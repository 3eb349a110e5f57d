package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All k MinHash components of a token-hash array in ONE fused pass.
  *
  * The composable form — k separate `array_min(transform(hashes,
  * h -> xxhash64(h, seed)))` columns — evaluates interpreted lambdas per
  * (token × seed): tens of millions of boxed calls per scan on a document
  * corpus. This expression walks the hash array once and keeps all k
  * running minima in a primitive local array.
  *
  * Hash chain is bit-identical to the composable form and to
  * [[graft.llm.MinHashAggregator]] (asserted in LlmSpec): xxhash64 semantics
  * with default seed 42 and multi-arg chaining, i.e.
  * `mixed = XXH64.hashInt(seed, XXH64.hashLong(tokenHash, 42L))`.
  */
case class MinHashArray(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_array requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an empty hash array yields a null signature even if the child is
  // non-nullable (mirrors array_min-over-empty in the composable form)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_array"

  /** Row kernel, shared by interpreted eval and codegen. Degenerate inputs
    * mirror the composable form exactly: an empty array yields null (like
    * `array_min` over an empty transform), and a null element contributes
    * `hashInt(seed, 42)` (xxhash64 skips null children, leaving the seed). */
  def computeRow(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42L else XXH64.hashLong(arr.getLong(i), 42L)
      var s = 0
      while (s < k) {
        val m = XXH64.hashInt(s, base)
        if (m < out(s)) out(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashArray", this,
      classOf[MinHashArray].getName)
    val r = ctx.freshName("mhResult")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Object $r = $self.computeRow($a);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashArray = copy(child = newChild)
}

object MinHashArray {
  /** Column entry point: array of the k min-hash components. */
  def minhash_array(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashArray(GraftBridge.expression(hashes), k))
}
