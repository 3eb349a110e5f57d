package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token-hash array in ONE fused per-row pass.
  *
  * SimHash is a pure per-document function — bit i of the fingerprint is the
  * majority vote of bit i across the document's token hashes. The previous
  * formulation (explode to (doc_id, token_hash) rows, then groupBy(doc_id)
  * with 64 conditional sums) shuffled one row per (doc, token) and paid a
  * 64-column aggregate for what a single array walk computes for free. This
  * kernel is the MinHashArray pattern: walk the array once per row, keep 64
  * vote counters in a primitive local array, no shuffle anywhere.
  *
  * Bit parity with the explode form (asserted in LlmSpec): a set bit votes
  * +1, a clear bit -1, and bit i of the result is set iff the vote sum is
  * strictly positive (the groupBy form's `when(sum > 0)`).
  *
  * Degenerate inputs: an empty array yields null (the explode form dropped
  * the document entirely — a scalar expression can't drop rows, so null is
  * the honest marker; no tokenizer in this engine produces an empty array
  * because `split("", " ")` is `[""]`). A null element contributes the
  * xxhash64 seed 42 — exactly what `xxhash64(null_token)` fed the explode
  * form, and the same convention MinHashArray documents.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty array → null, see scaladoc
  override def prettyName: String = "simhash64"

  /** Row kernel, shared by interpreted eval and codegen. */
  def computeRow(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 42L else arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    val r = ctx.freshName("shResult")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Object $r = $self.computeRow($a);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $r).longValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column entry point: the 64-bit SimHash of a token-hash array. */
  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
}
