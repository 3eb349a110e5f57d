package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 64-bit hashes of every length-n sliding window of a token-hash array —
  * the word-n-gram analogue of [[CharNgramHashes]].
  *
  * Replaces the composable `transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, n)))` form, which materializes every n-gram as a string:
  * n× the corpus bytes allocated per scan and shuffled into the
  * contamination join. Here each window contributes one long — built by
  * chaining the window's token hashes through the xxhash64 mix
  * (`acc = XXH64.hashLong(h_i, acc)`, seed 42), one fused pass per row.
  *
  * A window shorter than n (doc shorter than the gram size) hashes the
  * available tokens — mirroring the slice-clamp fallback of the string form.
  * Downstream equality on these hashes equals string-gram equality absent a
  * 64-bit collision (~1e-10 over this corpus).
  */
case class TokenNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ngram_hashes requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ngram_hashes"

  /** Row kernel, shared by interpreted eval and codegen. */
  def computeRow(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var acc = 42L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        // null slots leave the chain unchanged — exactly what multi-arg
        // xxhash64 does with a null argument (and MinHashArray's documented
        // null-element convention); the SQL surface accepts containsNull
        // arrays, so an unguarded getLong would hash garbage here
        if (!arr.isNullAt(j)) acc = XXH64.hashLong(arr.getLong(j), acc)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenNgramHashes", this,
      classOf[TokenNgramHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.computeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenNgramHashes = copy(child = newChild)
}

object TokenNgramHashes {
  /** Column entry point: hashes of all length-n token windows. */
  def token_ngram_hashes(tokenHashes: Column, n: Int): Column =
    GraftBridge.column(
      TokenNgramHashes(GraftBridge.expression(tokenHashes), n))
}
