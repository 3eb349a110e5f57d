package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics in ONE fused pass over the token array:
  * token count, total character count, BPE-ish subword estimate
  * (ceil(len/4) per token), and a hit count per caller-supplied lexicon.
  *
  * The composable form — `aggregate(transform(toks, t -> length(t)), ...)`
  * plus one `size(filter(toks, t -> array_contains(lex, t)))` per lexicon —
  * interprets a lambda per (token × use): Spark HOFs do not participate in
  * whole-stage codegen, so a 5-use quality query paid five boxed walks per
  * document. This kernel walks the array once and keeps primitive
  * accumulators; lexicons are pre-hashed sets resolved per token in O(1).
  *
  * Parity with the composable form (asserted in LlmSpec): character
  * counts use the same code-point semantics as the builtin `length`
  * (UTF8String.numChars); `ceil(length/4.0)` over a non-negative int equals
  * `(len + 3) / 4` exactly; lexicon matching is exact string equality.
  * `n_tok` counts all slots (like `size`). Null token slots contribute
  * nothing to sums or hits (the HOF form poisons the whole sum to null —
  * the skip is the useful semantics and matches MinHashArray's documented
  * null-element convention; no tokenizer in this engine emits null tokens).
  */
case class TokenStats(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("bpe_sum", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "token_stats"

  @transient private lazy val lexSets: Array[java.util.HashSet[UTF8String]] =
    lexicons.map { lex =>
      val s = new java.util.HashSet[UTF8String](lex.size * 2)
      lex.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Row kernel, shared by interpreted eval and codegen. */
  def computeRow(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var charSum = 0L
    var bpeSum = 0L
    val hits = new Array[Int](lexSets.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val len = t.numChars()
        charSum += len
        bpeSum += (len + 3) / 4
        var l = 0
        while (l < lexSets.length) {
          if (lexSets(l).contains(t)) hits(l) += 1
          l += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, charSum, bpeSum,
      new GenericArrayData(hits)))
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (${classOf[InternalRow].getName}) $self.computeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  /** Column entry point: struct(n_tok, char_sum, bpe_sum, hits) where
    * hits(i) counts tokens contained in `lexicons(i)`. */
  def token_stats(tokens: Column, lexicons: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenStats(GraftBridge.expression(tokens), lexicons))

  /** SQL-surface constructor: `token_stats(toks)` or
    * `token_stats(toks, array(array('the','and'), array('le','la')))` with
    * a foldable lexicon literal. */
  def fromSql(exprs: Seq[Expression]): TokenStats = {
    SqlArgs.arity("token_stats", exprs, 1, 2)
    val lex: Seq[Seq[String]] =
      if (exprs.size < 2) Nil
      else SqlArgs.foldable("token_stats", exprs, 1, "lexicons") match {
        case outer: ArrayData =>
          (0 until outer.numElements()).map { i =>
            val inner = outer.getArray(i)
            if (inner == null) throw new IllegalArgumentException(
              "token_stats lexicons must not contain null arrays")
            (0 until inner.numElements())
              .map(j => inner.getUTF8String(j).toString)
          }
        case other => throw new IllegalArgumentException(
          "token_stats argument 2 (lexicons) must be array<array<string>>, " +
            s"got ${other.getClass.getSimpleName}")
      }
    TokenStats(exprs.head, lex)
  }
}
