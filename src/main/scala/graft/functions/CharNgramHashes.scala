package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, de-duplicated 64-bit hashes of a string's byte-level n-gram
  * shingles, in one allocation-free pass.
  *
  * The composable form — `sort_array(array_distinct(transform(sequence(...),
  * i -> xxhash64(substring(text, i, n)))))` — allocates an index array, an
  * UTF8String per window and two intermediate arrays per row; at 5k docs ×
  * ~300 grams that alone cost more than the pairwise stage it feeds. This
  * expression walks the UTF8 bytes once, hashing each n-byte window in
  * place (XXH64 over the original buffer, Spark's xxhash64 seed), then
  * sorts + dedups into the result array.
  *
  * Byte-level windows equal character-level windows for ASCII text (the
  * fixture corpus is pure ASCII); for multi-byte UTF-8 the shingles differ
  * from `substring`'s but remain a valid shingling for Jaccard purposes.
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  private val Seed = 42L // Spark's xxhash64 seed

  /** Static runtime helper, called from both interpreted eval and the
    * generated code (compiled bytecode — stays inside the codegen stage). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes
    val count = math.max(numBytes - n + 1, 1)
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      val len = math.min(n, numBytes - i)
      hashes(i) = XXH64Bridge.hash(base, offset + i, len, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    val out = if (w == count) hashes else java.util.Arrays.copyOf(hashes, w)
    new GenericArrayData(out)
  }

  def ngram_hashes(c: Column, n: Int): Column =
    GraftBridge.column(CharNgramHashes(GraftBridge.expression(c), n))
}

/** Thin indirection over catalyst's XXH64 (same algorithm/seed as the
  * xxhash64 SQL function). */
private object XXH64Bridge {
  def hash(base: AnyRef, offset: Long, len: Int, seed: Long): Long =
    XXH64.hashUnsafeBytes(base, offset, len, seed)
}
