package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct winnowed document fingerprints (Schleimer/Wilkerson/Aiken
  * robust winnowing) in one O(n) pass: md5 each k-char gram, slide a
  * w-gram window, keep the window MINIMUM with rightmost-on-ties, dedup.
  *
  * The composable spelling this replaces built, PER DOCUMENT, an
  * n-element array of 39-char strings (`md5-hex ++ lpad(3000000 − p)`)
  * and then, PER WINDOW POSITION, copied a w-element `slice` and ran
  * `array_min` over it — O(n·w) string comparisons plus O(n) array
  * allocations, all in interpreted HOF eval (higher-order functions
  * never enter whole-stage codegen). Measured at the round-17 sf0.1
  * sweep it was the board's slowest verify key by an order of
  * magnitude: ~40 ms/doc, and the plan computed the fps THREE times
  * (the n_fp branch and the two shared-count consumers), for 100+
  * single-task minutes on the one-row-group staging file. This
  * expression hashes each gram once into a 16-byte digest and keeps the
  * window minimum with a monotone deque — amortized O(1) per position,
  * zero per-window copies. Digests compare as unsigned bytes, which is
  * ORDER-IDENTICAL to comparing their lowercase-hex spellings (each
  * byte maps monotonically to two hex digits), and ties prefer the
  * larger position — exactly the `min(hash ++ lpad(3000000 − p))`
  * total order of the composable form and of the DuckDB oracle, which
  * still runs the spelled-out recipe (the cross-engine check that
  * pins this kernel's semantics).
  *
  * Grams are CHARACTER windows (like `substring`/DuckDB `substr`): on
  * pure-ASCII text the byte walk is used directly; multi-byte UTF-8
  * takes a per-char offset table first. Documents shorter than k chars
  * yield an empty array (callers filter them; the guard keeps eval
  * total). For w = 1 every gram is selected.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(w >= 1, s"window size must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned-lexicographic digest compare == lowercase-hex compare. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Static runtime helper, called from both interpreted eval and the
    * generated code (compiled bytecode — stays inside the codegen stage). */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val nChars = s.numChars()
    // char p (0-based) starts at byte charOff(p); gram p covers
    // [charOff(p), charOff(p + k)) — identity when pure ASCII
    val charOff: Array[Int] =
      if (nChars == nBytes) null
      else {
        val off = new Array[Int](nChars + 1)
        var b = 0; var c = 0
        while (c < nChars) {
          off(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        off(nChars) = nBytes
        off
      }
    val m = nChars - k + 1 // gram count
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    val grams = new Array[Array[Byte]](m)
    var p = 0
    while (p < m) {
      val start = if (charOff == null) p else charOff(p)
      val end = if (charOff == null) p + k else charOff(p + k)
      digest.update(bytes, start, end - start)
      grams(p) = digest.digest() // digest() resets for the next gram
      p += 1
    }
    // LinkedHashSet keeps first-selection order; the consumer only
    // counts, but deterministic order keeps parity with array_distinct
    val selected = new java.util.LinkedHashSet[UTF8String]()
    if (m < w) {
      // fewer grams than one window: the global min is the one fingerprint
      var best = 0
      p = 1
      while (p < m) {
        if (cmp(grams(p), grams(best)) <= 0) best = p // ties → rightmost
        p += 1
      }
      selected.add(toHex(grams(best)))
    } else {
      // monotone deque of gram indices, increasing in the total order
      // (digest asc, position desc on digest ties): the head is always
      // the window minimum with rightmost-on-ties
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      p = 0
      while (p < m) {
        // a new position wins every tie (it is rightmost), so pop <= 0
        while (tail > head && cmp(grams(p), grams(deque(tail - 1))) <= 0)
          tail -= 1
        deque(tail) = p; tail += 1
        if (deque(head) <= p - w) head += 1 // slid out of the window
        if (p >= w - 1) selected.add(toHex(grams(deque(head))))
        p += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def winnow_fps(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(c), k, w))
}
