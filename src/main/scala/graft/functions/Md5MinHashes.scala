package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k md5-seeded MinHash components of a token array in ONE fused pass.
  *
  * The composable form — k separate
  * `array_min(transform(toks, t => md5(concat(lit(s"$i|"), t))))` columns —
  * is the DIFFERENTIAL construction (md5 hex replays bit-for-bit in the
  * DuckDB oracle), but it evaluates an interpreted lambda chain per
  * (token × seed) and materializes k intermediate arrays of 32-char hex
  * strings per row: the largest single source of interpreted-HOF cost and
  * JIT-window variance on the bench board (r17 exit-state adjudication).
  * This expression walks the token array once, keeps all k running minima
  * as raw 16-byte digests, and hex-encodes only the k winners.
  *
  * Result is BIT-IDENTICAL to the composable form (Md5MinHashSpec pins
  * parity on the fixture corpus plus edge cases; the DuckDB oracle still
  * runs the spelled-out recipe, so the hash gate cross-checks the kernel
  * end-to-end):
  *  - digest input is the UTF-8 byte concatenation of "<i>|" and the
  *    token — exactly what `md5(concat(lit(s"$i|"), t))` hashes;
  *  - lexicographic min over lowercase-hex strings equals unsigned
  *    byte-wise min over the raw digests (the nibble→hex-char map is
  *    strictly increasing in ASCII — the WinnowFingerprints argument);
  *  - null tokens are skipped (concat(_, null) is null and array_min
  *    skips nulls) and an empty-or-all-null array yields a NULL signature
  *    (each composable mh_i would be null).
  */
case class Md5MinHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // k is part of the plan (a foldable literal via the SQL shim), so a
    // bad value must fail analysis with the function's name — not surface
    // as a NegativeArraySizeException from `prefixes` at eval time
    // (ADVICE r17); k = 0 would silently yield NULL for every row.
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"md5_minhashes requires k >= 1, got $k")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_minhashes requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_minhashes"

  // seed prefixes "0|".."<k-1>|" as UTF-8 bytes, one per component
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // one digest instance per thread — expression objects are shared across
  // local-mode tasks, and MessageDigest is stateful
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Row kernel, shared by interpreted eval and codegen. */
  def computeRow(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = digests.get()
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(prefixes(s))
          md.update(tok)
          val d = md.digest()
          if (mins(s) == null || unsignedLess(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    if (k == 0 || mins(0) == null) return null // empty or all-null input
    new GenericArrayData(mins.map(d => hex(d): Any))
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5MinHashes", this,
      classOf[Md5MinHashes].getName)
    val r = ctx.freshName("mmhResult")
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
      : Md5MinHashes = copy(child = newChild)
}

object Md5MinHashes {
  /** Column entry point: array of the k md5-seeded min-hash hex strings. */
  def md5_minhashes(toks: Column, k: Int): Column =
    GraftBridge.column(Md5MinHashes(GraftBridge.expression(toks), k))
}
