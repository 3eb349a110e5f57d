package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All banded sign-projection LSH buckets of a vector in ONE fused pass.
  *
  * The naive formulation — `bands × bits` separate dot-product expressions
  * composed with when/shiftleft — generates thousands of lines of code for
  * 32×8 planes, which overwhelms janino (seconds of compile, or fallback to
  * interpreted evaluation). This expression keeps the whole projection
  * matrix as one flat `double[]` reference object and emits a single
  * per-row call into compiled Scala: `bands*bits*dim` multiplies in one
  * tight loop, no per-plane expression overhead.
  *
  * Output: `array<bigint>` of length `bands`; element `b` is
  * `(b << bits) + signBits(b)` — band-tagged so buckets from different
  * bands never collide when exploded into one bucket-join column.
  */
case class SignBandBuckets(child: Expression, planes: Seq[Double],
    bands: Int, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
  // the band tag strides by 2^bits, so the largest bucket id is
  // bands·2^bits - 1 — it must fit in a long or band tags silently collide
  require(bands >= 1 && bands.toLong <= (Long.MaxValue >> bits),
    s"bands·2^bits must fit in a long, got bands=$bands bits=$bits")

  private val dim: Int = planes.length / (bands * bits)

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_band_buckets requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_band_buckets"

  // lazy: child.dataType is unresolved at construction time
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Row kernel, shared by interpreted eval and codegen (codegen calls it
    * through a reference object: one virtual call per ROW, primitive loops
    * inside). */
  def computeRow(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    // materialize the vector once; ArrayData getters in the inner loop would
    // re-branch per access
    val v = new Array[Double](n)
    var k = 0
    while (k < n) {
      // null elements project as 0.0 (no contribution to any plane dot) —
      // the SQL surface accepts containsNull arrays and an unguarded getter
      // would read garbage from the null slot
      v(k) = if (arr.isNullAt(k)) 0.0
        else if (isFloat) arr.getFloat(k).toDouble
        else arr.getDouble(k)
      k += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // band tag strides by 2^bits so buckets from different bands can
      // never collide regardless of the configured band width
      var bucket = b.toLong << bits
      var t = 0
      while (t < bits) {
        val off = (b * bits + t) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += flat(off + i) * v(i); i += 1 }
        if (s > 0) bucket += (1L << t)
        t += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signBandBuckets", this,
      classOf[SignBandBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.computeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SignBandBuckets = copy(child = newChild)
}

object SignBandBuckets {
  /** Column entry point: array of band-tagged sign-LSH buckets. */
  def sign_band_buckets(v: Column, planes: Seq[Array[Double]], bits: Int)
      : Column =
    GraftBridge.column(SignBandBuckets(
      GraftBridge.expression(v),
      planes.flatten.toIndexedSeq, planes.length / bits, bits))

  /** Expression with the standard seeded hyperplanes (seed 42, gaussian) —
    * the SQL-facing form: `sign_band_buckets(vec, bands, bits, dim)`.
    * Identical planes to [[graft.llm.Similarity]]'s generator. */
  def seeded(child: Expression, bands: Int, bits: Int, dim: Int)
      : SignBandBuckets = {
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(bands * bits)(Array.fill(dim)(rnd.nextGaussian()))
    SignBandBuckets(child, planes.flatten.toIndexedSeq, bands, bits)
  }
}
