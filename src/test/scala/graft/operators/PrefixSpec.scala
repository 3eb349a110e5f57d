package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence tests for the 2-pass partition-prefix primitive: on any
  * input whose sort key is a total order, Prefix.runningAggs must equal
  * the single-partition `Window.orderBy` it replaces, row for row; on
  * tied keys the cum values must form the same multiset. Inputs are
  * deliberately skewed/small/negative to hit empty range slices,
  * single-row partitions, and non-monotone running sums (the sweep-line
  * −1 deltas). */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("unique keys: running sum and position equal the global window") {
    // pseudo-random but fixed values, including negatives
    val rows = (1L to 1000L).map(i => (i, ((i * 2654435761L) % 97L) - 48L))
    val df = rows.toDF("id", "v")
    val w = Window.orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("i", count(lit(1)).over(w))
      .select("id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Prefix.runningAggs(df,
        Seq(col("v").asc, col("id").asc), col("v"),
        sumOut = Some("cum"), rnOut = Some("i"))
      .select("id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("tied keys: cum values form the same multiset as the window's") {
    // every key collides 10 ways — ties may stradde range boundaries,
    // the guarantee is multiset equality of (key, cum) pairs
    val df = (1L to 500L).map(i => (i % 50L, 1L)).toDF("k", "v")
    val w = Window.orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def multiset(rows: Array[(Long, Long)]) =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Prefix.runningAggs(df, Seq(col("k").asc), col("v"),
        sumOut = Some("cum"))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(multiset(got) == multiset(want))
  }

  test("more partitions than rows: empty range slices contribute nothing") {
    val df = Seq((1L, 5L), (2L, -3L), (3L, 7L)).toDF("id", "v")
    val got = Prefix.runningAggs(df, Seq(col("id").asc), col("v"),
        sumOut = Some("cum"), rnOut = Some("i"), partitions = Some(16))
      .select("id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L, 1L), (2L, 2L, 2L), (3L, 9L, 3L)))
  }

  test("grouped: per-key running sum and position equal the per-key window") {
    // 7 groups × ~150 rows, forced to 8 slices so groups straddle slice
    // boundaries (the stitch under test); negatives included
    val rows = (1L to 1000L).map(i =>
      (i % 7L, i, ((i * 2654435761L) % 97L) - 48L))
    val df = rows.toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("i", count(lit(1)).over(w))
      .select("g", "id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = Prefix.runningAggsByKey(df, Seq("g"),
        Seq(col("v").asc, col("id").asc), col("v"),
        sumOut = Some("cum"), rnOut = Some("i"), partitions = Some(8))
      .select("g", "id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("grouped: NULL key values form a group, exactly like the window") {
    // review finding: the offsets equi-join silently dropped NULL-keyed
    // rows until it was spelled null-safe (<=>); this pins the
    // Window.partitionBy equivalence on a nullable key
    val df = Seq((Some(1L), 1L, 10L), (None, 2L, 20L), (Some(1L), 3L, 30L),
      (None, 4L, 40L)).toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def keyOf(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2))
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("g", "id", "cum").collect().map(keyOf).toSet
    val got = Prefix.runningAggsByKey(df, Seq("g"), Seq(col("id").asc),
        col("v"), sumOut = Some("cum"), partitions = Some(3))
      .select("g", "id", "cum").collect().map(keyOf).toSet
    assert(got == want, s"got $got want $want")
  }

  test("grouped: a single key spanning every slice stitches correctly") {
    // ONE key, 500 rows, 16 slices — the per-group window would funnel
    // all 500 through one task; the prefix must still match it exactly
    val df = (1L to 500L).map(i => (42L, i, i % 13L)).toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Prefix.runningAggsByKey(df, Seq("g"), Seq(col("id").asc),
        col("v"), sumOut = Some("cum"), partitions = Some(16))
      .select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("decimal values: DECIMAL(38,0) cumulatives beyond long range match " +
      "the window exactly") {
    // round 16 (r15 verdict #6): a DecimalType value rides a
    // DECIMAL(38, scale) accumulator through both passes. Values are
    // ~21 digits — far beyond Long — so any silent cast-to-long path
    // would overflow or null out; forced to 8 slices so the stitch adds
    // big decimals too.
    val df = (1L to 200L).map(i => (i, s"9223372036854775807${i % 97}"))
      .toDF("id", "vs")
      .withColumn("v", col("vs").cast("decimal(38,0)")).drop("vs")
    val w = Window.orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .withColumn("i", count(lit(1)).over(w))
      .select("id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toBigInteger.toString,
        r.getLong(2))).toSet
    val got = Prefix.runningAggs(df,
        Seq(col("v").asc, col("id").asc), col("v"),
        sumOut = Some("cum"), rnOut = Some("i"), partitions = Some(8))
    assert(got.schema("cum").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0))
    val gotSet = got.select("id", "cum", "i").collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toBigInteger.toString,
        r.getLong(2))).toSet
    assert(gotSet == want)
  }

  test("grouped decimal: per-key DECIMAL(20,2) cumulatives match the " +
      "per-key window") {
    // scale propagation under the grouped stitch: cents-style scale-2
    // money values, sums kept exact (the output dtype is pinned to
    // DECIMAL(38,2) so the (38,s)+(38,s) stitch add cannot renegotiate
    // the scale)
    val df = (1L to 300L).map(i => (i % 5L, i, s"${i * 37}.${10 + i % 90}"))
      .toDF("g", "id", "vs")
      .withColumn("v", col("vs").cast("decimal(20,2)")).drop("vs")
    val w = Window.partitionBy("g").orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("g", "id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet
    val got = Prefix.runningAggsByKey(df, Seq("g"), Seq(col("id").asc),
        col("v"), sumOut = Some("cum"), partitions = Some(6))
    assert(got.schema("cum").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 2))
    val gotSet = got.select("g", "id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet
    assert(gotSet == want)
  }

  test("descending sort keys route correctly through the range exchange") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id", "v")
    val got = Prefix.runningAggs(df,
        Seq(col("v").desc, col("id").asc), col("v"), sumOut = Some("cum"))
      .select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 60L), (2L, 30L), (3L, 50L)))
  }
}
