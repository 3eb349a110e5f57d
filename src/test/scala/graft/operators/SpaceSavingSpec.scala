package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Space-Saving's guarantees are ORDER-INDEPENDENT even though its counter
  * values are not: count ≥ true frequency ≥ count − err for every counter
  * under any merge tree, and every item with frequency > n/k is present.
  * The fixture gate can't check this (unit-tier key), so this spec plants
  * heavy hitters and folds the same stream through different partition
  * splits and merge shapes, asserting the bounds against exact counts. */
class SpaceSavingSpec extends SparkSpec {

  private type Buf = (Long, Seq[(String, Long, Long)])

  private def fold(agg: SpaceSavingAggregator, items: Seq[String]): Buf =
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))

  private def checkBounds(buf: Buf, truth: Map[String, Long],
      clue: String): Unit = {
    val (n, cs) = buf
    assert(n == truth.values.sum, s"$clue: n drifted")
    cs.foreach { case (item, c, e) =>
      val f = truth.getOrElse(item, 0L)
      assert(c >= f, s"$clue: $item count $c underestimates true $f")
      assert(c - e <= f, s"$clue: $item lower bound ${c - e} exceeds true $f")
    }
  }

  // hh1×300 + hh2×150 + 100 tail items ×5, interleaved deterministically
  private val planted: Seq[String] = {
    val raw = Seq.fill(300)("hh1") ++ Seq.fill(150)("hh2") ++
      (0 until 100).flatMap(i => Seq.fill(5)(f"t$i%02d"))
    new scala.util.Random(42).shuffle(raw)
  }
  private val truth: Map[String, Long] =
    planted.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("planted heavy hitters are present with valid bounds (single pass)") {
    val agg = new SpaceSavingAggregator(10)
    val buf = fold(agg, planted)
    checkBounds(buf, truth, "single-pass")
    val items = buf._2.map(_._1).toSet
    // n/k = 950/10 = 95; both planted frequencies clear it
    assert(items.contains("hh1") && items.contains("hh2"),
      s"guaranteed heavy hitters missing from $items")
    // top-1 by count must be the dominant planted item
    assert(buf._2.maxBy(_._2)._1 == "hh1")
  }

  test("bounds and HH presence hold across different merge trees") {
    val agg = new SpaceSavingAggregator(10)
    val chunks = planted.grouped((planted.size + 3) / 4).toSeq
    assert(chunks.size == 4)
    val parts = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val balanced = agg.finish(
      agg.merge(agg.merge(parts(0), parts(1)), agg.merge(parts(2), parts(3))))
    val skewed = agg.finish(
      agg.merge(agg.merge(agg.merge(parts(0), parts(1)), parts(2)), parts(3)))
    for ((buf, clue) <- Seq(balanced -> "balanced", skewed -> "left-deep")) {
      checkBounds(buf, truth, clue)
      val items = buf._2.map(_._1).toSet
      assert(items.contains("hh1") && items.contains("hh2"),
        s"$clue merge lost a guaranteed heavy hitter: $items")
    }
  }

  test("exact regime: <= k distinct items yields exact counts, zero err") {
    val agg = new SpaceSavingAggregator(10)
    val stream = new scala.util.Random(7).shuffle(
      (0 until 8).flatMap(i => Seq.fill(i + 1)(s"v$i")): Seq[String])
    val t = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (nChunks <- Seq(1, 3)) {
      val parts = stream.grouped((stream.size + nChunks - 1) / nChunks)
        .map(c => c.foldLeft(agg.zero)(agg.reduce)).toSeq
      val buf = agg.finish(parts.reduce(agg.merge))
      assert(buf._2.size == 8)
      buf._2.foreach { case (item, c, e) =>
        assert(c == t(item) && e == 0L,
          s"exact regime drifted: $item ($c, $e) vs true ${t(item)}")
      }
    }
  }

  test("agg_spacesaving_topk: distributed run satisfies the bounds vs exact counts") {
    val df = graft.SparkEntry.queries("agg_spacesaving_topk")(spark, sf)
    val exact = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_suppkey").cast("string").as("item"))
      .agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val totals = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, item) = (r.getString(0), r.getString(2))
      val (c, e, n) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val f = exact.getOrElse((flag, item), 0L)
      assert(n == totals(flag), s"$flag: n_rows $n vs exact ${totals(flag)}")
      assert(c >= f, s"$flag/$item: count $c underestimates $f")
      assert(c - e <= f, s"$flag/$item: lower bound ${c - e} exceeds $f")
    }
  }
}
