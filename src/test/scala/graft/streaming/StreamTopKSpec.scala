package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming Space-Saving sketch: the k-bounded state must carry
  * across micro-batches (not re-seed), fold in (tus, event_id) order, and
  * the deterministic single-state fold must equal a sequential reference
  * replay of the whole ordered stream — on top of the order-independent
  * ICDT-2005 bounds the batch sibling's spec asserts for merge trees. */
class StreamTopKSpec extends SparkSpec {

  test("sketch state carries across batches and equals the sequential reference fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_type, tus, event_id, item): 40 items over a 20-id vocabulary
    // with a planted heavy hitter "hh" (frequency 12 > n/k for k=16), so
    // the sketch runs in the eviction regime (>16 distinct items).
    val mkItem = (i: Int) => if (i % 3 == 0) "hh" else s"it${i % 20}"
    val all = (1 to 36).map(i => ("click", i.toLong, i.toLong, mkItem(i)))
    val input = MemoryStream[(String, Long, Long, String)]
    val events = input.toDS()
      .toDF("event_type", "tus", "event_id", "item")
      .as[StreamTopK.TEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[StreamTopK.SsState, StreamTopK.SsOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        StreamTopK.fold)
    val q = events.writeStream.format("memory").queryName("sst_spec")
      .outputMode("append").start()
    def rows() = spark.table("sst_spec").as[StreamTopK.SsOut].collect().toSeq
    try {
      // batch 1 delivered OUT of order — the fold must sort by (tus, id)
      input.addData(all.take(20).reverse)
      q.processAllAvailable()
      val b1 = rows()
      assert(b1.nonEmpty && b1.forall(_.n_so_far == 20L),
        s"batch-1 snapshot missing or mis-counted: $b1")
      // batch 2: state must CARRY (n reaches 36, not 16)
      input.addData(all.drop(20))
      q.processAllAvailable()
      val fin = rows().filter(_.n_so_far == 36L)
      assert(fin.nonEmpty, s"cross-batch carry broken: ${rows()}")

      // reference: the SAME aggregator folded sequentially over the full
      // ordered stream — the determinism contract
      val agg = new graft.operators.SpaceSavingAggregator(16)
      val ref = all.sortBy(e => (e._2, e._3))
        .foldLeft(agg.zero) { case (b, e) => agg.reduce(b, e._4) }
      val refRanked = ref._2.sortBy { case (it, c, _) => (-c, it) }
        .zipWithIndex.map { case ((it, c, er), i) => (i + 1, it, c, er) }
      val gotRanked = fin.sortBy(_.rank)
        .map(o => (o.rank, o.item, o.est_count, o.err_bound))
      assert(gotRanked == refRanked,
        s"streaming fold diverged from sequential reference:\n" +
          s"got $gotRanked\nref $refRanked")

      // ICDT bounds vs exact counts, and n/k heavy-hitter presence
      val exact = all.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      fin.foreach { o =>
        val t = exact.getOrElse(o.item, 0L)
        assert(o.est_count >= t && t >= o.est_count - o.err_bound,
          s"bounds violated for ${o.item}: est=${o.est_count} " +
            s"err=${o.err_bound} true=$t")
      }
      assert(fin.exists(_.item == "hh"),
        s"heavy hitter (12 > 36/16) evicted: $fin")
    } finally q.stop()
  }

  test("global pre-merge variant: ICDT bounds hold under the merge tree across 3 batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 120 items over a 30-id vocabulary (eviction regime for k=16) with a
    // planted heavy hitter at frequency 40 > n/k = 120/16; delivered over
    // THREE micro-batches and folded through multi-partition pre-merged
    // sketches — counter values are merge-order-dependent here, so the
    // assertions are exactly the order-independent ICDT/PODS guarantees.
    val mkItem = (i: Int) => if (i % 3 == 0) "hh" else s"it${i % 30}"
    val all = (1 to 120).map(i => ("click", i.toLong, i.toLong, mkItem(i)))
    val input = MemoryStream[(String, Long, Long, String)]
    // repartition(4) forces ≥2 non-empty partitions per batch, so the
    // state instance genuinely merges multiple pre-merged sketch rows
    val events = input.toDS()
      .toDF("event_type", "tus", "event_id", "item")
      .repartition(4)
      .as[StreamTopK.TEv]
      .mapPartitions { it =>
        val agg = new graft.operators.SpaceSavingAggregator(16)
        val sorted = it.toArray.sortBy(e => (e.tus, e.event_id))
        if (sorted.isEmpty) Iterator.empty
        else Iterator({
          var buf = agg.zero
          sorted.foreach(e => buf = agg.reduce(buf, e.item))
          StreamTopK.SkRow(buf._1, buf._2)
        })
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[StreamTopK.SsState, StreamTopK.SsOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        StreamTopK.foldGlobal)
    val q = events.writeStream.format("memory").queryName("ssg_spec")
      .outputMode("append").start()
    def rows() = spark.table("ssg_spec").as[StreamTopK.SsOut].collect().toSeq
    try {
      input.addData(all.take(40)); q.processAllAvailable()
      assert(rows().exists(_.n_so_far == 40L),
        s"batch-1 pre-merged n wrong: ${rows().map(_.n_so_far).distinct}")
      input.addData(all.slice(40, 80)); q.processAllAvailable()
      input.addData(all.drop(80)); q.processAllAvailable()
      val fin = rows().filter(_.n_so_far == 120L)
      // n carries exactly across batches: sketch-row n values are summed
      // by the PODS merge, so the final snapshot reads the true total
      assert(fin.nonEmpty, s"cross-batch sketch-merge carry broken: " +
        s"${rows().map(_.n_so_far).distinct}")
      assert(fin.size <= 16, s"snapshot wider than k: ${fin.size}")
      // ICDT bounds vs exact counts under an arbitrary merge tree
      val exact = all.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      fin.foreach { o =>
        val t = exact.getOrElse(o.item, 0L)
        assert(o.est_count >= t && t >= o.est_count - o.err_bound,
          s"merge-tree bounds violated for ${o.item}: est=${o.est_count} " +
            s"err=${o.err_bound} true=$t")
      }
      // n/k heavy-hitter presence survives the merge tree (PODS 2012)
      assert(fin.exists(_.item == "hh"),
        s"heavy hitter (40 > 120/16) evicted by the merge tree: $fin")
    } finally q.stop()
  }
}
