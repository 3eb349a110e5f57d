package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Space-Saving heavy hitters via `flatMapGroupsWithState` —
  * the continuous form of `agg_spacesaving_topk`: one k=16 counter sketch
  * per event_type carried across micro-batches, a ranked top-k snapshot
  * emitted per key per batch (the "trending items right now" readout a
  * dashboard polls, which the batch sketch can only produce by rescanning
  * history). The FOLD is single-sourced from
  * [[graft.operators.SpaceSavingAggregator]] — the state record is the
  * aggregator's buffer and each batch replays `reduce` over it, so the
  * streaming and batch sketches cannot drift (the bpe/ClickGraph
  * cannot-drift principle applied to state).
  *
  * Unlike the batch key (whose counter values depend on the partition
  * merge order — PODS-2012 merges), the streaming fold here is
  * DETERMINISTIC: one state per key folds items one at a time in
  * (unix_micros(ts), event_id) order — within a batch by explicit sort
  * (the EwmaAnomaly order contract), across batches because
  * eventsStreamChunked's chunks are ntile over the same global order. So
  * StreamTopKSpec can assert exact equality against a sequential
  * reference fold of the whole ordered stream, on top of the
  * order-independent ICDT-2005 bounds (est ≥ true ≥ est − err, any item
  * with frequency > n/k present).
  *
  * 100 TB shape: state is k-bounded per key (16 counters — constant
  * memory regardless of item cardinality), each batch shuffles only
  * (key, item) rows to the state partition, and the emitted snapshot is
  * k rows per key per batch. The per-key serial fold is the scale
  * bound: key cardinality (event types, tenants, shards) is the
  * parallelism axis, exactly how production per-tenant trending works; a
  * single global key at 100 TB would instead pre-aggregate per-partition
  * sketches with the batch aggregator's PODS merge and accept
  * merge-order-dependent counter values.
  */
object StreamTopK {

  case class TEv(event_type: String, tus: Long, event_id: Long, item: String)
  case class SsState(n: Long, counters: Seq[(String, Long, Long)])
  case class SsOut(event_type: String, n_so_far: Long, rank: Int,
      item: String, est_count: Long, err_bound: Long)

  private val K = 16

  def fold(key: String, evs: Iterator[TEv],
      state: GroupState[SsState]): Iterator[SsOut] = {
    val sorted = evs.toArray.sortBy(e => (e.tus, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val agg = new graft.operators.SpaceSavingAggregator(K)
    var buf = state.getOption
      .map(s => (s.n, s.counters)).getOrElse(agg.zero)
    sorted.foreach { e => buf = agg.reduce(buf, e.item) }
    state.update(SsState(buf._1, buf._2))
    buf._2.sortBy { case (item, c, _) => (-c, item) }.zipWithIndex.map {
      case ((item, c, err), i) => SsOut(key, buf._1, i + 1, item, c, err)
    }.iterator
  }

  /** Attach the sketch to a raw events stream (event_type, ts, event_id,
    * props columns); items are the page ids from props. */
  def topk(events: DataFrame): Dataset[SsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("event_type", "unix_micros(ts) AS tus", "event_id",
        "get_json_object(props, '$.k') AS item")
      .filter("item IS NOT NULL")
      .as[TEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SsState, SsOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** One pre-merged per-partition sketch row: (n folded, counters). */
  case class SkRow(n: Long, counters: Seq[(String, Long, Long)])

  /** Merge the batch's pre-merged partition sketches into the carried
    * global state via the batch aggregator's PODS-2012 merge — the state
    * instance never sees a raw item. Incoming sketches are merged in a
    * deterministic (n, first-item) order so a given partitioning replays
    * identically; counter VALUES still depend on the partitioning (the
    * merge-tree caveat the batch sketch documents), which is why the spec
    * asserts the order-independent ICDT bounds, not value parity. */
  def foldGlobal(key: Int, sks: Iterator[SkRow],
      state: GroupState[SsState]): Iterator[SsOut] = {
    val agg = new graft.operators.SpaceSavingAggregator(K)
    val sorted = sks.toArray.sortBy(sk =>
      (sk.n, sk.counters.headOption.map(_._1).getOrElse("")))
    if (sorted.isEmpty) return Iterator.empty
    var buf = state.getOption
      .map(s => (s.n, s.counters)).getOrElse(agg.zero)
    sorted.foreach { sk => buf = agg.merge(buf, (sk.n, sk.counters)) }
    state.update(SsState(buf._1, buf._2))
    buf._2.sortBy { case (item, c, _) => (-c, item) }.zipWithIndex.map {
      case ((item, c, err), i) =>
        SsOut("all", buf._1, i + 1, item, c, err)
    }.iterator
  }

  /** GLOBAL (single-key) streaming heavy hitters with per-partition
    * pre-merge — the scale shape the per-key variant's scaladoc names:
    * with ONE logical key, routing raw items to a single state instance
    * serializes the whole stream through it. Instead each input partition
    * folds its micro-batch slice into a k-bounded sketch locally
    * (`mapPartitions` + the batch aggregator's `reduce`, items in
    * (tus, event_id) order within the partition), and only ≤1 sketch ROW
    * per partition per batch crosses the shuffle to the state instance,
    * which merges them with the PODS merge (`foldGlobal`). Parallelism is
    * restored to the partition count and state traffic is k·partitions
    * counters per batch regardless of stream volume. The price is
    * merge-order-dependent counter values (any merge tree keeps the
    * ICDT bounds — StreamTopKSpec asserts them over 3 real batches). */
  def topkGlobal(events: DataFrame): Dataset[SsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sketches = events
      .selectExpr("event_type", "unix_micros(ts) AS tus", "event_id",
        "get_json_object(props, '$.k') AS item")
      .filter("item IS NOT NULL")
      .as[TEv]
      .mapPartitions { it =>
        val agg = new graft.operators.SpaceSavingAggregator(K)
        val sorted = it.toArray.sortBy(e => (e.tus, e.event_id))
        if (sorted.isEmpty) Iterator.empty
        else {
          var buf = agg.zero
          sorted.foreach { e => buf = agg.reduce(buf, e.item) }
          Iterator(SkRow(buf._1, buf._2))
        }
      }
    sketches
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[SsState, SsOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(foldGlobal)
  }
}
