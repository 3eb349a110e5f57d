package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session assembly via typed `flatMapGroupsWithState` — the one stateful
  * streaming API the rest of the engine didn't exercise (CustomState covers
  * `mapGroupsWithState`, TierD's windows cover the built-ins). Where
  * `session_window` can only aggregate, flatMap ownership of the state
  * record lets the operator EMIT a variable number of rows per key per
  * batch — here, one row per CLOSED session, the "emit sessions as they
  * finish" shape.
  *
  * Semantics match the batch sessionizer (TierC `sessionize_batch`, 30-min
  * gap) exactly, in epoch-second longs: a new session starts when an event
  * arrives ≥ 1800 s after the previous event. Value sums travel as exact
  * 2-decimal BigDecimals (CustomState's discipline) so results hash-match
  * the DuckDB oracle.
  *
  * Batch-boundary contract (the stream_stream_join caveat, same shape):
  * each batch emits the sessions its data closes AND flushes the open tail.
  * Under the AvailableNow one-batch harness this equals the batch
  * sessionization exactly — which is what the differential oracle checks.
  * A multi-batch production run would instead hold the tail in state
  * (`state.update` below is the carry) and flush it on an event-time
  * timeout; the per-batch sort is bounded by a user's events per batch
  * (the collect_list-style buffer bound, per key per batch — not per
  * stream). */
object SessionAssembly {

  case class SEv(user_id: Long, t: Long, value: java.math.BigDecimal)
  /** The finalized variant's event carries the RAW watermark column too:
    * Spark's unsupported-operation check requires an output attribute with
    * watermark metadata to reach the FlatMapGroupsWithState child, and a
    * CAST expression strips it — so `ts` rides along unchanged. */
  case class SEvF(user_id: Long, ts: java.sql.Timestamp, t: Long,
      value: java.math.BigDecimal)
  case class OpenTail(start: Long, end: Long, n: Long,
      sum: java.math.BigDecimal)
  case class SessionOut(user_id: Long, session_start_s: Long,
      session_end_s: Long, n_events: Long, sum_value: Double)

  val gapSeconds = 1800L

  def assemble(uid: Long, evs: Iterator[SEv],
      state: GroupState[OpenTail]): Iterator[SessionOut] = {
    // the group iterator is unordered; sessionization needs event-time
    // order within the batch (ties carry no order-dependence: the break
    // test and the BigDecimal sum depend on values only)
    val sorted = evs.toArray.sortBy(_.t)
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null) cur = OpenTail(e.t, e.t, 1L, e.value)
      else if (e.t >= cur.end + gapSeconds) {
        out += SessionOut(uid, cur.start, cur.end, cur.n, cur.sum.doubleValue)
        cur = OpenTail(e.t, e.t, 1L, e.value)
      } else cur = OpenTail(cur.start, e.t, cur.n + 1L, cur.sum.add(e.value))
    }
    state.update(cur) // the cross-batch carry (see batch-boundary contract)
    out += SessionOut(uid, cur.start, cur.end, cur.n, cur.sum.doubleValue)
    out.iterator
  }

  /** Attach session assembly to an events stream with (user_id, ts, value).
    * Append output with a PER-BATCH TAIL FLUSH: every micro-batch emits each
    * touched user's closed sessions AND its still-open tail; a tail that
    * extends across batches is re-emitted (grown) in each later batch that
    * touches the user. Single-batch consumers (the gate's AvailableNow run)
    * therefore see exactly one row per session; multi-batch consumers must
    * reduce by (user_id, start) keeping the longest row — maxBy(end), as
    * SessionAssemblySpec does — or gate the flush behind an event-time
    * timeout. See the object-level batch-boundary contract. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "CAST(ts AS LONG) AS t",
        "CAST(value AS DECIMAL(18,2)) AS value")
      .as[SEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenTail, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(assemble)
  }

  /** The WATERMARK-FINALIZED variant (round 12): each session is emitted
    * EXACTLY ONCE — closed sessions when the closing event arrives, the
    * open tail only when the event-time watermark passes `end + gap` (an
    * event-time timeout), at which point no in-order event can extend it.
    * Append-mode consumers need no per-(user, start) reduction: there are
    * no duplicate rows by construction (SessionAssemblySpec pins this over
    * ≥3 micro-batches). The trade: a tail whose `end + gap` the watermark
    * never passes (each user's final session near stream end) stays in
    * state unemitted when the stream stops — the gate oracle states that
    * boundary exactly (emit iff a later same-user event exists, or
    * (end+gap)·1000 < the global max event-time ms). */
  def assembleFinal(uid: Long, evs: Iterator[SEvF],
      state: GroupState[OpenTail]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val cur = state.get
      state.remove()
      return Iterator.single(
        SessionOut(uid, cur.start, cur.end, cur.n, cur.sum.doubleValue))
    }
    val sorted = evs.toArray.sortBy(_.t)
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null) cur = OpenTail(e.t, e.t, 1L, e.value)
      else if (e.t >= cur.end + gapSeconds) {
        out += SessionOut(uid, cur.start, cur.end, cur.n, cur.sum.doubleValue)
        cur = OpenTail(e.t, e.t, 1L, e.value)
      } else cur = OpenTail(cur.start, e.t, cur.n + 1L, cur.sum.add(e.value))
    }
    state.update(cur)
    // fire when the watermark passes the gap after the tail's last event;
    // the max() guard keeps the timestamp legal (it must exceed the
    // current watermark) for a user whose whole tail is already behind it
    state.setTimeoutTimestamp(math.max((cur.end + gapSeconds) * 1000L,
      state.getCurrentWatermarkMs() + 1L))
    out.iterator
  }

  /** Attach watermark-finalized session assembly (see [[assembleFinal]]).
    * `delay` is the watermark delay on the raw `ts` column; the gate uses
    * 0 seconds so the finalization boundary is a pure function of the
    * fixture's max event time. */
  def sessionsFinal(events: DataFrame,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .selectExpr("user_id", "ts", "CAST(ts AS LONG) AS t",
        "CAST(value AS DECIMAL(18,2)) AS value")
      .as[SEvF]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenTail, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        assembleFinal)
  }
}
