package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user streaming EWMA anomaly scoring via `flatMapGroupsWithState` —
  * the ORDER-SENSITIVE stateful recurrence the rest of the streaming
  * surface didn't exercise (CustomState folds an order-independent sum;
  * SessionAssembly's gap rule only reads the previous event's time).
  * Every event is scored against the exponentially-weighted moving
  * average of the user's PRIOR events and emitted exactly once in its
  * arrival batch; the state record carries the running EWMA across
  * micro-batches.
  *
  * Integer-exact by construction: values travel as cents (the
  * CAST(value AS DECIMAL(18,2))·100 long), and the α = 1/4 recurrence is
  * e' = (3e + v) DIV 4 — pure non-negative integer division (fixture
  * values are positive; Spark DIV ≡ DuckDB // on non-negative operands,
  * the knn_pq_adc caveat), so the whole stream is a pure function of the
  * event sequence and hash-matches the oracle's per-user recursive-CTE
  * replay of the same recurrence. A user's first event seeds e = v (the
  * uniform step (3v+v) DIV 4 = v keeps the code branch-free) and can
  * never flag. Anomaly rule: |v − e_prev|·2 > e_prev — deviation beyond
  * 50% of the running average, all-integer.
  *
  * ORDER contract: events fold in (unix_micros(ts), event_id) order —
  * within a batch by explicit sort (bounded by a user's events per batch,
  * the SessionAssembly buffer bound), across batches by
  * eventsStreamChunked's construction (chunks are ntile over the global
  * (ts, event_id) order, so batch i's events all precede batch i+1's).
  * The fixture has no same-user full-timestamp ties (checked round 12),
  * so this order is total and engine/oracle agree row-for-row.
  */
object EwmaAnomaly {

  case class EEv(user_id: Long, tus: Long, event_id: Long, v_c: Long)
  case class EwmaState(e_c: Long)
  case class EwmaOut(user_id: Long, event_id: Long, t_s: Long, v_c: Long,
      e_prev_c: Long, e_c: Long, is_anomaly: Boolean)

  def score(uid: Long, evs: Iterator[EEv],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    val sorted = evs.toArray.sortBy(e => (e.tus, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var e = state.getOption.map(_.e_c).getOrElse(-1L)
    val out = sorted.map { ev =>
      val prev = if (e < 0) ev.v_c else e
      val next = (3L * prev + ev.v_c) / 4L
      val flag = math.abs(ev.v_c - prev) * 2L > prev
      e = next
      EwmaOut(uid, ev.event_id, ev.tus / 1000000L, ev.v_c, prev, next, flag)
    }
    state.update(EwmaState(e))
    out.iterator
  }

  /** Attach the scorer to a raw events stream (ts, user_id, event_id,
    * value columns). */
  def scored(events: DataFrame): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "unix_micros(ts) AS tus", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c")
      .as[EEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(score)
  }
}
