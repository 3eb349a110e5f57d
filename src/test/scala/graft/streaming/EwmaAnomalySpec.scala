package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The order-sensitive stateful recurrence: the running integer EWMA must
  * carry across micro-batches (not re-seed), fold in timestamp order
  * within a batch, and emit every event exactly once. */
class EwmaAnomalySpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("EWMA state carries across batches; first event seeds and never flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = EwmaAnomaly.scored(events)
      .writeStream.format("memory").queryName("ea_spec")
      .outputMode("append").start()
    def rows() = spark.table("ea_spec").as[EwmaAnomaly.EwmaOut]
      .collect().sortBy(r => (r.user_id, r.event_id)).toSeq
    try {
      // batch 1, deliberately out of arrival order: the fold must sort by
      // (ts, event_id) — 1.00 at 10:00 seeds (e=100, no flag possible),
      // then 2.00 at 10:01 deviates 100% (flag) and moves e to
      // (3*100+200)/4 = 125
      input.addData(
        (1L, ts("2024-01-01 10:01:00"), 2L, 2.0),
        (1L, ts("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      val b1 = rows()
      assert(b1.map(r => (r.event_id, r.v_c, r.e_prev_c, r.e_c,
        r.is_anomaly)) == Seq(
        (1L, 100L, 100L, 100L, false),
        (2L, 200L, 100L, 125L, true)), s"batch-1 fold wrong: $b1")
      // batch 2: 3.00 must score against the CARRIED e=125 (flag, since
      // |300-125|*2 > 125), not re-seed at 300 (which would not flag) —
      // this is the cross-batch state assertion
      input.addData((1L, ts("2024-01-01 10:02:00"), 3L, 3.0))
      q.processAllAvailable()
      val b2 = rows().last
      assert((b2.e_prev_c, b2.e_c, b2.is_anomaly) == (125L, 168L, true),
        s"cross-batch carry broken: $b2")
      // exactly-once: 3 events in, 3 rows out, no duplicates
      assert(rows().map(_.event_id) == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
