package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** mapGroupsWithState keeps per-user state ACROSS micro-batches — the
  * property the built-in windowed aggs can't give you in update mode. */
class CustomStateSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("per-user state accumulates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Timestamp)]
    val events = input.toDF().toDF("user_id", "value", "ts")
    val q = CustomState.runningUserStats(events)
      .writeStream.format("memory").queryName("cs_spec")
      .outputMode(CustomState.outputMode).start()
    try {
      input.addData((1L, 10.0, ts("2024-01-01 10:00:00")),
        (1L, 5.0, ts("2024-01-01 10:01:00")),
        (2L, 1.0, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // batch 2: user 1 returns — state must carry the earlier 2 events
      input.addData((1L, 2.0, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val latest = spark.table("cs_spec")
        .groupBy("user_id")
        .agg(max("events").as("events"), max("total_value").as("total_value"),
          min("first_seen_micros").as("first_seen"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(latest(1L) == ((3L, 17.0)), s"user1 state: ${latest(1L)}")
      assert(latest(2L) == ((1L, 1.0)))
      // first_seen sticks to the batch-1 timestamp for user 1
      val firstSeen = spark.table("cs_spec")
        .filter(col("user_id") === 1 && col("events") === 3)
        .head().getAs[Long]("first_seen_micros")
      assert(firstSeen == ts("2024-01-01 10:00:00").getTime * 1000)
    } finally q.stop()
  }
}
