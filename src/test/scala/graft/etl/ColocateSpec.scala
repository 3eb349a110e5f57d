package graft.etl

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The shuffle-placement guarantees behind Colocate: bucketed joins must be
  * Exchange-free; salted joins must be result-identical to plain joins. */
class ColocateSpec extends SparkSpec {

  test("bucketed join plans no shuffle Exchange on either side") {
    val wh = tmpDir("colocate_spec")
    Colocate.writeBucketed(Tables.orders(spark, sf), "o_orderkey",
      "orders_spec_b", 4, s"$wh/o")
    Colocate.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "l_orderkey", "lineitem_spec_b", 4, s"$wh/l")
    // pin broadcast off (both planner and AQE) — at fixture scale the tables
    // are broadcastable, which would bypass the bucketed path under test
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val joined = Colocate.bucketedJoin(spark, "orders_spec_b", "lineitem_spec_b",
        "o_orderkey", "l_orderkey")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket scan not used:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
      // pre-repartitioning by the bucket key means one data file per bucket,
      // not tasks × buckets small files
      val files = new java.io.File(s"$wh/o").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(files == 4, s"expected 4 bucket files, found $files")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join equals the plain join") {
    val big = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val small = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val salted = Colocate.saltedJoin(big, small, "l_orderkey",
        col("l_linenumber"), 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = big.join(small, Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
