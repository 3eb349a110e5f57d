package graft.etl

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The reference guide's full path (upload → event → incremental ingest →
  * crawl → change-schema → JDBC load → SQL), driven twice to prove the
  * bookmark/no-reprocess behavior survives the whole composition. */
class ReferencePipelineSpec extends SparkSpec {

  test("end-to-end pipeline: two trigger firings, delta-only processing") {
    val watch = tmpDir("refpipe_watch")
    val sink = JdbcSink(
      s"jdbc:derby:${tmpDir("refpipe_wh")}/db;create=true", "CUSTOMER_WH")
    val pipe = new ReferencePipeline(spark, watch, "*.csv",
      s"refpipe_customers_${System.nanoTime}", sink,
      mapping = df => df.select(
        col("c_custkey").as("customer_id"),
        upper(col("c_name")).as("customer_name"),
        col("c_acctbal").cast("double").as("balance")))

    val customers = Tables.customer(spark, sf)
    val batch1Count = customers.filter(col("c_custkey") <= 75).count()
    // firing 1: first batch lands (+ a decoy the suffix filter must reject)
    customers.filter(col("c_custkey") <= 75)
      .write.options(CsvSource.options).mode("append").csv(watch)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$watch/decoy.txt"), "c,not,csv\n")
    val loaded1 = pipe.run()
    assert(loaded1.count() == batch1Count)

    // firing 2: only the new files flow; warehouse reloads in full
    customers.filter(col("c_custkey") > 75)
      .write.options(CsvSource.options).mode("append").csv(watch)
    val loaded2 = pipe.run()
    assert(loaded2.count() == customers.count())

    // step 7: the SQL surface over the warehouse
    loaded2.createOrReplaceTempView("warehouse_customers")
    val top = spark.sql(
      """SELECT customer_id, customer_name FROM warehouse_customers
        |ORDER BY balance DESC LIMIT 1""".stripMargin).head()
    assert(top.getAs[String]("customer_name").startsWith("CUSTOMER#"))
  }
}
