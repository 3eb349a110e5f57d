package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Tier B — the Glue "Change schema" job surface (reference README.md:149-151):
  * source→target mapping = select / rename / reorder / add / cast. In Spark
  * these are pure projections — zero shuffle, fully pushed into the scan
  * (ReadSchema prunes unselected columns at the parquet footer).
  */
object TierB {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1 — "removing destination columns" (README.md:151).
    "project_select" -> ((s, d) => {
      customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // B2 — "renaming" (README.md:151).
    "project_rename" -> ((s, d) => {
      customer(s, d)
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .select("customer_id", "customer_name")
        .orderBy("customer_id")
    }),
    // B3 — "reordering" (README.md:151).
    "project_reorder" -> ((s, d) => {
      customer(s, d).select("c_mktsegment", "c_name", "c_custkey")
        .orderBy("c_custkey")
    }),
    // B4 — "adding" derived destination columns (README.md:151). Doubled
    // price ×2 is exact IEEE; literal tag exercises constant columns.
    "project_add_derived" -> ((s, d) => {
      orders(s, d).select(
          col("o_orderkey"),
          (col("o_totalprice") * 2).as("double_price"),
          lit("etl").as("tag"))
        .orderBy("o_orderkey")
    }),
    // B5 — ApplyMapping-style casts (README.md:149 "Change schema").
    // double→BIGINT is deliberately absent: Spark truncates, DuckDB rounds.
    "project_cast" -> ((s, d) => {
      orders(s, d).select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_custkey").cast("int").as("cust_int"),
          col("o_orderdate").cast("date").as("order_day"))
        .orderBy("o_orderkey")
    })
  )

  def oracle: Map[String, String] = Map(
    "project_select" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""",
    "project_rename" ->
      """SELECT c_custkey AS customer_id, c_name AS customer_name
        |FROM customer ORDER BY customer_id""".stripMargin,
    "project_reorder" ->
      """SELECT c_mktsegment, c_name, c_custkey FROM customer ORDER BY c_custkey""",
    "project_add_derived" ->
      """SELECT o_orderkey, o_totalprice * 2 AS double_price, 'etl' AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "project_cast" ->
      """SELECT o_orderkey,
        |       CAST(o_orderkey AS VARCHAR) AS key_str,
        |       CAST(o_custkey AS INT) AS cust_int,
        |       CAST(o_orderdate AS DATE) AS order_day
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
