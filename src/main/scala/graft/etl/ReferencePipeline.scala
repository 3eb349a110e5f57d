package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference guide's full path, end-to-end in one object — the flow a
  * user of `braindoorg/s3-glue-redshift-guide` runs today, re-expressed
  * Spark-native (reference trace: SURVEY.md §3.1, README.md:202 → :150):
  *
  *  1. a file lands in the watched store prefix        (S3 upload, :202)
  *  2. the event filter admits it                      (prefix/suffix, :196-198)
  *  3. incremental ingest processes ONLY new files     (Lambda→workflow + bookmarks, :182-188, :145)
  *  4. the crawler infers/merges the schema, registers the table (:104, :117)
  *  5. the "Change schema" mapping shapes the rows     (:149-151)
  *  6. the warehouse load writes via JDBC              (:150)
  *  7. the data is queryable with SQL                  (:79)
  *
  * Each `run()` is one trigger firing; calling it again after new files
  * land processes only the delta (bookmark semantics) but reloads the
  * warehouse table in full (the reference's job overwrites its target).
  */
class ReferencePipeline(spark: SparkSession, watchDir: String,
    suffixFilter: String, tableName: String, warehouse: JdbcSink,
    mapping: DataFrame => DataFrame) {

  private val checkpoint = graft.core.Tables.scratchDir("graft_refpipe_ckpt")
  private val staging = graft.core.Tables.scratchDir("graft_refpipe_staging")
  private val crawler = new Crawler(spark)

  /** One end-to-end trigger firing. Returns the warehouse-loaded frame. */
  def run(): DataFrame = {
    // steps 1-3: event-filtered incremental ingest of new files only
    // (the suffix filter applies to the schema pass too — a decoy file must
    // not contribute fields)
    val schema = spark.read.options(CsvSource.options)
      .option("multiLine", "true")
      .option("pathGlobFilter", suffixFilter)
      .option("inferSchema", "true")
      .csv(watchDir).schema
    Incremental.runAvailableNow(spark, watchDir, schema, checkpoint, staging,
      globFilter = Some(suffixFilter))
    // step 4: crawl the staged (parquet) data, add-only schema evolution
    val crawled = crawler.crawl(staging, tableName, format = "parquet")
    // steps 5-6: change-schema mapping, then the JDBC warehouse load
    val shaped = mapping(crawled)
    warehouse.write(shaped)
    // step 7: the warehouse surface
    warehouse.read(spark)
  }
}
