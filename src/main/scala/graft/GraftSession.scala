package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.{CharNgramHashes, DotProduct, MinHashArray, RollingHash, SignBandBuckets, SimHash64, SortedIntersectCount, TokenNgramHashes, TokenStats}

/** Session extensions: registers graft's native expressions as SQL
  * functions so the whole library surface is reachable from `spark.sql`:
  *
  *   SELECT doc_id, rolling_hash(text)          FROM documents
  *   SELECT dot_product(a.embedding, b.embedding) ...
  *   SELECT sorted_intersect_count(t1, t2) ...
  *   SELECT ngram_hashes(text, 3) ...
  *
  * Activate via `GraftSession.builder(...)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RollingHash].getName, "rolling_hash"),
        exprs => RollingHash(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "dot_product"),
        exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
        exprs => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CharNgramHashes].getName, "ngram_hashes"),
        exprs => CharNgramHashes(exprs(0),
          exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_array"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashArray].getName, "minhash_array"),
        exprs => MinHashArray(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("token_ngram_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TokenNgramHashes].getName, "token_ngram_hashes"),
        exprs => TokenNgramHashes(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("token_stats"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TokenStats].getName, "token_stats"),
        exprs => TokenStats.fromSql(exprs)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64].getName, "simhash64"),
        exprs => SimHash64(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("sign_band_buckets"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SignBandBuckets].getName, "sign_band_buckets"),
        exprs => SignBandBuckets.seeded(exprs(0),
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int],
          exprs(3).eval().asInstanceOf[Int])))
  }
}

/** The library's front door: a SparkSession tuned the way every graft
  * operator expects (UTC, AQE, right-sized shuffle partitions, native
  * functions registered). A user of the reference pipeline starts here.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def build(): SparkSession = builder().getOrCreate()

  /** Register the native functions on an already-running session (e.g. a
    * shell or notebook session built without `spark.sql.extensions`). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftBridge.registerFunction
    registerFunction(spark, "rolling_hash", exprs => RollingHash(exprs.head))
    registerFunction(spark, "dot_product", exprs => DotProduct(exprs(0), exprs(1)))
    registerFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    registerFunction(spark, "ngram_hashes",
      exprs => CharNgramHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    registerFunction(spark, "minhash_array",
      exprs => MinHashArray(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    registerFunction(spark, "token_ngram_hashes",
      exprs => TokenNgramHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    registerFunction(spark, "simhash64", exprs => SimHash64(exprs.head))
    registerFunction(spark, "token_stats", exprs => TokenStats.fromSql(exprs))
    registerFunction(spark, "sign_band_buckets",
      exprs => SignBandBuckets.seeded(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int]))
  }
}
