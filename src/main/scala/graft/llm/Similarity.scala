package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Tier E similarity search over the 64-dim `embeddings.embedding` column
  * (SURVEY.md §2 E4-E5 + builder-mandated ANN scale path).
  *
  * 100 TB design notes:
  *  - Brute-force top-k (E4) broadcasts the query vector and computes the
  *    dot product inside codegen'd higher-order functions — one scan, no
  *    shuffle except the final TakeOrdered merge of per-partition top-k.
  *  - Per-label kNN (E5) blocks the self-join on `label` (the IVF idea:
  *    compare only within a partition), and windows per probe vector.
  *  - knn_lsh_bucketed is the sub-linear path: sign-random-projection
  *    buckets via fixed seeded hyperplanes; candidates share a bucket.
  *    Hyperplane constants are compile-time literals — deterministic,
  *    broadcast implicitly with the plan, no SQL `rand()` (SURVEY §7.4.5).
  */
object Similarity {

  /** Dot product of two vector columns — a native codegen'd expression
    * (graft.functions.DotProduct): one fused primitive loop, no per-element
    * interpreted lambdas. Works on float and double arrays. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Attach a unit-normalized double copy of `vec` as `out`. Pairwise
    * similarity stages normalize each side ONCE per row, so the per-pair
    * work is a single dot product instead of three (cosine recomputes both
    * norms per pair — 3× the flops on an m×n pair space). */
  def withUnitVec(df: DataFrame, vec: String, out: String): DataFrame =
    df.withColumn("graft_nrm", norm(col(vec)))
      .withColumn(out, transform(col(vec), x => x.cast("double") / col("graft_nrm")))
      .drop("graft_nrm")

  /** Dot product of two already-double arrays (same native expression). */
  def dotD(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot_product(a, b)

  /** Deterministic pseudo-random unit-free hyperplanes for LSH bucketing. */
  private[llm] def hyperplanes(n: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-projection bucket id: one bit per hyperplane. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(v, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)

  /** Near-dup dedup over an embedding table (vec_id, embedding, label):
    * each vector maps to the smallest earlier same-label vec_id whose cosine
    * exceeds `threshold`. */
  def embeddingCosineDedup(emb: DataFrame, threshold: Double): DataFrame = {
    val unit = withUnitVec(emb, "embedding", "uv")
    val a = unit.select(col("vec_id").as("a_id"), col("uv").as("a_v"),
      col("label"))
    val b = unit.select(col("vec_id").as("b_id"), col("uv").as("b_v"),
      col("label"))
    a.join(b, Seq("label")).filter(col("b_id") < col("a_id"))
      .filter(dotD(col("a_v"), col("b_v")) > threshold)
      .groupBy(col("a_id").as("vec_id"))
      .agg(min(col("b_id")).as("keeper"))
      .orderBy("vec_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E4 — exact top-10 cosine neighbours of vec_id=0. Similarity itself is
    // engine-local float math, so only the *ranking* (with PK tiebreak) is
    // oracle-compared, not the raw double.
    "knn_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val sims = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosine(col("embedding"), col("qv")).as("sim"))
      val w = Window.orderBy(desc("sim"), asc("vec_id"))
      sims.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("rn", "vec_id")
        .orderBy("rn")
    }),
    // E5 — nearest neighbour per probe vector within its label block
    // (probe set capped at vec_id < 200 so bench cost stays linear-ish).
    "knn_pairs_label" -> ((s, d) => {
      val unit = withUnitVec(embeddings(s, d), "embedding", "uv")
      val probes = unit.filter(col("vec_id") < 200)
        .select(col("vec_id").as("a_id"), col("uv").as("a_v"), col("label"))
      val cands = unit
        .select(col("vec_id").as("b_id"), col("uv").as("b_v"), col("label"))
      val pairs = probes.join(cands, Seq("label"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("label"), col("a_id"), col("b_id"),
          dotD(col("a_v"), col("b_v")).as("sim"))
      val w = Window.partitionBy("a_id").orderBy(desc("sim"), asc("b_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("a_id", "b_id", "label")
        .orderBy("a_id")
    }),
    // Embedding-cosine near-dup verdicts (builder mandate): vectors whose
    // cosine to an earlier same-label vector exceeds a threshold map to that
    // keeper. Label blocking bounds the pair space (the IVF idea); verdict
    // output stays linear in vectors. Production dedup uses ~0.95; this
    // synthetic corpus tops out at 0.45 same-label cosine, so the query runs
    // at 0.3 to exercise the operator non-trivially. Rows-only (cosine
    // thresholds on engine-local float math are not cross-engine hashable).
    "dedup_embedding_cosine" -> ((s, d) =>
      embeddingCosineDedup(embeddings(s, d), threshold = 0.3)),
    // ANN scale path — LSH sign-projection buckets, exact cosine re-rank
    // within buckets only (rows-only check; SimilaritySpec asserts recall
    // against brute force).
    "knn_lsh_bucketed" -> ((s, d) => {
      val planes = hyperplanes(8, 64)
      val emb = withUnitVec(embeddings(s, d), "embedding", "uv")
        .select(col("vec_id"), col("uv"),
          lshBucket(col("uv"), planes).as("bucket"))
      val a = emb.select(col("vec_id").as("a_id"), col("uv").as("a_v"),
        col("bucket"))
      val b = emb.select(col("vec_id").as("b_id"), col("uv").as("b_v"),
        col("bucket"))
      val pairs = a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          dotD(col("a_v"), col("b_v")).as("sim"))
      // top-100 most similar candidate pairs (rank, not threshold: stays
      // non-empty at any SF; total order via PK tiebreak)
      pairs.orderBy(desc("sim"), asc("a_id"), asc("b_id")).limit(100)
        .select("a_id", "b_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "knn_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(embedding, (SELECT qv FROM q)) AS sim
        |  FROM embeddings WHERE vec_id <> 0)
        |SELECT rn, vec_id FROM (
        |  SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rn
        |  FROM sims) t
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "knn_pairs_label" ->
      """WITH pairs AS (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |         list_cosine_similarity(a.embedding, b.embedding) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 200)
        |SELECT a_id, b_id, label FROM (
        |  SELECT a_id, b_id, label,
        |         row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
        |  FROM pairs) t
        |WHERE rn = 1 ORDER BY a_id""".stripMargin
  )
}
