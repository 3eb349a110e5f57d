package graft.llm

import graft.SparkSpec
import graft.core.Tables
import graft.functions.RollingHash
import org.apache.spark.sql.functions._

/** Tier E unit-tier assertions: MinHash estimate quality (SURVEY §7.3 hard
  * #2), LSH recall vs brute force, rolling-hash codegen parity, multimodal
  * batch plumbing. */
class LlmSpec extends SparkSpec {

  test("E3: MinHash component-match rate estimates Jaccard within 0.3") {
    import spark.implicits._
    // synthetic docs with controlled overlap
    val base = (0 until 60).map(i => s"tok$i")
    val docs = Seq(
      1L -> base.take(40),                     // |A∩B|/|A∪B| controlled below
      2L -> base.slice(20, 60),                // vs doc1: 20/60 = 0.333
      3L -> base.take(40),                     // vs doc1: identical = 1.0
      4L -> (0 until 40).map(i => s"other$i")) // vs doc1: 0.0
    val df = docs.toDF("doc_id", "toks")
    val sigs = df.select(col("doc_id") +: Dedup.minhashSignature(col("toks")): _*)
      .collect().map(r => r.getLong(0) -> (1 until 33).map(r.getLong).toVector).toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 32
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (docs.toMap.apply(a).toSet, docs.toMap.apply(b).toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    for ((a, b) <- Seq((1L, 2L), (1L, 3L), (1L, 4L)))
      assert(math.abs(est(a, b) - jac(a, b)) <= 0.3,
        s"pair ($a,$b): est=${est(a, b)} true=${jac(a, b)}")
  }

  test("E3b: LSH banding surfaces identical and near-identical docs") {
    import spark.implicits._
    // identical docs share all 32 minhashes → every band collides; a doc
    // with 90% token overlap should share at least one band; a disjoint
    // doc should (with these params) share none.
    val base = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "),                                   // identical
      3L -> (base.take(90) ++ (0 until 10).map(i => s"x$i")).mkString(" "), // near
      4L -> (0 until 100).map(i => s"z$i").mkString(" "))         // disjoint
    val df = docs.toDF("doc_id", "text")
    val sigs = df.select(col("doc_id") +:
      Dedup.minhashSignature(array_distinct(split(col("text"), " "))): _*)
    val banded = sigs.select(col("doc_id") +: Dedup.bandHashes(): _*)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.Bands).map(r.getLong)).toMap
    def sharesBand(a: Long, b: Long): Boolean =
      banded(a).zip(banded(b)).exists { case (x, y) => x == y }
    assert(sharesBand(1L, 2L), "identical docs must collide in every band")
    assert(sharesBand(1L, 3L), "90%-overlap docs should collide in some band")
    assert(!sharesBand(1L, 4L), "disjoint docs should not collide")
  }

  test("SimHash: identical docs collide, near-dups stay close, disjoint far") {
    import spark.implicits._
    val base = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "),                                   // identical
      3L -> (base.take(90) ++ (0 until 10).map(i => s"x$i")).mkString(" "), // near
      4L -> (0 until 100).map(i => s"z$i").mkString(" "))         // disjoint
    val sh = Dedup.simhash(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L), "identical docs must share the fingerprint")
    assert(hamming(sh(1L), sh(3L)) <= 16,
      s"90%-overlap docs drifted ${hamming(sh(1L), sh(3L))} bits apart")
    assert(hamming(sh(1L), sh(4L)) >= 20,
      s"disjoint docs only ${hamming(sh(1L), sh(4L))} bits apart")
  }

  test("typed MinHash aggregator equals the expression signatures") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    // expression path
    val exprSigs = docs
      .select(col("doc_id"), Dedup.tokenHashes(col("toks")).as("th"))
      .select(col("doc_id") +: Dedup.minhashFromHashes(col("th")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector).toMap
    // typed aggregator path (groupByKey per doc)
    val agg = new MinHashAggregator().toColumn
    val typedSigs = docs.as[(Long, Seq[String])]
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().map { case (id, sig) => id -> sig.toVector }.toMap
    assert(typedSigs == exprSigs,
      s"first diff: ${typedSigs.find { case (k, v) => exprSigs(k) != v }}")
  }

  test("rolling_hash codegen equals the reference implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "abc", "hello world", "ünïcödé ✓",
      "a" * 1000, "line\nbreak\ttab", "\\back\\slash", "\"quotes\"")
    val viaSpark = samples.toDF("t")
      .select(col("t"), RollingHash.rolling_hash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(viaSpark(s) == RollingHash.hashBytes(s.getBytes("UTF-8")),
        s"mismatch for ${s.take(20)}")
    }
  }

  test("E4: knn top-10 matches a driver-side brute force") {
    val topk = graft.SparkEntry.queries("knn_cosine_topk")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq.sortBy(_._1).map(_._2)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val brute = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (cos(q, v), id) }
      .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2)
    assert(topk == brute, s"spark=$topk brute=$brute")
  }

  test("sign_band_buckets matches a plain-Scala reference") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(Similarity.Bands * Similarity.BandBits, 4)
    val vecs = Seq(
      (1L, Seq(0.5, -0.25, 0.125, 1.0)),
      (2L, Seq(-1.0, 2.0, -3.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)))
    val viaSpark = vecs.toDF("id", "v")
      .select(col("id"),
        graft.functions.SignBandBuckets.sign_band_buckets(
          col("v"), planes, Similarity.BandBits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    def reference(v: Seq[Double]): Vector[Long] =
      (0 until Similarity.Bands).map { b =>
        (0 until Similarity.BandBits).foldLeft(b.toLong << Similarity.BandBits) { (acc, t) =>
          val p = planes(b * Similarity.BandBits + t)
          val s = v.indices.map(i => p(i) * v(i)).sum
          if (s > 0) acc + (1L << t) else acc
        }
      }.toVector
    vecs.foreach { case (id, v) =>
      assert(viaSpark(id) == reference(v), s"bucket mismatch for vec $id")
    }
  }

  test("ANN: knn_lsh_bucketed recalls most of the true top pairs") {
    // ground truth: the 50 highest-cosine pairs over all vectors (brute force)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
    } yield (cos(vecs(i)._2, vecs(j)._2),
        math.min(vecs(i)._1, vecs(j)._1), math.max(vecs(i)._1, vecs(j)._1)))
      .toSeq.sortBy { case (s, a, b) => (-s, a, b) }
      .take(50).map { case (_, a, b) => (a, b) }.toSet
    val lsh = graft.SparkEntry.queries("knn_lsh_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    // 32 bands × 8 sign bits (OR-amplified): top pairs on this corpus sit
    // near cosine 0.45 (per-plane agreement p≈0.65), giving expected recall
    // ≈ 1-(1-0.65^8)^32 ≈ 2/3; require a majority recalled.
    assert(recall >= 0.5, s"LSH recall vs brute force = $recall (< 0.5)")
  }

  test("multimodal featurize preserves ids and emits fixed-shape features") {
    val media = Tables.documents(spark, sf).limit(50).select(
      col("doc_id"),
      encode(substring(col("text"), 1, 64), "UTF-8").as("payload"),
      lit("image/png").as("mime"),
      length(substring(col("text"), 1, 64)).cast("long").as("n_bytes"))
    val feats = Multimodal.featurize(spark, media)
    assert(feats.count() == 50)
    val row = feats.orderBy("doc_id").head()
    assert(row.getAs[scala.collection.Seq[Double]]("features").size == 8)
    assert(feats.select("doc_id").distinct().count() == 50)
  }
}
