package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV's defining property is the opposite of Space-Saving's: the sketch
  * is a pure FUNCTION OF THE SET (the k smallest distinct hashes), so the
  * result must be bit-identical under every chunking and merge tree —
  * asserted here exactly, along with the union-containment law that makes
  * the pair estimates sound, the estimator's error bound on a known
  * ground truth, the sub-k exact regime, and the planted-overlap Jaccard
  * the `sketch_kmv_intersect` query reads off the merged sketch. */
class KmvSketchSpec extends SparkSpec {

  private val k = 128

  private def fold(agg: KmvAggregator, hs: Seq[Long]): Vector[Long] =
    hs.foldLeft(agg.zero)(agg.reduce)

  /** deterministic stand-in for xxhash64: splitmix64 finalizer — uniform
    * over the full signed-long domain, so the estimator math applies */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def estimate(sk: Seq[Long]): Double =
    if (sk.size < k) sk.size.toDouble
    else (k - 1).toDouble /
      ((sk(k - 1).toDouble + 9.223372036854775808e18) / 1.8446744073709551616e19)

  test("sketch is a pure function of the set: any chunking, any merge tree") {
    val agg = new KmvAggregator(k)
    val hs = (0 until 5000).map(i => mix(i.toLong))
    // duplicates + reordering must not matter
    val stream = new scala.util.Random(11).shuffle(hs ++ hs.take(1000))
    val single = fold(agg, stream)
    for (nChunks <- Seq(2, 5, 9)) {
      val parts = stream.grouped((stream.size + nChunks - 1) / nChunks)
        .map(c => fold(agg, c)).toSeq
      val leftDeep = parts.reduce(agg.merge)
      val rightDeep = parts.reverse.reduce((a, b) => agg.merge(b, a))
      assert(leftDeep == single, s"$nChunks-chunk left-deep merge drifted")
      assert(rightDeep == single, s"$nChunks-chunk right-deep merge drifted")
    }
    // and it IS the k smallest distinct values
    assert(single == hs.distinct.sorted.take(k).toVector)
  }

  test("union containment law: kmv(A ∪ B) == trim_k(merge(kmv(A), kmv(B)))") {
    val agg = new KmvAggregator(k)
    val a = (0 until 3000).map(i => mix(i.toLong))
    val b = (2000 until 6000).map(i => mix(i.toLong)) // 1000-element overlap
    val direct = fold(agg, a ++ b)
    val merged = agg.merge(fold(agg, a), fold(agg, b))
    assert(merged == direct,
      "k smallest of the union escaped the per-set sketches")
  }

  test("estimator: within 4σ of a known distinct count; exact below k") {
    val agg = new KmvAggregator(k)
    val d = 20000
    val est = estimate(agg.finish(fold(agg, (0 until d).map(i => mix(i.toLong)))))
    val sigma = d / math.sqrt((k - 2).toDouble) // Beyer et al. §3.2
    assert(math.abs(est - d) < 4 * sigma,
      s"estimate $est vs true $d exceeds 4σ = ${4 * sigma}")
    // sub-k regime: the sketch IS the set — estimate exact
    val small = (0 until 57).map(i => mix(i.toLong))
    assert(estimate(agg.finish(fold(agg, small))) == 57.0)
  }

  test("planted overlap: pair Jaccard estimate tracks the true ratio") {
    val agg = new KmvAggregator(k)
    // |A| = |B| = 4000, |A ∩ B| = 2000 → J = 2000/6000 = 1/3
    val a = (0 until 4000).map(i => mix(i.toLong))
    val b = (2000 until 6000).map(i => mix(i.toLong))
    val (ska, skb) = (fold(agg, a), fold(agg, b))
    val un = agg.merge(ska, skb) // == kmv(A ∪ B) by the containment law
    val overlap = un.count(h => ska.contains(h) && skb.contains(h))
    val j = overlap.toDouble / un.size
    // σ(J) ≈ sqrt(J(1-J)/k) ≈ 0.042 at k=128 — allow 4σ
    assert(math.abs(j - 1.0 / 3) < 4 * math.sqrt(1.0 / 3 * 2.0 / 3 / k),
      s"Jaccard estimate $j vs true ${1.0 / 3}")
    val estInter = j * estimate(un)
    assert(math.abs(estInter - 2000) < 2000 * 0.5,
      s"intersection estimate $estInter vs true 2000")
  }

  test("sketch_kmv_intersect: distributed sketches equal local folds; " +
      "estimates bracket exact distinct counts") {
    val df = graft.SparkEntry.queries("sketch_kmv_intersect")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exact per-source distinct token-hash counts
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .select(col("source"), xxhash64(col("token")).as("h"))
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("h")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      for ((src, est) <- Seq(s1 -> r.getDouble(2), s2 -> r.getDouble(3))) {
        val d = exact(src).toDouble
        val tol = math.max(4 * d / math.sqrt((k - 2).toDouble), 1.0)
        assert(math.abs(est - d) <= tol,
          s"$s1/$s2: estimate $est for $src vs exact $d exceeds $tol")
      }
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000,
        "jaccard_q6 out of range")
    }
  }
}
