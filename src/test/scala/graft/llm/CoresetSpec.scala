package graft.llm

import graft.SparkSpec

/** The Gonzalez farthest-first property is what makes `coreset_kcenter` a
  * 2-approximation: each round MUST add the point with the maximum
  * distance to the chosen set (argmax pinned (d² DESC, vec_id ASC)), and
  * the final assignment MUST be each point's true nearest center
  * ((d² ASC, c_id ASC)). The fixture gate checks this differentially
  * against DuckDB on the corpus; this spec plants outlier geometry where
  * the correct center sequence is known by hand, and fuzzes random
  * integer vectors against a plain-Scala replay of the greedy. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum

  /** Plain-Scala replay: seed 0, then k−1 rounds of argmax-min-distance
    * (ties → lower vec_id); assignment ties → lower center id. */
  private def kcenterRef(pts: Map[Long, Seq[Long]], k: Int)
      : (Seq[Long], Map[Long, (Long, Long)]) = {
    var centers = Seq(0L)
    for (_ <- 2 to k) {
      val far = pts.keys.toSeq
        .map(id => (id, centers.map(c => d2(pts(id), pts(c))).min))
        .sortBy { case (id, dm) => (-dm, id) }.head._1
      centers = centers :+ far
    }
    val assign = pts.map { case (id, v) =>
      id -> centers.map(c => (d2(v, pts(c)), c)).min.swap
    }
    (centers, assign)
  }

  private def run(pts: Map[Long, Seq[Long]], k: Int)
      : Map[Long, (Long, Long)] =
    Similarity.kcenterAssign(
      pts.toSeq.map { case (id, v) => (id, v.map(_.toDouble)) }
        .toDF("vec_id", "qv"), k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("planted outliers become centers in farthest-first order; assignment d² exact") {
    val pts = Map[Long, Seq[Long]](
      0L -> Seq(0L, 0L),    // seed
      1L -> Seq(1L, 0L),    // tight cluster around the seed
      2L -> Seq(0L, 1L),
      3L -> Seq(1L, 1L),
      9L -> Seq(100L, 100L),  // farthest outlier — must be center #2
      10L -> Seq(-100L, 80L)) // next-farthest — must be center #3
    val got = run(pts, 4)
    // center set read off the assignment: every center assigns to itself
    // at d² = 0
    assert(got(9L) == ((9L, 0L)), s"outlier 9 must be a center: $got")
    assert(got(10L) == ((10L, 0L)), s"outlier 10 must be a center: $got")
    assert(got(0L) == ((0L, 0L)))
    // round 4 takes the farthest cluster point (3 at d²=2 beats 1,2 at 1)
    assert(got(3L) == ((3L, 0L)), s"point 3 must be the 4th center: $got")
    // assignment tie: point 1 is d²=1 from BOTH center 0 and center 3 —
    // (d² ASC, c_id ASC) must pick center 0; same for point 2
    assert(got(1L) == ((0L, 1L)), s"tie must resolve to lower c_id: $got")
    assert(got(2L) == ((0L, 1L)))
  }

  test("argmax tie between equidistant farthest points resolves to the lower vec_id") {
    val pts = Map[Long, Seq[Long]](
      0L -> Seq(0L, 0L),
      5L -> Seq(50L, 0L),   // |·|² = 2500, tied with 6
      6L -> Seq(0L, 50L),
      7L -> Seq(3L, 0L))
    val got = run(pts, 2)
    assert(got(5L) == ((5L, 0L)), s"lower-id tied point must win: $got")
    // 6 stays with seed 0 (d²=2500) — center 5 is farther (d²=5000)
    assert(got(6L) == ((0L, 2500L)), s"6 assigns to center 0 at d²=2500: $got")
  }

  test("random integer vectors match the plain-Scala greedy replay") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 30L).map(id =>
      id -> Seq.fill(4)((rnd.nextInt(11) - 5).toLong)).toMap
    val got = run(pts, 4)
    val (_, want) = kcenterRef(pts, 4)
    assert(got == want,
      s"diff: ${got.toSet.diff(want.toSet)} vs ${want.toSet.diff(got.toSet)}")
  }
}
