package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shape-level unit tests for the pointer-jumping min-label propagation —
  * the oracle (dedup_clusters' recursive CTE) checks the real corpus; these
  * pin the graph shapes the corpus doesn't exercise. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], n: Long,
      maxIter: Int = 25): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val v = spark.range(n).select(col("id"))
    ConnectedComponents.run(e, "src", "dst", v, "id", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph collapses to its minimum in logarithmic rounds") {
    // 0-1-2-...-63: plain propagation needs 63 rounds (min label walks one
    // hop per round); pointer jumping must finish well inside 10 (≈log₂ 64
    // + slack). maxIter doubles as the round budget assertion — run()
    // throws if convergence needs more.
    val path = (0L until 63L).map(i => (i, i + 1))
    val comp = cc(path, 64, maxIter = 10)
    assert(comp.values.toSet == Set(0L), s"path graph must be one component")
  }

  test("disjoint components, stars, and isolated vertices") {
    // star centred at 5 (edges point away), a 2-cycle with both
    // orientations, an isolated vertex 9
    val edges = Seq((5L, 6L), (5L, 7L), (5L, 8L), (1L, 2L), (2L, 1L))
    val comp = cc(edges, 10)
    assert(comp(6L) == 5L && comp(7L) == 5L && comp(8L) == 5L && comp(5L) == 5L)
    assert(comp(1L) == 1L && comp(2L) == 1L)
    assert(comp(9L) == 9L, "isolated vertex keeps its own id")
    assert(comp(0L) == 0L && comp(3L) == 3L && comp(4L) == 4L)
  }

  test("non-convergence within maxIter is an error, never a wrong answer") {
    val path = (0L until 63L).map(i => (i, i + 1))
    assertThrows[IllegalArgumentException](cc(path, 64, maxIter = 2))
  }

  test("frontier collapses per round — edge work tracks the delta, not the graph") {
    // The neighbour-min join builds on DELTA (the previous half-step's
    // changed vertices), so per-round edge work must shrink with the
    // frontier. onRound reports the END-of-round frontier: the vertices
    // still moving after a doubled round's two halves.
    // Star graph: every leaf adopts the centre's label in the FIRST half,
    // the second half changes nothing — one scheduled round, frontier 0.
    // If stable vertices re-entered the join, convergence detection would
    // still work but a second round would fire. Deterministic, no timing.
    val star = (1L until 32L).map(i => (0L, i))
    val fronts = scala.collection.mutable.ArrayBuffer[Long]()
    val e = star.toDF("src", "dst")
    val v = spark.range(32).select(col("id"))
    ConnectedComponents.run(e, "src", "dst", v, "id",
      onRound = (_, n) => fronts += n)
    assert(fronts.toSeq == Seq(0L),
      s"star must converge in ONE doubled round, got $fronts")
    // Path graph: the end-of-round frontier must be non-increasing and end
    // at exactly 0 — total frontier work far below rounds×|V| (full-graph
    // propagation would hold every round at |V|). The doubled round also
    // caps scheduled rounds at ~half the half-step count: well under 6
    // for a 64-path with pointer jumping.
    val path = (0L until 63L).map(i => (i, i + 1))
    val pf = scala.collection.mutable.ArrayBuffer[Long]()
    ConnectedComponents.run(path.toDF("src", "dst"),
      "src", "dst", spark.range(64).select(col("id")), "id",
      onRound = (_, n) => pf += n)
    assert(pf.last == 0L)
    assert(pf.size <= 5, s"doubled rounds must converge the 64-path in ≤5 " +
      s"scheduled rounds, got ${pf.size}")
    assert(pf.toSeq == pf.toSeq.sorted.reverse,
      s"path frontier must be non-increasing, got $pf")
    assert(pf.sum < 64L * (pf.size - 1),
      s"total frontier work must undercut rounds×|V|, got $pf")
  }

  test("half-step builds on the frontier only — an empty delta changes nothing") {
    // The doubled round reports only the END-of-round frontier, so the
    // loop telemetry can no longer show stable vertices re-entering the
    // join; pin the restriction at the half-step directly. Labels are
    // deliberately INCONSISTENT (1 still carries its own id next to
    // neighbour 0): a full-graph build side would rewrite 1 → 0, the
    // frontier-restricted join with an EMPTY delta must change nothing.
    val sym = Seq((0L, 1L), (1L, 0L)).toDF("cc_src", "cc_dst")
    val labels = Seq((0L, 0L), (1L, 1L)).toDF("cc_id", "cc_comp")
    val empty = labels.filter(lit(false))
    val (after, frontier) = ConnectedComponents.halfStep(sym, labels, empty)
    assert(frontier.count() == 0L, "empty frontier must stay empty")
    assert(after.orderBy("cc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 0L), (1L, 1L)),
      "labels must pass through untouched when the delta is empty")
    // and the same labels DO collapse when vertex 0 is in the frontier
    val (fixed, moved) = ConnectedComponents.halfStep(sym, labels,
      Seq((0L, 0L)).toDF("cc_id", "cc_comp"))
    assert(moved.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L)), "frontier vertex 0 must pull neighbour 1 down")
    assert(fixed.orderBy("cc_id").collect().map(_.getLong(1)).toSeq ==
      Seq(0L, 0L))
  }

  test("random graphs match a plain union-find (frontier+jump cross-check)") {
    // the distributed loop now skips stable vertices and jumps pointers —
    // both are easy places for a subtle soundness bug, so check the exact
    // fixpoint against the textbook sequential algorithm on varied shapes
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 20 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      // always attach the larger root under the smaller, so every final
      // root IS its component's minimum — the operator's output contract
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(v => v.toLong -> find(v).toLong).toMap
      val got = cc(edges, n)
      assert(got == expected, s"trial $trial (n=$n): diff=${
        got.toSet.diff(expected.toSet).take(5)}")
    }
  }
}
