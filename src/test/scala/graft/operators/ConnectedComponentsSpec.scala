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
}
