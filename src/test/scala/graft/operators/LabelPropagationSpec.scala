package graft.operators

import graft.SparkSpec

/** Planted-graph tests for synchronous min-tie-break label propagation: two
  * cliques joined by a bridge pin community separation; a single edge pins
  * the documented 2-cycle behaviour (why fixed rounds, not convergence, is
  * the stopping rule); an isolated vertex pins label retention; and a
  * driver-side replay of the same recurrence pins the fixture query. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** two triangles {1,2,3} and {7,8,9} joined by bridge 3-7, plus
    * isolated vertex 50 */
  private def plantedCliques() = (
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L),
      (3L, 7L)).toDF("u", "v"),
    Seq(1L, 2L, 3L, 7L, 8L, 9L, 50L).toDF("page"))

  private def runToMap(rounds: Int): Map[Long, Long] = {
    val (edges, vertices) = plantedCliques()
    LabelPropagation.run(edges, "u", "v", vertices, "page", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two bridged triangles: each clique converges to its min label") {
    // round 1: every vertex adopts its neighbourhood min (ties broken low):
    // 1,2→min nb lab; by round 4 the left triangle is all-1 and the right
    // stabilizes on the min label that propagates across — verify against
    // the independently hand-run recurrence below rather than intuition
    val got = runToMap(4)
    val want = replay(plantedCliques(), 4)
    assert(got == want, s"got $got want $want")
    // community structure: left triangle shares one label
    assert(Set(1L, 2L, 3L).map(got).size == 1, s"left clique split: $got")
  }

  test("isolated vertex keeps its own label through every round") {
    assert(runToMap(4)(50L) == 50L)
  }

  test("single edge 2-cycles under synchronous updates (fixed rounds matter)") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val vs = Seq(1L, 2L).toDF("page")
    def at(r: Int) = LabelPropagation.run(edges, "u", "v", vs, "page", r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(at(1) == Map(1L -> 2L, 2L -> 1L), "round 1 swaps labels")
    assert(at(2) == Map(1L -> 1L, 2L -> 2L), "round 2 swaps back: a 2-cycle")
  }

  /** driver-side replay of the exact synchronous recurrence (argmax of
    * neighbor-label counts, ties to smaller label, isolated keep) — the
    * in-test oracle used for both the planted graph and the fixture run */
  private def replay(g: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame), rounds: Int): Map[Long, Long] = {
    val edges = g._1.collect().map(r => (r.getLong(0), r.getLong(1)))
    val vertices = g._2.collect().map(_.getLong(0))
    replayEdges(edges, vertices, rounds)
  }

  private def replayEdges(edges: Seq[(Long, Long)], vertices: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var labels = vertices.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = labels.map { case (v, lab) =>
        adj.get(v) match {
          case None => v -> lab
          case Some(nbs) =>
            val counts = nbs.groupBy(labels).view.mapValues(_.size)
            v -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
        }
      }
    }
    labels
  }

  test("fixture query matches the driver-side recurrence replay") {
    val q = graft.SparkEntry.queries("graph_communities_lpa")
    val got = q(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === lit("click"))
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"))
    val evPages = ev.select("page").distinct().as[Long].collect()
    val und = {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      ev.withColumn("prev", lag(col("page"), 1).over(byUser))
        .filter(col("prev").isNotNull && col("prev") =!= col("page"))
        .select(least(col("prev"), col("page")).as("u"),
          greatest(col("prev"), col("page")).as("v"))
        .distinct().as[(Long, Long)].collect()
    }
    val want = replayEdges(und.toSeq, evPages.toSeq, 4)
    assert(got == want, s"fixture LPA diverged from replay")
  }
}
