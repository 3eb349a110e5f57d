package graft.operators

import graft.SparkSpec

/** Planted-graph tests for the bounded-hop frontier BFS: a path graph pins
  * exact first-reach distances and the maxHops cutoff; a disjoint component
  * pins non-reachability; a multi-seed run pins the min-over-seeds
  * semantics (a vertex settles in the FIRST round any seed reaches it). */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  /** path 1-2-3-4-5-6 plus a disjoint edge 100-101 */
  private def plantedPath() =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (100L, 101L))
      .toDF("u", "v")

  private def runToMap(seeds: Seq[Long], maxHops: Int): Map[Long, Long] =
    Bfs.run(plantedPath(), "u", "v", seeds.toDF("page"), "page", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: exact hop distances, cutoff drops the beyond-k tail") {
    val got = runToMap(Seq(1L), maxHops = 3)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"vertices 5,6 are beyond 3 hops and 100,101 unreachable; got $got")
  }

  test("multi-seed: distance is min over seeds; disjoint component found") {
    // seeds at both path ends + the island: interior settles from the
    // nearer end, never later than either unrolled single-seed distance
    val got = runToMap(Seq(1L, 6L, 100L), maxHops = 3)
    assert(got == Map(
      1L -> 0L, 6L -> 0L, 100L -> 0L,
      2L -> 1L, 5L -> 1L, 101L -> 1L,
      3L -> 2L, 4L -> 2L), s"got $got")
  }

  test("duplicate + already-visited seeds dedupe; hop 0 only when maxHops=0") {
    assert(runToMap(Seq(3L, 3L), maxHops = 0) == Map(3L -> 0L))
  }

  test("fixture query matches an independently-computed transitive unroll") {
    // replay graph_bfs_reach's semantics with a driver-side Floyd-style
    // unroll over the (small) sf0.001 click graph — an in-test oracle
    // independent of both the loop and the SQL CTEs
    val q = graft.SparkEntry.queries("graph_bfs_reach")
    val got = q(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === lit("click"))
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"))
    val evPages = ev.select("page").distinct().as[Long].collect().toSet
    val und = {
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      ev.withColumn("prev", lag(col("page"), 1).over(byUser))
        .filter(col("prev").isNotNull && col("prev") =!= col("page"))
        .select(least(col("prev"), col("page")).as("u"),
          greatest(col("prev"), col("page")).as("v"))
        .distinct().as[(Long, Long)].collect()
    }
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seeds = evPages.filter(_ % 97 == 0)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    assert(got == dist, s"query=$got unroll=$dist")
  }
}
