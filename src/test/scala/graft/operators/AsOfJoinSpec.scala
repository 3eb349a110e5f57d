package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the union-and-carry backward as-of join — the join_asof
  * oracle (DuckDB's native ASOF LEFT JOIN) checks the real corpus; these pin
  * the edge semantics: inclusive same-time ties, no-predecessor nulls,
  * per-key isolation, and a random cross-check against the naive
  * range-join-then-max encoding the operator exists to avoid. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right at-or-before each left time; nulls when none precedes") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 10L, "d"), (3L, 10L, "e"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 7L, 100.0), (1L, 15L, 200.0), (2L, 10L, 300.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
      .select(col("tag"), col("asof.rt").as("rt"), col("asof.v").as("v"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out("a") == (Some(7L), Some(100.0)), "10 sees rt=7, not 15")
    assert(out("b") == (Some(15L), Some(200.0)), "20 sees the later rt=15")
    assert(out("c") == (None, None), "5 precedes every right row")
    assert(out("d") == (Some(10L), Some(300.0)),
      "same-time right row is included (inclusive as-of)")
    assert(out("e") == (None, None), "key 3 has no right rows at all")
  }

  test("left columns and row multiplicity survive untouched") {
    val left = Seq((1L, 10L), (1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, "x")).toDF("k", "rt", "p")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
    assert(out.columns.toSeq == Seq("k", "t", "asof"),
      "left schema + one payload struct, no temp columns")
    assert(out.count() == 3, "duplicate left rows each keep their match")
  }

  test("tolerance nulls out matches staler than the bound") {
    val left = Seq((1L, 100L, "a"), (1L, 110L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 95L, "x")).toDF("k", "rt", "p")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt",
        tolerance = Some(lit(10L)))
      .select(col("tag"), col("asof.p").as("p"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") == Some("x"), "staleness 5 <= 10 survives")
    assert(out("b") == None, "staleness 15 > 10 is nulled out")
  }

  test("forward: earliest right at-or-after each left time; nulls when none follows") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 10L, "d"), (3L, 10L, "e"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 7L, 100.0), (1L, 15L, 200.0), (2L, 10L, 300.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt")
      .select(col("tag"), col("asof.rt").as("rt"))
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out("a") == Some(15L), "10 sees the NEXT right row rt=15, not 7")
    assert(out("b") == None, "20 follows every right row")
    assert(out("c") == Some(7L), "5 sees the first right row")
    assert(out("d") == Some(10L),
      "same-time right row is included (inclusive as-of)")
    assert(out("e") == None, "key 3 has no right rows at all")
  }

  test("forward: tolerance nulls out matches further ahead than the bound") {
    val left = Seq((1L, 100L, "a"), (1L, 80L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 105L, "x")).toDF("k", "rt", "p")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt",
        tolerance = Some(lit(10L)))
      .select(col("tag"), col("asof.p").as("p"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") == Some("x"), "lead 5 <= 10 survives")
    assert(out("b") == None, "lead 25 > 10 is nulled out")
  }

  test("nearest: picks the closer side, backward wins ties, falls back one-sided") {
    val left = Seq((1L, 10L, "a"), (1L, 13L, "b"), (1L, 3L, "c"),
      (1L, 30L, "d"), (2L, 7L, "e"), (1L, 11L, "f"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 7L, "p7"), (1L, 15L, "p15")).toDF("k", "rt", "v")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt")
      .select(col("tag"), col("asof.v").as("v"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") == Some("p7"), "10 is nearer 7 (3) than 15 (5)")
    assert(out("b") == Some("p15"), "13 is nearer 15 (2) than 7 (6)")
    assert(out("c") == Some("p7"), "3 has no predecessor; forward fallback")
    assert(out("d") == Some("p15"), "30 has no follower; backward fallback")
    assert(out("e") == None, "key 2 has no right rows")
    assert(out("f") == Some("p7"), "11 ties (4 both ways): backward wins")
  }

  test("nearest random data matches the naive min-distance encoding") {
    // same discipline as the backward/forward differentials: random keys
    // and times with plenty of same-instant collisions, checked against a
    // rank over abs distance with the backward-wins tiebreak
    val rnd = new scala.util.Random(17)
    val left = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong)).toDF("k", "t")
    val right = Seq.fill(150)(
      (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong))
      .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "rt", "v")
    val got = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("asof.rt").as("rt"), col("asof.v").as("v"))
    left.createOrReplaceTempView("aonl")
    right.createOrReplaceTempView("aonr")
    val naive = spark.sql(
      """WITH lefts AS (SELECT DISTINCT k, t FROM aonl),
        |cand AS (
        |  SELECT lefts.k, lefts.t, r.rt, r.v,
        |         row_number() OVER (PARTITION BY lefts.k, lefts.t
        |           ORDER BY abs(r.rt - lefts.t),
        |                    CASE WHEN r.rt <= lefts.t THEN 0 ELSE 1 END) AS rn
        |  FROM lefts JOIN aonr r ON lefts.k = r.k)
        |SELECT l.k, l.t, c.rt, c.v
        |FROM aonl l LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        |  ON l.k = c.k AND l.t = c.t""".stripMargin)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(key(got) == key(naive), "nearest as-of disagrees with the naive encoding")
  }

  test("forward random data matches the naive range-join-then-earliest encoding") {
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong)).toDF("k", "t")
    val right = Seq.fill(200)(
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "rt", "v")
    val got = AsOfJoin.forward(left, right, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("asof.rt").as("rt"), col("asof.v").as("v"))
    left.createOrReplaceTempView("aofl")
    right.createOrReplaceTempView("aofr")
    val naive = spark.sql(
      """SELECT l.k, l.t, r.rt, r.v
        |FROM aofl l
        |LEFT JOIN (
        |  SELECT l.k, l.t, MIN(r.rt) AS mrt
        |  FROM aofl l JOIN aofr r ON l.k = r.k AND r.rt >= l.t
        |  GROUP BY l.k, l.t) m ON l.k = m.k AND l.t = m.t
        |LEFT JOIN aofr r ON r.k = m.k AND r.rt = m.mrt""".stripMargin)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(key(got) == key(naive), "forward as-of disagrees with the naive encoding")
  }

  test("random data matches the naive range-join-then-latest encoding") {
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong)).toDF("k", "t")
    // distinct (k, rt): the operator's uniqueness contract
    val right = Seq.fill(200)(
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
      .toDF("k", "rt", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("asof.rt").as("rt"), col("asof.v").as("v"))
    left.createOrReplaceTempView("aol")
    right.createOrReplaceTempView("aor")
    val naive = spark.sql(
      """SELECT l.k, l.t, r.rt, r.v
        |FROM aol l
        |LEFT JOIN (
        |  SELECT l.k, l.t, MAX(r.rt) AS mrt
        |  FROM aol l JOIN aor r ON l.k = r.k AND r.rt <= l.t
        |  GROUP BY l.k, l.t) m ON l.k = m.k AND l.t = m.t
        |LEFT JOIN aor r ON r.k = m.k AND r.rt = m.mrt""".stripMargin)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(key(got) == key(naive), "as-of disagrees with the naive encoding")
  }
}
