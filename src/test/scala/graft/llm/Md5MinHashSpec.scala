package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity gate for the fused [[graft.functions.Md5MinHashes]] kernel
  * against the composable construction it replaced —
  * `array_min(transform(toks, t => md5(concat(lit(s"$i|"), t))))` per
  * seed — which is ALSO what the DuckDB oracles of the minhash keys
  * spell out, so this spec is the engine-side half of the differential
  * argument (the oracle hash gate is the cross-engine half). Covers the
  * fixture-corpus shape plus the edges the fixture can't exercise:
  * multi-byte UTF-8 tokens (byte-wise digest input must match concat's),
  * null tokens (skipped, like array_min over a null-bearing transform),
  * empty and null arrays (NULL signature), two-digit seed prefixes
  * (k > 10), and tie-heavy low-alphabet corpora. */
class Md5MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def composable(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(col("id") +: (0 until k).map(i =>
      array_min(transform(col("toks"),
        t => md5(concat(lit(s"$i|"), t)))).as(s"mh_$i")): _*)

  private def native(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(col("id"),
        graft.functions.Md5MinHashes.md5_minhashes(col("toks"), k).as("mh"))
      .select(col("id") +: (0 until k).map(i =>
        element_at(col("mh"), i + 1).as(s"mh_$i")): _*)

  private def assertParity(rows: Seq[(Long, Seq[String])], k: Int): Unit = {
    val df = rows.toDF("id", "toks")
    val a = composable(df, k).orderBy("id").collect().map(_.toSeq)
    val b = native(df, k).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("parity on realistic token sets (k = 8, the production shape)") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "k", "zz9",
      "lorem", "ipsum", "xx", "y")
    val rows = (0L until 50L).map(i =>
      i -> Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
        .distinct)
    assertParity(rows, 8)
  }

  test("parity on multi-byte UTF-8 tokens") {
    assertParity(Seq(
      1L -> Seq("héllo", "wörld", "日本語", "emoji😀tok", "ß"),
      2L -> Seq("ascii", "ünïcödé")), 8)
  }

  test("parity on single-token and tie-heavy low-alphabet corpora") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      i -> Seq.fill(1 + rng.nextInt(8))(
        ("a" + rng.nextInt(3)).toString).distinct)
    assertParity(rows, 8)
  }

  test("parity with two-digit seed prefixes (k = 12)") {
    assertParity(Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("longer", "tokens", "here")), 12)
  }

  test("null tokens are skipped; empty and null arrays yield NULL signatures") {
    val df = Seq(
      (1L, Seq("a", null, "b")), // null element: skipped by both forms
      (2L, Seq.empty[String]),   // empty: every mh_i null
      (3L, null)                 // null array: every mh_i null
    ).toDF("id", "toks")
    val k = 4
    val a = composable(df, k).orderBy("id").collect().map(_.toSeq)
    val b = native(df, k).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // non-vacuity: row 1 has real minima, rows 2-3 are null
    assert(a(0).drop(1).forall(_ != null))
    assert(a(1).drop(1).forall(_ == null) && a(2).drop(1).forall(_ == null))
  }

  test("k < 1 fails analysis with the function's name (ADVICE r17)") {
    graft.GraftSession.register(spark)
    val df = Seq((1L, Seq("x", "y"))).toDF("id", "toks")
    df.createOrReplaceTempView("mmh_bad_k")
    for (k <- Seq(-1, 0)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT md5_minhashes(toks, $k) FROM mmh_bad_k").collect()
      }
      assert(e.getMessage.contains("md5_minhashes requires k >= 1"),
        s"k=$k: ${e.getMessage.take(200)}")
    }
  }

  test("the SQL registration round-trips") {
    graft.GraftSession.register(spark) // the late-registration path
    val df = Seq((1L, Seq("x", "y"))).toDF("id", "toks")
    df.createOrReplaceTempView("mmh_in")
    val viaSql = spark.sql(
      "SELECT id, md5_minhashes(toks, 3) AS mh FROM mmh_in")
      .select(col("id"), element_at(col("mh"), 1), element_at(col("mh"), 2))
      .collect().map(_.toSeq)
    val direct = native(df, 2).collect().map(_.toSeq)
    assert(viaSql.toSeq == direct.toSeq)
  }
}
