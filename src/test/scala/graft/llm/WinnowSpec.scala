package graft.llm

import graft.SparkSpec

/** The winnowing selection GUARANTEE (Schleimer/Wilkerson/Aiken §3) is the
  * whole point of `dedup_winnow_fingerprint` over the fixed-stride window
  * profile: any shared run of ≥ w+k−1 = 23 chars must share at least one
  * selected fingerprint. The fixture gate checks the operator
  * differentially against DuckDB but only on the corpus's realized
  * overlaps; this spec plants the boundary run and replays the full
  * selection recurrence (hash ASC, pos DESC per window, distinct) in
  * plain Scala against random low-alphabet documents — ties included. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8; private val W = 16

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Plain-Scala replay of the selection recurrence: the per-window key is
    * md5(k-gram) ++ lpad(3000000 − pos) so string MIN is (hash ASC,
    * pos DESC) — the robust-winnowing rightmost-on-ties rule. */
  private def winnowRef(text: String): Set[String] = {
    if (text.length < K) return Set.empty
    val keys = (1 to text.length - K + 1).map { p =>
      md5hex(text.substring(p - 1, p - 1 + K)) + f"${3000000 - p}%07d"
    }
    val sel =
      if (keys.size >= W) (W to keys.size).map(i => keys.slice(i - W, i).min)
      else Seq(keys.min)
    sel.map(_.take(32)).toSet
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Dedup.winnowProfile(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def expected(
      docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val fps = docs.map { case (id, t) => id -> winnowRef(t) }.toMap
    docs.map { case (id, _) =>
      val mine = fps(id)
      val nShared = mine.count(f =>
        fps.exists { case (j, other) => j != id && other.contains(f) })
      val nFp = mine.size.toLong
      val q6 = if (nFp > 0) nShared * 1000000L / nFp else 0L
      id -> ((nFp, nShared.toLong, q6))
    }.toMap
  }

  test("selection guarantee: a shared run of exactly w+k-1 = 23 chars shares a fingerprint") {
    // disjoint-alphabet contexts so NO k-gram outside the run can match;
    // the run contributes 23-8+1 = 16 grams = exactly one full window,
    // whose min hash is identical in both docs (ties between identical
    // grams resolve to the same relative position on both sides)
    val runStr = "thequickbrownfoxjumpsov"
    assert(runStr.length == W + K - 1)
    val docs = Seq(
      1L -> ("XXXXXXXXXXXX" + runStr + "YYYYYYYYYYYY"),
      2L -> ("ZZZZZZZZZZZZ" + runStr + "QQQQQQQQQQQQ"))
    val got = run(docs)
    assert(got(1L)._2 >= 1L, s"doc 1 must share a fingerprint: $got")
    assert(got(2L)._2 >= 1L, s"doc 2 must share a fingerprint: $got")
    // the planted case agrees with the full reference replay
    assert(got == expected(docs))
  }

  test("disjoint docs share nothing; sub-k and sub-window docs hit the degenerate branches") {
    val docs = Seq(
      1L -> "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // 32 a's: every gram equal
      2L -> "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb",
      3L -> "short",                            // < k chars: n_fp = 0
      4L -> "exactly8!",                        // 9 chars: 2 grams, 1 window
      5L -> "")
    val got = run(docs)
    assert(got == expected(docs), s"got $got want ${expected(docs)}")
    assert(got(1L) == ((1L, 0L, 0L)), "all-equal grams collapse to 1 fp, unshared")
    assert(got(3L) == ((0L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L)))
  }

  test("random low-alphabet docs match the plain-Scala selection replay (ties exercised)") {
    val rnd = new scala.util.Random(42)
    // alphabet {a,b}: 8-gram collisions are common, so windows are full
    // of hash ties — the replay must agree on the distinct selected-hash
    // set through tie-heavy minima, window boundaries, and the
    // short-sequence single-window branch
    val docs = (1L to 24L).map { id =>
      val len = rnd.nextInt(60)
      id -> Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    val got = run(docs)
    val want = expected(docs)
    assert(got == want,
      s"diff: ${got.toSet.diff(want.toSet)} vs ${want.toSet.diff(got.toSet)}")
  }

  test("native winnow_fps equals the composable transform/slice/array_min " +
      "spelling on the fixture corpus") {
    // round 17: the kernel moved from the interpreted HOF chain to the
    // native WinnowFingerprints expression (O(n) deque vs O(n·w) slice
    // mins). This pins byte-for-byte parity of the SELECTED SETS on the
    // real documents table — the strongest corpus the recurrence sees —
    // by running both spellings side by side.
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .filter(length(col("text")) >= K).select("doc_id", "text")
    val composable = docs
      .withColumn("keys", expr(
        s"""transform(sequence(1, length(text) - $K + 1),
           |  p -> concat(md5(substring(text, p, $K)),
           |              lpad(cast(3000000 - p as string), 7, '0')))"""
          .stripMargin))
      .select(col("doc_id"), expr(
        s"""array_distinct(
           |  CASE WHEN size(keys) >= $W
           |  THEN transform(sequence($W, size(keys)),
           |         i -> substring(array_min(slice(keys, i - $W + 1, $W)),
           |                        1, 32))
           |  ELSE array(substring(array_min(keys), 1, 32)) END)"""
          .stripMargin).as("ref_fps"))
    val native = docs.select(col("doc_id"),
      graft.functions.WinnowFingerprints.winnow_fps(col("text"), K, W)
        .as("fps"))
    val diff = native.join(composable, "doc_id")
      .filter(not(array_sort(col("fps")) <=> array_sort(col("ref_fps"))))
      .count()
    assert(diff == 0L, s"$diff docs diverge from the composable reference")
  }

  test("multi-byte UTF-8 grams are CHARACTER windows, matching substring") {
    // the charOff path: 2- and 3-byte chars shift byte offsets away from
    // char positions, so a byte-window kernel would hash different grams
    // than the composable (character-based substring) spelling
    val docs = Seq(
      1L -> "наши дела идут хорошо и стабильно всегда",  // cyrillic, 2-byte
      2L -> "日本語のテキストで試験をするための文章です",   // CJK, 3-byte
      3L -> ("mixed ascii and ünïcödé tëxt wïth äccents " * 3))
    val got = run(docs)
    assert(got == expected(docs), s"got $got want ${expected(docs)}")
  }

  test("long tie-heavy docs slide full windows through the deque") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 8L).map { id =>
      val len = 150 + rnd.nextInt(150)
      id -> Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    val got = run(docs)
    val want = expected(docs)
    assert(got == want,
      s"diff: ${got.toSet.diff(want.toSet)} vs ${want.toSet.diff(got.toSet)}")
  }
}
