package graft.operators

import graft.SparkSpec

/** The pigeonhole cover must be COMPLETE (every pair within maxDist found)
  * and the verification EXACT (every pair beyond maxDist excluded) — the
  * fixture gate proves it differentially against a brute-force oracle, but
  * only on the corpus's realized distances; this spec plants the boundary
  * cases and fuzzes random clustered fingerprints against an in-test
  * brute force. */
class HammingBandingSpec extends SparkSpec {
  import spark.implicits._

  private val bandBits = 16
  private val nBands = 3
  private val maxDist = 2

  private def verdicts(rows: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    HammingBanding
      .closeVerdicts(rows.toDF("id", "ph"), "id", "ph", bandBits, nBands,
        maxDist)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def brute(rows: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    rows.flatMap { case (i, p) =>
      rows.collect { case (j, q)
        if j < i && java.lang.Long.bitCount(p ^ q) <= maxDist => j }
        match {
          case Nil => None
          case ks => Some(i -> ((ks.min, ks.size.toLong)))
        }
    }.toMap

  test("planted boundary cases: within-band, cross-band, just-beyond") {
    val rows = Seq(
      10L -> 0L,                        // base
      11L -> 1L,                        // dist 1, band 0
      12L -> 3L,                        // dist 2, both flips in band 0
      13L -> (1L | (1L << 16)),         // dist 2 spread over bands 0 and 1
                                        //   (agrees with base only in band 2)
      14L -> (1L | (1L << 16) | (1L << 32)), // dist 3 from base, one flip
                                        //   per band: NO band agrees with
                                        //   base — correctly out of its ball
      15L -> (1L << 47))                // dist 1, top bit of band 2
    val got = verdicts(rows)
    assert(got == brute(rows), s"got $got want ${brute(rows)}")
    // the documented boundary facts the construction rests on:
    // 13 is dist 2 from base SPREAD over two bands — only band 2 agrees,
    // so a single-band construction would already have found it, but a
    // >2-band spread would not: that's exactly what 14 exercises
    assert(got(13L)._1 == 10L, "cross-band dist-2 pair must be found")
    // 14 is dist 3 from base with one flip per band (no band agrees with
    // base — and correctly so, it's outside base's ball), yet dist 2 from
    // id 11: its keeper must be 11, proving exclusion and inclusion at
    // the same code point
    assert(got(14L)._1 == 11L,
      s"dist-3-from-base / dist-2-from-11 handling diverged: ${got.get(14L)}")
  }

  test("random clustered fingerprints match brute force") {
    val rnd = new scala.util.Random(71)
    // clusters: a few base codes, each with satellites 1-4 bit flips away —
    // distances straddle the maxDist boundary in both directions
    val rows = (0 until 8).flatMap { c =>
      val base = rnd.nextLong() & ((1L << 48) - 1)
      (0 until 12).map { s =>
        val flips = rnd.nextInt(5)
        val ph = (0 until flips).foldLeft(base)((p, _) =>
          p ^ (1L << rnd.nextInt(48)))
        (c * 100L + s) -> ph
      }
    }
    assert(verdicts(rows) == brute(rows))
  }
}
