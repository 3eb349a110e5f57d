package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT Hamming-ball pairing by pigeonhole banding — the candidate
  * generator behind perceptual-hash dedup (`multimodal_dedup_phash`).
  *
  * Split a W-bit fingerprint into `nBands` disjoint bands. Two fingerprints
  * within Hamming distance `maxDist` differ in at most `maxDist` bands, so
  * whenever `maxDist < nBands` they agree EXACTLY in at least one band —
  * the band-equality join is a complete cover of the ≤maxDist ball
  * (pigeonhole), unlike sign-LSH whose buckets are probabilistic. The
  * price is candidate noise: two RANDOM fingerprints collide in a band
  * with probability 2^-bandBits, so background candidates are
  * nBands·n²/2^bandBits — controlled by CODE WIDTH (wider fingerprints ⇒
  * wider bands at the same nBands), not by recall. That is the
  * multi-index-hashing layout; SCALING.md carries the measured curve.
  *
  * Shuffle shape: candidates travel as skinny (band, value, id) rows; the
  * fingerprint re-joins by id only for the bit_count verification, and the
  * verdict output (keeper = smallest close earlier id) is linear in rows
  * however large a near-dup cluster is.
  */
object HammingBanding {

  /** All (earlier, later) pairs within Hamming distance `maxDist`, reduced
    * to per-row verdicts: (id, keeper = min earlier close id, n_close).
    * Requires maxDist < nBands (the pigeonhole condition) and
    * nBands·bandBits ≤ 64. */
  /** Distinct band-collision candidate pairs with their exact Hamming
    * distance: (d1 < d2, hd). Factored out of [[closeVerdicts]] (round
    * 14c) so the calibration audit (`dedup_phash_calibration`) describes
    * exactly the candidate generator the dedup key ships. */
  def candidatePairs(ph: DataFrame, id: String, phCol: String,
      bandBits: Int, nBands: Int): DataFrame = {
    require(nBands * bandBits <= 64, "bands exceed a 64-bit fingerprint")
    val base = ph.select(col(id).as("hb_id"), col(phCol).as("hb_ph"))
    val banded = base.select(col("hb_id"),
      explode(array((0 until nBands).map(k =>
        struct(lit(k).as("band"),
          shiftright(col("hb_ph"), k * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))): _*)).as("e"))
      .select(col("hb_id"), col("e.band"), col("e.bv"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bv"))
      .filter(col("x.hb_id") < col("y.hb_id"))
      .select(col("x.hb_id").as("d1"), col("y.hb_id").as("d2"))
      .distinct()
    val pa = base.select(col("hb_id").as("d1"), col("hb_ph").as("ph1"))
    val pb = base.select(col("hb_id").as("d2"), col("hb_ph").as("ph2"))
    cand.join(pa, "d1").join(pb, "d2")
      .select(col("d1"), col("d2"),
        bit_count(col("ph1").bitwiseXOR(col("ph2"))).as("hd"))
  }

  def closeVerdicts(ph: DataFrame, id: String, phCol: String,
      bandBits: Int, nBands: Int, maxDist: Int): DataFrame = {
    require(maxDist < nBands,
      s"pigeonhole needs maxDist ($maxDist) < nBands ($nBands)")
    candidatePairs(ph, id, phCol, bandBits, nBands)
      .filter(col("hd") <= maxDist)
      .groupBy(col("d2").as(id))
      .agg(min(col("d1")).as("keeper"), count(lit(1)).as("n_close"))
  }
}
