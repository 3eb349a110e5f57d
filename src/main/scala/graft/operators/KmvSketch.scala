package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct sketch (Bar-Yossef, Jayram, Kumar,
  * Sivakumar & Trevisan, "Counting distinct elements in a data stream",
  * RANDOM 2002; estimator form: Beyer, Haas, Reinwald, Sismanis &
  * Gemulla, SIGMOD 2007) — the fifth mergeable sketch, and the one that
  * gives the family SET ALGEBRA: HLL answers "how many distinct" for ONE
  * set, but two HLLs only union; two KMV sketches additionally estimate
  * Jaccard and INTERSECTION size (Beyer et al. §4), because the sketch
  * IS a uniform sample of the hashed domain — the k smallest distinct
  * hash values. That is what cross-source overlap accounting needs
  * (|tokens(A) ∩ tokens(B)| across corpus sources without pairwise
  * token joins).
  *
  * The buffer is the k smallest DISTINCT signed-long hashes in natural
  * order — signed order equals unsigned order under the +2^63 shift
  * (monotone), so callers map a value to estimate space via
  * u = (h + 2^63) / 2^64 and D̂ = (k−1)/u_k. Crucially, unlike
  * Space-Saving, the result is a pure FUNCTION OF THE SET (the k
  * smallest distinct values), so the aggregate is bit-identical under
  * every partitioning and merge tree — KmvSketchSpec asserts exactly
  * that, plus the estimator's error bound (σ ≈ D/√(k−2)) and the
  * union-sketch containment law that makes pair estimates sound:
  * the k smallest of A ∪ B all lie in (k smallest of A) ∪ (k smallest
  * of B), so kmv(A ∪ B) = trim_k(merge(kmv(A), kmv(B))) EXACTLY.
  *
  * 100 TB shape: k-bounded buffer riding partial aggregation — raw
  * instance streams fold locally (duplicates die in the buffer's
  * distinct check; after warm-up an accepted insert has probability
  * ≈ k/n, so the common path is one comparison against the buffer max)
  * and only k longs per group per partition cross the shuffle.
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k >= 2, s"KmvAggregator: k must be >= 2, got $k")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(buf: Vector[Long], h: Long): Vector[Long] =
    if (buf.length == k && h >= buf.last) buf // common path: one compare
    else if (buf.contains(h)) buf
    else (buf :+ h).sorted.take(k)

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Vector[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Vector[Long]] =
    ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
