package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitter sketch (Metwally, Agrawal & El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005) — the fourth mergeable sketch next to HLL
  * (distinct), GK (percentile) and CMS (point frequency): `k` bounded
  * counters that surface the top-k item LIST, which CMS cannot emit
  * without enumerating the key space.
  *
  * Buffer: (n processed, ≤k counters of (item, count, err)).
  *  - seen item → count+1;
  *  - free slot → (item, 1, 0);
  *  - full → evict the (count, item)-min counter m (item tiebreak keeps
  *    single-partition folds deterministic) and take over its mass:
  *    (item, m.count+1, err = m.count).
  *
  * Invariants carried per counter (the paper's Lemma 3.2/3.5, asserted
  * in SpaceSavingSpec): count ≥ true frequency ≥ count − err within the
  * folded stream, and any item with frequency > n/k is present (at most
  * k counters can reach the min-count floor that eviction requires).
  *
  * merge follows the mergeable-summaries construction (Agarwal, Cormode,
  * Huang, Phillips, Wei & Yi, PODS 2012 §3): shared items add counts and
  * errs; an item absent from one FULL summary gains that side's
  * min-count as both count and err mass (an evicted item's true
  * frequency is ≤ that floor — the pessimistic upper bound that keeps
  * count ≥ true ≥ count − err through any merge tree); a summary still
  * under k counters evicted nothing, so absence there contributes 0.
  * The union then trims to the k largest (count DESC, item ASC).
  * Counter VALUES therefore depend on the partition merge order — the
  * sketch is unit-tier like its three siblings — but the bounds hold for
  * every merge tree, which is exactly what the spec asserts.
  *
  * 100 TB shape: the buffer is k-bounded and rides Spark's partial
  * aggregation, so each input partition folds locally and only k
  * counters per group per partition cross the shuffle. The per-row
  * linear probe over a k-vector is the simplicity trade at small k; a
  * TypedImperativeAggregate with a hash-indexed heap is the drop-in when
  * k grows past ~100.
  */
class SpaceSavingAggregator(k: Int) extends Aggregator[String,
    (Long, Seq[(String, Long, Long)]), (Long, Seq[(String, Long, Long)])] {
  require(k >= 1, s"SpaceSavingAggregator: k must be >= 1, got $k")

  private def trim(cs: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
    cs.sortBy { case (item, c, _) => (-c, item) }.take(k)

  override def zero: (Long, Seq[(String, Long, Long)]) = (0L, Vector.empty)

  override def reduce(buf: (Long, Seq[(String, Long, Long)]), item: String)
      : (Long, Seq[(String, Long, Long)]) = {
    val (n, cs) = buf
    val i = cs.indexWhere(_._1 == item)
    val next =
      if (i >= 0) cs.updated(i, (item, cs(i)._2 + 1, cs(i)._3))
      else if (cs.size < k) cs :+ ((item, 1L, 0L))
      else {
        val m = cs.minBy { case (it, c, _) => (c, it) }
        cs.filterNot(_ == m) :+ ((item, m._2 + 1, m._2))
      }
    (n + 1, next)
  }

  override def merge(a: (Long, Seq[(String, Long, Long)]),
      b: (Long, Seq[(String, Long, Long)]))
      : (Long, Seq[(String, Long, Long)]) = {
    val (na, ca) = a; val (nb, cb) = b
    if (ca.isEmpty) (na + nb, cb)
    else if (cb.isEmpty) (na + nb, ca)
    else {
      // a summary under k counters never evicted: absence there means
      // true frequency 0 in that substream, so it contributes no mass
      val floorA = if (ca.size < k) 0L else ca.map(_._2).min
      val floorB = if (cb.size < k) 0L else cb.map(_._2).min
      val ma = ca.map(t => t._1 -> t).toMap
      val mb = cb.map(t => t._1 -> t).toMap
      val merged = (ma.keySet ++ mb.keySet).toSeq.map { it =>
        val (c1, e1) = ma.get(it).map(t => (t._2, t._3))
          .getOrElse((floorA, floorA))
        val (c2, e2) = mb.get(it).map(t => (t._2, t._3))
          .getOrElse((floorB, floorB))
        (it, c1 + c2, e1 + e2)
      }
      (na + nb, trim(merged))
    }
  }

  override def finish(r: (Long, Seq[(String, Long, Long)]))
      : (Long, Seq[(String, Long, Long)]) = (r._1, trim(r._2))

  override def bufferEncoder: Encoder[(Long, Seq[(String, Long, Long)])] =
    ExpressionEncoder[(Long, Seq[(String, Long, Long)])]()
  override def outputEncoder: Encoder[(Long, Seq[(String, Long, Long)])] =
    ExpressionEncoder[(Long, Seq[(String, Long, Long)])]()
}
