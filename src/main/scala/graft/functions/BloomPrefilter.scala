package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column/SQL surface over Spark's own runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`, which Catalyst's
  * `InjectRuntimeFilter` rule only applies to plans it can prove
  * beneficial). Exposing them as library functions lets a pipeline author
  * state the filter explicitly: build a bloom over the SELECTIVE side's
  * join keys (one small aggregate), ship it as a scalar subquery, and
  * prune the probe side MAP-SIDE before its shuffle — the join that
  * follows is exact, so a false positive costs a shuffled row, never a
  * wrong result.
  *
  * `might_contain` requires its bloom input to be a constant or scalar
  * subquery (enforced by the expression's own type check), so the SQL
  * form `bloom_might_contain((SELECT bloom_agg(...) FROM dim), probe)` is
  * the supported shape; a broadcast-joined bloom column is rejected at
  * analysis time.
  */
object BloomPrefilter {

  /** Aggregate: a bloom filter over xxhash64-hashed long values.
    * `estimatedItems` sizes the bitmap (Spark derives optimal numBits);
    * at production scale it comes from table statistics — correctness
    * never depends on it, only the false-positive rate does. */
  def bloom_agg(value: Column, estimatedItems: Long): Column =
    GraftBridge.column(aggBuilder(Seq(GraftBridge.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems))))

  def bloom_might_contain(bloom: Column, value: Column): Column =
    GraftBridge.column(containsBuilder(Seq(
      GraftBridge.expression(bloom), GraftBridge.expression(value))))

  private[graft] def aggBuilder(exprs: Seq[Expression]): Expression = {
    SqlArgs.arity("bloom_agg", exprs, 2, 2)
    new BloomFilterAggregate(exprs(0), exprs(1)).toAggregateExpression()
  }

  private[graft] def containsBuilder(exprs: Seq[Expression]): Expression = {
    SqlArgs.arity("bloom_might_contain", exprs, 2, 2)
    BloomFilterMightContain(exprs(0), exprs(1))
  }
}
