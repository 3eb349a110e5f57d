package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, backward and forward. Backward — for every left row, the single right row with the
  * largest right time ≤ the left time on the same key (the "state as of
  * this event" lookup: latest price tick, latest account snapshot, latest
  * purchase before a click). Spark has no ASOF JOIN operator; the naive
  * encodings are a range join that explodes to every ≤ pair before picking
  * the max, or a correlated max-subquery that rewrites to the same thing.
  *
  * This is the union-and-carry encoding instead: tag both inputs, union
  * them, sort each key's rows by (time, side) in ONE shuffle, and let a
  * running `last(payload, ignoreNulls)` window carry the most recent right
  * payload onto every left row. Cost is a single hash Exchange on the key +
  * one sort — identical to the shuffle a plain equi-join would pay, with no
  * pair blow-up in between (PlanSpec asserts the plan contains no Join node
  * at all).
  *
  * 100 TB design: per-key work is linear in that key's rows, so the
  * operator survives any key cardinality; a single HOT key serializes into
  * one task's sort — the standard mitigation is range-splitting the key's
  * timeline into salted chunks and carrying each chunk's last payload into
  * the next as a boundary row (the same carry trick, applied once more at
  * chunk granularity). Right rows must be unique per (key, time) — callers
  * pre-aggregate duplicates (AsOfJoinSpec asserts the contract) — otherwise
  * "the" latest row is ill-defined no matter the engine.
  */
object AsOfJoin {

  /** Left rows with a `payload` struct column holding the latest right-side
    * columns (all of `right` minus the key) at or before the left time —
    * null when no right row precedes (left-outer semantics).
    *
    * @param left      probe side; all its columns survive
    * @param right     lookup side, unique per (key, rightTime)
    * @param key       equi-join key column names (present on both sides)
    * @param leftTime  left ordering column (orderable: timestamp/date/num)
    * @param rightTime right ordering column (same type as leftTime)
    * @param payload   name of the output struct column
    * @param tolerance max staleness: a carried right row older than
    *                  `leftTime - tolerance` is nulled out (an interval
    *                  expression for time columns, a number for numerics) —
    *                  pandas merge_asof's `tolerance`. None = unbounded.
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String,
      payload: String = "asof",
      tolerance: Option[Column] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c))
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        struct(payloadCols.map(col): _*).as(payload)): _*)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
    // right rows sort BEFORE left rows at the same time (side 0 < 1), so
    // "at or before" is inclusive; the frame ends at the current row, so a
    // left row never sees a later right row
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    // staleness bound: applied AFTER the carry (a bounded window frame
    // can't express it — the frame is in rows, the bound is in time)
    tolerance.fold(carried) { tol =>
      carried.withColumn(payload,
        when(col(s"$payload.$rightTime") >= col("__asof_t") - tol,
          col(payload)))
    }.drop("__asof_t", "__asof_side")
  }

  /** Forward as-of: for every left row, the single right row with the
    * SMALLEST right time ≥ the left time on the same key (the "next event"
    * lookup: next purchase after a click, next restock after a stock-out).
    * Mirror of [[backward]]: same union-and-carry encoding, same single
    * hash shuffle, but the carrying window looks forward —
    * `first(payload, ignoreNulls)` over CURRENT ROW..UNBOUNDED FOLLOWING —
    * and the side tag flips so a right row at the same instant sorts AFTER
    * the left row (side 0 = left < side 1 = right), keeping "at or after"
    * inclusive. Same uniqueness contract and 100 TB story as backward. */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String,
      payload: String = "asof",
      tolerance: Option[Column] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c))
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(1).as("__asof_side"),
        struct(payloadCols.map(col): _*).as(payload)): _*)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(0))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload, first(col(payload), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 0)
    // staleness bound, mirrored: a carried right row FURTHER ahead than
    // `leftTime + tolerance` is nulled out
    tolerance.fold(carried) { tol =>
      carried.withColumn(payload,
        when(col(s"$payload.$rightTime") <= col("__asof_t") + tol,
          col(payload)))
    }.drop("__asof_t", "__asof_side")
  }

  /** Nearest as-of: the single right row closest in time on the same key,
    * in EITHER direction (pandas merge_asof direction='nearest'); backward
    * wins exact-distance ties. Still ONE union and ONE hash shuffle — the
    * backward carry (`last` over the preceding frame) and the forward carry
    * (`first` over the following frame) are two windows on the SAME
    * partitioning and ordering, so Catalyst reuses a single sort. Tie
    * subtlety: right rows sort before left rows at the same instant
    * (side 0 < 1), which makes the backward frame inclusive and the
    * forward frame exclusive at ties — harmless, because backward then
    * holds that row at distance zero and wins the comparison. */
  def nearest(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String,
      payload: String = "asof"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c))
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        struct(payloadCols.map(col): _*).as("__asof_p")): _*)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
    val ord = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bwDist = col("__asof_t") - col(s"__asof_bw.$rightTime")
    val fwDist = col(s"__asof_fw.$rightTime") - col("__asof_t")
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_bw", last(col("__asof_p"), ignoreNulls = true).over(wb))
      .withColumn("__asof_fw", first(col("__asof_p"), ignoreNulls = true).over(wf))
      .filter(col("__asof_side") === 1)
      .withColumn(payload,
        when(col("__asof_bw").isNull, col("__asof_fw"))
          .when(col("__asof_fw").isNull, col("__asof_bw"))
          .when(bwDist <= fwDist, col("__asof_bw"))
          .otherwise(col("__asof_fw")))
      .drop("__asof_t", "__asof_side", "__asof_p", "__asof_bw", "__asof_fw")
  }
}
