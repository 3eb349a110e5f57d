package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-placement utilities — the two levers that decide whether a
  * fact-fact join is feasible at 100 TB:
  *
  *  - **Bucketing**: persist both sides pre-hashed on the join key; a later
  *    sort-merge join reads co-located buckets and plans NO Exchange on
  *    either side. The shuffle is paid once at write time (when the data is
  *    being laid down anyway), not once per downstream join. ColocateSpec
  *    asserts the Exchange-free plan.
  *
  *  - **Salting**: when one key dominates (power-law keys), hash
  *    partitioning puts the hot key on one executor. Salting splinters each
  *    big-side row into one of S sub-keys and replicates the small side S
  *    ways — trading S× duplication of the small side for S-way parallelism
  *    of the hot key. (Spark's AQE skew-join splits oversized partitions
  *    after the fact; explicit salting is the plan-level tool when the skew
  *    is known, e.g. a null-heavy or default-valued key.)
  */
object Colocate {

  /** Persist `df` bucketed+sorted by `key` as a catalog table backed by
    * `path`. Joins between tables bucketed the same way on the same key are
    * Exchange-free. */
  def writeBucketed(df: DataFrame, key: String, table: String, buckets: Int,
      path: String): Unit =
    // repartition by the key with numPartitions = numBuckets uses the same
    // Murmur3 hash as the bucket id, so each task holds exactly one bucket
    // and writes exactly one file — without it every task writes a file per
    // bucket it sees (tasks × buckets files; the small-file problem at scale)
    df.repartition(buckets, col(key)).write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Inner equi-join of two same-bucketed tables — reads co-located buckets,
    * no shuffle on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** Salted inner equi-join: big side gets a deterministic salt in [0, S)
    * derived from a discriminator column (NOT from rand() — oracle and
    * retry determinism, SURVEY §7.4.5); small side is replicated S ways.
    *
    * The join is PINNED to the shuffled-hash path. Salting presupposes
    * the "small" side is too big to broadcast — if it fit the broadcast
    * threshold there would be no skew problem to salt away — yet at
    * staging scale Catalyst's estimate still picks BroadcastHashJoin,
    * which replicates the salt fan-out into the build for nothing (the
    * r17 board-wide BroadcastAudit measured the ×4-replicated build at
    * 2-3× the threshold at sf0.1 — the exact oversize-build class the
    * audit exists to catch). `shuffle_hash` rather than `merge`: the
    * per-(key, salt) build partitions are small by construction, and a
    * hash build skips sorting the splintered big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("graft_salt",
      pmod(xxhash64(discriminator), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall.hint("shuffle_hash"), Seq(key, "graft_salt"))
      .drop("graft_salt")
  }
}
