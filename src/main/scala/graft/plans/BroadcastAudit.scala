package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}

/** Post-execution audit of every broadcast build side's ACTUAL size —
  * the guard for the estimate-vs-actual hazard the round-15 star-join
  * study measured (SCALING.md `join_multiway`): Spark's broadcast
  * decision reads the ESTIMATED size of the build side, and column
  * pruning discounts that estimate proportionally to the pruned
  * columns, while the hashed relation that actually lands on the driver
  * and every executor does not shrink the same way. A pruning-discounted
  * dim therefore rides BroadcastHashJoin far past the configured
  * `spark.sql.autoBroadcastJoinThreshold` (measured: the ×64 staged
  * customer dim scans at 15.5 MB, prunes to an estimated ~6.2 MB —
  * under the 10 MB threshold — and broadcasts a build whose true
  * serialized size is ~4× the bound). At production scale that class is
  * a driver/executor OOM, and NOTHING in the engine's plans reports it:
  * the explain output shows the estimate, not the build.
  *
  * This audit closes the blind spot with the one number the estimate
  * cannot fake: after an action has run, every BroadcastExchange in the
  * FINAL adaptive plan carries a `dataSize` metric measured while the
  * broadcast was built. The audit walks the executed plan — through
  * AQE query stages, reused exchanges and subqueries — dedupes builds
  * by exchange identity (a ReusedExchange is ONE build, not two), and
  * flags any build whose actual bytes exceed k× the session threshold.
  *
  * Intended use at 100 TB: run the pipeline's smoke-scale replay under
  * `violations(df)` as a deployment gate (PlanSpec wires it as exactly
  * that for the engine's own keys), and page on the flagged joins —
  * the fix per join is an explicit `.hint("merge")`/`.hint("shuffle_hash")`
  * on the offending build side or real table stats, both of which move
  * the decision off the discounted estimate. The engine-wide remedy
  * (applied r17, per this audit's own x64 measurement) is
  * `GraftSession.FileCompressionFactor`: the 6.3× measured
  * estimate-to-actual gap is fed back into every file-scan size
  * estimate, so the broadcast flip lands where the ACTUAL bytes cross
  * the threshold — re-measured in SCALING.md `join_multiway`.
  *
  * Measurement caveat: `dataSize` is the hashed relation's
  * `estimatedSize` = ALLOCATED memory, which includes the
  * `BytesToBytesMap` first page. On a big-heap driver Spark's derived
  * page size reaches 32-64 MiB, flooring every build's reading there
  * and turning a 10 MB-threshold audit into all-noise (measured: 61/61
  * builds of a bench sweep read 32 MiB + real bytes). Sessions that
  * feed this audit must pin `spark.buffer.pageSize` to a small page —
  * `GraftSession.BufferPageSize` (2 MiB, the production-executor shape)
  * does; every graft driver surface sets it.
  */
object BroadcastAudit {

  /** One broadcast build that actually executed.
    * @param desc  output column names of the broadcast (identifies the dim)
    * @param rows  numOutputRows metric of the exchange
    * @param bytes dataSize metric — the true serialized build size */
  case class BuildSide(desc: String, rows: Long, bytes: Long)

  /** The session's auto-broadcast threshold in bytes (-1 = disabled). */
  def thresholdBytes(spark: SparkSession): Long = {
    val s = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    if (s.trim == "-1" || s.trim == "-1b") -1L
    else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
  }

  /** Every broadcast build in `df`'s FINAL executed plan, deduped by
    * exchange identity. `df` must have run an action already — without
    * one the adaptive plan is not final and the metrics are zero; this
    * asserts on a never-executed adaptive root rather than return
    * silently-empty results. */
  def buildSides(df: DataFrame): Seq[BuildSide] = {
    val root = df.queryExecution.executedPlan
    // ADVICE r16: gate on isFinalPlan, not on the presence of a
    // QueryStageExec — an AQE root that materializes no exchange stages
    // (e.g. adaptive applied only for subqueries) is fully executed yet
    // stage-free, and the old guard spuriously rejected it.
    require(root match {
      case a: AdaptiveSparkPlanExec => a.isFinalPlan
      case _ => true
    }, "BroadcastAudit.buildSides: plan has not executed yet — run an " +
        "action (count/collect) first; adaptive metrics are only " +
        "populated on the final plan")
    buildSidesOf(root)
  }

  private def buildSidesOf(root: SparkPlan): Seq[BuildSide] = {
    val exchanges = flatten(root)
      .collect { case b: BroadcastExchangeExec => b }
    // dedupe by plan identity: the same exchange reached through a
    // QueryStage AND a ReusedExchange is one physical build
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    exchanges.filter(seen.add).map { e =>
      BuildSide(
        e.output.map(_.name).mkString("bcast[", ",", "]"),
        e.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
        e.metrics.get("dataSize").map(_.value).getOrElse(-1L))
    }
  }

  /** Builds whose ACTUAL size exceeds k× the session threshold — the
    * deployment-gate form. Empty when the threshold is disabled (-1):
    * with auto-broadcast off, every broadcast is an explicit hint and
    * the caller owns it. Default k = 2.0 (r16 verdict #1): with the
    * estimate calibrated to actual bytes (GraftSession's
    * fileCompressionFactor) the worst in-engine build sits at ~1× the
    * threshold, so 2× is real headroom, not a bar set over the worst
    * measured point. */
  def violations(df: DataFrame, k: Double = 2.0): Seq[BuildSide] = {
    val t = thresholdBytes(df.sparkSession)
    if (t <= 0) Seq.empty
    else buildSides(df).filter(_.bytes > k * t)
  }

  /** Flattens through the adaptive wrappers a plain `children` walk
    * cannot see: AdaptiveSparkPlanExec holds its final plan in
    * `executedPlan`, query stages hold theirs in `plan`, reused
    * exchanges point at the original via `child`, and scalar/IN
    * subqueries hang off `subqueries`. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    }
    (p +: below) ++ p.subqueries.flatMap(flatten)
  }

  /** The ALWAYS-ON form of the guard: a QueryExecutionListener that
    * audits every completed action's final plan and records builds over
    * k× the threshold. Metrics are already collected by the time
    * onSuccess fires, so the audit is a metadata walk — no re-execution,
    * no measurable overhead — and it sees EVERY query of the session,
    * including ones a deployment-gate replay would never enumerate.
    * Install with [[install]]; in production, page on [[violations]]
    * draining non-empty (the listener also WARN-logs each hit as it
    * lands). Listener delivery is asynchronous (Spark's execution
    * listener bus) — a test that asserts right after an action should
    * poll briefly. */
  final class Listener(k: Double)
      extends org.apache.spark.sql.util.QueryExecutionListener
      with org.apache.spark.internal.Logging {
    private val hits =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, BuildSide)]()

    /** Violations recorded so far as (action name, build). */
    def violations: Seq[(String, BuildSide)] = {
      import scala.jdk.CollectionConverters._
      hits.iterator().asScala.toSeq
    }

    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = {
      val t = thresholdBytes(qe.sparkSession)
      if (t > 0) buildSidesOf(qe.executedPlan)
        .filter(_.bytes > k * t)
        .foreach { b =>
          hits.add(funcName -> b)
          logWarning(s"BroadcastAudit: $funcName built ${b.desc} at " +
            s"${b.bytes} bytes — over ${k}x the ${t}-byte threshold " +
            s"(rows=${b.rows}); the estimate that allowed the broadcast " +
            "does not reflect the true build size")
        }
    }

    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Register an always-on audit listener on the session; returns it so
    * the caller can drain [[Listener.violations]]. */
  def install(spark: SparkSession, k: Double = 2.0): Listener = {
    val l = new Listener(k)
    spark.listenerManager.register(l)
    l
  }
}
