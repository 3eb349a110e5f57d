package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Glue-Studio visual job (reference README.md:147-151 — the console's
  * "Change schema" job is one node of Studio's drag-and-drop transform
  * graph): a DECLARATIVE node DAG — sources, ApplyMapping, filter, join,
  * aggregate, union, drop-duplicates, drop-fields — compiled to ONE
  * Catalyst plan.
  *
  * The design point mirrors what Glue's codegen does with the visual
  * graph: each node compiles to a Dataset transformation and nothing
  * executes per node, so the whole graph collapses into a single logical
  * plan and Catalyst sees through every node boundary — filters placed
  * "late" in the graph still push to the scan, mapping nodes still prune
  * columns at the source, and join strategy is chosen over the complete
  * plan. A per-node materialization (the naive interpreter) would fence
  * the optimizer at every edge; this compiler never does.
  */
object VisualJob {

  sealed trait Node { def inputs: Seq[String] }

  /** Leaf — a named table bound by the caller at compile time. */
  case class Source(table: String) extends Node {
    def inputs: Seq[String] = Nil
  }

  /** ApplyMapping — Glue's select + rename + cast in one transform:
    * (from, to, castType) triples; output has exactly the mapped fields. */
  case class ApplyMapping(input: String,
      mapping: Seq[(String, String, String)]) extends Node {
    def inputs: Seq[String] = Seq(input)
  }

  /** Filter — rows matching a SQL predicate. */
  case class FilterRows(input: String, predicate: String) extends Node {
    def inputs: Seq[String] = Seq(input)
  }

  /** Join — equi-join on same-named keys (Studio's Join node renames via
    * an upstream ApplyMapping, exactly as modeled here). */
  case class EquiJoin(left: String, right: String, keys: Seq[String],
      how: String = "inner") extends Node {
    def inputs: Seq[String] = Seq(left, right)
  }

  /** Aggregate — group keys + (alias, SQL aggregate expression) pairs. */
  case class Aggregate(input: String, groupBy: Seq[String],
      aggs: Seq[(String, String)]) extends Node {
    def inputs: Seq[String] = Seq(input)
  }

  /** Union — Studio's n-ary Union node. Resolves columns BY NAME (Studio
    * requires matching schemas and pairs columns by name, not position), so
    * an upstream ApplyMapping that reordered fields cannot silently pair
    * the wrong columns. */
  case class Union(branches: Seq[String]) extends Node {
    def inputs: Seq[String] = branches
  }

  /** Drop Duplicates — Studio's dedupe node: whole-row when `keys` is
    * empty, else first-arbitrary-row per key tuple (Spark's dropDuplicates
    * semantics — Studio makes the same no-ordering guarantee). */
  case class DropDuplicates(input: String, keys: Seq[String] = Nil)
      extends Node {
    def inputs: Seq[String] = Seq(input)
  }

  /** Drop Fields — Studio's column-removal node (the complement of
    * ApplyMapping's keep-list). */
  case class DropFields(input: String, fields: Seq[String]) extends Node {
    def inputs: Seq[String] = Seq(input)
  }

  /** Compile the graph to the plan of `output`. Pure plan construction:
    * no action, no temp views, no per-node materialization. Rejects
    * unknown node references, unbound sources and cycles. */
  def compile(graph: Map[String, Node], sources: Map[String, DataFrame],
      output: String): DataFrame = {
    val done = scala.collection.mutable.HashMap[String, DataFrame]()
    val visiting = scala.collection.mutable.HashSet[String]()
    def resolve(name: String): DataFrame = done.get(name).getOrElse {
      require(graph.contains(name), s"unknown node '$name'")
      require(visiting.add(name), s"workflow cycle through '$name'")
      val df = graph(name) match {
        case Source(table) =>
          require(sources.contains(table), s"unbound source '$table'")
          sources(table)
        case ApplyMapping(in, mapping) =>
          resolve(in).select(mapping.map { case (from, to, tpe) =>
            col(from).cast(tpe).as(to)
          }: _*)
        case FilterRows(in, predicate) => resolve(in).filter(expr(predicate))
        case EquiJoin(l, r, keys, how) => resolve(l).join(resolve(r), keys, how)
        case Aggregate(in, groupBy, aggs) =>
          require(aggs.nonEmpty,
            s"node '$name': Aggregate needs at least one aggregate")
          val exprs = aggs.map { case (alias, e) => expr(e).as(alias) }
          resolve(in).groupBy(groupBy.map(col): _*)
            .agg(exprs.head, exprs.tail: _*)
        case Union(branches) =>
          require(branches.size >= 2,
            s"node '$name': Union needs at least two branches")
          branches.map(resolve).reduce(_ unionByName _)
        case DropDuplicates(in, keys) =>
          val df = resolve(in)
          if (keys.isEmpty) df.dropDuplicates() else df.dropDuplicates(keys)
        case DropFields(in, fields) =>
          require(fields.nonEmpty,
            s"node '$name': DropFields needs at least one field")
          val df = resolve(in)
          val missing = fields.filterNot(df.columns.contains)
          require(missing.isEmpty,
            s"node '$name': DropFields names unknown fields $missing")
          df.drop(fields: _*)
      }
      visiting.remove(name)
      done(name) = df
      df
    }
    resolve(output)
  }
}
