package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tier A unit-tier assertions (SURVEY §5.2): CSV serde edge cases, add-only
  * schema evolution, bookmark no-reprocess, event-filter exclusion. */
class EtlSpec extends SparkSpec {

  test("A2: CSV round-trips quotes, commas, newlines, backslashes") {
    import spark.implicits._
    val dir = tmpDir("csv_rt")
    val rows = Seq(
      (1L, """plain"""),
      (2L, """has,comma"""),
      (3L, """has"quote"""),
      (4L, "has\nnewline"),
      (5L, """has\backslash"""),
      (6L, """both",and\more"""))
    val df = rows.toDF("id", "s")
    CsvSource.write(df, dir)
    val back = CsvSource.read(spark, dir,
        Some(StructType(Seq(StructField("id", LongType), StructField("s", StringType)))))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(back == rows)
  }

  test("A5: add-only merge keeps existing types, appends new fields") {
    val v1 = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType)))
    val v2 = StructType(Seq(
      StructField("a", LongType), // retype attempt — must be ignored
      StructField("b", StringType),
      StructField("c", DoubleType, nullable = false))) // new — appended nullable
    val merged = SchemaEvolution.addOnlyMerge(v1, v2)
    assert(merged.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(merged("a").dataType == IntegerType, "existing field was retyped")
    assert(merged("c").dataType == DoubleType)
    assert(merged("c").nullable, "appended field must be nullable")
    // idempotent + drop attempt does not drop
    assert(SchemaEvolution.addOnlyMerge(merged, v2) == merged)
    assert(SchemaEvolution.addOnlyMerge(merged, StructType(Seq(v1("a")))) == merged)
  }

  test("A5: crawler re-crawl applies the add-only policy") {
    val dir1 = tmpDir("crawl1"); val dir2 = tmpDir("crawl2")
    import graft.core.Tables
    val crawler = new Crawler(spark)
    CsvSource.write(Tables.region(spark, sf), dir1)
    crawler.crawl(dir1, "evo_spec_region")
    CsvSource.write(Tables.region(spark, sf)
      .withColumn("r_extra", lit(1.5)), dir2)
    val df2 = crawler.crawl(dir2, "evo_spec_region")
    val sch = crawler.schemaOf("evo_spec_region").get
    assert(sch.fieldNames.toSeq == Seq("r_regionkey", "r_name", "r_extra"))
    assert(df2.count() == 5)
  }

  test("A3c: crawler infers and registers every lake format the engine reads") {
    import graft.core.Tables
    val crawler = new Crawler(spark)
    val nation = Tables.nation(spark, sf)
    val jd = tmpDir("crawl_json"); val od = tmpDir("crawl_orc")
    nation.write.mode("overwrite").json(jd)
    nation.write.mode("overwrite").orc(od)
    assert(crawler.crawl(jd, "crawl_spec_json", "json").count() == 25)
    assert(crawler.crawl(od, "crawl_spec_orc", "orc").count() == 25)
    // ORC preserves the written schema exactly; JSON infers (alphabetical
    // field order, widened ints) but must keep all columns
    assert(crawler.schemaOf("crawl_spec_orc").get.fieldNames.toSeq ==
      nation.schema.fieldNames.toSeq)
    assert(crawler.schemaOf("crawl_spec_json").get.fieldNames.sorted.toSeq ==
      nation.schema.fieldNames.sorted.toSeq)
    assert(spark.table("crawl_spec_json").count() == 25)
  }

  test("A3b: one crawl run over a parent path registers one table per child") {
    import graft.core.Tables
    val parent = tmpDir("crawl_multi")
    CsvSource.write(Tables.region(spark, sf), s"$parent/region_ds")
    CsvSource.write(Tables.nation(spark, sf), s"$parent/nation_ds")
    val crawler = new Crawler(spark)
    val tables = crawler.crawlChildren(parent, namePrefix = "multi_")
    assert(tables.keySet == Set("multi_region_ds", "multi_nation_ds"))
    assert(crawler.schemaOf("multi_region_ds").get.fieldNames.toSeq ==
      Seq("r_regionkey", "r_name"))
    assert(spark.table("multi_nation_ds").count() == 25)
    assert(spark.table("multi_region_ds").count() == 5)
  }

  test("A8: bookmark runs never reprocess already-seen files") {
    val src = tmpDir("bm_src"); val ckpt = tmpDir("bm_ckpt"); val sink = tmpDir("bm_sink")
    import graft.core.Tables
    val n = Tables.nation(spark, sf)
    n.filter(col("n_nationkey") < 10)
      .write.options(CsvSource.options).mode("append").csv(src)
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 10)
    // no new files → second run emits nothing new
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 10, "re-run reprocessed old files")
    // one new batch → exactly its rows are appended
    n.filter(col("n_nationkey") >= 10)
      .write.options(CsvSource.options).mode("append").csv(src)
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 25)
  }

  test("A8b: incremental path round-trips embedded newlines (multiLine)") {
    import spark.implicits._
    val src = tmpDir("bm_nl_src"); val ckpt = tmpDir("bm_nl_ckpt")
    val sink = tmpDir("bm_nl_sink")
    val rows = Seq((1L, "plain"), (2L, "line1\nline2"), (3L, "a,\"q\"\nb"))
    CsvSource.write(rows.toDF("id", "s"), src)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    Incremental.runAvailableNow(spark, src, schema, ckpt, sink)
    val back = spark.read.parquet(sink).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(back == rows, s"incremental CSV read corrupted quoted newlines: $back")
  }

  test("A8c: checkpoint reset rewinds the bookmark — same files reprocess") {
    val src = tmpDir("bm_rw_src"); val ckpt = tmpDir("bm_rw_ckpt")
    val sink1 = tmpDir("bm_rw_sink1"); val sink2 = tmpDir("bm_rw_sink2")
    import graft.core.Tables
    val n = Tables.nation(spark, sf)
    n.filter(col("n_nationkey") < 10)
      .write.options(CsvSource.options).mode("append").csv(src)
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink1)
    assert(spark.read.parquet(sink1).count() == 10)
    // control: a fresh sink with the LIVE bookmark sees nothing — the
    // checkpoint, not the sink, is what remembers processed files
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink2)
    def dataFiles(dir: String): Int = {
      val f = new java.io.File(dir)
      if (!f.exists()) 0
      else f.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(dataFiles(sink2) == 0,
      "live bookmark must not reprocess into a fresh sink")
    // rewind: the bookmark forgets everything; the rerun re-emits the
    // already-seen batch into the rebuilt target (Glue reset semantics)
    Incremental.resetCheckpoint(spark, ckpt)
    Incremental.runAvailableNow(spark, src, n.schema, ckpt, sink2)
    assert(spark.read.parquet(sink2).count() == 10,
      "after reset the same files must reprocess")
  }

  test("A9: suffix filter excludes non-matching files") {
    val src = tmpDir("ev_src"); val ckpt = tmpDir("ev_ckpt"); val sink = tmpDir("ev_sink")
    import graft.core.Tables
    val r = Tables.region(spark, sf)
    CsvSource.write(r, src)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/decoy.txt"),
      "r_regionkey,r_name\n99,DECOY\n")
    Incremental.runAvailableNow(spark, src, r.schema, ckpt, sink, Some("*.csv"))
    val out = spark.read.parquet(sink)
    assert(out.count() == 5)
    assert(out.filter(col("r_name") === "DECOY").count() == 0)
  }

  test("A12: compaction reduces file count without losing rows") {
    import graft.core.Tables
    val src = tmpDir("compact_src"); val out = tmpDir("compact_out")
    Tables.nation(spark, sf).repartition(12).write.mode("overwrite").parquet(src)
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 12)
    spark.read.parquet(src).coalesce(1).write.mode("overwrite").parquet(out)
    assert(parquetFiles(out) == 1, "compaction must merge to the target count")
    assert(spark.read.parquet(out).count() == Tables.nation(spark, sf).count())
  }

  test("A4: partition filters prune key=value directories at the scan") {
    val dir = tmpDir("part_prune")
    import graft.core.Tables
    Tables.orders(spark, sf).write.partitionBy("o_orderstatus")
      .mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("o_orderstatus"),
      s"partition filter not pushed:\n$plan")
    // pruning means only the F partition's files are read
    assert(filtered.count() ==
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count())
  }

  test("A6: JDBC sink round-trips through embedded Derby") {
    import graft.core.Tables
    val sinkObj = JdbcSink(s"jdbc:derby:${tmpDir("derby_spec")}/db;create=true",
      "REGION_RT")
    sinkObj.write(Tables.region(spark, sf))
    val back = sinkObj.read(spark)
    assert(back.count() == 5)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("r_regionkey", "r_name"))
  }

  test("A7b: a fan-in job starts only after ALL watched crawls complete") {
    import graft.core.Tables
    // two crawlers feed one job; nodes declared join-first so only the
    // watch edges (not declaration order) can produce a correct schedule
    val order = scala.collection.mutable.ArrayBuffer[String]()
    def mark(name: String, df: org.apache.spark.sql.DataFrame) = {
      order += name; df
    }
    val results = Workflow.run(Seq(
      Workflow.node("join", "crawl_a", "crawl_b") { up =>
        assert(up.keySet == Set("crawl_a", "crawl_b"),
          "the AND-gate must hand the job exactly its watched upstreams")
        mark("join", up("crawl_a").unionByName(up("crawl_b")))
      },
      Workflow.node("crawl_a")(_ => mark("crawl_a", Tables.region(spark, sf))),
      Workflow.node("crawl_b")(_ => mark("crawl_b", Tables.region(spark, sf)))))
    assert(order.indexOf("join") > order.indexOf("crawl_a"))
    assert(order.indexOf("join") > order.indexOf("crawl_b"))
    assert(results("join").count() == 10)
  }

  test("A7b: a failed crawl halts the DAG — downstream never runs, nothing loads") {
    import graft.core.Tables
    val out = tmpDir("wf_fail_sink") + "/never_written"
    var joined = false
    val boom = intercept[RuntimeException] {
      Workflow.run(Seq(
        Workflow.node("crawl_a")(_ => Tables.region(spark, sf)),
        Workflow.node("crawl_b")(_ => sys.error("crawler timeout")),
        Workflow.node("join", "crawl_a", "crawl_b") { up =>
          joined = true; up("crawl_a")
        },
        Workflow.node("load", "join") { up =>
          ParquetSink(out).write(up("join")); up("join")
        }))
    }
    assert(boom.getMessage.contains("crawler timeout"))
    assert(!joined, "job gated on the failed crawl must not have run")
    assert(!new java.io.File(out).exists(), "nothing may land in the sink")
  }

  test("A7d: scheduled trigger fires once per period slot, coalescing missed windows") {
    import graft.core.Tables
    var runs = 0
    val trig = new ScheduledTrigger(Seq(
      Workflow.node("crawl")(_ => { runs += 1; Tables.region(spark, sf) })),
      startAt = 1000L, period = 10L)
    assert(trig.poll(999L).isEmpty && runs == 0, "before start: never fires")
    assert(trig.poll(1000L).nonEmpty && runs == 1 && trig.nextDue == 1010L)
    assert(trig.poll(1009L).isEmpty && runs == 1, "inside the slot: no refire")
    // the clock jumps three periods: ONE coalesced run, cadence resumes
    // from the slot after the poll that fired — never a backlog of runs
    assert(trig.poll(1035L).nonEmpty && runs == 2 && trig.nextDue == 1040L)
    assert(trig.poll(1039L).isEmpty && runs == 2)
    assert(trig.poll(1040L).nonEmpty && runs == 3 && trig.nextDue == 1050L)
    assert(trig.firedCount == 3)
  }

  test("A7d: poll-per-tick replays the workflow_scheduled fire rule") {
    // bursts and gaps: fires must be exactly the first tick of each
    // non-empty slot — the rule the oracle-checked query computes in one
    // groupBy (slots of width 10 anchored at 0: 0,1 | 12,13 | 25,26,27 |
    // 59 | 61 → fire at 0, 12, 25, 59, 61)
    val ticks = Seq(0L, 1L, 12L, 13L, 25L, 26L, 27L, 59L, 61L)
    val trig = new ScheduledTrigger(Seq(
      Workflow.node("crawl")(_ => graft.core.Tables.region(spark, sf))),
      startAt = 0L, period = 10L)
    val fired = ticks.filter(t => trig.poll(t).nonEmpty)
    assert(fired == Seq(0L, 12L, 25L, 59L, 61L),
      s"fires must be first-tick-per-slot, got $fired")
  }

  test("A7b: workflow rejects cycles and unknown watch targets") {
    val id = (up: Map[String, org.apache.spark.sql.DataFrame]) =>
      up.values.headOption.getOrElse(graft.core.Tables.region(spark, sf))
    intercept[IllegalArgumentException] {
      Workflow.run(Seq(Workflow.node("a", "b")(id), Workflow.node("b", "a")(id)))
    }
    intercept[IllegalArgumentException] {
      Workflow.run(Seq(Workflow.node("a", "ghost")(id)))
    }
  }

  test("A7c: visual-job node boundaries are invisible to the optimizer") {
    // a filter declared LATE in the graph (after the join node) must still
    // reach the parquet scan — the single-plan compilation claim
    import VisualJob._
    val graph = Map[String, Node](
      "orders" -> Source("orders"),
      "customer" -> Source("customer"),
      "cust_slim" -> ApplyMapping("customer", Seq(
        ("c_custkey", "o_custkey", "bigint"),
        ("c_mktsegment", "segment", "string"))),
      "joined" -> EquiJoin("orders", "cust_slim", Seq("o_custkey")),
      "late_filter" -> FilterRows("joined", "o_totalprice > 100000"))
    val df = compile(graph, Map(
      "orders" -> graft.core.Tables.orders(spark, sf),
      "customer" -> graft.core.Tables.customer(spark, sf)), "late_filter")
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("GreaterThan(o_totalprice,100000.0)"),
      s"late filter did not push to the scan:\n$scans")
    // the mapping node's column pruning reaches the customer scan too
    assert(scans.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"),
      s"mapping node did not prune the customer scan:\n$scans")
  }

  test("A7c: optimization passes through Union/DropFields/DropDuplicates nodes") {
    // r7 verdict #2: the three remaining Studio palette members. The graph
    // unions two branches of the same table, drops columns, filters late,
    // then dedupes by key — the single-plan property means the late filter
    // must reach BOTH parquet scans below the Union and the drop must
    // prune the scans' ReadSchema.
    import VisualJob._
    val graph = Map[String, Node](
      "o1" -> Source("orders_a"),
      "o2" -> Source("orders_b"),
      "both" -> Union(Seq("o1", "o2")),
      "slim" -> DropFields("both", Seq("o_orderpriority", "o_orderdate")),
      "late_filter" -> FilterRows("slim", "o_totalprice > 100000"),
      "dedup" -> DropDuplicates("late_filter", Seq("o_orderkey")))
    val orders = graft.core.Tables.orders(spark, sf)
    val df = compile(graph,
      Map("orders_a" -> orders, "orders_b" -> orders), "dedup")
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "GreaterThan\\(o_totalprice,100000.0\\)".r
      .findAllIn(plan).size
    assert(pushed >= 2,
      s"late filter must push to both scans under the Union ($pushed):\n$plan")
    assert(!plan.contains("o_orderpriority"),
      s"DropFields must prune the dropped columns out of the scans:\n$plan")
    // dedup-by-key collapses the two identical branches back to one
    assert(df.count() ==
      orders.filter(col("o_totalprice") > 100000).count())
    // whole-row variant: duplicate rows from the self-union collapse too
    val whole = compile(
      graph.updated("dedup", DropDuplicates("late_filter")),
      Map("orders_a" -> orders, "orders_b" -> orders), "dedup")
    assert(whole.count() == df.count())
    // n-ary requirement is enforced at compile
    intercept[IllegalArgumentException] {
      compile(Map[String, Node]("u" -> Union(Seq("o1"))),
        Map("orders_a" -> orders), "u")
    }
    intercept[IllegalArgumentException] {
      compile(Map[String, Node](
        "o1" -> Source("orders_a"),
        "d" -> DropFields("o1", Seq("ghost_col"))),
        Map("orders_a" -> orders), "d")
    }
  }

  test("A15b: partition fingerprints roll up to the table fingerprint") {
    // the shared-recipe contract: sum/xor/min/max of the per-year digests
    // must reproduce the table digest EXACTLY (same h values, all four
    // aggregates associative-commutative) — if the two keys ever used
    // different canonicalizations this identity would break immediately
    val table = graft.SparkEntry.queries("etl_table_fingerprint")(spark, sf)
      .collect().head
    val parts = graft.SparkEntry.queries("etl_partition_fingerprint")(spark, sf)
      .collect()
    assert(parts.length > 1, "fixture should span multiple order years")
    assert(parts.map(_.getAs[Long]("n_rows")).sum ==
      table.getAs[Long]("n_rows"))
    assert(parts.map(_.getAs[Long]("hash_sum")).sum ==
      table.getAs[Long]("hash_sum"))
    assert(parts.map(_.getAs[Long]("hash_xor")).reduce(_ ^ _) ==
      table.getAs[Long]("hash_xor"))
    assert(parts.map(_.getAs[Long]("hash_min")).min ==
      table.getAs[Long]("hash_min"))
    assert(parts.map(_.getAs[Long]("hash_max")).max ==
      table.getAs[Long]("hash_max"))
  }

  test("r14c: the bloom layout actually writes a bloom for the key column — footer-verified") {
    // parquet-mr silently skips blooms for fully dictionary-encoded
    // columns (the dictionary is already an exact membership filter) —
    // the first write of this key produced offset=-1 on every column and
    // only this check caught it. Pin: the written footer carries a bloom
    // for o_custkey and for no other column.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    val out = graft.core.Tables.scratchDir("graft_bloomspec")
    graft.core.Tables.orders(spark, sf).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_custkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
      .option("parquet.enable.dictionary#o_custkey", "false")
      .parquet(out)
    val conf = new Configuration()
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val withBloom = cols.filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString).toSet
      assert(withBloom == Set("o_custkey"),
        s"expected a bloom on o_custkey only, footer has: $withBloom")
    } finally reader.close()
  }

  test("r14c: the as-of join's row-preservation invariant holds — no event predates the dim open") {
    // etl_dim_asof_join/stream_dim_asof derive their oracle from change
    // predicates with no date lower bound, while the Spark interval join
    // drops any event before the 2024-01-01 version open. The fixture
    // satisfies 'min event day >= dim open' today; this pin turns that
    // hidden invariant into a loud failure if the fixture regenerates
    // with earlier timestamps, plus the row-count preservation itself.
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf)
    val minDay = ev.agg(min(to_date(col("ts")))).head.getDate(0)
    assert(!minDay.before(java.sql.Date.valueOf("2024-01-01")),
      s"events predate the SCD2 open: min day $minDay")
    val joined = graft.SparkEntry.queries("etl_dim_asof_join")(spark, sf).count()
    val raw = ev.join(graft.core.Tables.customer(spark, sf),
      col("user_id") === col("c_custkey")).count()
    assert(joined == raw,
      s"as-of join changed the fact row count: $joined vs $raw")
  }

  test("A7c: visual-job compile rejects cycles, unknown nodes, unbound sources") {
    import VisualJob._
    val src = Map("orders" -> graft.core.Tables.orders(spark, sf))
    intercept[IllegalArgumentException] {
      compile(Map[String, Node](
        "a" -> FilterRows("b", "1=1"), "b" -> FilterRows("a", "1=1")), src, "a")
    }
    intercept[IllegalArgumentException] {
      compile(Map[String, Node]("a" -> FilterRows("ghost", "1=1")), src, "a")
    }
    intercept[IllegalArgumentException] {
      compile(Map[String, Node]("a" -> Source("missing")), src, "a")
    }
  }
}
