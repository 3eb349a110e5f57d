package graft

import org.apache.spark.sql.functions._

/** The scaling study's conclusions rest on staging invariants — copies must
  * be content-disjoint (else the true near-dup pair count is itself
  * quadratic in the multiplier and every curve is meaningless) while
  * preserving the base corpus's blocking structure. Pin them on a planted
  * 3× inflation of the smallest fixture. */
class ScalingSpec extends SparkSpec {

  test("staged documents: copies are token- and gram-disjoint, blocks shared") {
    import spark.implicits._
    val dir = Scaling.stageFamily(spark, sf, 3,
      inflateDocs = true, inflateEmbEvents = false)
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val staged = spark.read.parquet(s"$dir/documents.parquet")
    val n = base.count()
    assert(staged.count() == 3 * n, "row count must scale by the multiplier")
    // every copy keeps the base n_chars (the length-band blocking input)
    // and plants the shared first token
    assert(staged.filter(!col("text").startsWith("blk ")).count() == 0,
      "planted shared leading token missing")
    val span = base.agg(max("doc_id")).head.getLong(0) + 1
    val tokensOf = (c: Int) => staged
      .filter(col("doc_id") >= c * span && col("doc_id") < (c + 1) * span)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "blk" && col("t") =!= "")
      .select("t").distinct().as[String].collect().toSet
    val (t0, t1, t2) = (tokensOf(0), tokensOf(1), tokensOf(2))
    assert((t0 & t1).isEmpty && (t0 & t2).isEmpty && (t1 & t2).isEmpty,
      s"copies share tokens: ${(t0 & t1) ++ (t0 & t2) ++ (t1 & t2)}")
  }

  test("staged events: disjoint isomorphic copy graphs, users/pages offset") {
    val dir = Scaling.stageFamily(spark, sf, 2,
      inflateDocs = false, inflateEmbEvents = true)
    val base = graft.core.Tables.events(spark, sf)
    val staged = graft.core.Tables.events(spark, dir)
    assert(staged.count() == 2 * base.count())
    // pages of copy 1 sit exactly 100 above copy 0's (disjoint vertex sets)
    val pages = staged
      .select(get_json_object(col("props"), "$.k").cast("long").as("p"))
      .agg(min("p"), max("p")).head()
    assert(pages.getLong(0) >= 0 && pages.getLong(1) >= 100,
      s"expected offset page range, got $pages")
    // the copy graphs are isomorphic: identical undirected edge counts
    val und = graft.queries.ClickGraph.und(spark, dir)
    val c0 = und.filter(col("u") < 100 && col("v") < 100).count()
    val c1 = und.filter(col("u") >= 100 && col("v") >= 100).count()
    val cross = und.filter((col("u") < 100) =!= (col("v") < 100)).count()
    assert(cross == 0, s"$cross edges cross copies — staging leaked")
    assert(c0 == c1, s"copy graphs differ: $c0 vs $c1 edges")
  }

  test("staged orders/lineitem: key-offset copies, calendar span and key domains preserved") {
    val dir = Scaling.stageFamily(spark, sf, 2,
      inflateDocs = false, inflateEmbEvents = false, inflateTpch = true)
    val bo = spark.read.parquet(s"$sf/orders.parquet")
    val bl = spark.read.parquet(s"$sf/lineitem.parquet")
    val so = spark.read.parquet(s"$dir/orders.parquet")
    val sl = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(so.count() == 2 * bo.count() && sl.count() == 2 * bl.count(),
      "fact rows must scale by the multiplier")
    // the CUSUM design point: the calendar is NOT inflated — the staged
    // daily table has exactly the base's day set
    val days = (df: org.apache.spark.sql.DataFrame) =>
      df.select(to_date(col("o_orderdate")).as("d")).distinct().count()
    assert(days(so) == days(bo), "calendar span must stay the base's")
    // the Space-Saving design point: the (flag, suppkey) key domain is
    // NOT inflated — eviction churn is preserved while n grows
    val keys = (df: org.apache.spark.sql.DataFrame) =>
      df.select("l_returnflag", "l_suppkey").distinct().count()
    assert(keys(sl) == keys(bl), "sketch key domain must stay the base's")
    // copies are row-disjoint on order keys, and lineitem stays
    // join-consistent with orders (both offset by the SAME span)
    val span = bo.agg(max("o_orderkey")).head.getLong(0) + 1
    assert(so.filter(col("o_orderkey") >= span).count() == bo.count(),
      "copy-1 orders must sit one span above copy 0")
    val orphans = sl.join(so, sl("l_orderkey") === so("o_orderkey"),
      "left_anti").count()
    assert(orphans == 0, s"$orphans staged lineitem rows lost their order")
    // round 15: the star-join contract — copy-i orders reference copy-i
    // customers (o_custkey offset by the CUSTOMER span), so the
    // orders⋈customer path measures real dim growth; FK coverage must be
    // exactly preserved (no staged order loses its customer), and copy-1
    // orders must sit one customer-span above copy 0
    val sc = spark.read.parquet(s"$dir/customer.parquet")
    val bc = spark.read.parquet(s"$sf/customer.parquet")
    assert(sc.count() == 2 * bc.count(), "customer dim must scale ×m")
    val cSpan = bc.agg(max("c_custkey")).head.getLong(0) + 1
    assert(so.filter(col("o_orderkey") >= span)
      .filter(col("o_custkey").isNotNull)
      .filter(col("o_custkey") < cSpan).count() == 0,
      "copy-1 orders must reference copy-1 customers")
    val custOrphans = so.filter(col("o_custkey").isNotNull)
      .join(sc, so("o_custkey") === sc("c_custkey"), "left_anti").count()
    val baseOrphans = bo.filter(col("o_custkey").isNotNull)
      .join(bc, bo("o_custkey") === bc("c_custkey"), "left_anti").count()
    assert(custOrphans == 2 * baseOrphans,
      s"staged FK coverage drifted: $custOrphans orphans vs base $baseOrphans×2")
  }

  test("staged embeddings: rotation preserves norms, ids offset") {
    val dir = Scaling.stageFamily(spark, sf, 2,
      inflateDocs = false, inflateEmbEvents = true)
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val staged = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(staged.count() == 2 * base.count())
    val span = base.agg(max("vec_id")).head.getLong(0) + 1
    // norms are pairwise identical between a vector and its rotated copy
    // (circular shift is an isometry), so per-copy norm sums agree exactly
    val normSq = aggregate(transform(col("embedding"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)
    val sums = staged.withColumn("c", (col("vec_id") / span).cast("int"))
      .groupBy("c").agg(sum(normSq).as("s")).orderBy("c")
      .collect().map(_.getDouble(1))
    assert(sums.length == 2 && math.abs(sums(0) - sums(1)) < 1e-6,
      s"copy norm sums diverge: ${sums.toSeq}")
  }

  test("letter bijections are pairwise distinct across the 156-family") {
    val perms = (0 until 156).map(Scaling.alphaPerm)
    assert(perms.distinct.size == perms.size, "bijection family collided")
    // each is a true bijection of the alphabet
    perms.foreach(p => assert(p.sorted == "abcdefghijklmnopqrstuvwxyz", p))
  }

  test("no multi-letter fixture token survives any bijection pair intact") {
    // the content-disjointness premise of every curve (alphaPerm scaladoc):
    // distinct bijections may agree on a few letters (reflection/
    // derangement families), so check the property that actually matters
    // against the REAL vocabulary — a token collides across copies i,j
    // iff every one of its letters lies in the i-vs-j agreement set. Only
    // the single-letter token "a" is permitted to (documented-harmless).
    // Bitmask form: 156 bijections = 12090 pairs; a token survives pair
    // (i,j) iff its 26-bit letter mask ⊆ the pair's agreement mask.
    import spark.implicits._
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) >= 2)
      .distinct().as[String].collect()
    assert(vocab.nonEmpty, "fixture vocabulary unexpectedly empty")
    def maskOf(s: String): Int =
      s.foldLeft(0)((m, c) =>
        if (c >= 'a' && c <= 'z') m | (1 << (c - 'a')) else m)
    val vocabMasks = vocab.map(t => t -> maskOf(t)).filter(_._2 != 0)
    val perms = (0 until 156).map(Scaling.alphaPerm)
    val offenders = for {
      i <- 0 until 156; j <- (i + 1) until 156
      agree = (0 until 26).filter(c => perms(i)(c) == perms(j)(c))
        .foldLeft(0)((m, c) => m | (1 << c))
      if agree != 0
      (t, m) <- vocabMasks if (m & ~agree) == 0
    } yield (i, j, t)
    assert(offenders.isEmpty,
      s"tokens collide across copies: ${offenders.take(10)}")
  }
}
