package graft

import graft.etl.{CsvSource, SchemaEvolution}
import graft.functions.RollingHash
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based assertions (SURVEY §5.2.3) via raw ScalaCheck: CSV
  * round-trip identity under adversarial strings, schema-merge laws,
  * fingerprint determinism. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, tries: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tries), prop)
    assert(res.passed, res.status.toString)
  }

  // strings drawn from the characters that break naive CSV writers
  private val nastyString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\\', '\n', ' ')))
      .map(_.mkString)

  test("TopKAggregator is split-invariant: any partitioning gives sorted top-k") {
    import org.scalacheck.Arbitrary.arbitrary
    val agg = new graft.operators.TopKAggregator(3)
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), arbitrary[Long]))
    val prop = Prop.forAll(rows, Gen.chooseNum(0, 10)) { (xs, cut) =>
      // reference: global sort
      val expect = xs.sortBy { case (v, id) => (-v, id) }.take(3)
      // aggregator: reduce two arbitrary splits independently, then merge —
      // the partial-aggregation execution shape
      val (l, r) = xs.splitAt(math.min(cut, xs.size))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(bufL, bufR)).toList == expect
    }
    check(prop)
  }

  test("CSV PERMISSIVE mode nulls malformed cells instead of failing the read") {
    val dir = tmpDir("csv_permissive")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,n\n1,10\n2,not_a_number\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    val back = CsvSource.read(spark, dir, Some(schema))
      .orderBy("id").collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(back.toSeq == Seq((1L, false), (2L, true), (3L, false)),
      s"malformed cell handling: ${back.toSeq}")
  }

  test("token_ngram_hashes matches a plain-Scala xxhash64 fold") {
    import org.scalacheck.Arbitrary.arbitrary
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import spark.implicits._
    val prop = Prop.forAll(Gen.listOf(arbitrary[Long]), Gen.chooseNum(1, 5)) {
      (hs, n) =>
        val viaSpark = Seq(Tuple1(hs)).toDF("h")
          .select(graft.functions.TokenNgramHashes
            .token_ngram_hashes(org.apache.spark.sql.functions.col("h"), n))
          .head().getSeq[Long](0).toList
        val expect = (0 until math.max(hs.length - n + 1, 1)).map { i =>
          hs.slice(i, i + n).foldLeft(42L)((acc, h) => XXH64.hashLong(h, acc))
        }.toList
        viaSpark == expect
    }
    check(prop, tries = 15)
  }

  test("CSV write-then-read is the identity on adversarial strings") {
    import spark.implicits._
    // One batched property: sample N nasty strings, round-trip them together
    // (per-sample Spark jobs would be prohibitively slow).
    val samples = Gen.listOfN(60, nastyString).sample.get.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val dir = tmpDir("csv_prop")
    CsvSource.write(samples.toDF("id", "s"), dir)
    val back = CsvSource.read(spark, dir,
        Some(StructType(Seq(StructField("id", LongType), StructField("s", StringType)))))
      .as[(Long, String)].collect().toMap
    samples.foreach { case (id, s) =>
      // empty string is indistinguishable from null in CSV — both map to null
      val expected = if (s.isEmpty) null else s
      assert(back(id) == expected, s"id=$id ${s.take(30).replace("\n", "\\n")}")
    }
  }

  test("schema merge is idempotent and add-order-insensitive in field set") {
    val field: Gen[StructField] = for {
      name <- Gen.oneOf("a", "b", "c", "d", "e", "f")
      dt <- Gen.oneOf[DataType](IntegerType, LongType, StringType, DoubleType)
    } yield StructField(name, dt)
    val schema: Gen[StructType] =
      Gen.listOf(field).map(fs => StructType(fs.distinctBy(_.name)))
    check(Prop.forAll(schema, schema) { (s1, s2) =>
      val m = SchemaEvolution.addOnlyMerge(s1, s2)
      // idempotence
      SchemaEvolution.addOnlyMerge(m, s2) == m &&
      // existing fields never retyped
      s1.fields.forall(f => m(f.name).dataType == f.dataType) &&
      // field set = union of names
      m.fieldNames.toSet == s1.fieldNames.toSet ++ s2.fieldNames.toSet
    })
  }

  test("sorted_intersect_count equals array_intersect size (long + string)") {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"),
        sorted_intersect_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("e"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"row ${r.getInt(0)}"))
    // string variant (binary UTF8 order must match sort_array's)
    val sdf = rows.map { case (i, a, b) => (i, a.map("w" + _), b.map("w" + _)) }
      .toDF("i", "a", "b")
      .select(col("i"), sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val sgot = sdf.select(col("i"),
        sorted_intersect_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("e"))
      .collect()
    sgot.foreach(r => assert(r.getInt(1) == r.getInt(2), s"row ${r.getInt(0)}"))
  }

  test("ngram_hashes equals the composable sort/distinct/xxhash form") {
    import graft.functions.CharNgramHashes.ngram_hashes
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Seq("", "a", "ab", "abc", "abcd", "hello world hello",
      "aaaaaaa", "the quick brown fox", "x" * 500)
    val df = samples.zipWithIndex.map(_.swap).toDF("i", "text")
    val composable = expr("sort_array(array_distinct(transform(" +
      "sequence(1, greatest(length(text) - 2, 1)), i -> xxhash64(substring(text, i, 3)))))")
    val bad = df.select(col("i"), composable.as("a"),
        ngram_hashes(col("text"), 3).as("b"))
      .filter(not(col("a") === col("b"))).collect()
    assert(bad.isEmpty, s"mismatch rows: ${bad.map(_.getInt(0)).toSeq}")
  }

  test("as-of join preserves left cardinality and never matches forward") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one batched property run: random keys/times, both invariants checked
    // row-by-row against the operator output
    val rnd = new scala.util.Random(23)
    val left = Seq.fill(200)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      .toDF("k", "t")
    val right = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      .distinct.map { case (k, t) => (k, t, t * 10 + k) }.toDF("k", "rt", "v")
    val out = graft.operators.AsOfJoin
      .backward(left, right, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("asof.rt").as("rt"))
      .collect()
    assert(out.length == left.count(), "left-outer: one row out per row in")
    out.foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getLong(2) <= r.getLong(1),
          s"forward match: rt=${r.getLong(2)} > t=${r.getLong(1)}")
    }
  }

  test("int8 quantization round-trips within half a quantization step") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("scale", lit(127.0) /
        nullif(array_max(transform(col("embedding"),
          x => abs(x.cast("double")))), lit(0.0)))
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * col("scale") + 0.5).cast("int")))
    val got = df.collect()
    got.foreach { r =>
      val scale = r.getDouble(2)
      val emb = r.getSeq[Float](1); val q = r.getSeq[Int](3)
      q.foreach(qi => assert(math.abs(qi) <= 127, s"|q|>127: $qi"))
      emb.zip(q).foreach { case (x, qi) =>
        val err = math.abs(x.toDouble - qi / scale)
        assert(err <= 0.5 / scale + 1e-12,
          s"dequant error $err > half step ${0.5 / scale}")
      }
    }
  }

  test("skyline window plan agrees with brute-force dominance on random points") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // random (price, size) points with deliberate duplicates and price
    // ties; the O(n log n) distinct-price window plan (the pareto_frontier
    // shape) must keep exactly the non-dominated set
    val rnd = new scala.util.Random(41)
    val pts = Seq.fill(400)((rnd.nextInt(40).toDouble, rnd.nextInt(40)))
      .zipWithIndex.map { case ((p, sz), i) => (i.toLong, p, sz) }
    val df = pts.toDF("id", "price", "size")
    val byPrice = df.groupBy("price").agg(max(col("size")).as("gmax"))
    val ord = Window.orderBy("price")
    val cheaperMax = byPrice
      .withColumn("cmax", max(col("gmax")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_max", lag(col("cmax"), 1).over(ord))
      .select("price", "gmax", "prev_max")
    val got = df.join(cheaperMax, Seq("price"))
      .filter(col("size") === col("gmax") &&
        (col("prev_max").isNull || col("prev_max") < col("size")))
      .select("id").collect().map(_.getLong(0)).toSet
    val brute = pts.filter { case (_, p, sz) =>
      !pts.exists { case (_, bp, bsz) =>
        bp <= p && bsz >= sz && (bp < p || bsz > sz) }
    }.map(_._1).toSet
    assert(got == brute,
      s"skyline mismatch: extra=${got -- brute} missing=${brute -- got}")
  }

  test("overlap chunks tile the token stream: coverage, stride, reconstruction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val W = 64; val S = 48
    val rnd = new scala.util.Random(43)
    // doc lengths straddle every boundary case: empty-ish, < W, = W, = W+1,
    // multiples of the stride, long tails
    val lens = Seq(1, 5, W - 1, W, W + 1, W + S, W + S + 1, 200, 500) ++
      Seq.fill(20)(1 + rnd.nextInt(400))
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks", when(col("n") <= W, lit(1))
        .otherwise(lit(1) + expr(s"(n - $W + ${S - 1}) div $S")))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(W), col("n") - col("chunk_idx") * S).as("chunk_len"),
        array_join(slice(col("toks"), col("chunk_idx") * S + 1, lit(W)), " ")
          .as("chunk_text"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).toSeq).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val cs = chunks(id)
      // every chunk is exactly the stride-offset window of the original
      cs.foreach { r =>
        val idx = r.getLong(1).toInt
        val expected = toks.slice(idx * S, math.min(idx * S + W, toks.length))
        assert(r.getString(3) == expected.mkString(" "),
          s"doc $id chunk $idx text mismatch")
        assert(r.getLong(2) == expected.length,
          s"doc $id chunk $idx length mismatch")
      }
      // chunks cover the whole stream: the last chunk reaches the end and
      // consecutive chunks overlap by exactly W - S tokens (when full)
      val last = cs.last
      assert(last.getLong(1) * S + last.getLong(2) == toks.length,
        s"doc $id: last chunk does not reach the end")
      // stitching non-overlap prefixes + the last chunk rebuilds the doc
      val rebuilt = (cs.init.map(_.getString(3).split(" ").take(S)) :+
        cs.last.getString(3).split(" ")).flatten
      assert(rebuilt.sameElements(toks), s"doc $id: reconstruction differs")
    }
  }

  test("canonical_url scanner matches the 8-regex reference chain on adversarial URLs") {
    // the kernel replaced a chain of regexp_replace calls; this fuzz pins
    // step-for-step parity against the chain itself (java.util.regex, the
    // same engine Spark's regexp_replace uses). ASCII single-line inputs —
    // the kernel's documented domain.
    def referenceChain(u: String): String = {
      var s = u.replaceAll("#.*$", "").toLowerCase(java.util.Locale.ROOT)
      s = s.replaceAll("^http://", "https://")
      s = s.replaceAll("://www\\.", "://")
      s = s.replaceAll(":443/", "/")
      s = s.replaceAll("[?&]utm_[^&#]*", "")
      s = s.replaceAll("^([^?&]*)&", "$1?")
      s = s.replaceAll("/$", "")
      s.replaceAll("\\?$", "")
    }
    val piece = Gen.oneOf("http://", "https://", "HTTP://", "www.", "WWW.",
      "shop.example.com", ":443", ":8080", "/item/7", "/", "?", "&",
      "utm_source=x", "utm_", "UTM_A=1", "ref=abc", "#frag", "#", "a b",
      "?utm_x=1&ref=2", "&utm_y", "://www.www.", ":443/:443/",
      "ÉXAMPLE.COM", "Müller", "straße")
    val urlish: Gen[String] = Gen.listOf(piece).map(_.mkString)
    check(Prop.forAll(urlish) { u =>
      graft.functions.CanonicalUrl.canonicalize(u) == referenceChain(u)
    }, tries = 200)
    // and the fixture's five variant shapes explicitly
    Seq("https://www.shop.example.com/item/3",
      "HTTPS://WWW.SHOP.EXAMPLE.COM/item/3/",
      "https://shop.example.com:443/item/3?utm_source=x&utm_campaign=y",
      "http://shop.example.com/item/3?ref=abc&utm_medium=z#frag",
      "https://shop.example.com/item/3?utm_source=q&ref=abc")
      .foreach { u =>
        assert(graft.functions.CanonicalUrl.canonicalize(u) == referenceChain(u),
          s"variant diverged: $u")
      }
    // canonicalization is idempotent on WELL-FORMED urls — a cache keyed
    // on canonical URLs may re-canonicalize a stored key and must get the
    // same key back. (Degenerate non-URLs like "//" are not idempotent
    // under the regex chain either: each pass strips one trailing slash.)
    val wellFormed: Gen[String] = for {
      scheme <- Gen.oneOf("http://", "https://", "HTTP://")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("shop.example.com", "ÉXAMPLE.com", "a.b")
      port <- Gen.oneOf("", ":443", ":8080")
      segs <- Gen.listOf(Gen.oneOf("item", "7", "x"))
      params <- Gen.listOf(Gen.oneOf("utm_a=1", "utm_b", "ref=2", "a=b"))
      frag <- Gen.oneOf("", "#frag")
      slash <- Gen.oneOf("", "/")
    } yield scheme + www + host + port + segs.map("/" + _).mkString +
      (if (params.isEmpty) "" else "?" + params.mkString("&")) + slash + frag
    check(Prop.forAll(wellFormed) { u =>
      val once = graft.functions.CanonicalUrl.canonicalize(u)
      graft.functions.CanonicalUrl.canonicalize(once) == once
    }, tries = 200)
  }

  test("simhash64 matches a straightforward majority-vote reference") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent reference: per bit, sum ±1 votes over the hashes, set
    // the bit iff strictly positive — written over boxed Seq[Long] with no
    // shared code with the kernel's primitive-array walk
    def ref(hs: Seq[Long]): Long = {
      var out = 0L
      (0 until 64).foreach { b =>
        val v = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (v > 0) out |= 1L << b
      }
      out
    }
    val rnd = new scala.util.Random(53)
    // adversarial sizes: single element (result == element), even counts
    // (tied bits → 0), all-same, and random fills
    val arrays: Seq[Seq[Long]] =
      Seq(Seq(7L), Seq(-1L, -1L), Seq(0L, -1L), Seq.fill(5)(Long.MinValue)) ++
        (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong()))
    val got = arrays.zipWithIndex.map(_.swap).toDF("i", "hs")
      .select(col("i"), graft.functions.SimHash64.simhash64(col("hs")).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    arrays.zipWithIndex.foreach { case (hs, i) =>
      assert(got(i) == ref(hs), s"array $i: got ${got(i)} want ${ref(hs)}")
    }
    // empty array → null (the kernel's documented degenerate contract)
    val empty = Seq((0, Seq.empty[Long])).toDF("i", "hs")
      .select(graft.functions.SimHash64.simhash64(col("hs"))).head()
    assert(empty.isNullAt(0), "simhash64 of empty array must be null")
  }

  test("dsir_importance: every bucket log-ratio sits far from its q8 rounding boundary") {
    // the one transcendental in dsir_importance is ln of an exact rational,
    // half-up quantized at 1e-8 (floor(x·1e8+0.5)); the quantization is
    // engine-safe only if no value sits within libm ulp noise (~1e-15
    // unscaled) of a boundary. Re-derives the bucket counts exactly as the
    // query does (md5 hex digits 25-28 of the token, mod 256) on the live
    // fixtures and asserts the measured margin (scaladoc records ~2.9e-11;
    // re-measure if the fixture changes).
    import org.apache.spark.sql.functions._
    val B = 256
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val hx = md5(col("tok"))
      def hexVal(i: Int) = {
        val c = substring(hx, i, 1)
        when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)
      }
      val fold = (25 until 29).map(hexVal).reduce(_ * 16 + _)
      val counts = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", fold % B)
        .groupBy("b").agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"),
          count(lit(1)).as("n_r"))
        .collect()
      assert(counts.nonEmpty)
      val tt = counts.map(_.getLong(1)).sum
      val rr = counts.map(_.getLong(2)).sum
      val minDist = counts.map { r =>
        val x = (r.getLong(1) + 1).toDouble * (rr + B).toDouble /
          ((r.getLong(2) + 1).toDouble * (tt + B).toDouble)
        val y = math.log(x) * 1e8 + 0.5
        math.abs(y - math.rint(y)) / 1e8
      }.min
      assert(minDist > 1e-12,
        s"$dir: min boundary distance $minDist within libm noise range")
    }
  }

  test("perplexity_bigram_doc: every bigram-type log-prob sits far from its q6 rounding boundary") {
    // same transcendental discipline as the dsir test above, at the q6
    // spacing the query uses (q8 measured too tight at ~2.8e-12 for the
    // ~916-type bigram table; q6 gives ~1.1e-9, ~6 orders above libm ulp
    // noise — re-measure if the fixture changes).
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val toks = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "w")))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val big = toks.withColumn("w2", lead(col("w"), 1).over(byDoc))
        .filter(col("w2").isNotNull)
        .select(col("w").as("w1"), col("w2"))
      val v = toks.agg(countDistinct(col("w"))).head.getLong(0)
      val types = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .join(big.groupBy("w1").agg(count(lit(1)).as("c1")), "w1")
        .select("c12", "c1").collect()
      assert(types.length > 100, s"$dir: suspiciously few bigram types")
      val minDist = types.map { r =>
        val y = math.log((r.getLong(0) + 1).toDouble / (r.getLong(1) + v)) *
          1e6 + 0.5
        math.abs(y - math.rint(y)) / 1e6
      }.min
      assert(minDist > 1e-11,
        s"$dir: min boundary distance $minDist within libm noise range")
    }
  }

  test("token_stats matches a plain-Scala reference on random unicode tokens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // tokens mix ASCII, multi-byte BMP (é, 中) and a surrogate-pair emoji —
    // char_sum must count CODE POINTS (UTF8String.numChars semantics ==
    // String.codePointCount), not UTF-16 units or bytes
    val alphabet = Seq("a", "bc", "", "é", "ß", "中文", "🚀", "the", "and",
      "word", " ", "\t", "ω", "🚀🚀x")
    val lexicons = Seq(Seq("the", "and", "中文"), Seq("🚀", "missing"))
    val rnd = new scala.util.Random(59)
    val docs: Seq[Seq[String]] = Seq(Seq.empty[String], Seq("")) ++
      (0 until 40).map(_ => Seq.fill(rnd.nextInt(25))(
        alphabet(rnd.nextInt(alphabet.size))))
    def ref(toks: Seq[String]): (Int, Long, Long, Seq[Int]) = {
      val lens = toks.map(t => t.codePointCount(0, t.length).toLong)
      (toks.size, lens.sum, lens.map(l => (l + 3) / 4).sum,
        lexicons.map(lex => toks.count(lex.contains)))
    }
    val got = docs.zipWithIndex.map(_.swap).toDF("i", "toks")
      .select(col("i"),
        graft.functions.TokenStats.token_stats(col("toks"), lexicons).as("st"))
      .select(col("i"), col("st.n_tok"), col("st.char_sum"),
        col("st.bpe_sum"), col("st.hits"))
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)))
      .toMap
    docs.zipWithIndex.foreach { case (toks, i) =>
      val (n, cs, bs, hits) = ref(toks)
      assert(got(i) == ((n, cs, bs, hits)),
        s"doc $i: got ${got(i)} want ${(n, cs, bs, hits)}")
    }
  }

  test("ngram_hashes matches a byte-window reference on random unicode text") {
    import graft.functions.CharNgramHashes.ngram_hashes
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the kernel's documented semantics are BYTE-level windows (equal to
    // substring's char windows only on ASCII — the fixed-sample test above
    // pins that case). This fuzz pins the byte contract itself on
    // multi-byte text: binary substring slices bytes, and Spark's
    // xxhash64 hashes string and binary identically, so this composable
    // form is an independent byte-window reference. n ∈ {2,3,4}.
    val pieces = Seq("a", "b", " ", "é", "中", "🚀", "xyz", "ßß")
    val rnd = new scala.util.Random(61)
    val texts = Seq("", "é", "🚀") ++ (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(40))(pieces(rnd.nextInt(pieces.size))).mkString)
    (2 to 4).foreach { n =>
      val df = texts.zipWithIndex.map(_.swap).toDF("i", "text")
      val composable = expr("sort_array(array_distinct(transform(" +
        s"sequence(1, greatest(octet_length(text) - ${n - 1}, 1)), " +
        s"i -> xxhash64(substring(cast(text AS binary), i, $n)))))")
      val bad = df.select(col("i"), composable.as("a"),
          ngram_hashes(col("text"), n).as("b"))
        .filter(not(col("a") === col("b"))).collect()
      assert(bad.isEmpty,
        s"n=$n mismatch rows: ${bad.map(_.getInt(0)).toSeq}")
    }
  }

  test("dot_product matches a plain fold on random vectors (incl. empty)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = Seq((0, Seq.empty[Double], Seq.empty[Double])) ++
      (1 to 40).map { i =>
        val n = rnd.nextInt(65)
        (i, Seq.fill(n)(rnd.nextInt(255) - 127.0),
          Seq.fill(n)(rnd.nextInt(255) - 127.0))
      }
    val got = rows.toDF("i", "a", "b")
      .select(col("i"),
        graft.functions.VectorOps.dot_product(col("a"), col("b")).as("dp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, a, b) =>
      // integer-valued doubles: the fold is exact in any order, so == holds
      val expect = a.zip(b).map { case (x, y) => x * y }.sum
      assert(got(i) == expect, s"row $i: got ${got(i)} want $expect")
    }
  }

  test("rolling hash is deterministic and spreads adversarial inputs") {
    check(Prop.forAll(nastyString) { s =>
      val h1 = RollingHash.hashBytes(s.getBytes("UTF-8"))
      val h2 = RollingHash.hashBytes(s.getBytes("UTF-8"))
      h1 == h2
    })
    // distinct short strings should rarely collide
    val strings = (0 until 2000).map(i => s"doc $i payload")
    val hashes = strings.map(s => RollingHash.hashBytes(s.getBytes)).toSet
    assert(hashes.size == strings.size, "rolling hash collided on trivial corpus")
  }

  test("minhash_array matches the composable per-seed xxhash64 form") {
    // the kernel's documented contract: component i equals
    // array_min(transform(hs, h -> xxhash64(h, i))) — a genuinely different
    // evaluation path (catalyst lambda + builtin hash chain) over random
    // arrays including null elements; one batched job (per-sample jobs are
    // prohibitively slow — the CSV round-trip precedent)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 8
    val rnd = new scala.util.Random(42)
    val samples: Seq[Seq[Option[Long]]] = (0 until 60).map { _ =>
      Seq.fill(1 + rnd.nextInt(12))(
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextLong()))
    }
    val df = samples.zipWithIndex.map { case (hs, i) => (i, hs) }
      .toDF("i", "hs")
    val kernel = df.select(col("i"),
        graft.functions.MinHashArray.minhash_array(col("hs"), k).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    val composable = df.select(col("i") +: (0 until k).map(s =>
        array_min(transform(col("hs"), h => xxhash64(h, lit(s)))).as(s"c$s")): _*)
      .collect().map(r => r.getInt(0) -> (1 to k).map(r.getLong).toList).toMap
    samples.indices.foreach { i =>
      assert(kernel(i) == composable(i), s"sample $i")
    }
    // empty array: null signature, mirroring array_min over an empty
    // transform
    val empty = Seq((0, Seq.empty[Option[Long]])).toDF("i", "hs")
      .select(graft.functions.MinHashArray.minhash_array(col("hs"), k))
      .head()
    assert(empty.isNullAt(0), "empty hash array must yield a null signature")
  }

  test("sign_band_buckets matches a plain-Scala projection reference") {
    // random planes + random vectors (short vectors and null elements
    // included: the kernel clamps to min(dim, len) and projects nulls as
    // 0.0); reference replays band-tag << bits + sign bits with the same
    // ascending-index summation order, so double equality is exact
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bands = 2; val bits = 3; val dim = 4
    val rnd = new scala.util.Random(42)
    val planes: Seq[Array[Double]] =
      Seq.fill(bands * bits)(Array.fill(dim)(rnd.nextGaussian()))
    def ref(v: Seq[Option[Double]]): Seq[Long] = {
      val n = math.min(dim, v.length)
      val vv = (0 until n).map(i => v(i).getOrElse(0.0))
      (0 until bands).map { b =>
        var bucket = b.toLong << bits
        var t = 0
        while (t < bits) {
          val p = planes(b * bits + t)
          var s = 0.0
          var i = 0
          while (i < n) { s += p(i) * vv(i); i += 1 }
          if (s > 0) bucket += (1L << t)
          t += 1
        }
        bucket
      }
    }
    val samples: Seq[Seq[Option[Double]]] = (0 until 60).map { _ =>
      Seq.fill(1 + rnd.nextInt(dim + 2))(
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextGaussian()))
    }
    val got = samples.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v")
      .select(col("i"), graft.functions.SignBandBuckets
        .sign_band_buckets(col("v"), planes, bits).as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    samples.indices.foreach { i =>
      assert(got(i) == ref(samples(i)).toList, s"sample $i")
    }
  }

  test("bloom prefilter: zero false negatives, bounded false-positive rate") {
    // the correctness contract the join_bloom_prefilter plan rests on: a
    // bloom miss must PROVE absence (the exact join never sees the row), a
    // false positive only costs a shuffled row. 500 random inserted keys
    // all pass; 2000 disjoint probes stay under 10% fp (Spark sizes the
    // bitmap for ~3% at the given estimate)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val inserted = Seq.fill(500)(rnd.nextLong()).distinct
    val bloomBytes = inserted.toDF("v")
      .agg(graft.functions.BloomPrefilter.bloom_agg(col("v"), 500L))
      .head().getAs[Array[Byte]](0)
    val probeSet = inserted.toSet
    val outside = Iterator.continually(rnd.nextLong())
      .filterNot(probeSet).take(2000).toSeq
    val hits = (inserted ++ outside).toDF("v")
      .select(col("v"), graft.functions.BloomPrefilter
        .bloom_might_contain(lit(bloomBytes), col("v")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    inserted.foreach(v => assert(hits(v), s"false negative on inserted $v"))
    val fp = outside.count(hits)
    assert(fp < 200, s"false-positive rate too high: $fp/2000")
  }

  test("Adamic-Adar q6 weight sits far from every rounding boundary") {
    // graph_adamic_adar half-up quantizes 10^6/ln(d) per wedge center —
    // safe across engines only if no plausible degree value lands within
    // float-noise of a boundary (the dsir/bigram-LM measured-margin
    // discipline). Sweep every degree to 200k: the minimum distance to a
    // boundary must exceed 1e-7 (measured 2.58e-6 at d=154431), ~10^3
    // above the ~2e-10 worst-case cross-engine ln deviation; and the
    // quantized weight must agree with an independent BigDecimal-free
    // spelling of floor(x + 0.5).
    var minDist = Double.MaxValue
    var argD = -1
    (2 to 200000).foreach { d =>
      val x = 1e6 / math.log(d.toDouble) + 0.5
      val dist = math.abs(x - math.rint(x))
      if (dist < minDist) { minDist = dist; argD = d }
      assert(math.floor(x).toLong ==
        math.floor(1e6 / math.log(d.toDouble) + 0.5).toLong)
    }
    assert(minDist > 1e-7,
      s"degree $argD quantizes within $minDist of a boundary")
    // and the Spark-side SQL expression agrees with the JVM fold on a
    // spot grid including the tightest degree
    import spark.implicits._
    val grid = Seq(2, 3, 10, 99, 1000, 154431, 200000)
    val viaSql = grid.toDF("d")
      .selectExpr("CAST(floor(1000000.0 / ln(d) + 0.5) AS BIGINT)")
      .collect().map(_.getLong(0)).toSeq
    val viaJvm = grid.map(d => math.floor(1e6 / math.log(d.toDouble) + 0.5).toLong)
    assert(viaSql == viaJvm)
  }
}
