package graft.llm

import graft.SparkSpec
import graft.core.Tables
import graft.functions.RollingHash
import org.apache.spark.sql.functions._

/** Tier E unit-tier assertions: MinHash estimate quality (SURVEY §7.3 hard
  * #2), LSH recall vs brute force, rolling-hash codegen parity, multimodal
  * batch plumbing. */
class LlmSpec extends SparkSpec {

  test("E3: MinHash component-match rate estimates Jaccard within 0.3") {
    import spark.implicits._
    // synthetic docs with controlled overlap
    val base = (0 until 60).map(i => s"tok$i")
    val docs = Seq(
      1L -> base.take(40),                     // |A∩B|/|A∪B| controlled below
      2L -> base.slice(20, 60),                // vs doc1: 20/60 = 0.333
      3L -> base.take(40),                     // vs doc1: identical = 1.0
      4L -> (0 until 40).map(i => s"other$i")) // vs doc1: 0.0
    val df = docs.toDF("doc_id", "toks")
    val sigs = df.select(col("doc_id") +: Dedup.minhashSignature(col("toks")): _*)
      .collect().map(r => r.getLong(0) -> (1 until 33).map(r.getLong).toVector).toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 32
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (docs.toMap.apply(a).toSet, docs.toMap.apply(b).toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    for ((a, b) <- Seq((1L, 2L), (1L, 3L), (1L, 4L)))
      assert(math.abs(est(a, b) - jac(a, b)) <= 0.3,
        s"pair ($a,$b): est=${est(a, b)} true=${jac(a, b)}")
  }

  test("E3b: LSH banding surfaces identical and near-identical docs") {
    import spark.implicits._
    // identical docs share all 32 minhashes → every band collides; a doc
    // with 90% token overlap should share at least one band; a disjoint
    // doc should (with these params) share none.
    val base = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "),                                   // identical
      3L -> (base.take(90) ++ (0 until 10).map(i => s"x$i")).mkString(" "), // near
      4L -> (0 until 100).map(i => s"z$i").mkString(" "))         // disjoint
    val df = docs.toDF("doc_id", "text")
    val sigs = df.select(col("doc_id") +:
      Dedup.minhashSignature(array_distinct(split(col("text"), " "))): _*)
    val banded = sigs.select(col("doc_id") +: Dedup.bandHashes(): _*)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.Bands).map(r.getLong)).toMap
    def sharesBand(a: Long, b: Long): Boolean =
      banded(a).zip(banded(b)).exists { case (x, y) => x == y }
    assert(sharesBand(1L, 2L), "identical docs must collide in every band")
    assert(sharesBand(1L, 3L), "90%-overlap docs should collide in some band")
    assert(!sharesBand(1L, 4L), "disjoint docs should not collide")
  }

  test("SimHash: identical docs collide, near-dups stay close, disjoint far") {
    import spark.implicits._
    val base = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "),                                   // identical
      3L -> (base.take(90) ++ (0 until 10).map(i => s"x$i")).mkString(" "), // near
      4L -> (0 until 100).map(i => s"z$i").mkString(" "))         // disjoint
    val sh = Dedup.simhash(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L), "identical docs must share the fingerprint")
    assert(hamming(sh(1L), sh(3L)) <= 16,
      s"90%-overlap docs drifted ${hamming(sh(1L), sh(3L))} bits apart")
    assert(hamming(sh(1L), sh(4L)) >= 20,
      s"disjoint docs only ${hamming(sh(1L), sh(4L))} bits apart")
  }

  test("typed MinHash aggregator equals the expression signatures") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    // expression path
    val exprSigs = docs
      .select(col("doc_id"), Dedup.tokenHashes(col("toks")).as("th"))
      .select(col("doc_id") +: Dedup.minhashFromHashes(col("th")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector).toMap
    // typed aggregator path (groupByKey per doc)
    val agg = new MinHashAggregator().toColumn
    val typedSigs = docs.as[(Long, Seq[String])]
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().map { case (id, sig) => id -> sig.toVector }.toMap
    assert(typedSigs == exprSigs,
      s"first diff: ${typedSigs.find { case (k, v) => exprSigs(k) != v }}")
  }

  test("rolling_hash codegen equals the reference implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "abc", "hello world", "ünïcödé ✓",
      "a" * 1000, "line\nbreak\ttab", "\\back\\slash", "\"quotes\"")
    val viaSpark = samples.toDF("t")
      .select(col("t"), RollingHash.rolling_hash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(viaSpark(s) == RollingHash.hashBytes(s.getBytes("UTF-8")),
        s"mismatch for ${s.take(20)}")
    }
  }

  test("E4: knn top-10 matches a driver-side brute force") {
    val topk = graft.SparkEntry.queries("knn_cosine_topk")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq.sortBy(_._1).map(_._2)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val brute = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (cos(q, v), id) }
      .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2)
    assert(topk == brute, s"spark=$topk brute=$brute")
  }

  test("sign_band_buckets matches a plain-Scala reference") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(Similarity.Bands * Similarity.BandBits, 4)
    val vecs = Seq(
      (1L, Seq(0.5, -0.25, 0.125, 1.0)),
      (2L, Seq(-1.0, 2.0, -3.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)))
    val viaSpark = vecs.toDF("id", "v")
      .select(col("id"),
        graft.functions.SignBandBuckets.sign_band_buckets(
          col("v"), planes, Similarity.BandBits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    def reference(v: Seq[Double]): Vector[Long] =
      (0 until Similarity.Bands).map { b =>
        (0 until Similarity.BandBits).foldLeft(b.toLong << Similarity.BandBits) { (acc, t) =>
          val p = planes(b * Similarity.BandBits + t)
          val s = v.indices.map(i => p(i) * v(i)).sum
          if (s > 0) acc + (1L << t) else acc
        }
      }.toVector
    vecs.foreach { case (id, v) =>
      assert(viaSpark(id) == reference(v), s"bucket mismatch for vec $id")
    }
  }

  test("ANN: knn_lsh_bucketed recalls most of the true top pairs") {
    // ground truth: the 50 highest-cosine pairs over all vectors (brute force)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
    } yield (cos(vecs(i)._2, vecs(j)._2),
        math.min(vecs(i)._1, vecs(j)._1), math.max(vecs(i)._1, vecs(j)._1)))
      .toSeq.sortBy { case (s, a, b) => (-s, a, b) }
      .take(50).map { case (_, a, b) => (a, b) }.toSet
    val lsh = graft.SparkEntry.queries("knn_lsh_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    // 32 bands × 8 sign bits (OR-amplified): top pairs on this corpus sit
    // near cosine 0.45 (per-plane agreement p≈0.65), giving expected recall
    // ≈ 1-(1-0.65^8)^32 ≈ 2/3; require a majority recalled.
    assert(recall >= 0.5, s"LSH recall vs brute force = $recall (< 0.5)")
  }

  test("ANN: knn_nndescent converges toward the true k-NN graph and beats its init") {
    // ground truth: exact top-10 cosine neighbors per vector (brute force)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val truth: Map[Long, Set[Long]] = vecs.map { case (id, v) =>
      id -> vecs.iterator.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .toSeq.sortBy { case (j, s) => (-s, j) }.take(10).map(_._1).toSet
    }.toMap
    def recallOf(rounds: Int): Double = {
      val got = Similarity.nnDescent(Tables.embeddings(spark, sf), rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = truth.iterator.map { case (id, t) =>
        t.count(got.getOrElse(id, Set.empty).contains) }.sum
      hits.toDouble / (truth.size * 10)
    }
    val init = recallOf(0)
    val fin = recallOf(3)
    info(f"NN-Descent recall@10: init $init%.4f, after 3 rounds $fin%.4f")
    // the multi-partition hash init is a random graph — recall ≈ k/n;
    // three neighbor-of-neighbor rounds must lift it decisively
    // (deterministic — pure fixture function). The floors leave slack
    // only for a fixture regeneration.
    assert(fin > init + 0.3,
      s"NN-Descent did not descend: init recall $init, final $fin")
    assert(fin >= 0.6, s"NN-Descent recall@10 $fin < 0.6")
  }

  test("ANN dedup verdicts are a sound subset of the exact query's") {
    // dedup_embedding_ann generates pairs from LSH band collisions, then
    // re-ranks exactly — so every verdict it emits must be genuine (the vec
    // has SOME qualifying earlier neighbour: it appears in the exact output
    // with keeper <= the ANN keeper), and at this corpus's low threshold
    // (0.3498, per-plane agreement p≈0.61) the measured recall is ~0.5
    // (sf0.001 0.50, sf0.01 0.58, sf0.1 0.54 — deterministic seeded planes).
    val exact = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = graft.SparkEntry.queries("dedup_embedding_ann")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ann.foreach { case (v, k) =>
      assert(exact.contains(v), s"ANN invented a verdict for vec $v")
      assert(k >= exact(v), s"ANN keeper $k beats the exact min ${exact(v)}")
    }
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.45, s"ANN dedup recall $recall < 0.45")
  }

  test("adaptive cell count: exactly 8 on every fixture size, ~sqrt(n)/8 beyond") {
    import spark.implicits._
    // the fixture-stability claim the oracle parity rests on: K = 8 for
    // every n <= 4096 (all driver SFs), so adaptive K never changes
    // committed outputs; beyond, K tracks ceil(sqrt(n))/8
    def kOf(n: Int): Int = Similarity.adaptiveCellCount(
      (0 until n).map(i => (i.toLong, Array(0.1f), 0L))
        .toDF("vec_id", "embedding", "label"))
    for (n <- Seq(1, 8, 500, 2000, 4096))
      assert(kOf(n) == 8, s"K must stay 8 at n=$n (fixture stability)")
    // first n with ceil(sqrt(n)) DIV 8 = 9 is 71^2 + 1 = 5042 — the
    // formula stays at the fixture value with margin past 4096
    assert(kOf(5041) == 8 && kOf(5042) == 9,
      s"growth boundary: ${kOf(5041)}/${kOf(5042)}")
    assert(kOf(32000) == 22,
      s"K(32000) = ceil(sqrt(32000)) DIV 8 = 22: ${kOf(32000)}")
  }

  test("JL sign matrix is balanced (the md5-parity Rademacher claim)") {
    // jlSign's scaladoc: hex chars split 8/16 even on ASCII parity, so
    // the 64x16 matrix should be near-balanced — pin it within 40-60%
    val plus = (for (i <- 0 until 64; j <- 0 until 16)
      yield Similarity.jlSign(i, j)).count(_ > 0)
    assert(plus >= 410 && plus <= 614,
      s"sign matrix unbalanced: $plus/1024 positive")
  }

  test("semantic ANN dedup verdicts are a sound subset of the exact cell query's") {
    // dedup_semantic_ann blocks on the SAME deterministic IVF cells as
    // dedup_semantic_cells (shared ivfCellAssign) and verifies candidates
    // at the same exact threshold, so its candidate pairs are a subset of
    // the within-cell pairs: every verdict must appear in the exact
    // output with keeper <= the ANN keeper, and a recall floor holds at
    // this corpus's low-threshold regime (the dedup_embedding_ann bound).
    val exact = graft.SparkEntry.queries("dedup_semantic_cells")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = graft.SparkEntry.queries("dedup_semantic_ann")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ann.foreach { case (v, k) =>
      assert(exact.contains(v), s"semantic ANN invented a verdict for vec $v")
      assert(k >= exact(v),
        s"semantic ANN keeper $k beats the exact min ${exact(v)}")
    }
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.45, s"semantic ANN dedup recall $recall < 0.45")
  }

  test("ANN dedup recalls everything in the production threshold regime") {
    import spark.implicits._
    // The low-threshold corpus caps LSH recall near 0.5 (documented in
    // Similarity.embeddingCosineDedup). The production setting — near-dup
    // clusters at cosine >= 0.99 against an orthogonal-ish background,
    // threshold 0.95 — is the regime the 32×8 banding is built for:
    // per-plane agreement p≈0.955, band hit 0.955^8≈0.69, miss probability
    // (1-0.69)^32 ≈ 4e-17. There the ANN output must EQUAL the exact one.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 12).flatMap { c =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 5).map { j =>
        val v = if (j == 0) base
          else base.map(_ + 0.05 * rnd.nextGaussian()) // cosine ~0.998
        ((c * 5 + j).toLong, v.toSeq, s"l${c % 3}")
      }
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val exact = Similarity.embeddingCosineDedup(df, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val ann = Similarity.embeddingCosineDedupAnn(df, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(exact.nonEmpty, "planted clusters produced no exact verdicts")
    assert(ann == exact,
      s"high-threshold ANN diverged: missed=${exact -- ann} extra=${ann -- exact}")
  }

  test("ANN per-label top-1 agrees with exact on a measured share of probes") {
    // Top-1 is the hardest target for OR-amplified LSH when the nearest
    // neighbour sits in the background sim range (~0.2-0.3 cosine here):
    // measured agreement is 0.33/0.41/0.38 at sf0.001/0.01/0.1. The spec
    // pins soundness (every ANN pick is a real same-label neighbour) and
    // the measured agreement floor.
    val exact = graft.SparkEntry.queries("knn_pairs_label")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = graft.SparkEntry.queries("knn_pairs_label_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val labels = Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    ann.foreach { case (a, b) =>
      assert(a != b && labels(a) == labels(b),
        s"ANN pick ($a,$b) crosses labels or self-pairs")
      assert(exact.contains(a), s"ANN probe $a missing from exact probe set")
    }
    val agree = ann.count { case (a, b) => exact(a) == b }.toDouble / exact.size
    assert(agree >= 0.3, s"ANN top-1 agreement $agree < 0.3")
  }

  test("PII scrub redacts planted emails, numbers and deny terms") {
    import spark.implicits._
    // the corpus contains no digits/'@' (its oracle pins those counts at 0)
    // — this test is where the email/number paths actually fire
    val rows = Seq(
      (1L, "contact me at jane.doe@example.com for details"),
      (2L, "call 555-123-4567 or 555 987 6543 today"),
      (3L, "the customer saw a dup record"),
      (4L, "card 4111 1111 1111 1111 leaked"),
      (5L, "clean text with nothing sensitive"))
    val out = rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextScrub.scrub(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact me at [EMAIL] for details")
    assert(out(2L) == "call [NUM] or [NUM] today")
    assert(out(3L) == "the [TERM] saw a [TERM] record")
    assert(out(4L) == "card [NUM] leaked")
    assert(out(5L) == rows(4)._2, "clean text must pass through unchanged")
  }

  test("deny-list scrub handles empty lists and regex metacharacters") {
    import spark.implicits._
    val docs = Seq((1L, "code 9X99 and price 9.99 today"))
      .toDF("doc_id", "text")
    // empty deny list: nothing redacted — the naive '\b()\b' pattern used
    // to match at every word boundary and stamp [TERM] everywhere
    val none = docs.select(TextScrub.scrub(col("text"), Nil).as("s"))
      .head().getString(0)
    assert(none == "code 9X99 and price 9.99 today")
    // a term's '.' is a literal, not a wildcard: unescaped '9.99' would
    // redact '9X99' too
    val dot = docs.select(TextScrub.scrub(col("text"), Seq("9.99")).as("s"))
      .head().getString(0)
    assert(dot == "code 9X99 and price [TERM] today")
    // raw 'c++' is a possessive quantifier in Java (matches any run of
    // c's) and a syntax error in RE2 — escaped, it is just the literal
    import java.util.regex.Pattern
    assert(Pattern.compile("\\b(c++)\\b").matcher("ccc").find(),
      "sanity: the unescaped term really did match arbitrary 'c' runs")
    assert(!Pattern.compile(TextScrub.denyPattern(Seq("c++")))
      .matcher("ccc").find())
    // …and it must actually FIRE on real text: a trailing '\b' after '+'
    // (non-word char) can never match before a space, so the anchor is
    // dropped on non-word ends — 'c++' redacts, 'c' alone stays intact
    val cpp = docs.select(TextScrub.scrub(
        lit("use c++ not c here, c++!"), Seq("c++")).as("s"))
      .head().getString(0)
    assert(cpp == "use [TERM] not c here, [TERM]!",
      s"'c++' deny term must redact in normal text, got: $cpp")
    // a blank entry (deny file with an empty line) must neither crash the
    // pattern build nor create an empty alternation branch that matches
    // everywhere
    val blank = docs.select(TextScrub.scrub(
        lit("the customer is here"), Seq("customer", "")).as("s"))
      .head().getString(0)
    assert(blank == "the [TERM] is here", s"blank deny entry broke: $blank")
  }

  test("embed_quantize survives an all-zero embedding (null, not NaN crash)") {
    import spark.implicits._
    val rows = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // same expression shape as the query: scale then floor-half-up ints
    val out = rows
      .withColumn("scale", lit(127.0) /
        nullif(array_max(transform(col("embedding"),
          x => abs(x.cast("double")))), lit(0.0)))
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * col("scale") + 0.5).cast("int")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.getSeq[Any](3).headOption.orNull))).toMap
    assert(out(1L)._1.isDefined, "normal vector quantizes")
    assert(out(2L)._2.isEmpty || out(2L)._2.contains(null),
      "zero vector yields nulls, never NaN/ANSI cast failure")
  }

  test("token_stats kernel equals the composable HOF form") {
    import spark.implicits._
    // unicode rows guard the numChars-vs-bytes distinction; the lexicon
    // rows guard exact-equality matching incl. duplicates across lexicons
    val docs = Seq("the quick brown fox", "el perro y la casa",
      "ünïcödé ✓ tokens here", "", "a bb ccc dddd eeeee",
      "the the the and and of").toDF("text")
    val lexicons = Seq(Seq("the", "and", "of"), Seq("el", "la", "y"))
    val toks = split(col("text"), " ")
    val kernel = graft.functions.TokenStats.token_stats(toks, lexicons)
    val viaHof = docs.select(
      size(toks).as("n_tok"),
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (a, x) => a + x).as("char_sum"),
      aggregate(transform(toks, t => ceil(length(t) / lit(4.0)).cast("long")),
        lit(0L), (a, x) => a + x).as("bpe_sum"),
      array(lexicons.map(lex =>
        size(filter(toks, t => array_contains(typedLit(lex), t)))): _*).as("hits"))
      .collect()
    val viaKernel = docs.select(
      kernel.getField("n_tok"), kernel.getField("char_sum"),
      kernel.getField("bpe_sum"), kernel.getField("hits"))
      .collect()
    viaHof.zip(viaKernel).zipWithIndex.foreach { case ((h, k), i) =>
      assert(h.getInt(0) == k.getInt(0), s"row $i n_tok")
      assert(h.getLong(1) == k.getLong(1), s"row $i char_sum")
      assert(h.getLong(2) == k.getLong(2), s"row $i bpe_sum")
      assert(h.getSeq[Int](3) == k.getSeq[Int](3), s"row $i hits")
    }
  }

  test("multimodal featurize preserves ids and emits fixed-shape features") {
    val media = Tables.documents(spark, sf).limit(50).select(
      col("doc_id"),
      encode(substring(col("text"), 1, 64), "UTF-8").as("payload"),
      lit("image/png").as("mime"),
      length(substring(col("text"), 1, 64)).cast("long").as("n_bytes"))
    val feats = Multimodal.featurize(spark, media)
    assert(feats.count() == 50)
    val row = feats.orderBy("doc_id").head()
    assert(row.getAs[scala.collection.Seq[Double]]("features").size == 8)
    assert(feats.select("doc_id").distinct().count() == 50)
  }

  test("E3d: verified dedup rejects a planted LSH band-collision false positive") {
    import spark.implicits._
    // doc 2 keeps EXACTLY doc 1's band-0 argmin tokens (the token whose
    // md5('i|'||tok) is smallest, for seeds 0..3), so band 0 collides BY
    // CONSTRUCTION — the min over a subset equals the full min iff the
    // argmin survives — while doc 2 holds only 6 of doc 1's 10 tokens:
    // J = 0.6, below the 0.8 verify bar. This is the S-curve-tail false
    // positive the two-stage operator exists to reject.
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = (0 until 10).map(i => s"w$i")
    val keep = (0 until 4).map(i => toks.minBy(t => md5hex(s"$i|$t"))).toSet
    val fillers = toks.filterNot(keep).take(6 - keep.size)
    val d2 = toks.filter(t => keep(t) || fillers.contains(t))
    assert(d2.size == 6)
    val docs = Seq((1L, toks.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    // threshold 0/1 keeps every candidate: proves the pair IS an LSH
    // candidate with the expected exact witness (non-vacuity)...
    val cand = Dedup.minhashVerifiedPairs(docs, 0, 1).collect()
    val fp = cand.find(r => r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(fp.isDefined, s"planted pair must be an LSH candidate: ${cand.toSeq}")
    assert(fp.get.getAs[Number]("inter").longValue == 6L)
    assert(fp.get.getAs[Number]("uni").longValue == 10L)
    // ...and the production threshold rejects it
    assert(Dedup.minhashVerifiedPairs(docs).collect().isEmpty,
      "J=0.6 candidate must fail exact verification at the 0.8 bar")
  }

  test("mutual-NN pairing keeps the reciprocated edge and kills hub edges") {
    import spark.implicits._
    // hub H on the x-axis, A at +10°, B at −20°: A→H (cos10° beats
    // cos30° to B), B→H (cos20° beats cos30° to A), H→A (cos10° beats
    // cos20°). H is top-1 FOR both, reciprocates only A — mutual must be
    // exactly {(H,A)}; the one-directional top-1 table would keep the
    // (B, H) hub edge the filter exists to kill.
    val th1 = math.Pi / 18; val th2 = math.Pi / 9
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(math.cos(th1), math.sin(th1)), 0),
      (3L, Seq(math.cos(th2), -math.sin(th2)), 0))
      .toDF("vec_id", "uv", "label")
    val out = Similarity.mutualNearestPairs(vecs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)), s"got $out")
  }

  test("r14c: shard assignment balances instances and conserves the repeat total") {
    // the key's whole claim: md5('doc_id#copy') spreads a document's
    // repeats across shards roughly uniformly. Deterministic fixture →
    // deterministic counts, so the spread bound is a regression pin, not
    // a flake: every shard within ±25% of the mean, and Σ instances over
    // shards == Σ n_repeats from the published materialization (nothing
    // dropped or double-assigned).
    val shards = graft.SparkEntry.queries("mix_shard_assignment")(
      spark, "/root/testdata/sf0.01").collect()
    assert(shards.length == 8)
    val counts = shards.map(_.getAs[Long]("n_instances"))
    val mean = counts.sum.toDouble / counts.length
    assert(counts.forall(c => math.abs(c - mean) <= 0.25 * mean),
      s"shard spread beyond 25% of mean $mean: ${counts.mkString(",")}")
    val totalRepeats = graft.SparkEntry.queries("mix_materialize_repeats")(
      spark, "/root/testdata/sf0.01")
      .agg(sum(col("n_repeats"))).head.getLong(0)
    assert(counts.sum == totalRepeats,
      s"instances ${counts.sum} != published repeats $totalRepeats")
  }
}
