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
}
