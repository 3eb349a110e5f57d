package graft

import org.apache.spark.sql.functions._

/** The driver contract: every declared query runs and every oracle-checked
  * query returns rows (a 0-row oracle query would vacuously "match" while
  * exercising nothing). */
class ContractSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle keys without query: $orphans")
  }

  test("oracle-checked queries are non-trivial (rows > 0) on sf0.001") {
    val empty = SparkEntry.oracleSql.keySet.toSeq.sorted.filter { name =>
      SparkEntry.queries(name)(spark, sf).limit(1).count() == 0
    }
    assert(empty.isEmpty, s"oracle queries with empty results: $empty")
  }

  test("unit-tier queries run and return rows on sf0.001") {
    val unitTier = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
    val empty = unitTier.filter { name =>
      SparkEntry.queries(name)(spark, sf).limit(1).count() == 0
    }
    assert(empty.isEmpty, s"unit-tier queries with empty results: $empty")
  }
}
