package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run end-to-end at sf0.001 (the driver's t1 gate
  * shape): non-crashing, with a non-empty schema, and each declared oracle must
  * reference only relation names the driver registers. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  SparkEntry.allQ.foreach { q =>
    test(s"query ${q.name} runs at sf0.001") {
      val df = q.run(spark, SparkTestBase.sf)
      assert(df.schema.nonEmpty, "schema must not be empty")
      assert(df.count() >= 0)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name is unique and every oracle key exists") {
    val names = SparkEntry.allQ.map(_.name)
    assert(names.distinct.sizeIs == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("bench names are registered queries") {
    assert(SparkEntry.benchNames.toSet.subsetOf(SparkEntry.queries.keySet))
  }
}
