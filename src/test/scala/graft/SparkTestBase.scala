package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (SURVEY §5 → one fixture
  * session like the reference's BaseTest). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.create("local[4]", shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}
