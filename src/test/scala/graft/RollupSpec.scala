package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Rollups]] — the durable-rollup layout family: the persisted IVM state
  * must answer exactly what the from-scratch aggregation answers, the
  * O(delta) refresh must equal a full rebuild over the grown fact, and the
  * q11 body must transparently pick the state up from a layout dir. */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf
  private val name = Rollups.LineitemByPartkey

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  /** A dataset dir that shares the fixture's facts but owns its _rollup. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    Seq("lineitem", "part").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$d/$t.parquet"),
        java.nio.file.Paths.get(s"$sf/$t.parquet").toAbsolutePath)
    }
    Rollups.build(spark, d, name)
    d
  }

  private def direct(of: DataFrame): DataFrame =
    of.groupBy("l_partkey").agg(
      sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"))
        .as("value_dec"))

  test("persisted state answers the from-scratch aggregation exactly") {
    val viaState = Rollups.visibleDf(spark, dir, name).get
    assert(canon(viaState) === canon(direct(Tables.df(spark, sf, "lineitem"))))
  }

  test("O(delta) refresh == full rebuild over the grown fact (IVM)") {
    val base = Tables.df(spark, sf, "lineitem")
    val delta = base.filter(col("l_partkey") % 7 === 0)
      .withColumn("l_orderkey", col("l_orderkey") + lit(10000000L))
    val grown = java.nio.file.Files.createTempDirectory("graft-rollup-grown").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$grown/lineitem.parquet"),
      java.nio.file.Paths.get(s"$sf/lineitem.parquet").toAbsolutePath)
    Rollups.build(spark, grown, name)
    Rollups.refresh(spark, grown, name, delta)
    val viaRefresh = Rollups.visibleDf(spark, grown, name).get
    assert(canon(viaRefresh) === canon(direct(base.unionByName(delta))))
    // and a signed delete-delta takes the state back to the base
    Rollups.refresh(spark, grown, name, delta, sign = -1)
    assert(canon(Rollups.visibleDf(spark, grown, name).get) === canon(direct(base)))
  }

  test("q11 body picks the rollup up from a layout dir and answers identically") {
    val viaRollup = operators.TpchFullQueries.q11ImportantParts.run(spark, dir)
    val recompute = operators.TpchFullQueries.q11ImportantParts.run(spark, sf)
    // the rollup path must actually be taken: every scan reads _rollup state
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scanned = viaRollup.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("_rollup")),
      s"q11 on a rollup-carrying dir must read only the rollup state, got: $scanned")
    assert(viaRollup.collect().toSeq === recompute.collect().toSeq)
  }

  test("q67's finest lattice level re-aggregates from the rollup state identically") {
    // decimal sums associate: per-(type,brand) over the per-part state must
    // equal per-(type,brand) over the raw fact — rows, types and rank ties
    val viaRollup = operators.TpcdsQueries.q67TopkRollup.run(spark, dir)
    val recompute = operators.TpcdsQueries.q67TopkRollup.run(spark, sf)
    assert(viaRollup.schema === recompute.schema)
    assert(viaRollup.collect().toSeq === recompute.collect().toSeq)
  }
}
