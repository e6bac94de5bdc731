package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materialized-view maintenance bench: initial build vs O(delta) incremental
  * maintenance vs full REFRESH on the `SPARK_GRAFT_SF_DIR` lineitem table.
  * The point at scale: once the base is large, a DML statement's maintenance
  * cost must track the DELTA size, not the base size — this prints all three
  * so the gap is a recorded number, not a claim. */
object BenchIvm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-bench-ivm"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cat = new Catalog(spark)
    cat.register("li_ivm", Tables.df(spark, sfDir, "lineitem"))
    val p = new Pipeline(cat)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val baseRows = cat.table("li_ivm").count()
    // high-cardinality key: maintenance is O(delta + |state|) while REFRESH
    // is O(base) — the gap the feature exists for (a returnflag rollup has 4
    // groups and its refresh is so cheap the fixed costs dominate both paths)
    val build = timed(p.run(
      """CREATE MATERIALIZED VIEW li_mv AS
        |  SELECT l_suppkey, COUNT(*) AS n, SUM(l_quantity) AS q
        |  FROM li_ivm GROUP BY l_suppkey""".stripMargin))

    // delta: 1000 rows re-inserted from the base (values irrelevant, size is)
    val delta = cat.table("li_ivm").limit(1000).localCheckpoint()
    val maintain = timed(cat.insert("li_ivm", delta))
    val refresh = timed(p.run("REFRESH MATERIALIZED VIEW li_mv"))
    // maintained view must equal the just-refreshed recompute
    val n = cat.table("li_mv").agg(sum("n")).head.getLong(0)
    require(n == baseRows + 1000, s"view count $n != ${baseRows + 1000}")

    println(s"""{"metric":"matview","unit":"sec","base_rows":$baseRows,"delta_rows":1000,""" +
      s""""build_sec":$build,"incremental_maintain_sec":$maintain,"full_refresh_sec":$refresh,""" +
      s""""speedup_vs_refresh":${refresh / maintain},"sf":"$sfDir"}""")
    spark.stop()
  }
}
