package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Mirrors the reference's
  * benchmark runner shape — named items, per-item runtimes, JSON report
  * (reference: src/lib/benchmarklib/benchmark_runner.hpp:37-46,71-80).
  *
  * Each query gets one untimed warmup (JIT + parquet footer cache, like the
  * reference's --warmup) and the reported time is the best of two timed runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = SparkEntry.queries
    def timeOne(name: String): Double = {
      val fn = queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val results = SparkEntry.benchNames.map { name =>
      val t = try timeOne(name) catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
