package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once/probe-many ANN bench: times the one-time index build
  * ([[functions.AnnIndex.buildAll]]) and each PROBE-ONLY query against the
  * persisted index, next to the exact brute-force baseline and the inline
  * (retrain-per-query) variants it replaces — the measured answer to r9's
  * finding that an index retrained per query loses to linear scan
  * (IVF k-means 45.7 s inline vs exact 2.4 s at the 2M store).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.BenchAnnIndex [indexDir]`;
  * prints ONE JSON line. Bench-evidence tooling, not part of the driver
  * contract. */
object BenchAnnIndex {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val indexDir = args.headOption.getOrElse(functions.AnnIndex.defaultDir(sfDir))
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-ann-index"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(df: => DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def best(df: => DataFrame): Double = {
      drain(df) // warmup
      (1 to nRuns).map(_ => timed(drain(df))).min
    }

    val storeRows = Tables.df(spark, sfDir, "embeddings").count()
    val buildSec = timed(functions.AnnIndex.buildAll(spark, sfDir, indexDir))

    // adaptive probe: stats travel with the result (no shared mutable state)
    var adaptiveCells: Map[Long, Int] = Map.empty
    def adaptiveProbe(): DataFrame = {
      val (df, cells) =
        functions.AnnIndex.probeIvfScaledAdaptiveWithStats(spark, sfDir, indexDir)
      adaptiveCells = cells
      df
    }
    val probes = Seq(
      "probe_ivf_topk" -> (() => functions.AnnIndex.probeIvf(spark, sfDir, indexDir)),
      "probe_ivf_scaled_topk" -> (() => functions.AnnIndex.probeIvfScaled(spark, sfDir, indexDir)),
      "probe_ivf_scaled_adaptive_topk" -> (() => adaptiveProbe()),
      "probe_ivfpq_topk" -> (() => functions.AnnIndex.probeIvfPq(spark, sfDir, indexDir)),
      "probe_sq8_topk" -> (() => functions.AnnIndex.probeSq8(spark, sfDir, indexDir)))
    val inlines = Seq(
      "inline_ivf_kmeans_topk" -> "ann_ivf_kmeans_topk",
      "inline_ivfpq_topk" -> "ann_ivfpq_topk",
      "inline_sq8_topk" -> "emb_sq8_topk",
      "exact_cosine" -> "ann_brute_force_topk")

    val entries =
      probes.map { case (n, f) => s""""$n":${best(f())}""" } ++
        inlines.map { case (n, q) =>
          s""""$n":${best(SparkEntry.queries(q)(spark, sfDir))}"""
        }
    val adaptiveField =
      if (adaptiveCells.isEmpty) ""
      else {
        val avg = adaptiveCells.values.sum.toDouble / adaptiveCells.size
        s""","adaptive_cells_probed_avg":$avg,"adaptive_cells_probed_max":${adaptiveCells.values.max}"""
      }
    println(s"""{"metric":"ann_index_build_probe","unit":"sec","store_rows":$storeRows,"build_sec":$buildSec$adaptiveField,"queries":${entries.mkString("{", ",", "}")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
