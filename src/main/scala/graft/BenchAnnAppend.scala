package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-vs-rebuild bench for the ANN index ([[functions.AnnIndex
  * .appendIvfScaled]]): build the scaled IVF index on an N-vector store,
  * grow the corpus in place by ~10 %, APPEND the delta (assign-only, fixed
  * centroids) and compare the append cost against the full build it
  * replaces — the FAISS add-vs-train split, measured. Also re-probes the
  * appended index and reports the scaled tier's recall over the grown
  * corpus (strict + tie-aware, same scoring as [[AnnRecall]]) so "recall
  * unchanged" is a number, not a claim.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<embStoreDir> runMain graft.BenchAnnAppend
  * [indexDir]`; the store dir is MUTATED (delta rows appended to
  * embeddings.parquet) — point it at a scratch copy, e.g. a
  * [[ScaleUpCorpus]] output. Prints ONE JSON line. Bench-evidence tooling,
  * not part of the driver contract. */
object BenchAnnAppend {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val indexDir = args.headOption.getOrElse(functions.AnnIndex.defaultDir(sfDir))
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-ann-append"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseRows = base.count()
    val buildSec = timed(functions.AnnIndex.buildAll(spark, sfDir, indexDir))

    // grow the corpus in place by ~10%: every 10th base vector re-enters
    // under a fresh id (vectors reused — the identity under test is the
    // assignment, which is id-blind; near-duplicate mass is also exactly
    // what a production ingest adds)
    val maxId = base.agg(max(col("vec_id").cast("long"))).head.getLong(0)
    val delta = base.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id").cast("long") + maxId + 1L)
    delta.write.mode("append").parquet(s"$sfDir/embeddings.parquet")

    val appendSec = timed {
      functions.AnnIndex.appendIvfScaled(spark, sfDir, indexDir, delta)
    }
    val (trainedRows, appendedRows) = functions.AnnIndex.appendState(indexDir)
    val retrain = functions.AnnIndex.retrainRecommended(indexDir)

    // ensure() must be a no-op on the re-pinned manifest (probe-path cost)
    val ensureSec = timed(functions.AnnIndex.ensure(spark, sfDir, indexDir))

    // recall of the appended index over the GROWN corpus, scored exactly
    // like AnnRecall: strict set intersection + tie-aware band vs exact
    // cosine ground truth
    val probe = functions.AnnIndex.probeIvfScaled(spark, sfDir, indexDir)
      .select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = SparkEntry.queries("ann_brute_force_topk")(spark, sfDir)
      .select(col("q_id").cast("long"), col("n_id").cast("long"),
        (lit(1.0) - col("sim")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = exact.map(t => (t._1, t._2)).toSet
    val strict = (probe.toSet & truth).size.toDouble / truth.size
    val kth = exact.groupBy(_._1).map { case (q, ts) => q -> ts.map(_._3).max }
    // tie-aware: a retrieved neighbor whose true distance is within 1% of
    // the k-th true distance counts (AnnRecall's TIE_REL discipline)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val gotDf = spark.createDataFrame(probe.toSeq).toDF("q_id", "n_id")
    val trueD = gotDf.join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), "n_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"),
        (lit(1.0) - expr("graft_vec_dot(qv, nv)") /
          (sqrt(expr("graft_vec_dot(qv, qv)")) * sqrt(expr("graft_vec_dot(nv, nv)")))).as("td"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val tie = trueD.count { case (qq, td) =>
      kth.get(qq).exists(dk => td <= dk * 1.01 + 1e-9)
    }.toDouble / truth.size

    println(s"""{"metric":"ann_append","unit":"sec","base_rows":$baseRows,""" +
      s""""build_sec":$buildSec,"append_rows":$appendedRows,"append_sec":$appendSec,""" +
      s""""ensure_noop_sec":$ensureSec,"trained_rows":$trainedRows,""" +
      s""""retrain_recommended":$retrain,""" +
      s""""scaled_recall_after_append":$strict,"scaled_tie_recall_after_append":$tie,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
