package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN recall-at-scale harness: times each approximate top-k query and
  * scores its recall@k against the exact ranking ON THE SAME DIRECTORY —
  * converting the small-N recall spot-checks (SimilaritySpec) into a
  * measured number at whatever corpus size the dir holds (pair with
  * `ScaleUpCorpus` for the 10×/100× embedding stores).
  *
  * Ground truth is metric-matched, FAISS-style:
  *  - cosine family (IVF flat, IVF k-means): exact = `ann_brute_force_topk`
  *    (cosine over raw floats);
  *  - quantized-L2 family (IVFPQ ADC, SQ8): exact = L2 top-k over the RAW
  *    float vectors, so the reported recall includes quantization error —
  *    the standard IVFPQ evaluation (Jégou 2011 §V measures against exact
  *    Euclidean search, not against the quantized grid).
  *
  * Both exact baselines are linear in the store (10 broadcast query rows ×
  * corpus scan) — fine to run even at 100×.
  *
  * Usage: `runMain graft.AnnRecall <sfDir>`; prints ONE JSON line
  * `{"metric":"ann_recall","store_rows":N,"queries":{name:{"recall":r,
  * "sec":s},...}}`. Bench-evidence tooling, not part of the driver contract.
  */
object AnnRecall {

  private val NQUERY = 10
  private val TOPK = 3

  /** name -> ground-truth family ("cos" | "l2"); ann_filtered_topk is
    * excluded (its candidate universe is label-filtered, not the full store) */
  private val approx = Seq(
    "ann_ivf_topk" -> "cos", "ann_ivf_kmeans_topk" -> "cos",
    "ann_ivfpq_topk" -> "l2", "emb_sq8_topk" -> "l2")

  /** exact L2 top-k over raw float embeddings, same (q_id, n_id) shape */
  private def exactL2(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.dfSpread(spark, dir, "embeddings")
    val q = broadcast(e.filter(col("vec_id") < NQUERY)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe")))
    val d2 = expr(
      "aggregate(zip_with(qe, ce, (a, b) -> cast((a - b) * (a - b) as double)), 0D, (acc, x) -> acc + x)")
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("n_id"))
    q.join(e.select(col("vec_id").as("n_id"), col("embedding").as("ce")),
        col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TOPK)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-ann-recall"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val storeRows = Tables.df(spark, dir, "embeddings").count()

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // warmup (JIT + parquet footer cache), then timed
    approx.foreach { case (n, _) =>
      try pairs(SparkEntry.queries(n)(spark, dir)) catch { case _: Throwable => () }
    }
    val (exactCos, cosSec) = timed(pairs(SparkEntry.queries("ann_brute_force_topk")(spark, dir)))
    val (exactEu, l2Sec) = timed(pairs(exactL2(spark, dir)))

    // two-stage IVFPQ: ADC SHORTLIST (wider cutoff) → exact L2 re-rank on the
    // raw vectors. Pure ADC with PQ_M code bytes saturates at large N (its
    // recall@k collapses once millions of candidates share coarse codes); the
    // production shape keeps the cheap ADC scan to cut 2M candidates to ~100
    // and spends exact distance work only there.
    val (rrPairs, rrSec) = timed {
      val short = functions.SimilarityQueries.ivfPqAdcRanked(spark, dir, 100)
        .select(col("q_id"), col("n_id"))
      val e = Tables.dfSpread(spark, dir, "embeddings")
      val d2 = expr(
        "aggregate(zip_with(qe2, ne2, (a, b) -> cast((a - b) * (a - b) as double)), 0D, (acc, x) -> acc + x)")
      val w = Window.partitionBy("q_id").orderBy(col("d2"), col("n_id"))
      pairs(short
        .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe2")), "q_id")
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne2")), "n_id")
        .select(col("q_id"), col("n_id"), d2.as("d2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TOPK))
    }
    val rrRecall = (rrPairs & exactEu).size.toDouble / exactEu.size

    val entries = approx.map { case (n, gt) =>
      val truth = if (gt == "cos") exactCos else exactEu
      val (got, sec) = timed(pairs(SparkEntry.queries(n)(spark, dir)))
      val recall = (got & truth).size.toDouble / truth.size
      s""""$n":{"recall":$recall,"sec":$sec,"truth":"$gt"}"""
    } ++ Seq(
      s""""ann_ivfpq_rerank_topk":{"recall":$rrRecall,"sec":$rrSec,"truth":"l2"}""",
      s""""exact_cosine":{"recall":1.0,"sec":$cosSec,"truth":"cos"}""",
      s""""exact_l2":{"recall":1.0,"sec":$l2Sec,"truth":"l2"}""")
    println(s"""{"metric":"ann_recall","store_rows":$storeRows,"k":$TOPK,"n_queries":$NQUERY,"queries":${entries.mkString("{", ",", "}")},"sf":"$dir"}""")
    spark.stop()
  }
}
