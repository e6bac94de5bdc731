package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN recall-at-scale harness: times each approximate top-k query and
  * scores its recall@k against the exact ranking ON THE SAME DIRECTORY —
  * converting the small-N recall spot-checks (SimilaritySpec) into a
  * measured number at whatever corpus size the dir holds (pair with
  * `ScaleUpCorpus` for the 10×/100×/1000× embedding stores).
  *
  * Ground truth is metric-matched, FAISS-style:
  *  - cosine family (IVF flat, IVF k-means): exact = `ann_brute_force_topk`
  *    (cosine over raw floats);
  *  - quantized-L2 family (IVFPQ ADC, SQ8): exact = L2 top-k over the RAW
  *    float vectors, so the reported recall includes quantization error —
  *    the standard IVFPQ evaluation (Jégou 2011 §V measures against exact
  *    Euclidean search, not against the quantized grid).
  *
  * Two recall numbers per query:
  *  - `recall` — STRICT set intersection with the id-tiebroken exact top-k;
  *  - `tie_recall` — TIE-AWARE: a retrieved neighbor counts as correct when
  *    its TRUE distance is within a 1% relative band of the query's k-th
  *    true distance. When several corpus vectors are equidistant from the
  *    query at measurement resolution, any of them is an equally-correct
  *    answer; strict id-tiebreak recall then measures tiebreak agreement,
  *    not retrieval (the r10 0.067 artifact: a fixed-amplitude scale-up put
  *    ~999 copies at one exactly-tied d², making strict "exact top-3"
  *    unrecoverable by construction). Standard IR practice for tied ranks.
  *
  * Modes (arg 2 or GRAFT_ANN_MODE): `inline` retrains per query — the
  * oracle-gated query shapes, O(train) per run; `probe` builds the persisted
  * index ONCE ([[graft.functions.AnnIndex]], timed as `build_sec`) and times
  * probe-only queries — the production shape, and the probe-vs-build
  * evidence for the train-once/probe-many design. Probe results are
  * row-identical to their inline twins (AnnIndexSpec), so recall transfers.
  *
  * Both exact baselines are linear in the store (10 broadcast query rows ×
  * corpus scan) — fine to run even at 1000×.
  *
  * Usage: `runMain graft.AnnRecall <sfDir> [inline|probe]`; prints ONE JSON
  * line `{"metric":"ann_recall","store_rows":N,"queries":{name:{"recall":r,
  * "tie_recall":t,"sec":s},...}}`. Bench-evidence tooling, not part of the
  * driver contract.
  */
object AnnRecall {

  private val NQUERY = 10
  private val TOPK = 3
  /** Tie band: retrieved counts as correct when true_d ≤ d_k·(1+REL)+ABS.
    * 1% relative separates measurement-resolution ties (the r10 store's tied
    * family copies differ by <0.2% in d²) from genuinely farther neighbors
    * (the nearest non-tied competitor sits ≳30× away in that store). */
  private val TIE_REL = 0.01
  private val TIE_ABS = 1e-9

  /** exact L2 top-k over raw float embeddings, with the true distance kept */
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

  /** exact-L2 re-rank of a (q_id, n_id) shortlist on the raw vectors */
  private def rerank(spark: SparkSession, dir: String, short: DataFrame): DataFrame = {
    val e = Tables.dfSpread(spark, dir, "embeddings")
    val d2 = expr(
      "aggregate(zip_with(qe2, ne2, (a, b) -> cast((a - b) * (a - b) as double)), 0D, (acc, x) -> acc + x)")
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("n_id"))
    short.select("q_id", "n_id")
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe2")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne2")), "n_id")
      .select(col("q_id"), col("n_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TOPK)
  }

  /** TRUE metric distance for each retrieved (q_id, n_id) pair — bounded:
    * NQUERY·k rows joined against the store (the 30-row side broadcasts). */
  private def trueDists(spark: SparkSession, dir: String, res: DataFrame,
      metric: String): Seq[(Long, Double)] = {
    val e = Tables.dfSpread(spark, dir, "embeddings")
    val d: Column =
      if (metric == "l2") expr(
        "aggregate(zip_with(qe3, ne3, (a, b) -> cast((a - b) * (a - b) as double)), 0D, (acc, x) -> acc + x)")
      else expr(
        """1.0d - aggregate(zip_with(qe3, ne3, (a, b) -> cast(a * b as double)), 0D, (acc, x) -> acc + x)
          |/ (sqrt(aggregate(transform(qe3, x -> cast(x * x as double)), 0D, (acc, x) -> acc + x))
          |  * sqrt(aggregate(transform(ne3, x -> cast(x * x as double)), 0D, (acc, x) -> acc + x)))"""
          .stripMargin.replace("\n", " "))
    // distinct so both metrics are set-based: strict recall dedups via its
    // pair Set, and a probe tier emitting duplicate (q_id, n_id) rows must
    // not inflate the row-based tie_recall numerator relative to it.
    broadcast(res.select(col("q_id").cast("long"), col("n_id").cast("long")).distinct())
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("qe3")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne3")), "n_id")
      .select(col("q_id"), d.as("td"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args.lift(1).getOrElse(sys.env.getOrElse("GRAFT_ANN_MODE", "inline"))
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-ann-recall"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val storeRows = Tables.df(spark, dir, "embeddings").count()
    val indexDir = functions.AnnIndex.defaultDir(dir)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // probe mode: train the persisted index ONCE, timed — everything after
    // is probe-only (the build/search split the index exists for)
    val buildSec: Option[Double] =
      if (mode == "probe") Some(timed(functions.AnnIndex.ensure(spark, dir, indexDir))._2)
      else None

    /** name -> (truth family, result thunk) */
    val approx: Seq[(String, String, () => DataFrame)] =
      if (mode == "probe") Seq(
        ("ann_ivf_topk", "cos", () => SparkEntry.queries("ann_ivf_topk")(spark, dir)),
        ("ann_ivf_kmeans_topk", "cos", () => functions.AnnIndex.probeIvf(spark, dir, indexDir)),
        // index-only perf tier (nlist≈√N, no inline twin): recall measured
        // here against exact cosine is its whole quality story
        ("ann_ivf_scaled_topk", "cos", () => functions.AnnIndex.probeIvfScaled(spark, dir, indexDir)),
        ("ann_ivfpq_topk", "l2", () => functions.AnnIndex.probeIvfPq(spark, dir, indexDir)),
        ("emb_sq8_topk", "l2", () => functions.AnnIndex.probeSq8(spark, dir, indexDir)))
      else Seq(
        ("ann_ivf_topk", "cos", () => SparkEntry.queries("ann_ivf_topk")(spark, dir)),
        ("ann_ivf_kmeans_topk", "cos", () => SparkEntry.queries("ann_ivf_kmeans_topk")(spark, dir)),
        ("ann_ivfpq_topk", "l2", () => SparkEntry.queries("ann_ivfpq_topk")(spark, dir)),
        ("emb_sq8_topk", "l2", () => SparkEntry.queries("emb_sq8_topk")(spark, dir)))

    // two-stage IVFPQ: ADC SHORTLIST (wider cutoff) → exact L2 re-rank on the
    // raw vectors. Pure ADC with PQ_M code bytes saturates at large N; the
    // production shape keeps the cheap ADC scan to cut millions of candidates
    // to ~100 and spends exact distance work only there.
    def rerankShortlist(): DataFrame =
      if (mode == "probe")
        functions.AnnIndex.probeIvfPq(spark, dir, indexDir, topK = 100)
      else
        functions.SimilarityQueries.ivfPqAdcRanked(spark, dir, 100)

    // warmup (JIT + parquet footer cache), then timed
    approx.foreach { case (_, _, f) =>
      try pairs(f()) catch { case _: Throwable => () }
    }
    val (exactCosDf, cosSec) = timed {
      val df = SparkEntry.queries("ann_brute_force_topk")(spark, dir)
        .select(col("q_id").cast("long"), col("n_id").cast("long"),
          (lit(1.0) - col("sim")).as("d")).cache()
      df.count(); df
    }
    val (exactEuDf, l2Sec) = timed {
      val df = exactL2(spark, dir)
        .select(col("q_id").cast("long"), col("n_id").cast("long"),
          col("d2").as("d")).cache()
      df.count(); df
    }
    def truthOf(df: DataFrame): (Set[(Long, Long)], Map[Long, Double]) = {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      (rows.map(t => (t._1, t._2)).toSet,
        rows.groupBy(_._1).map { case (q, ts) => q -> ts.map(_._3).max })
    }
    val (cosPairs, cosKth) = truthOf(exactCosDf)
    val (euPairs, euKth) = truthOf(exactEuDf)

    // Oracle-gated capability probes with FIXED test-scale parameters
    // (NLIST=8 / nprobe=1, sized for the sf fixtures so DuckDB can recompute
    // the exact derivation): their recall DEGRADES by design as the store
    // grows — the oracle gates the math, not retrieval quality. The scaled
    // √N tier (ann_ivf_scaled_topk) is the production retrieval-quality
    // number; this flag keeps the two unmistakable in the evidence JSON.
    val testScaleOnly = Set("ann_ivf_topk", "ann_ivf_kmeans_topk")

    def score(name: String, metric: String, res: DataFrame, sec: Double): String = {
      val truth = if (metric == "cos") cosPairs else euPairs
      val kth = if (metric == "cos") cosKth else euKth
      val got = pairs(res)
      val strict = (got & truth).size.toDouble / truth.size
      val hits = trueDists(spark, dir, res, metric).count { case (q, td) =>
        kth.get(q).exists(dk => td <= dk * (1 + TIE_REL) + TIE_ABS)
      }
      val tie = hits.toDouble / truth.size
      val flag = if (testScaleOnly(name)) ""","test_scale_only":true""" else ""
      s""""$name":{"recall":$strict,"tie_recall":$tie,"sec":$sec,"truth":"$metric"$flag}"""
    }

    val entries = approx.map { case (n, gt, f) =>
      val (res, sec) = timed { val df = f().cache(); df.count(); df }
      val out = score(n, gt, res, sec)
      res.unpersist(); out
    } ++ {
      val (rr, rrSec) = timed {
        val df = rerank(spark, dir, rerankShortlist()).cache(); df.count(); df
      }
      val out = score("ann_ivfpq_rerank_topk", "l2", rr, rrSec)
      rr.unpersist(); Seq(out)
    } ++ Seq(
      s""""exact_cosine":{"recall":1.0,"tie_recall":1.0,"sec":$cosSec,"truth":"cos"}""",
      s""""exact_l2":{"recall":1.0,"tie_recall":1.0,"sec":$l2Sec,"truth":"l2"}""")
    val buildField = buildSec.map(b => s""""build_sec":$b,""").getOrElse("")
    println(s"""{"metric":"ann_recall","mode":"$mode",$buildField"store_rows":$storeRows,"k":$TOPK,"n_queries":$NQUERY,"tie_rel":$TIE_REL,"queries":${entries.mkString("{", ",", "}")},"sf":"$dir"}""")
    spark.stop()
  }
}
