package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-family N× scale-up with REALISTIC duplicate structure, so the
  * dedup/ANN operators can be scale-MEASURED (the TPC-H family got this via
  * `ScaleUp`; the corpus family was only plan-audited until now).
  *
  * Naive N× replication (ScaleUp) is wrong for dedup benching: every document
  * would gain N−1 exact copies, so LSH band buckets hold N docs each and the
  * per-bucket pair enumeration degenerates to O(N²) per base doc — a dup
  * density no real corpus has. Instead:
  *
  *  - copy 0 is the original corpus, verbatim;
  *  - every 10th base doc keeps copies 1–2 verbatim too → 10% of base docs
  *    become exact-duplicate clusters of size 3 (bounded, realistic — this is
  *    the dup rate large web corpora show after coarse URL dedup);
  *  - all other copies REWRITE every 3rd word to a copy-salted form
  *    ("s<k><word>"). With the dedup family's 3-word shingles
  *    (DedupQueries.NGRAM) every shingle window of a salted copy contains a
  *    salted position, so cross-copy shingle overlap is exactly zero — the
  *    copies are genuinely distinct documents, not near-dups. Crucially the
  *    rewrite PRESERVES each window's specificity (the salted token is a
  *    function of the word it replaces, so a window's document frequency
  *    within a copy equals the base corpus's df for that window): the scaled
  *    corpus's shingle-df histogram is N disjoint replicas of the base
  *    histogram, which is exactly "N× more data from the same distribution".
  *    Earlier drafts that INSERTED a constant or echo token between words
  *    degraded windows to bigram strength and inflated hot-shingle df far
  *    beyond anything the base distribution has — a generator artifact, not
  *    a corpus property. (The template-boilerplate stress where copies share
  *    half their shingles is covered separately by the naive-replication
  *    sf10 bench.);
  *  - embeddings follow the same rule: 10% exact triples, the rest jittered
  *    per-component with a per-copy SPREAD amplitude (deterministic in
  *    (vec_id, copy); see [[scaleEmbeddings]]) so each base vector gains a
  *    few genuine near-duplicates, a mid-range shell, and a far tail — the
  *    distance structure a real corpus shows — instead of `factor` copies at
  *    one exactly-tied distance (which makes exact-top-k ground truth
  *    unrecoverable and recall measurement meaningless).
  *
  * Deterministic end to end (no Random), distributed end to end (broadcast
  * copy fan-out, map-only transforms, multi-file parquet out). Only the two
  * corpus tables are written — the corpus queries read nothing else.
  *
  * Usage: `runMain graft.ScaleUpCorpus <srcSfDir> <dstDir> [factor=10]`, then
  * `SPARK_GRAFT_SF_DIR=<dstDir> SPARK_GRAFT_BENCH_NAMES=dedup_... runMain
  * graft.Bench`. Bench-evidence tooling, not part of the driver contract.
  */
object ScaleUpCorpus {

  /** Exact-dup rule shared by both tables: base key ≡ 0 (mod 10) keeps its
    * first `DupClusterSize` copies verbatim. */
  private val DupClusterSize = 3

  def scaleDocuments(docs: DataFrame, factor: Int, stride: Long): DataFrame = {
    val copies = broadcast(docs.sparkSession.range(factor.toLong).toDF("copy_k"))
    val keepVerbatim =
      col("copy_k") === 0 ||
        (col("doc_id") % 10 === 0 && col("copy_k") < DupClusterSize)
    // rewrite every 3rd word to its copy-salted form (see scaladoc: zero
    // cross-copy shingle overlap at NGRAM=3 with the base df histogram
    // preserved within each copy)
    val salted = regexp_replace(
      col("text"), lit("((?:\\S+\\s+){2})(\\S+)"),
      concat(lit("$1s"), col("copy_k").cast("string"), lit("$2")))
    docs.crossJoin(copies)
      .withColumn("text", when(keepVerbatim, col("text")).otherwise(salted))
      .select(
        (col("doc_id") + col("copy_k") * stride).cast("long").as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("int").as("n_chars"))
  }

  def scaleEmbeddings(emb: DataFrame, factor: Int, stride: Long): DataFrame = {
    val copies = broadcast(emb.sparkSession.range(factor.toLong).toDF("copy_k"))
    val keepVerbatim =
      col("copy_k") === 0 ||
        (col("vec_id") % 10 === 0 && col("copy_k") < DupClusterSize)
    // SPREAD jitter: each copy gets its own deterministic amplitude
    // amp(vec_id, copy_k) ∈ [0.02, 0.70] — d²(base, copy) ≈ amp²·D/2 then
    // spans [0.013, ~15.7], so the exact top-k among a base's copies is
    // WELL-SEPARATED. An earlier fixed-amplitude draft (0.05 for every copy)
    // made all of a base's ~factor copies an exact L2 tie at d²≈0.079 —
    // id-tiebroken "exact top-k" truth was unrecoverable by construction and
    // recall measured tiebreak agreement, not retrieval (the r10 0.067
    // artifact). sqrt(u) pushes amplitude mass UPWARD so the few nearest
    // copies are sparse: at factor=1000 the 1st/2nd/3rd-nearest amplitudes
    // land around 0.04/0.05/0.056 with ≳10% relative d² gaps — resolvable by
    // the quantized tiers, unlike uniform order statistics whose near-minimum
    // gaps shrink as range/factor.
    val jittered = expr(
      "transform(embedding, (x, i) -> cast(x + j_amp * sin(vec_id * 1.7d + copy_k * 0.61d + i) as float))")
    emb.crossJoin(copies)
      .withColumn("j_u",
        expr("(abs(sin(vec_id * 12.9898d + copy_k * 78.233d)) * 43758.5453d) % 1.0d"))
      .withColumn("j_amp", expr("0.02d + 0.68d * sqrt(j_u)"))
      .withColumn("embedding", when(keepVerbatim, col("embedding")).otherwise(jittered))
      .select(
        (col("vec_id") + col("copy_k") * stride).cast("long").as("vec_id"),
        col("embedding"), col("label"))
  }

  def main(args: Array[String]): Unit = {
    val (src, dst) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-scale-up-corpus"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.df(spark, src, "documents")
    val emb = Tables.df(spark, src, "embeddings")
    val docStride = docs.agg(max(col("doc_id").cast("long"))).collect()(0).getLong(0) + 1L
    val vecStride = emb.agg(max(col("vec_id").cast("long"))).collect()(0).getLong(0) + 1L

    val parts = math.max(8, factor / 4)
    scaleDocuments(docs, factor, docStride)
      .repartition(parts).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaleEmbeddings(emb, factor, vecStride)
      .repartition(parts).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // sanity facts for the bench-evidence record
    val d = spark.read.parquet(s"$dst/documents.parquet")
    val dupClusters = d.groupBy(md5(col("text"))).count().filter(col("count") > 1)
    println(s"documents: ${d.count()} rows, " +
      s"exact-dup clusters: ${dupClusters.count()} " +
      s"(max size ${dupClusters.agg(max("count")).collect()(0).getLong(0)})")
    println(s"embeddings: ${spark.read.parquet(s"$dst/embeddings.parquet").count()} rows")
    spark.stop()
  }
}
