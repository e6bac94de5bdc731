package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval compositions over `documents` + `embeddings` (the two tables
  * share the 0..N-1 id space): attribute-FILTERED vector search and
  * BM25⊕vector hybrid fusion — the two operations a RAG/search stack runs on
  * top of the raw ANN index (FAISS IDSelector / Milvus filtered search;
  * reciprocal rank fusion, Cormack 2009). No reference counterpart (hyrise
  * has no vector or text retrieval); these are training/serving-pipeline
  * extensions like the rest of the similarity family. */
object RetrievalQueries {
  import SimilarityQueries.{quantize, quantizeSql, dotL, dotLSql}

  private val TOPK = 3
  private val NQUERY = 10
  private val RRF_K = 60        // the standard RRF damping constant
  private val RRF_DEPTH = 50    // fuse the top-50 of each ranked list

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.dfSpread(s, dir, "embeddings")

  private def cosSql(a: String, b: String): String =
    s"(CAST(${dotLSql(a, b)} AS DOUBLE) / (sqrt(CAST(${dotLSql(a, a)} AS DOUBLE)) * sqrt(CAST(${dotLSql(b, b)} AS DOUBLE))))"
  private def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    dotL(a, b).cast("double") /
      (sqrt(dotL(a, a).cast("double")) * sqrt(dotL(b, b).cast("double")))

  /** Attribute-filtered ANN: each query's top-k among ONLY the corpus vectors
    * sharing its label — the metadata-predicate vector search every serving
    * stack needs (FAISS IDSelector; SQL `WHERE label = ?` next to ORDER BY
    * distance). Spark-first: the label predicate becomes a JOIN KEY, so the
    * "filter" rides the hash join's partitioning instead of a post-distance
    * filter — candidates are pruned BEFORE any distance arithmetic, the plan
    * a 100 TB filtered search needs (per-label cells, not corpus scans). */
  val annFiltered: Q = Q(
    "ann_filtered_topk",
    s"""WITH quant AS (
       |  SELECT vec_id, label, ${quantizeSql("embedding")} AS qe FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS q_id, q.label, c.vec_id AS n_id,
       |    ${cosSql("q.qe", "c.qe")} AS sim
       |  FROM quant q JOIN quant c ON q.label = c.label AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQUERY
       |)
       |SELECT q_id, label, n_id, sim, rk FROM (
       |  SELECT q_id, label, n_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
       |  FROM scored) WHERE rk <= $TOPK
       |ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
    val quant = emb(s, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qe"))
    val q = quant.filter(col("vec_id") < NQUERY)
      .select(col("vec_id").as("q_id"), col("label"), col("qe").as("qq"))
    val c = quant.select(col("vec_id").as("n_id"), col("label").as("c_label"), col("qe"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(q)
      .join(c, col("label") === col("c_label") && col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("label"), col("n_id"), cos(col("qq"), col("qe")).as("sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TOPK)
      .orderBy("q_id", "rk")
  }

  /** Hybrid retrieval: reciprocal rank fusion (Cormack 2009) of the BM25
    * ranked list (term-set query over `documents`) and the dense ranked list
    * (cosine vs query vector 0 over `embeddings`) — the standard hybrid
    * search combiner, exact because RRF only needs RANKS: contribution =
    * 1e6 // (60 + rank), an integer; the fused score is a sum of at most two
    * integers. Lists fuse at depth $RRF_DEPTH via FULL OUTER join on the doc
    * id (a doc ranked by only one list still scores).
    * Scale: both ranked lists are top-$RRF_DEPTH windows over their own
    * (corpus-sized, keyed-agg) scores; the fusion joins two 50-row sets —
    * driver-free, broadcast-trivial. */
  val hybridRrf: Q = Q(
    "ret_hybrid_rrf",
    s"""WITH ${TextQueries.bm25CtesSql},
       |bmr AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS r
       |  FROM scored QUALIFY r <= $RRF_DEPTH
       |), quant AS (
       |  SELECT vec_id, ${quantizeSql("embedding")} AS qe FROM embeddings
       |), qv AS (
       |  SELECT qe FROM quant WHERE vec_id = 0
       |), vecr AS (
       |  SELECT vec_id AS doc_id,
       |    ROW_NUMBER() OVER (ORDER BY ${cosSql("c.qe", "q.qe")} DESC, vec_id) AS r
       |  FROM quant c CROSS JOIN qv q WHERE c.vec_id <> 0
       |  QUALIFY r <= $RRF_DEPTH
       |), fused AS (
       |  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(1000000 // ($RRF_K + b.r), 0)
       |      + COALESCE(1000000 // ($RRF_K + v.r), 0) AS rrf_u
       |  FROM bmr b FULL OUTER JOIN vecr v ON b.doc_id = v.doc_id
       |)
       |SELECT doc_id, rrf_u, rk FROM (
       |  SELECT doc_id, rrf_u,
       |    ROW_NUMBER() OVER (ORDER BY rrf_u DESC, doc_id) AS rk
       |  FROM fused) WHERE rk <= 10
       |ORDER BY rk""".stripMargin) { (s, dir) =>
    val wBm = Window.orderBy(col("score_u").desc, col("doc_id"))
    val bmr = TextQueries.bm25Scored(s, dir)
      .withColumn("r_bm", row_number().over(wBm).cast("long"))
      .filter(col("r_bm") <= RRF_DEPTH).select("doc_id", "r_bm")
    val quant = emb(s, dir).select(col("vec_id"), quantize(col("embedding")).as("qe"))
    val qv = quant.filter(col("vec_id") === 0).select(col("qe").as("qq"))
    val wVec = Window.orderBy(col("sim").desc, col("vec_id"))
    val vecr = quant.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"), cos(col("qe"), col("qq")).as("sim"))
      .withColumn("r_vec", row_number().over(wVec).cast("long"))
      .filter(col("r_vec") <= RRF_DEPTH)
      .select(col("vec_id").as("v_doc"), col("r_vec"))
    val wTop = Window.orderBy(col("rrf_u").desc, col("doc_id"))
    bmr.join(vecr, col("doc_id") === col("v_doc"), "full_outer")
      .select(coalesce(col("doc_id"), col("v_doc")).as("doc_id"),
        (coalesce(expr(s"1000000 div ($RRF_K + r_bm)"), lit(0L))
          + coalesce(expr(s"1000000 div ($RRF_K + r_vec)"), lit(0L))).as("rrf_u"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= 10)
      .orderBy("rk")
  }

  val all: Seq[Q] = Seq(annFiltered, hybridRrf)
}
