package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table: token stats, quality
  * scoring, language ID, fingerprinting. No reference counterpart (hyrise has no
  * text functions beyond SUBSTR/CONCAT — reference:
  * src/lib/expression/function_expression.hpp:14-18); these are the
  * training-data-pipeline extensions, built as pure codegen expressions so a
  * 100 TB corpus scans them at parquet speed with zero shuffles (all per-row). */
object TextQueries {
  import TextFunctions._

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.dfSpread(s, dir, "documents")

  /** Token + char counting (BPE-ish subword estimate = ceil(chars/4) heuristic). */
  val textTokenCount: Q = Q(
    "text_token_count",
    s"""SELECT doc_id,
       |  ${tokenCountSql("text")} AS n_tokens,
       |  length(text) AS chars,
       |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    docs(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      length(col("text")).cast("long").as("chars"),
      ceil(length(col("text")) / 4.0).cast("long").as("bpe_est"))
      .orderBy("doc_id")
  }

  /** Quality ratios: avg word length, stopword ratio, digit ratio, plus a
    * composite score — all integer-ratio doubles, deterministic across engines. */
  val textQuality: Q = {
    val stops = langMarkers.flatMap(_._2)
    Q(
      "text_quality",
      s"""SELECT doc_id, n_tokens,
         |  lensum / n_tokens AS avg_word_len,
         |  n_stop / n_tokens AS stop_ratio,
         |  n_digit / chars AS digit_ratio,
         |  0.5 * (n_stop / n_tokens) + 0.3 * least(lensum / n_tokens / 10.0, 1.0)
         |    + 0.2 * (1.0 - n_digit / chars) AS quality_score
         |FROM (
         |  SELECT doc_id,
         |    CAST(${tokenCountSql("text")} AS DOUBLE) AS n_tokens,
         |    CAST(${tokenLenSumSql(tokensSql("text"))} AS DOUBLE) AS lensum,
         |    CAST(${markerCountSql(tokensSql("text"), stops)} AS DOUBLE) AS n_stop,
         |    CAST(${digitCountSql("text")} AS DOUBLE) AS n_digit,
         |    CAST(length(text) AS DOUBLE) AS chars
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ws = tokens(col("text"))
      val base = docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).cast("double").as("n_tokens"),
        tokenLenSum(ws).cast("double").as("lensum"),
        markerCount(ws, stops).cast("double").as("n_stop"),
        digitCount(col("text")).cast("double").as("n_digit"),
        length(col("text")).cast("double").as("chars"))
      base.select(
        col("doc_id"),
        col("n_tokens"),
        (col("lensum") / col("n_tokens")).as("avg_word_len"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        (col("n_digit") / col("chars")).as("digit_ratio"),
        (lit(0.5) * (col("n_stop") / col("n_tokens"))
          + lit(0.3) * least(col("lensum") / col("n_tokens") / 10.0, lit(1.0))
          + lit(0.2) * (lit(1.0) - col("n_digit") / col("chars"))).as("quality_score"))
        .orderBy("doc_id")
    }
  }

  /** Marker-based language ID (n-gram-free heuristic: per-language stopword hit
    * counts, argmax with fixed priority). Compared against the labeled `lang`
    * column for an agreement count per predicted language. */
  val textLangId: Q = Q(
    "text_lang_id",
    s"""SELECT pred_lang, COUNT(*) AS n,
       |  COUNT(*) FILTER (WHERE pred_lang = lang) AS agree
       |FROM (SELECT lang, ${langIdSql(tokensSql("text"))} AS pred_lang FROM documents)
       |GROUP BY pred_lang ORDER BY pred_lang""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("lang"), langId(tokens(col("text"))).as("pred_lang"))
      .groupBy("pred_lang")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("pred_lang") === col("lang"), 1)).as("agree"))
      .orderBy("pred_lang")
  }

  /** Document fingerprint (md5 of normalized text) per doc — the join key for
    * exact dedup and incremental corpus diffing. */
  val textFingerprint: Q = Q(
    "text_fingerprint",
    s"""SELECT doc_id, ${fingerprintSql("text")} AS fp, source
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"), col("source"))
      .orderBy("doc_id")
  }

  /** BPE-style pre-tokenization counting (regex family, not the chars/4
    * heuristic of text_token_count) — whitespace words vs BPE pre-tokens per
    * document, both engines splitting with the identical lookahead-free
    * pattern. */
  val textBpeTokens: Q = Q(
    "text_bpe_token_count",
    s"""SELECT doc_id,
       |  ${tokenCountSql("text")} AS n_words,
       |  ${bpeTokenCountSql("text")} AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    docs(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_words"),
      bpeTokenCount(col("text")).as("n_bpe"))
      .orderBy("doc_id")
  }

  /** PII-style redaction — regex scrubbing before a corpus ships to training:
    * email-shaped tokens and long digit runs replaced by placeholder tags,
    * match counts kept for audit. Map-only (one scan, zero shuffles besides
    * the presentation sort); the patterns stay in the RE2 ∩ java.util.regex
    * common dialect so both engines match identical spans. */
  val textRedact: Q = {
    val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val digitPat = "[0-9]{4,}"
    Q(
      "text_redact",
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$emailPat')) AS n_email,
         |  len(regexp_extract_all(text, '$digitPat')) AS n_digit_runs,
         |  md5(regexp_replace(regexp_replace(text, '$emailPat', '<EMAIL>', 'g'),
         |      '$digitPat', '<NUM>', 'g')) AS redacted_md5,
         |  length(regexp_replace(regexp_replace(text, '$emailPat', '<EMAIL>', 'g'),
         |      '$digitPat', '<NUM>', 'g')) AS redacted_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val redacted = regexp_replace(
        regexp_replace(col("text"), emailPat, "<EMAIL>"), digitPat, "<NUM>")
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).as("n_email"),
        size(regexp_extract_all(col("text"), lit(digitPat), lit(0))).as("n_digit_runs"),
        md5(redacted).as("redacted_md5"),
        length(redacted).cast("long").as("redacted_len"))
        .orderBy("doc_id")
    }
  }

  /** Corpus-statistics scoring: per-token DOCUMENT FREQUENCY from an inverted
    * index (explode distinct tokens → count distinct docs per token), joined
    * back to score each document by the mean df of its tokens — the
    * TF-IDF-family shape without the log (kept in exact integer ratios so the
    * oracle hash-matches; libm log() is not bit-portable across engines).
    * Low scores flag rare-vocabulary documents. Two keyed shuffles (df agg,
    * per-doc agg) + one equi join on token — the inverted-index plan that
    * scales linearly with corpus size. */
  val textDfScore: Q = Q(
    "text_df_score",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(${tokensSql("text")})) AS w FROM documents
       |), df AS (
       |  SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w
       |)
       |SELECT t.doc_id, COUNT(*) AS n_distinct_tokens, SUM(df.df) AS df_sum,
       |  SUM(df.df) / CAST(COUNT(*) AS DOUBLE) AS mean_df
       |FROM tok t JOIN df ON t.w = df.w
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("w"))
    val df = tok.groupBy("w").agg(countDistinct("doc_id").as("df"))
    tok.join(df, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_tokens"), sum("df").as("df_sum"))
      .select(col("doc_id"), col("n_distinct_tokens"), col("df_sum"),
        (col("df_sum") / col("n_distinct_tokens").cast("double")).as("mean_df"))
      .orderBy("doc_id")
  }

  /** Frequency-ranked vocabulary with cumulative corpus coverage — the
    * "how much vocab covers 95% of tokens" analysis behind tokenizer sizing
    * and stopword lists. Integer basis points (`div`) keep the oracle exact.
    *
    * Scale: the explode+count is one keyed shuffle with map-side combine over
    * the corpus; everything after operates on the VOCAB table (≪ corpus —
    * even web-scale text has ~10⁷ distinct tokens vs 10¹² occurrences), so
    * the unpartitioned rank/cumsum window is bounded by vocabulary size, not
    * data size. The corpus-total join is a broadcast of one row. */
  val textVocabCoverage: Q = Q(
    "text_vocab_coverage",
    s"""WITH tok AS (
       |  SELECT unnest(${tokensSql("text")}) AS w FROM documents
       |), c AS (
       |  SELECT w, COUNT(*) AS n FROM tok GROUP BY w
       |)
       |SELECT w, n,
       |  ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank,
       |  SUM(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING) AS cum_n,
       |  (10000 * SUM(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING))
       |    // (SELECT SUM(n) FROM c) AS coverage_bp
       |FROM c ORDER BY rank""".stripMargin) { (s, dir) =>
    val c = docs(s, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val byFreq = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("w"))
    val total = c.agg(sum("n").as("tot"))
    c.withColumn("rank", row_number().over(byFreq).cast("long")) // BIGINT like the oracle's ROW_NUMBER
      .withColumn("cum_n", sum("n").over(byFreq.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .join(broadcast(total))
      .withColumn("coverage_bp", expr("(10000 * cum_n) div tot"))
      .select("w", "n", "rank", "cum_n", "coverage_bp")
      .orderBy("rank")
  }

  /** Adjacent character-pair counts within words — the statistic behind the
    * first merge of BPE tokenizer TRAINING (Sennrich et al. 2016,
    * arXiv:1508.07909): the most frequent pair becomes the first merge rule;
    * iterating this map-reduce (re-count after each merge) trains the vocab.
    * One explode chain (tokens → pairs) + one keyed count with map-side
    * combine + TakeOrdered top-k — scales linearly with corpus size.
    * Deterministic tie-break (n DESC, pair) keeps the top-50 cut exact. */
  val textBpePairs: Q = Q(
    "text_bpe_pairs",
    s"""WITH tok AS (
       |  SELECT unnest(${tokensSql("text")}) AS w FROM documents
       |), pairs AS (
       |  SELECT unnest([substring(w, i, 2) for i in range(1, len(w))]) AS pair FROM tok
       |)
       |SELECT pair, COUNT(*) AS n FROM pairs
       |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
    val tok = docs(s, dir).select(explode(tokens(col("text"))).as("w"))
    // guard: Spark's sequence(1, 0) counts DOWN, so short words need an
    // explicit empty-array branch (DuckDB's range(1, 1) is already empty)
    val pairs = tok.select(explode(
      when(length(col("w")) >= 2,
        transform(sequence(lit(1), length(col("w")) - 1), i => col("w").substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(50)
  }

  // ------------------------------------------------------------------ BM25
  // Okapi BM25 retrieval ranking (Robertson & Walker 1994) for a fixed query
  // term set, with k1 = 6/5 and b = 3/4 carried as EXACT RATIONALS so the
  // whole score is integer arithmetic (libm log() is not bit-portable across
  // engines — see textDfScore — so the idf keeps the odds-ratio
  // (N − df + ½)/(df + ½) = (2N−2df+1)/(2df+1) un-logged; ln is monotone, so
  // each term's contribution ranks documents identically; swap ln in at the
  // presentation layer when absolute score calibration matters).
  // Derivation, with S = total corpus tokens, N = docs, dl = doc length,
  // avgdl = S/N:
  //   tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) = 22·S·tf/(10·S·tf + 3·S + 9·dl·N)
  // Both factors are floored to 1e-6 micro-units before the product, so every
  // intermediate is an i64 and the oracle hash-matches bit-for-bit.
  // Scale plan: explode+filter to the query's terms only (map-side, the
  // filter prunes the inverted index to |Q| postings lists), one keyed agg
  // for tf, a tiny df/corpus-stats broadcast, top-k via one window over the
  // scored docs. Linear in corpus size, no all-pairs work.
  private val BM25_TERMS = Seq("vector", "hash", "stream", "merge", "filter")
  private val BM25_K = 10

  /** The BM25 scoring CTE chain (corpus stats → postings → tf → df → per-doc
    * score_u), shared verbatim between [[textBm25]] and the hybrid-retrieval
    * fusion ([[RetrievalQueries]]) so the two surfaces cannot drift. */
  private[functions] val bm25CtesSql: String = {
    val termsSqlList = BM25_TERMS.map(t => s"'$t'").mkString(", ")
    s"""corpus AS (
       |  SELECT COUNT(*) AS n_docs, SUM(${tokenCountSql("text")}) AS s_tok FROM documents
       |), tok AS (
       |  SELECT doc_id, ${tokenCountSql("text")} AS dl,
       |    unnest(${tokensSql("text")}) AS w
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, MIN(dl) AS dl, w, COUNT(*) AS tf FROM tok
       |  WHERE w IN ($termsSqlList) GROUP BY doc_id, w
       |), df AS (
       |  SELECT w, COUNT(*) AS df FROM tf GROUP BY w
       |), scored AS (
       |  SELECT t.doc_id, MIN(t.dl) AS dl, COUNT(*) AS n_terms,
       |    SUM(((1000000 * (2 * c.n_docs - 2 * df.df + 1)) // (2 * df.df + 1))
       |        * ((1000000 * 22 * c.s_tok * t.tf)
       |           // (10 * c.s_tok * t.tf + 3 * c.s_tok + 9 * t.dl * c.n_docs))
       |        // 1000000) AS score_u
       |  FROM tf t JOIN df ON t.w = df.w CROSS JOIN corpus c
       |  GROUP BY t.doc_id
       |)""".stripMargin
  }

  /** DataFrame twin of [[bm25CtesSql]]'s `scored`: (doc_id, dl, n_terms,
    * score_u) for the fixed query term set. */
  private[functions] def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val corpus = d.agg(count(lit(1)).as("n_docs"), sum(tokenCount(col("text"))).as("s_tok"))
    val tok = d.select(col("doc_id"), tokenCount(col("text")).as("dl"),
      explode(tokens(col("text"))).as("w"))
    val tf = tok.filter(col("w").isin(BM25_TERMS: _*))
      .groupBy("doc_id", "w").agg(min("dl").as("dl"), count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val term = expr(
      """((1000000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1))
        | * ((1000000 * 22 * s_tok * tf)
        |    div (10 * s_tok * tf + 3 * s_tok + 9 * dl * n_docs))
        | div 1000000""".stripMargin)
    tf.join(broadcast(df), "w").crossJoin(broadcast(corpus))
      .groupBy("doc_id")
      .agg(min("dl").as("dl"), count(lit(1)).as("n_terms"), sum(term).as("score_u"))
  }

  val textBm25: Q = {
    Q(
      "text_bm25_topk",
      s"""WITH $bm25CtesSql
         |SELECT doc_id, dl, n_terms, score_u, rk FROM (
         |  SELECT doc_id, dl, n_terms, score_u,
         |    ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rk
         |  FROM scored) WHERE rk <= $BM25_K
         |ORDER BY rk""".stripMargin) { (s, dir) =>
      val wTop = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_u").desc, col("doc_id"))
      // top-k over per-doc scores: the global window runs on ≤N scored docs,
      // and BM25_K ≪ N makes a TakeOrdered plan equally valid; row_number
      // keeps rank dense + deterministic for the oracle
      bm25Scored(s, dir).withColumn("rk", row_number().over(wTop).cast("long"))
        .filter(col("rk") <= BM25_K)
        .orderBy("rk")
    }
  }

  val all: Seq[Q] = Seq(textTokenCount, textQuality, textLangId, textFingerprint,
    textBpeTokens, textRedact, textDfScore, textVocabCoverage, textBpePairs, textBm25)
}
