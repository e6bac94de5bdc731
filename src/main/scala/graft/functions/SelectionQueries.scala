package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-SELECTION operators — the published methods a pretraining pipeline
  * runs to choose WHICH documents train, on top of the per-doc stats
  * (TextQueries) and near-dup machinery (DedupQueries):
  *
  *   - benchmark decontamination with a broadcast Bloom prefilter
  *     (GPT-3 appendix C / PaLM §C: n-gram overlap against eval sets — the
  *     eval side is tiny, so at 100 TB the right plan ships a Bloom filter of
  *     eval shingles to every task and never shuffles the corpus);
  *   - DSIR importance weights (Xie et al. 2023, arXiv:2302.03169: hashed
  *     n-gram features, target-vs-raw likelihood ratios, resample top-k);
  *   - a fastText-style linear quality classifier (CCNet, Wenzek et al. 2020,
  *     arXiv:1911.00359 §4.3; RefinedWeb, Penedo et al. 2023: a linear model
  *     over cheap per-doc features gates the corpus before anything
  *     expensive runs).
  *
  * Same design rules as the rest of functions/: per-row logic is pure
  * Catalyst `Column` expressions (codegen'd, zero UDFs), every aggregate is
  * keyed, and each oracle twin is generated from the SAME constants so the
  * engines cannot drift. All scoring is integer fixed-point (basis points /
  * ppm with `div` // floor semantics) so hashes match exactly. */
object SelectionQueries {
  import TextFunctions._

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.dfSpread(s, dir, "documents")

  // ------------------------------------------- Bloom-prefiltered decontamination
  // A pseudo-benchmark slice (hash bucket of doc_id) stands in for the eval
  // suites; contamination = a train doc sharing >= BLOOM_OVERLAP_MIN distinct
  // word-NGRAM shingles with any eval doc (integer shingle keys shared with
  // the dedup family). The SPARK plan is the 100 TB shape: the eval shingle
  // set is collected once (eval benchmarks are KBs-to-MBs by nature — this is
  // the one driver-side step, and it is over the EVAL side only, never the
  // corpus), packed into a Bloom bit array that ships inside the plan as a
  // literal (the same mechanism as a broadcast var), and the corpus-side scan
  // drops non-member shingles map-side. Only the tiny surviving candidate set
  // reaches the exact confirm join, which removes Bloom false positives — so
  // the RESULT is exact and the DuckDB oracle is the plain exact SQL with no
  // Bloom at all. Three probe positions come from disjoint 20-bit fields of
  // the 60-bit md5-derived shingle key (uniform bits, zero extra hashing).
  private val BLOOM_EVAL_PCT = 7L // pseudo-benchmark slice, distinct from cur_decontaminate's
  private val BLOOM_OVERLAP_MIN = 3L

  val bloomDecontaminate: Q = Q(
    "cur_bloom_decontaminate",
    s"""WITH hsg AS (
       |  SELECT doc_id, ${hash64Sql("CAST(doc_id AS VARCHAR)", "beval")} % 100 AS bucket,
       |    ${shingleKeysSql("ws", "th", DedupQueries.NGRAM)} AS hsg
       |  FROM (SELECT doc_id, ws, ${tokenHashesSql("ws")} AS th
       |        FROM (SELECT doc_id, ${tokensSql("text")} AS ws FROM documents))
       |), eval_sh AS (
       |  SELECT DISTINCT s FROM (SELECT unnest(hsg) AS s FROM hsg WHERE bucket < $BLOOM_EVAL_PCT)
       |), train_sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(hsg) AS s FROM hsg WHERE bucket >= $BLOOM_EVAL_PCT)
       |)
       |SELECT t.doc_id, COUNT(*) AS n_overlap
       |FROM train_sh t JOIN eval_sh e ON t.s = e.s
       |GROUP BY t.doc_id
       |HAVING COUNT(*) >= $BLOOM_OVERLAP_MIN
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val d = docs(s, dir)
    val isEval = hash64(col("doc_id").cast("string"), "beval") % 100 < BLOOM_EVAL_PCT
    val evalSh = TextFunctions.explodeNoReeval(
      DedupQueries.hsgOf(d.filter(isEval)), Seq.empty, col("hsg"), "s").distinct()

    // Driver-side Bloom build over the EVAL shingles only (small by nature).
    val evalKeys = evalSh.collect().map(_.getLong(0))
    val mBits = {
      val want = math.max(4096L, evalKeys.length.toLong * 16L)
      var m = 4096L; while (m < want && m < (1L << 20)) m <<= 1; m
    }
    val mask = mBits - 1L
    // packed 64-bit bitmap, not array<boolean>: the filter literal shrinks
    // 64× (2²⁰ bits = 16k longs), keeping plan serialization + codegen cheap
    // (the boolean-array literal was the dominant cost of this query at 10×
    // corpus scale: 12.6 s vs 2.6 s for the no-bloom exact variant)
    val bloom = new Array[Long]((mBits / 64).toInt)
    def setBit(i: Long): Unit = bloom((i >>> 6).toInt) |= (1L << (i & 63L))
    evalKeys.foreach { k =>
      setBit(k & mask); setBit((k >> 20) & mask); setBit((k >> 40) & mask)
    }
    val bloomLit = typedLit(bloom.toSeq)
    // bit test: word >> (idx & 63) & 1, with the named bitmap column so the
    // SQL shift (which, unlike the Column API, takes an expression shift)
    // references the literal once
    def probeSql(i: String): String =
      s"((element_at(bm, cast(shiftright($i, 6) as int) + 1) >> cast($i % 64 as int)) & 1) = 1"

    val trainSh = TextFunctions.explodeNoReeval(
      DedupQueries.hsgOf(d.filter(!isEval)), Seq(col("doc_id")), col("hsg"), "s")
      .distinct()
    trainSh
      .withColumn("bm", bloomLit)
      .withColumn("i0", col("s").bitwiseAND(lit(mask)))
      .withColumn("i1", shiftright(col("s"), 20).bitwiseAND(lit(mask)))
      .withColumn("i2", shiftright(col("s"), 40).bitwiseAND(lit(mask)))
      // map-side Bloom drop: the corpus never shuffles non-members
      .filter(expr(s"${probeSql("i0")} AND ${probeSql("i1")} AND ${probeSql("i2")}"))
      .select("doc_id", "s")
      .join(broadcast(evalSh), "s") // exact confirm removes Bloom false positives
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= BLOOM_OVERLAP_MIN)
      .orderBy("doc_id")
  }

  // -------------------------------------------------- DSIR importance weights
  // Xie et al. 2023 (arXiv:2302.03169): represent each doc by hashed n-gram
  // features, weight it by how target-like its features are, resample top-k.
  // Feature space = unigram and bigram hashes mod DSIR_B; target = the 'en'
  // slice (a real pipeline passes its high-quality target corpus). The
  // per-feature affinity is the integer-exact surrogate of the DSIR
  // log-likelihood ratio: target share in ppm with add-one smoothing,
  //   affinity(b) = (1e6 * (ct_target+1)) div (ct_target + ct_raw + 2),
  // monotone in p_target/p_raw per feature; per-doc weight = sum of the
  // affinities of its feature OCCURRENCES.
  // Scale: feature counting is one keyed agg with map-side combine into a
  // DSIR_B-row table that BROADCASTS back to the doc-side explode; the only
  // corpus-sized shuffle is the per-doc re-aggregation on doc_id.
  private val DSIR_B = 4096L // hashed feature buckets
  private val DSIR_K = 50L   // resample size

  private def dsirFeats(ws: Column): Column = concat(
    transform(ws, w => hash64(w, "dsiru") % DSIR_B),
    transform(shingles(ws, 2), g => hash64(g, "dsirb") % DSIR_B))
  private def dsirFeatsSql(ws: String): String =
    s"list_concat([${hash64Sql("w", "dsiru")} % $DSIR_B for w in $ws], " +
      s"[${hash64Sql("g", "dsirb")} % $DSIR_B for g in ${shinglesSql(ws, 2)}])"

  val dsirWeights: Q = Q(
    "cur_dsir_weights",
    s"""WITH feat AS (
       |  SELECT doc_id, lang, unnest(${dsirFeatsSql("ws")}) AS b
       |  FROM (SELECT doc_id, lang, ${tokensSql("text")} AS ws FROM documents)
       |), cts AS (
       |  SELECT b, COUNT(*) AS raw_ct,
       |    COUNT(*) FILTER (WHERE lang = 'en') AS tgt_ct
       |  FROM feat GROUP BY b
       |), aff AS (
       |  SELECT b, (1000000 * (tgt_ct + 1)) // (tgt_ct + raw_ct + 2) AS affinity
       |  FROM cts
       |)
       |SELECT doc_id, weight FROM (
       |  SELECT f.doc_id, SUM(a.affinity) AS weight
       |  FROM feat f JOIN aff a ON f.b = a.b
       |  GROUP BY f.doc_id)
       |ORDER BY weight DESC, doc_id LIMIT $DSIR_K""".stripMargin) { (s, dir) =>
    val feat = TextFunctions.explodeNoReeval(
      docs(s, dir).select(col("doc_id"), col("lang"), tokens(col("text")).as("ws")),
      Seq(col("doc_id"), col("lang")), dsirFeats(col("ws")), "b")
    val aff = feat.groupBy("b")
      .agg(count(lit(1)).as("raw_ct"),
        count(when(col("lang") === "en", 1)).as("tgt_ct"))
      .select(col("b"),
        expr("(1000000 * (tgt_ct + 1)) div (tgt_ct + raw_ct + 2)").as("affinity"))
    feat.join(broadcast(aff), "b")
      .groupBy("doc_id").agg(sum("affinity").as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(DSIR_K.toInt)
  }

  // --------------------------------------------- linear quality classifier
  // CCNet (arXiv:1911.00359 §4.3) / RefinedWeb gate the corpus with a linear
  // (fastText) classifier over cheap surface features; the weights here are a
  // fixed stand-in for the trained model (a real pipeline loads its own), and
  // the ENGINE side — map-only integer feature extraction + dot product +
  // threshold, all inside whole-stage codegen — is the load-bearing part.
  // Features (integer fixed-point): stopword ratio (bp), distinct-token
  // ratio (bp), digit ratio (bp), avg token length (centichars), capped
  // token count. Score = w·x; keep = score >= threshold.
  private val QL_THRESHOLD = 61000L // near the corpus median — a real pipeline calibrates on held-out labels
  private val allStopwords: Seq[String] = langMarkers.flatMap(_._2).distinct

  val qualityLinear: Q = Q(
    "cur_quality_linear",
    s"""SELECT doc_id,
       |  20 * stop_bp + 10 * dist_bp - 30 * digit_bp + 5 * len_centi
       |    + 2 * least(n_tok, 200) AS score,
       |  CASE WHEN 20 * stop_bp + 10 * dist_bp - 30 * digit_bp + 5 * len_centi
       |    + 2 * least(n_tok, 200) >= $QL_THRESHOLD THEN 1 ELSE 0 END AS keep_flag
       |FROM (
       |  SELECT doc_id, len(ws) AS n_tok,
       |    (10000 * ${markerCountSql("ws", allStopwords)}) // len(ws) AS stop_bp,
       |    (10000 * len(list_distinct(ws))) // len(ws) AS dist_bp,
       |    (10000 * (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))))
       |      // length(text) AS digit_bp,
       |    (100 * list_sum([length(w) for w in ws])) // len(ws) AS len_centi
       |  FROM (SELECT doc_id, text, ${tokensSql("text")} AS ws FROM documents)
       |)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val base = docs(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        expr(s"(10000 * ${markerCountScala}) div size(ws)").as("stop_bp"),
        expr("(10000 * size(array_distinct(ws))) div size(ws)").as("dist_bp"),
        expr("(10000 * (length(text) - length(regexp_replace(text, '[0-9]', ''))))" +
          " div length(text)").as("digit_bp"),
        expr("(100 * aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x))" +
          " div size(ws)").as("len_centi"))
    val score = expr(s"20 * stop_bp + 10 * dist_bp - 30 * digit_bp + 5 * len_centi" +
      s" + 2 * least(n_tok, 200L)")
    base.select(col("doc_id"), score.as("score"),
      when(score >= QL_THRESHOLD, 1).otherwise(0).as("keep_flag"))
      .orderBy("doc_id")
  }

  /** Spark-SQL fragment counting stopword tokens (same list as the oracle). */
  private def markerCountScala: String = {
    val list = allStopwords.map(m => s"'$m'").mkString("array(", ", ", ")")
    s"size(filter(ws, w -> array_contains($list, w)))"
  }

  // ----------------------------------------------- bigram-LM fluency score
  // Perplexity filtering (CCNet §4.2 trains a 5-gram KenLM and keeps the
  // low-perplexity tail; Gopher/MassiveText and RefinedWeb run the same
  // gate): score each doc by how probable its token transitions are under a
  // language model estimated FROM THE CORPUS ITSELF. Here the LM is a
  // hashed-bucket bigram model (count-sketch style, LM_B buckets — bounded
  // state regardless of corpus size) with add-one smoothing, and the score
  // is the integer-exact surrogate of the per-bigram average probability:
  //   p_ppm(w1 w2) = (1e6 * (c(w1 w2) + 1)) div (c(w1 ·) + LM_B)
  //   fluency_ppm(doc) = SUM(p_ppm) div n_bigrams
  // (monotone in the geometric-mean probability's arithmetic companion;
  // log-free so the DuckDB oracle compares bit-exactly). High score = the
  // doc's transitions are common corpus-wide = "fluent"; gibberish and
  // shuffled text score low.
  // Scale: POSITIONAL bigrams (every occurrence) explode map-side; the two
  // count tables are keyed aggs bounded at LM_B rows each, so they BROADCAST
  // back regardless of corpus size; the only corpus-sized shuffle is the
  // final per-doc re-aggregation — the same shape as cur_dsir_weights.
  private val LM_B = 4096L

  val lmFluency: Q = Q(
    "text_lm_fluency",
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    ${hash64Sql("g", "lmb")} % $LM_B AS bg,
       |    ${hash64Sql("string_split(g, ' ')[1]", "lmu")} % $LM_B AS cx
       |  FROM (
       |    SELECT doc_id, unnest(${spansSql("ws", 2)}) AS g
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS ws FROM documents)
       |    WHERE len(ws) >= 2)
       |), bgc AS (SELECT bg, COUNT(*) AS bg_ct FROM keyed GROUP BY bg),
       |cxc AS (SELECT cx, COUNT(*) AS cx_ct FROM keyed GROUP BY cx)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  SUM((1000000 * (bg_ct + 1)) // (cx_ct + $LM_B)) // COUNT(*) AS fluency_ppm
       |FROM keyed JOIN bgc USING (bg) JOIN cxc USING (cx)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    fluencyOf(docs(s, dir))
  }

  /** The fluency pipeline over any (doc_id, text) frame — the spec feeds a
    * handcrafted corpus to prove fluent-vs-gibberish separation. */
  private[functions] def fluencyOf(d: DataFrame): DataFrame = {
    val keyed = d
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val keyedEx = TextFunctions.explodeNoReeval(keyed, Seq(col("doc_id")), spans(col("ws"), 2), "g")
      .select(col("doc_id"),
        (hash64(col("g"), "lmb") % LM_B).as("bg"),
        (hash64(split(col("g"), " ").getItem(0), "lmu") % LM_B).as("cx"))
    val bgc = keyedEx.groupBy("bg").agg(count(lit(1)).as("bg_ct"))
    val cxc = keyedEx.groupBy("cx").agg(count(lit(1)).as("cx_ct"))
    keyedEx
      .join(broadcast(bgc), "bg")   // ≤ LM_B rows: broadcastable at any corpus size
      .join(broadcast(cxc), "cx")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr(s"sum((1000000 * (bg_ct + 1)) div (cx_ct + $LM_B)) div count(1)")
          .as("fluency_ppm"))
      .orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(bloomDecontaminate, dsirWeights, qualityLinear, lmFluency)
}
