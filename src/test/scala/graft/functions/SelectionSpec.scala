package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the data-selection operators (beyond the oracle
  * match): the Bloom prefilter must be invisible in the RESULT but visible in
  * the WORK (it prunes), DSIR must actually prefer target-like docs, and the
  * linear quality gate must be a deterministic non-degenerate split. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("bloom decontamination: result identical to exact no-bloom computation") {
    val withBloom = SelectionQueries.bloomDecontaminate.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // Exact recomputation, no Bloom anywhere (independent of the query's path).
    val d = graft.Tables.df(spark, sf, "documents")
    val isEval = TextFunctions.hash64(col("doc_id").cast("string"), "beval") % 100 < 7
    val evalSh = DedupQueries.hsgOf(d.filter(isEval))
      .select(explode(col("hsg")).as("s")).distinct()
    val trainSh = DedupQueries.hsgOf(d.filter(!isEval))
      .select(col("doc_id"), explode(col("hsg")).as("s")).distinct()
    val exact = trainSh.join(evalSh, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    assert(withBloom.toSeq == exact.toSeq, "Bloom false positives must not leak into the result")
    assert(withBloom.nonEmpty, "synthetic corpus should have contaminated docs")
  }

  test("bloom decontamination: the prefilter prunes most non-member shingles") {
    val d = graft.Tables.df(spark, sf, "documents")
    val isEval = TextFunctions.hash64(col("doc_id").cast("string"), "beval") % 100 < 7
    val evalKeys = DedupQueries.hsgOf(d.filter(isEval))
      .select(explode(col("hsg")).as("s")).distinct()
      .collect().map(_.getLong(0))
    val mBits = {
      val want = math.max(4096L, evalKeys.length.toLong * 16L)
      var m = 4096L; while (m < want && m < (1L << 20)) m <<= 1; m
    }
    val mask = mBits - 1L
    val bloom = new Array[Boolean](mBits.toInt)
    evalKeys.foreach { k =>
      bloom((k & mask).toInt) = true
      bloom(((k >> 20) & mask).toInt) = true
      bloom(((k >> 40) & mask).toInt) = true
    }
    val bloomLit = typedLit(bloom.toSeq)
    def probe(c: org.apache.spark.sql.Column, shift: Int) =
      element_at(bloomLit, (shiftright(c, shift).bitwiseAND(lit(mask)) + 1L).cast("int"))
    val trainSh = DedupQueries.hsgOf(d.filter(!isEval))
      .select(col("doc_id"), explode(col("hsg")).as("s")).distinct()
    val total = trainSh.count()
    val pass = trainSh
      .filter(probe(col("s"), 0) && probe(col("s"), 20) && probe(col("s"), 40)).count()
    val members = trainSh.join(evalSh(d, isEval), "s").select("s").distinct().count()
    assert(pass < total / 2,
      s"Bloom should drop most of the $total train shingles map-side (passed $pass)")
    assert(pass >= members, "Bloom must never drop a true member (no false negatives)")
  }

  private def evalSh(d: org.apache.spark.sql.DataFrame,
      isEval: org.apache.spark.sql.Column) =
    DedupQueries.hsgOf(d.filter(isEval)).select(explode(col("hsg")).as("s")).distinct()

  test("dsir: weights descend, deterministic, and the target language is enriched") {
    val a = SelectionQueries.dsirWeights.run(spark, sf).collect()
    val b = SelectionQueries.dsirWeights.run(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq, "bit-stable across runs")
    val ws = a.map(_.getLong(1))
    assert(ws.zip(ws.tail).forall { case (x, y) => x >= y }, "descending weights")
    assert(a.length == 50)

    val langById = graft.Tables.df(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enFracTop = a.count(r => langById(r.getLong(0)) == "en").toDouble / a.length
    val enFracAll = langById.values.count(_ == "en").toDouble / langById.size
    assert(enFracTop > enFracAll,
      s"top-k must be enriched in the target lang ($enFracTop vs corpus $enFracAll)")
  }

  test("lm fluency: repeated common transitions outscore gibberish; bounds hold") {
    import spark.implicits._
    // 20 copies of the same sentence make its bigrams corpus-dominant; one
    // gibberish doc has transitions seen nowhere else.
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat and the dog ran"))
    val noise = Seq((99L, "zq xv plk wrn ghj bnm qwe rty uio asd"))
    val d = (fluent ++ noise).toDF("doc_id", "text")
    val rows = SelectionQueries.fluencyOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.size == 21)
    rows.values.foreach(v => assert(v > 0 && v <= 1000000L, s"ppm out of range: $v"))
    assert(rows(1L) > rows(99L) * 5,
      s"fluent ${rows(1L)} should far outscore gibberish ${rows(99L)}")
  }

  test("lm fluency on the fixture corpus: deterministic, all multi-token docs scored") {
    val a = SelectionQueries.lmFluency.run(spark, sf).collect()
    val b = SelectionQueries.lmFluency.run(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "bit-stable across runs")
    val nMulti = graft.Tables.df(spark, sf, "documents")
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(a.length == nMulti, "every >=2-token doc gets a score")
    a.foreach(r => assert(r.getLong(2) > 0 && r.getLong(2) <= 1000000L))
  }

  test("quality linear: non-degenerate keep split, flag consistent with threshold") {
    val rows = SelectionQueries.qualityLinear.run(spark, sf).collect()
    assert(rows.length == 500)
    val flags = rows.map(_.getInt(2)).toSet
    assert(flags == Set(0, 1), s"classifier must split the corpus, got flags $flags")
    rows.foreach { r =>
      val expect = if (r.getLong(1) >= 61000L) 1 else 0
      assert(r.getInt(2) == expect, s"flag/threshold mismatch for doc ${r.getLong(0)}")
    }
  }
}
