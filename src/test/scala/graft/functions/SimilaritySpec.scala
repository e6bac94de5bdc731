package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-vs-exact contracts for the similarity path:
  *  - LSH-bucketed pairs must be a SUBSET of the exact all-pairs result
  *    (bucketing may lose recall, never invent pairs or change scores);
  *  - the simhash pigeonhole rewrite must EQUAL the all-pairs formulation. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("ann_lsh_pairs ⊆ ann_threshold_pairs with identical sims") {
    val exact = SimilarityQueries.annThresholdPairs.run(spark, sf)
    val lsh = SimilarityQueries.annLshPairs.run(spark, sf)
    val missingFromExact = lsh.join(exact, Seq("id_a", "id_b", "sim"), "left_anti").count()
    assert(missingFromExact === 0, "LSH must never produce a pair the exact join lacks")
    val recallDen = exact.count()
    val recallNum = lsh.count()
    assert(recallNum > 0, "fixture plants near-dup vectors; LSH must find some")
    info(s"sign-LSH recall at sf0.001: $recallNum/$recallDen")
  }

  test("ann_knn_join: candidate sims exact, ranks dense, recall vs brute force measured") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = SimilarityQueries.annKnnJoin.run(spark, sf).cache()
    // sims must equal the exact cosine (LSH prunes candidates, never rescores):
    // recompute each returned pair's sim brute-force and compare bit-for-bit
    val e = graft.Tables.df(spark, sf, "embeddings")
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("graft_vec_dot", a, b)
    val nrm = (a: org.apache.spark.sql.Column) => sqrt(dot(a, a))
    val qs = e.select(col("vec_id").as("q_id"), col("embedding").as("qe"), nrm(col("embedding")).as("qn"))
    val cs = e.select(col("vec_id").as("n_id"), col("embedding").as("ce"), nrm(col("embedding")).as("cn"))
    val rescored = got.join(qs, "q_id").join(cs, "n_id")
      .withColumn("sim2", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    assert(rescored.filter(col("sim") =!= col("sim2")).count() === 0,
      "knn-join sims must be the exact cosine of the pair")
    // ranks dense from 1 per query
    val badRk = got.groupBy("q_id").agg(count(lit(1)).as("n"), max(col("rk")).as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(badRk === 0, "ranks must be dense 1..n per query")
    // recall@3 vs the exact per-query top-3 over the same query subset
    val exactW = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    val exact = qs.filter(col("q_id") % 5 === 0)
      .join(cs, col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("sim"))
      .withColumn("rk", row_number().over(exactW)).filter(col("rk") <= 3)
    val den = exact.count()
    val num = got.join(exact.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi").count()
    assert(num > 0, "fixture plants near-dup vectors; the knn join must recover some exact neighbours")
    info(s"knn-join recall@3 at sf0.001: $num/$den")
    got.unpersist()
  }

  test("PQ/ADC and IVFPQ: complete top-k per query, strictly ranked integer distances") {
    import org.apache.spark.sql.functions._
    for (q <- Seq(SimilarityQueries.embPqAdc, SimilarityQueries.annIvfPq,
        SimilarityQueries.embSq8)) {
      val df = q.run(spark, sf)
      val rows = df.collect()
      assert(rows.nonEmpty, s"${q.name} returned no rows")
      // every query returns a dense rank 1..k with non-decreasing ADC
      // distances (ties broken by n_id, so ordering is total + deterministic)
      rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
        val byRk = rs.sortBy(_.getInt(3))
        assert(byRk.map(_.getInt(3)).toSeq === (1 to byRk.length),
          s"${q.name}: dense ranks for q$qid")
        val dists = byRk.map(_.getLong(2)).toSeq
        assert(dists === dists.sorted, s"${q.name}: distances rank-ordered for q$qid")
        assert(dists.forall(_ >= 0L), "squared integer distances are non-negative")
      }
      // self must never appear as its own neighbor
      assert(df.filter(col("q_id") === col("n_id")).count() === 0)
    }
  }

  test("SQ8 top-k recall vs exact integer L2 on the quantized grid") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // exact asymmetric ground truth: full-precision quantized values on both
    // sides (what SQ8 approximates through its 255-level reconstruction)
    val quant = graft.Tables.dfSpread(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000 + lit(0.5)).cast("long")).as("qe"))
    val q = quant.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("qe").as("qq"))
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("n_id"))
    val exact = broadcast(q)
      .join(quant.select(col("vec_id").as("n_id"), col("qe")), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        aggregate(zip_with(col("qq"), col("qe"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("dist"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    val sq8 = SimilarityQueries.embSq8.run(spark, sf)
    val hits = sq8.join(exact, Seq("q_id", "n_id"), "left_semi").count()
    val total = exact.count()
    assert(total === 30, "10 queries x top-3")
    // 255 levels per dim reconstructs finely; the top-3 sets should mostly agree
    assert(hits >= total / 2, s"SQ8 recall collapsed: $hits/$total")
    info(s"SQ8 top-3 recall at sf0.001: $hits/$total")
  }

  test("kmeansAssign plans as one hash agg, one tiny broadcast, nothing sorts") {
    import org.apache.spark.sql.functions._
    val quant = graft.Tables.df(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000 + lit(0.5)).cast("long")).as("qe"))
    val cents = quant.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("qe").as("cemb"))
    val qe = SimilarityQueries.kmeansAssign(quant, cents).queryExecution
    // exactly ONE broadcast HINT — the nlist-row centroid table. The earlier
    // two-pass argmax also forced a broadcast of an O(N)-row per-vector max
    // table (a driver-memory cliff past ~100M vectors); the packed-decimal
    // argmax must never reintroduce a forced broadcast of a corpus-sized
    // aggregate. (Stats-driven auto-broadcasts at this toy scale are fine —
    // they vanish with size — so the assert targets the demanded hints.)
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    val forced = qe.optimizedPlan.collect { case j: LJoin =>
      Seq(j.hint.leftHint, j.hint.rightHint).flatten.count(_.strategy.contains(BROADCAST))
    }.sum
    assert(forced === 1, s"expected only the centroid broadcast hint, got $forced")
    // and the argmax must stay a hash aggregate — a struct-ordered max_by
    // here silently plans as SortAggregateExec and sorts the N×nlist stream
    val plan = qe.executedPlan.toString
    assert(!plan.contains("SortAggregate"), s"assign argmax fell to SortAggregate:\n$plan")
    assert(plan.contains("HashAggregate"), s"assign argmax lost its hash agg:\n$plan")
  }

  test("simhash pigeonhole pairs equal the quadratic formulation") {
    import org.apache.spark.sql.functions._
    val sims = DedupQueries.dedupSimhash.run(spark, sf)
    val quadratic = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 1)
    val fast = DedupQueries.dedupSimhashPairs.run(spark, sf)
    assert(fast.count() === quadratic.count())
    assert(fast.join(quadratic, Seq("doc_a", "doc_b", "hamming"), "left_anti").count() === 0)
  }
}
