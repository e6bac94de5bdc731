package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Derive a JCC-H-style SKEWED variant of a fixture scale-factor dir
  * (reference: third_party/jcch-dbgen and the `--jcch=skewed` mode in
  * src/benchmark/tpch_benchmark.cpp:58) so the bench set can be measured
  * under adversarial key distributions, not just the generator's uniform
  * ones:
  *
  *  - `lineitem`: 25% of rows re-point their l_orderkey at the 100 lowest
  *    order keys (deterministic murmur gate) — Zipf-style hot orders, ~400×
  *    the uniform per-key line count at sf0.1, stressing the q18-class
  *    orderkey shuffle + group-by;
  *  - `documents`: every 10th doc's text is replaced by one of 5 hot
  *    templates — identical-content cliques that blow up LSH buckets and
  *    near-dup cluster components, stressing the dedup family's bucket/edge
  *    caps;
  *  - every other table byte-copied unchanged, and the two rewritten tables
  *    stay single-file, so the ONLY variable vs the uniform twin is the
  *    distribution.
  *
  * An optional third argument scales WHILE skewing (`runMain graft.SkewLayout
  * <src> <dst> 100` = skewed SF10 from sf0.1): [[ScaleUp]]'s key-offset
  * fan-out runs first, then the skew rewrite over the scaled keys, written in
  * [[ScaleUpLayout]]'s hive-partitioned multi-file layout — the same layout
  * as the uniform decade twin, so skew stays the ONLY variable at scale. Note
  * the hotspot INTENSIFIES with factor by design: `pmod(l_orderkey, 100)`
  * over a 100× key domain funnels 100× more hot rows into the same 100
  * orders, and the every-10th-doc template cliques grow linearly — the
  * cross-term this measures is "does the q18 shuffle / LSH bucketing survive
  * a hotspot that grows WITH the data", which is what a production hot key
  * does (JCC-H keeps skew proportional too: third_party/jcch-dbgen).
  *
  * After writing, executes tpch_q18 on the skewed dir and prints its
  * executed AQE plan's join/skew markers as committed evidence. Usage:
  * `runMain graft.SkewLayout <srcSfDir> <dstDir> [factor=1]` then
  * `SPARK_GRAFT_SF_DIR=<dstDir> runMain graft.Bench`.
  */
object SkewLayout {
  def main(args: Array[String]): Unit = {
    val (src, dst) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-skew-layout"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val skewed = Map(
      "lineitem" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("l_orderkey",
          when(pmod(hash(col("l_orderkey")), lit(4)) === 0,
            pmod(col("l_orderkey"), lit(100))).otherwise(col("l_orderkey")))),
      "documents" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("text",
          when(col("doc_id") % 10 === 0,
            // one of 5 identical hot templates, long enough to shingle
            concat(lit("hot duplicate template "),
              (col("doc_id") % 5).cast("string"), lit(" "),
              expr("repeat('the quick brown fox jumps over the lazy dog ', 40)")))
            .otherwise(col("text")))))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    if (factor > 1) ScaleUpLayout.writeScaled(spark, src, dst, factor, skewed)
    else Tables.names.foreach { t =>
      val out = s"$dst/$t.parquet"
      skewed.get(t) match {
        case Some(fn) =>
          // single output file to match the fixture layout — only the
          // distribution differs from the uniform twin
          fn(Tables.df(spark, src, t)).coalesce(1)
            .write.mode("overwrite").parquet(out)
        case None =>
          val from = java.nio.file.Paths.get(s"$src/$t.parquet")
          val to = java.nio.file.Paths.get(out)
          java.nio.file.Files.copy(from, to,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    // skew facts + executed-plan evidence for the q18-class shuffle
    val hot = Tables.df(spark, dst, "lineitem")
      .groupBy("l_orderkey").count().orderBy(desc("count")).limit(3).collect()
    println("=== top-3 hot order keys (lines per key) ===")
    hot.foreach(r => println(s"  key=${r.getLong(0)} lines=${r.getLong(1)}"))

    val q18 = SparkEntry.queries("tpch_q18_large_volume")(spark, dst)
    q18.write.format("noop").mode("overwrite").save() // execute under AQE
    val plan = q18.queryExecution.executedPlan.toString
    println("=== tpch_q18 executed join/skew markers on skewed layout ===")
    plan.linesIterator
      .filter(l => l.contains("skew=true") || l.contains("SortMergeJoin")
        || l.contains("BroadcastHashJoin") || l.contains("HashAggregate"))
      .take(12).foreach(l => println(l.trim.take(160)))
    spark.stop()
  }
}
