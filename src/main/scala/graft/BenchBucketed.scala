package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-layout bench: materialize lineitem+orders hash-bucketed by
  * orderkey and measure the two headline fact⋈fact queries (q4, q18) against
  * the flat layout — the storage decision that removes the one recurring
  * shuffle the sf1 scale-up measured as the dominant cost of both queries.
  *
  * Both sides bucketed the same way join with ZERO exchange (the SMJ reads
  * buckets pairwise), and the per-order aggregation reuses the same
  * partitioning (HashPartitioning on a subset of the grouping keys satisfies
  * the clustered distribution), so q18's plan drops from two data-sized
  * shuffles to none. The bucketing write pays one shuffle ONCE, amortized
  * across every later orderkey join — at 100 TB this is the difference
  * between re-shuffling the fact table per query and never shuffling it.
  * The reference's counterpart is its radix-partitioned hash join, which
  * re-partitions per execution (reference:
  * src/lib/operators/join_hash_steps.hpp); a lakehouse makes the partitioning
  * durable instead.
  *
  * Usage: `runMain graft.BenchBucketed <srcSfDir> <dstDir> [buckets=32]`.
  * Prints ONE JSON line with flat vs bucketed per-query seconds, the
  * one-time bucketing cost, and the exchange counts from both plans.
  * Bench-evidence tooling, not part of the driver contract.
  */
object BenchBucketed {

  /** q4 shape over explicit inputs (same plan as SparkEntry's
    * tpch_q4_order_priority, parameterized by layout). */
  private def q4(o0: DataFrame, l: DataFrame): DataFrame = {
    val o = o0.filter(col("o_orderdate") >= "1996-01-01 00:00:00" &&
      col("o_orderdate") < "1997-01-01 00:00:00")
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q18 shape over explicit inputs (same plan as tpch_q18_large_volume). */
  private def q18(o: DataFrame, l: DataFrame, c: DataFrame): DataFrame =
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty_dec"))
      .filter(col("qty_dec") > 250)
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("qty_dec").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))

  private def timeBest(runs: Int)(build: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    (1 to runs).map(_ => once()).min
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  def main(args: Array[String]): Unit = {
    val (src, dst) = (args(0), args(1))
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-bench-bucketed")
        .config("spark.sql.warehouse.dir", s"$dst/warehouse"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lFlat = Tables.df(spark, src, "lineitem")
    val oFlat = Tables.df(spark, src, "orders")
    val cust = Tables.df(spark, src, "customer")

    // one-time layout cost: repartition by the bucket key first so each
    // bucket is ONE file and the per-bucket sortBy survives for merge joins
    val t0 = System.nanoTime()
    Layout.writeBucketed(lFlat.repartition(buckets, col("l_orderkey")),
      "bb_lineitem", buckets, "l_orderkey")
    Layout.writeBucketed(oFlat.repartition(buckets, col("o_orderkey")),
      "bb_orders", buckets, "o_orderkey")
    val layoutSec = (System.nanoTime() - t0) / 1e9
    val lB = spark.table("bb_lineitem")
    val oB = spark.table("bb_orders")

    val runs = 3
    val q4Flat = timeBest(runs)(q4(oFlat, lFlat))
    val q4Buck = timeBest(runs)(q4(oB, lB))
    val q18Flat = timeBest(runs)(q18(oFlat, lFlat, cust))
    val q18Buck = timeBest(runs)(q18(oB, lB, cust))

    val xq4f = exchanges(q4(oFlat, lFlat)); val xq4b = exchanges(q4(oB, lB))
    val xq18f = exchanges(q18(oFlat, lFlat, cust)); val xq18b = exchanges(q18(oB, lB, cust))

    // result parity: the layout must not change the answer
    val parity = q18(oB, lB, cust).exceptAll(q18(oFlat, lFlat, cust)).isEmpty &&
      q18(oFlat, lFlat, cust).exceptAll(q18(oB, lB, cust)).isEmpty

    println(s"""{"metric":"bucketed_vs_flat","unit":"sec","buckets":$buckets,""" +
      s""""layout_write_sec":$layoutSec,""" +
      s""""q4_flat":$q4Flat,"q4_bucketed":$q4Buck,""" +
      s""""q18_flat":$q18Flat,"q18_bucketed":$q18Buck,""" +
      s""""exchanges":{"q4_flat":$xq4f,"q4_bucketed":$xq4b,"q18_flat":$xq18f,"q18_bucketed":$xq18b},""" +
      s""""result_parity":$parity,"sf":"$src"}""")

    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.stop()
  }
}
