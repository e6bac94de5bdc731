package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout scale patterns: bucketing for co-located joins and salting
  * for skewed keys — the two shuffle-elimination tools the 100 TB design
  * point leans on (brief: "use broadcast() for small dims, repartition()/
  * bucketing for co-located joins, salting for skew").
  *
  * The reference co-locates by keeping tables chunked in one node's memory
  * and relies on its radix-partitioned hash join (reference:
  * src/lib/operators/join_hash_steps.hpp); on a cluster the equivalent
  * decisions are storage-layout ones, made here. */
object Layout {

  /** Persist `df` hash-bucketed (and per-bucket sorted) by `key` — two tables
    * bucketed the same way join with ZERO shuffle on either side: at 100 TB
    * this converts every recurring fact⋈fact join on the bucket key from a
    * full network shuffle into a local merge per bucket. The write itself
    * pays one shuffle, amortized across every later join. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet") // managed table: lives under spark.sql.warehouse.dir
      .saveAsTable(table)

  /** Persist `df` directory-partitioned by `partCol` — the storage layout
    * that turns partition-key predicates into FILE PRUNING: a filter on the
    * partition column never opens non-matching files (static pruning), and a
    * join against a filtered dimension on the partition key prunes at RUNTIME
    * via dynamic partition pruning. At 100 TB, date-partitioning the facts is
    * the difference between scanning a day and scanning the lake; the
    * reference's counterpart is chunk exclusion via pruning lists
    * (reference: src/lib/storage/chunk.hpp pruning statistics +
    * get_table.hpp excluded-chunk lists). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** 16-bit Morton interleave: bit i of `a` lands at position 2i+1, bit i of
    * `b` at 2i — points close in BOTH dimensions get close z-values. Pure
    * bit arithmetic, stays inside whole-stage codegen. */
  private def interleave16(a: Column, b: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Map `c` linearly onto [0, 65535] given its global min/max. */
  private def norm16(c: Column, mn: Long, mx: Long): Column =
    floor((c.cast("double") - mn) * 65535.0 / math.max(1L, mx - mn).toDouble)
      .cast("long")

  /** Persist `df` Z-ORDER clustered on two columns: rows are range-partitioned
    * and sorted by the Morton interleave of the (min/max-normalized) columns,
    * so every output file covers a small RECTANGLE of the 2-D key space
    * instead of a thin slice of one dimension. Parquet row-group min/max
    * stats then skip files for selective predicates on EITHER column — the
    * multi-dimension generalization of sort-based data skipping, and the
    * standard lakehouse answer when a 100 TB fact table is filtered by more
    * than one dimension (the reference's counterpart is per-chunk pruning
    * statistics over its sorted chunks, src/lib/storage/chunk.hpp).
    *
    * One tiny driver action fetches the two min/max pairs; the z-value is a
    * map-only expression and the write pays the one range shuffle any
    * clustered layout costs. Skew caveat: linear normalization assumes
    * roughly uniform key ranges (true for surrogate keys); heavy skew wants
    * rank-based normalization first. */
  def writeZOrdered(df: DataFrame, path: String, ca: String, cb: String,
      files: Int): Unit = {
    val r = df.agg(
      min(col(ca)).cast("long"), max(col(ca)).cast("long"),
      min(col(cb)).cast("long"), max(col(cb)).cast("long")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input or an all-NULL cluster column: no range to interleave —
      // degrade to a plain write instead of NPEing on the null aggregate
      df.write.mode("overwrite").parquet(path)
    } else {
      // NULL keys coalesce to the column minimum: they cluster
      // deterministically at the low corner instead of interleaving NULL
      // z-values into arbitrary files
      val z = interleave16(
        norm16(coalesce(col(ca), lit(r.getLong(0))), r.getLong(0), r.getLong(1)),
        norm16(coalesce(col(cb), lit(r.getLong(2))), r.getLong(2), r.getLong(3)))
      df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Compact a directory of small part files into `targetFiles` — the
    * small-file maintenance pass every long-lived 100 TB table needs
    * (streaming sinks and fine-grained partitions accrete KB-sized files;
    * scan-task scheduling overhead then dominates I/O). `coalesce` merges
    * read-side WITHOUT a shuffle; per-partition layouts compact each
    * partition directory independently. The reference's counterpart is chunk
    * consolidation under MVCC cleanup (src/lib/utils/pausable_loop_thread.hpp
    * driving MvccDeletePlugin). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int): Unit =
    spark.read.parquet(inPath).coalesce(targetFiles)
      .write.mode("overwrite").parquet(outPath)

  /** Write `df` as token-balanced shard directories (`shard=<n>/part-*`),
    * the physical realization of the cur_shard_assign operator: training
    * loaders read one directory per shard and every shard carries ~budget
    * mass of `massCol` (token counts, byte sizes — any additive weight).
    * Greedy sequential fill in deterministic hash order of `idCol`; the
    * global running sum is the two-phase shape (range partition on the order
    * key → per-partition sums → partition-count-sized offset join), so no
    * single-partition window ever materializes. Deterministic: same input →
    * same shard contents, on any cluster size (total-order range keys). */
  def writeTokenShards(df: DataFrame, path: String, idCol: String,
      massCol: String, budget: Long): Unit = {
    val s = df.sparkSession
    val keyed = df
      .withColumn("__hk", xxhash64(col(idCol)))
      .repartitionByRange(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("__hk"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__hk"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = keyed
      .withColumn("__cum", sum(col(massCol).cast("long")).over(w))
      .localCheckpoint(true) // pin range boundaries across the two passes
    val sums = local.groupBy("__pid").agg(sum(col(massCol).cast("long")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.map(_._1)
      .zip(sums.scanLeft(0L) { case (acc, (_, t)) => acc + t }.init)
    val offDf = broadcast(s.createDataFrame(offsets.toSeq).toDF("__pid2", "__offset"))
    local.join(offDf, col("__pid") === col("__pid2"))
      .withColumn("shard",
        expr(s"(__cum - CAST($massCol AS BIGINT) + __offset) div $budget"))
      .drop("__hk", "__pid", "__pid2", "__cum", "__offset")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Salted equi join for skewed build keys, the manual counterpart of AQE's
    * skew-join splitting (enabled in GraftSession) for when skew is KNOWN
    * up front: the left (skewed) side gets a deterministic per-row salt in
    * [0, factor), the right side replicates each row to all `factor` salts,
    * and the join key becomes (key, salt) — one hot key fans out over
    * `factor` reducers instead of melting one.
    *
    * Row-content-deterministic salting (hash of the whole row, not rand())
    * keeps the operation re-runnable and speculative-task-safe. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, factor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(factor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
