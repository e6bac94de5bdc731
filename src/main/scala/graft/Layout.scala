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
