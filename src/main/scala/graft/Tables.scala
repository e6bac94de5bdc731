package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table access over the driver's parquet fixtures (see TESTDATA.md).
  *
  * Counterpart of the reference's StorageManager lookup feeding GetTable
  * (reference: src/lib/storage/storage_manager.hpp:23, src/lib/operators/get_table.hpp:23):
  * the scan is declarative, so Catalyst performs column pruning and predicate
  * pushdown into the parquet reader — the moral equivalent of the reference's
  * static column/chunk pruning lists.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped with two physical types for `ts`:
    // TIMESTAMP(NANOS) (rejected by Spark's reader unless read as a
    // nanosecond-epoch long) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).
    // Queries are written against a single convention — nanosecond-epoch
    // long, `ts DIV 1000` == DuckDB's `epoch_us(ts)` — so normalize here.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(raw) else raw
  }

  /** Rewrite `ts` to a nanosecond-epoch long whatever the file carried.
    * TIMESTAMP_NTZ wall-clock is interpreted in the session zone (pinned to
    * UTC in GraftSession), matching DuckDB's naive-timestamp epoch_us. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    import org.apache.spark.sql.functions.{col, unix_micros}
    df.schema("ts").dataType match {
      case LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }

  /** Register every fixture table as a temp view so `spark.sql` works 1:1 with
    * the oracle SQL (DuckDB sees the same relation names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))

  /** Read + spread, for COMPUTE-heavy per-row stages (hashing, shingling,
    * signatures): a parquet row group is the scan-split unit, and the fixture
    * files are single-row-group, so the whole map stage would otherwise run
    * as ONE task regardless of cores. A round-robin repartition of the cheap
    * raw rows buys full parallelism for the expensive expressions above it.
    * On real multi-file data the scan parallelizes by itself and AQE
    * coalesces this exchange to a no-op-sized shuffle; filters/pruning still
    * push through a Repartition node. */
  def dfSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    df(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
