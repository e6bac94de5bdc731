package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** One-pass fixture → PRODUCTION-LAYOUT scale-up: [[ScaleUp]]'s key-offset
  * replication fused with [[BenchLayout]]'s hive-partitioned multi-file write,
  * so decade-scale datasets (SF100 ≈ 100 GB from the sf0.1 fixture at
  * factor 1000) materialize WITHOUT an intermediate flat copy — at these
  * sizes the flat+relayout route would double disk and add a full
  * read/write cycle.
  *
  * Parallelism discipline: the copy fan-out (broadcast nested-loop against
  * the copy indices) preserves the stream side's partitioning, so we
  * repartition the SMALL source (MBs — a cheap shuffle) to the target file
  * count and never shuffle the scaled output (GBs). File sizing targets
  * ~128 MiB parquet per file from the source bytes × factor, the layout a
  * 1000-executor scan wants.
  *
  * Usage: `runMain graft.ScaleUpLayout <srcSfDir> <dstDir> [factor=1000]`,
  * then `SPARK_GRAFT_SF_DIR=<dstDir> runMain graft.Bench`. Bench-evidence
  * tooling, not part of the driver contract.
  */
object ScaleUpLayout {

  private val partCols = Map("lineitem" -> "l_returnflag", "orders" -> "o_orderpriority")
  /** distinct partition values per hive-partitioned table (returnflag A/N/R;
    * five order priorities) — each write task emits one file per value */
  private val partVals = Map("lineitem" -> 3, "orders" -> 5)

  private def dirBytes(p: String): Long = {
    val d = Paths.get(p)
    if (!Files.exists(d)) 0L
    else {
      val s = Files.walk(d)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val (src, dst) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-scale-up-layout"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val strides = ScaleUp.keyStrides(spark, src)
    val target = 128L << 20
    Tables.names.foreach { t =>
      val df = Tables.df(spark, src, t)
      val out = s"$dst/$t.parquet"
      if (!ScaleUp.offsetCols.contains(t)) {
        // fixed dims (region/nation): single file
        df.coalesce(1).write.mode("overwrite").parquet(out)
      } else {
        val scaledBytes = dirBytes(s"$src/$t.parquet") * factor
        val perTask = target * partVals.getOrElse(t, 1)
        val srcParts = math.max(1, math.min(256, (scaledBytes / perTask).toInt))
        val scaled = ScaleUp.scaleDf(spark, df.repartition(srcParts), t, factor, strides)
        partCols.get(t) match {
          case Some(c) => scaled.write.mode("overwrite").partitionBy(c).parquet(out)
          case None    => scaled.write.mode("overwrite").parquet(out)
        }
        println(s"$t: srcParts=$srcParts scaledBytes~${scaledBytes >> 20}MiB " +
          s"-> ${dirBytes(out) >> 20}MiB on disk")
      }
    }
    println(s"done: ${dirBytes(dst) >> 20}MiB total at $dst")
    spark.stop()
  }
}
