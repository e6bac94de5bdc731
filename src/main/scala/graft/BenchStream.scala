package graft

import graft.streaming.{DocStreams, EventStreams}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Streaming-path throughput: wall-clocks `processAllAvailable` over the
  * fixture-backed file streams and reports rows/sec per pipeline — the
  * number that says whether the ingest-time operators (map-only curation,
  * bounded-state dedup, watermarked windowed aggregation, CEP state
  * machines) keep up with a production landing rate. Batch==stream
  * CORRECTNESS is StreamingSpec's job; this measures cost. */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-bench-stream"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeStream(s: Dataset[_], mode: String = "append"): Double = {
      val q = s.writeStream.outputMode(mode).format("noop").start()
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    val hasEvents = new java.io.File(s"$sfDir/events.parquet").exists()
    val nDocs = Tables.df(spark, sfDir, "documents").count()
    def docsSrc: DataFrame = DocStreams.source(spark, sfDir)
    def eventsSrc: DataFrame = EventStreams.source(spark, sfDir)

    val docResults = Seq(
      ("doc_curation", nDocs, timeStream(DocStreams.curated(docsSrc))),
      ("doc_dedup_bounded", nDocs,
        timeStream(DocStreams.dedupedByFingerprintBounded(docsSrc))))
    val results = if (!hasEvents) docResults else {
      val nEvents = Tables.df(spark, sfDir, "events").count()
      docResults ++ Seq(
        ("events_hourly", nEvents,
          timeStream(EventStreams.hourlyCounts(eventsSrc), mode = "update")),
        ("events_cep_patterns", nEvents,
          timeStream(EventStreams.patternFlags(spark, eventsSrc))))
    }

    val qs = results.map { case (n, rows, sec) =>
      s""""$n":{"rows":$rows,"sec":$sec,"rows_per_sec":${(rows / sec).toLong}}"""
    }.mkString(",")
    println(s"""{"metric":"stream_throughput","unit":"rows_per_sec",$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
