package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev harness: dump ONLY the SQLite-testrunner corpus results (same layout as
  * [[Verify]]) so tools/check.py can triage them in isolation. Not part of the
  * driver contract. */
object CorpusTriage {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/corpus_out")
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[8]").appName("graft-corpus-triage"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    operators.CorpusQueries.all.foreach { q =>
      try q.run(spark, "unused").coalesce(1).write.mode("overwrite").parquet(s"$outDir/${q.name}")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[spark-fail] ${q.name}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = operators.CorpusQueries.all
      .flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o)}")).mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[triage] ${operators.CorpusQueries.all.size} units, $failed spark-side failures")
    spark.stop()
  }
}
