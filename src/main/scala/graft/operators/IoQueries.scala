package graft.operators

import graft.{Q, Tables}
import graft.sources.{BinFormat, CsvMeta, TblReader}
import org.apache.spark.sql.SparkSession

/** Import/export round-trips as oracle-gated queries: each format writes the
  * `nation` table to a temp file and reads it back; the oracle is the table
  * itself, so any encode/decode defect hash-mismatches (reference formats:
  * src/lib/import_export/ — .tbl via load_table.cpp, CSV+meta via
  * csv_parser.cpp, .bin via binary_parser.cpp/binary_writer.cpp). */
object IoQueries {

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempFile("graft_io", suffix).toString

  private val oracleNation =
    "SELECT * FROM nation ORDER BY n_nationkey"

  private def nation(s: SparkSession, dir: String) =
    Tables.df(s, dir, "nation")

  val tblRoundtrip: Q = Q("io_tbl_roundtrip", oracleNation) { (s, dir) =>
    val p = tmp(".tbl")
    TblReader.write(nation(s, dir), p)
    TblReader.read(s, p).orderBy("n_nationkey")
  }

  val csvRoundtrip: Q = Q("io_csv_roundtrip", oracleNation) { (s, dir) =>
    val p = tmp(".csv")
    CsvMeta.write(nation(s, dir), p)
    CsvMeta.read(s, p).orderBy("n_nationkey")
  }

  val binRoundtrip: Q = Q("io_bin_roundtrip", oracleNation) { (s, dir) =>
    val p = tmp(".bin")
    BinFormat.write(nation(s, dir), p)
    BinFormat.read(s, p).orderBy("n_nationkey")
  }

  /** JSON-lines round-trip over `documents` — the interchange format every
    * training-data pipeline speaks. Unlike the fixture formats above this one
    * is distributed end-to-end: `df.write.json` emits executor-parallel part
    * files and the read-back scans them in parallel with the ORIGINAL schema
    * pinned (JSON inference would widen/reorder — never rely on it at scale). */
  val jsonlRoundtrip: Q = Q(
    "io_jsonl_roundtrip",
    "SELECT * FROM documents ORDER BY doc_id") { (s, dir) =>
    val d = Tables.df(s, dir, "documents")
    // fixed per-JVM scratch path, overwritten each run — repeated verify/
    // bench invocations must not accrete temp directories (ADVICE r5)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_scratch/docs"
    d.write.mode("overwrite").json(out)
    s.read.schema(d.schema).json(out).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(tblRoundtrip, csvRoundtrip, binRoundtrip, jsonlRoundtrip)
}
