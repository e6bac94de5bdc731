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

  /** Per-JVM scratch root for the distributed round-trips: overwritten on
    * repeat runs inside ONE JVM (no accretion — ADVICE r5) but pid-suffixed so
    * two concurrent verify/bench JVMs cannot clobber each other's scratch
    * mid-read (ADVICE r6); deleted by a shutdown hook. */
  private lazy val scratchRoot: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_scratch_${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(p))
    }))
    p
  }

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
    val out = s"$scratchRoot/jsonl/docs"
    d.write.mode("overwrite").json(out)
    s.read.schema(d.schema).json(out).orderBy("doc_id")
  }

  /** Columnar ORC round-trip over `lineitem` — the second first-class columnar
    * format next to parquet (Spark ships the ORC reader/writer natively; a
    * warehouse migrating between Hive/ORC and parquet estates needs both).
    * Distributed end-to-end like the JSONL path: executor-parallel part files,
    * predicate-pushdown-capable on read-back. The projection+filter after the
    * round-trip keeps the oracle cheap while still exercising every column
    * type through the encode/decode (decimal-free fixture: longs, doubles,
    * strings, dates). */
  val orcRoundtrip: Q = Q(
    "io_orc_roundtrip",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val li = Tables.df(s, dir, "lineitem")
    val out = s"$scratchRoot/orc/lineitem"
    li.write.mode("overwrite").orc(out)
    import org.apache.spark.sql.functions.col
    s.read.schema(li.schema).orc(out)
      .filter(col("l_orderkey") % 100 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val all: Seq[Q] = Seq(tblRoundtrip, csvRoundtrip, binRoundtrip, jsonlRoundtrip,
    orcRoundtrip)
}
