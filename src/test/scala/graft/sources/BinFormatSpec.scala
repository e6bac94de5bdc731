package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** `.bin` interchange: cross-reads the reference's own golden fixtures
  * (expected contents mirrored from the public parser test,
  * reference: src/test/lib/import_export/binary/binary_parser_test.cpp:78-130)
  * across Unencoded/Dictionary/RunLength encodings, and round-trips real
  * tables including NULLs. */
class BinFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val binDir = "/root/reference/resources/test_data/bin"

  private val allTypesSorted = Seq(
    Row("AAAAA", 1, 100L, 1.1f, 11.1),
    Row("BBBBBBBBBB", 2, 200L, 2.2f, 22.2),
    Row("CCCCCCCCCCCCCCC", 3, 300L, 3.3f, 33.3),
    Row("DDDDDDDDDDDDDDDDDDDD", 4, 400L, 4.4f, 44.4))

  for (enc <- Seq("Unencoded", "Dictionary", "RunLength")) {
    test(s"cross-read AllTypesSegmentSorted/$enc.bin") {
      val df = BinFormat.read(spark, s"$binDir/AllTypesSegmentSorted/$enc.bin")
      assert(df.columns.toSeq === Seq("a", "b", "c", "d", "e"))
      assert(df.collect().toSeq === allTypesSorted)
    }
  }

  test("cross-read AllTypesSegmentUnsorted preserves chunk row order") {
    val df = BinFormat.read(spark, s"$binDir/AllTypesSegmentUnsorted/Unencoded.bin")
    assert(df.collect().toSeq === Seq(
      Row("DDDDDDDDDDDDDDDDDDDD", 4, 400L, 4.4f, 44.4),
      Row("AAAAA", 1, 100L, 1.1f, 11.1),
      Row("CCCCCCCCCCCCCCC", 3, 300L, 3.3f, 33.3),
      Row("BBBBBBBBBB", 2, 200L, 2.2f, 22.2)))
  }

  for (enc <- Seq("Unencoded", "Dictionary", "RunLength")) {
    test(s"cross-read AllTypesNullValues/$enc.bin — NULLs in every column") {
      val got = BinFormat.read(spark, s"$binDir/AllTypesNullValues/$enc.bin").collect().toSeq
      assert(got === Seq(
        Row(null, 1.1f, 100L, "one", 1.11),
        Row(2, null, 200L, "two", 2.22),
        Row(3, 3.3f, null, "three", 3.33),
        Row(4, 4.4f, 400L, null, 4.44),
        Row(5, 5.5f, 500L, "five", null)))
    }
  }

  test("round-trip: nation table") {
    val nation = Tables.df(spark, SparkTestBase.sf, "nation")
    val path = java.nio.file.Files.createTempFile("graft", ".bin").toString
    BinFormat.write(nation, path)
    val back = BinFormat.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) === nation.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSeq === nation.collect().toSeq)
  }

  test("distributed multi-part .bin export round-trips without driver collect") {
    val li = Tables.df(spark, SparkTestBase.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .repartition(4) // force several executor-written parts
    val dir = java.nio.file.Files.createTempDirectory("graft-bin-dist").toString + "/parts"
    BinFormat.writeDistributed(li, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bin"))
    assert(parts.length > 1, s"expected multiple parts, got ${parts.length}")
    val back = BinFormat.readDistributed(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) === li.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("distributed .bin export of an empty table keeps the schema") {
    import spark.implicits._
    val empty = Seq.empty[(Int, String)].toDF("k", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft-bin-empty").toString + "/parts"
    BinFormat.writeDistributed(empty, dir)
    val back = BinFormat.readDistributed(spark, dir)
    assert(back.count() === 0L)
    assert(back.columns.toSeq === Seq("k", "s"))
  }

  test("round-trip: nullable values survive") {
    import spark.implicits._
    val df = Seq(
      (1, Option("x"), Option(1.5)),
      (2, None: Option[String], Option(2.5)),
      (3, Option("z"), None: Option[Double])).toDF("id", "s", "v")
    val path = java.nio.file.Files.createTempFile("graft", ".bin").toString
    BinFormat.write(df, path)
    assert(BinFormat.read(spark, path).collect().toSeq === df.collect().toSeq)
  }
}
