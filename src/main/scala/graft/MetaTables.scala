package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Storage-introspection meta tables from parquet footers — the counterpart of
  * the reference's chunk/segment meta tables (reference:
  * src/lib/utils/meta_tables/meta_chunks_table.cpp,
  * meta_segments_table.cpp, meta_segments_accurate_table.cpp,
  * meta_chunk_sort_orders_table.cpp). The reference walks its in-memory
  * chunks; our chunks are parquet ROW GROUPS, whose footers already carry the
  * same per-segment facts (row count, null count, min/max, compressed size,
  * codec) — a metadata-only read, no data scan, so this stays O(files) at
  * 100 TB exactly like the reference's O(chunks) walk. */
object MetaTables {

  private def footerFiles(spark: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
    else Seq(p)
  }

  private def statToString(v: Any): String = v match {
    case null => null
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case other => String.valueOf(other)
  }

  val chunksSchema: StructType = StructType(Seq(
    StructField("table_name", StringType), StructField("file", StringType),
    StructField("chunk_id", IntegerType), StructField("row_count", LongType),
    StructField("size_bytes", LongType)))

  val segmentsSchema: StructType = StructType(Seq(
    StructField("table_name", StringType), StructField("chunk_id", IntegerType),
    StructField("column_name", StringType), StructField("row_count", LongType),
    StructField("null_count", LongType), StructField("min_value", StringType),
    StructField("max_value", StringType), StructField("size_bytes", LongType),
    StructField("compression", StringType)))

  val sortOrdersSchema: StructType = StructType(Seq(
    StructField("table_name", StringType), StructField("chunk_id", IntegerType),
    StructField("column_name", StringType), StructField("sort_mode", StringType)))

  /** One row per (file, row group). */
  def chunks(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    val rows = for {
      (name, path) <- tables
      file <- footerFiles(spark, path)
      (block, i) <- withFooter(spark, file)(_.getBlocks.toArray.toSeq).zipWithIndex
    } yield {
      val b = block.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
      Row(name, file.getName, i, b.getRowCount, b.getCompressedSize)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), chunksSchema)
  }

  /** One row per (file, row group, column chunk) with footer statistics.
    * Parquet stats are exact for these files, so `meta_segments` and the
    * reference's `meta_segments_accurate` coincide. */
  def segments(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    val rows = for {
      (name, path) <- tables
      file <- footerFiles(spark, path)
      (block, i) <- withFooter(spark, file)(_.getBlocks.toArray.toSeq).zipWithIndex
      col <- block.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
        .getColumns.toArray.toSeq
    } yield {
      val c = col.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
      val st = c.getStatistics
      Row(name, i, c.getPath.toDotString, c.getValueCount,
        if (st == null) -1L else st.getNumNulls,
        if (st == null || !st.hasNonNullValue) null else statToString(st.genericGetMin),
        if (st == null || !st.hasNonNullValue) null else statToString(st.genericGetMax),
        c.getTotalSize, c.getCodec.name)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), segmentsSchema)
  }

  val segmentsAccurateSchema: StructType = StructType(Seq(
    StructField("table_name", StringType), StructField("chunk_id", IntegerType),
    StructField("column_id", IntegerType), StructField("column_name", StringType),
    StructField("column_data_type", StringType), StructField("distinct_value_count", LongType),
    StructField("size_in_bytes", LongType), StructField("compression", StringType)))

  /** `meta_segments_accurate` (reference: meta_segments_accurate_table.cpp —
    * "Accurate segment information are expensive to gather. Use with caution.").
    * Where [[segments]] reads ONLY parquet footers (metadata-cost), this runs a
    * real distributed scan per table to compute EXACT `distinct_value_count`
    * for every column — the reference's same fast/accurate split. One job per
    * table: a single multi-count-distinct aggregate (Catalyst expands it to
    * one pass over the data per distinct group — the documented, deliberate
    * cost of the accurate table; never run it casually at 100 TB, exactly as
    * the reference warns). Granularity is (table, column): a Spark scan does
    * not preserve row-group identity, so `chunk_id = -1` means "all chunks" —
    * the honest distributed re-expression of the reference's per-chunk walk. */
  def segmentsAccurate(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = tables.flatMap { case (name, path) =>
      val df = spark.read.parquet(path)
      // per-column compressed size + codec from footers (metadata-only)
      val colFacts = (for {
        file <- footerFiles(spark, path)
        block <- withFooter(spark, file)(_.getBlocks.toArray.toSeq)
        c <- block.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
          .getColumns.toArray.toSeq
      } yield {
        val cm = c.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
        (cm.getPath.toDotString, cm.getTotalSize, cm.getCodec.name)
      }).groupBy(_._1).map { case (k, vs) => k -> (vs.map(_._2).sum, vs.head._3) }
      val aggs = df.columns.map(c => countDistinct(col(s"`$c`")).as(c))
      val distinct = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        val (size, codec) = colFacts.getOrElse(f.name, (-1L, null))
        Row(name, -1, i, f.name, f.dataType.simpleString, distinct.getLong(i), size, codec)
      }
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), segmentsAccurateSchema)
  }

  /** Chunk sort orders (reference: meta_chunk_sort_orders_table.cpp). The
    * parquet-hadoop metadata API in this Spark build does not surface row
    * groups' `sortingColumns`, and none of our writers declare one — the
    * table is present (schema parity) and correctly empty. */
  def chunkSortOrders(spark: SparkSession, tables: Seq[(String, String)]): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), sortOrdersSchema)

  private def withFooter[A](spark: SparkSession, file: Path)(
      f: org.apache.parquet.hadoop.metadata.ParquetMetadata => A): A = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, spark.sessionState.newHadoopConf()))
    try f(reader.getFooter) finally reader.close()
  }

  // -------------------------------------------------------- session/system

  /** Session settings the engine tunes (reference: meta_settings_table.cpp). */
  def settings(spark: SparkSession): DataFrame = {
    val keys = Seq(
      "spark.sql.session.timeZone", "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled", "spark.sql.ansi.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.parquet.filterPushdown",
      "spark.graft.statementTimeoutMs") // server-side statement governor (PgServer)
    val rows = keys.map(k => Row(k, spark.conf.getOption(k).orNull))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("name", StringType), StructField("value", StringType))))
  }

  /** Static host facts (reference: meta_system_information_table.cpp). */
  def systemInformation(spark: SparkSession): DataFrame = {
    val rt = Runtime.getRuntime
    val rows = Seq(Row(rt.availableProcessors(), rt.maxMemory(),
      java.net.InetAddress.getLocalHost.getHostName))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("cpu_count", IntegerType), StructField("max_memory_bytes", LongType),
      StructField("hostname", StringType))))
  }

  /** Live JVM utilization (reference: meta_system_utilization_table.cpp). */
  def systemUtilization(spark: SparkSession): DataFrame = {
    val rt = Runtime.getRuntime
    val rows = Seq(Row(rt.totalMemory() - rt.freeMemory(), rt.totalMemory(),
      Thread.activeCount()))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("used_memory_bytes", LongType), StructField("allocated_memory_bytes", LongType),
      StructField("active_threads", IntegerType))))
  }

  /** Loaded plugins — none; the extension point is GraftExtensions, compiled
    * in rather than dlopen'd (reference: meta_plugins_table.cpp). */
  def plugins(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), StructType(Seq(
      StructField("name", StringType))))
}
