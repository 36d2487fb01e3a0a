package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Footer-only statistics audit — the observability layer behind every
  * data-skipping claim: parquet already stores per-row-group min/max/
  * null-count for each column; this reads JUST the footers (O(files)
  * metadata fetches, zero data pages) and surfaces them as a DataFrame,
  * so layout decisions ([[graft.ops.ZOrder]] clustering, sort-on-write,
  * partitioning) can be MEASURED as "what fraction of row groups would
  * a probe actually skip" instead of asserted.
  *
  * Scale shape: the file list fans out over executors (one footer read
  * per file — on object stores one ranged GET each); output is
  * O(files × row-groups × audited columns) rows, tiny next to data.
  * This is the same physical information a lakehouse table format
  * surfaces in its manifest — expressed over plain parquet directories,
  * no table format required. */
object ParquetStats {

  /** Per (file, row-group, column) footer stats for `columns`. min/max
    * are stringified in parquet's logical representation (UTF-8 for
    * binary/string columns, decimal text for numerics) — comparison
    * semantics belong to the caller, who knows the column type. `file`
    * is the full URI (basenames alias across subdirectories, and the
    * audit's point is to name files a rewrite could act on).
    *
    * Fails fast on a column the footers don't carry (typo, nested
    * field, or a PARTITION column — those live in directory names, not
    * footers): a silent empty result would read as "no evidence" when
    * the question itself was malformed. The first file's footer is
    * checked driver-side (cheap, good error message); EVERY file's
    * footer is then re-checked in the executor fan-out, so under schema
    * evolution a column missing from a later file fails the job loudly
    * instead of silently contributing zero rows for that file. */
  def rowGroupStats(spark: SparkSession, dir: String,
                    columns: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = spark.read.parquet(dir).inputFiles.toSeq.sorted
    require(files.nonEmpty, s"no parquet files under $dir")
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val wanted = columns.toSet
    val available = ParquetFileReader.readFooter(
        conf.value, new Path(files.head), ParquetMetadataConverter.NO_FILTER)
      .getFileMetaData.getSchema.getColumns.asScala
      .map(_.getPath.mkString(".")).toSet
    val missing = wanted -- available
    require(missing.isEmpty,
      s"column(s) not in parquet footers (typo or partition column?): " +
        s"${missing.mkString(", ")}; footer columns: " +
        s"${available.toSeq.sorted.mkString(", ")}")
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { uri =>
        val meta = ParquetFileReader.readFooter(
          conf.value, new Path(uri), ParquetMetadataConverter.NO_FILTER)
        val here = meta.getFileMetaData.getSchema.getColumns.asScala
          .map(_.getPath.mkString(".")).toSet
        val absent = wanted -- here
        require(absent.isEmpty,
          s"column(s) ${absent.mkString(", ")} missing from $uri's footer " +
            "(schema evolution?) — stats would silently omit this file")
        meta.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
          case (block, rg) =>
            block.getColumns.asScala.toSeq
              .filter(c => wanted.contains(c.getPath.toDotString))
              .map { c =>
                val st = c.getStatistics
                val (minS, maxS) =
                  if (st == null || st.isEmpty || !st.hasNonNullValue)
                    (null: String, null: String)
                  else (stringify(st.genericGetMin),
                    stringify(st.genericGetMax))
                val nulls =
                  if (st == null || st.isEmpty) -1L else st.getNumNulls
                (uri, rg, block.getRowCount, block.getTotalByteSize,
                  c.getPath.toDotString, minS, maxS, nulls)
              }
        }
      }
      .toDF("file", "row_group", "rg_rows", "rg_bytes", "column",
        "min_val", "max_val", "n_nulls")
  }

  private def stringify(v: Any): String = v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case x => String.valueOf(x)
  }

  /** Skipping audit for a LONG-typed column: of the row groups carrying
    * `column`, how many could a reader PRUNE for the point probe
    * `column = value` on footer evidence alone. Three prunable cases:
    * value below min, value above max, and an ALL-NULL row group
    * (stats present, no non-null value — NULL never equals a probe).
    * A row group with stats genuinely absent (`n_nulls = -1`) is NOT
    * prunable: no evidence means the reader must scan it. Returns one
    * row (n_row_groups, n_prunable, prunable_bp) — the basis-point
    * ratio is the measured value of a layout; contrast a
    * sorted/z-ordered write against a shuffled one on the same data. */
  def pointProbeAudit(stats: DataFrame, column: String,
                      value: Long): DataFrame = {
    // Validation and the prunable count ride ONE aggregation pass — a
    // separate validation action would re-execute the caller's
    // (uncached) rowGroupStats lineage and read every footer twice.
    // The guarded silent-garbage modes: a frame with zero rows for the
    // column (DIV by 0 → NULL ratio) and a non-LONG column whose min or
    // max casts to NULL (every row group would read as stats-absent,
    // i.e. non-prunable).
    val r = stats.where(col("column") === column)
      .select(col("min_val").cast("long").as("mn"),
        col("max_val").cast("long").as("mx"), col("n_nulls"),
        ((col("min_val").isNotNull && col("min_val").cast("long").isNull) ||
          (col("max_val").isNotNull && col("max_val").cast("long").isNull))
          .as("uncastable"))
      .agg(count(lit(1)).as("n_row_groups"),
        sum(when(col("uncastable"), 1L).otherwise(0L)).as("n_uncastable"),
        sum(when(
            (col("mn").isNotNull &&
              (lit(value) < col("mn") || lit(value) > col("mx"))) ||
            (col("mn").isNull && col("n_nulls") >= 0), 1L)
          .otherwise(0L)).as("n_prunable"))
      .head()
    require(r.getLong(0) > 0,
      s"no row-group stats for column '$column' in the given frame — " +
        "wrong column name or a pre-filtered frame?")
    require(r.getLong(1) == 0,
      s"column '$column' has ${r.getLong(1)} row group(s) whose min/max " +
        "do not parse as LONG — pointProbeAudit's contract is an " +
        "integer-typed column")
    stats.sparkSession.range(1)
      .select(lit(r.getLong(0)).as("n_row_groups"),
        lit(r.getLong(2)).as("n_prunable"),
        lit(10000L * r.getLong(2) / r.getLong(0)).as("prunable_bp"))
  }

  /** Per-file sizes from footers alone: (file, n_rows, n_bytes) with
    * n_bytes = Σ row-group compressed size — the on-disk payload a
    * compaction rewrite would actually move (footer byte counts, no
    * filesystem stat calls, no data pages). Same executor fan-out as
    * [[rowGroupStats]]. */
  def fileSizes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.parquet(dir).inputFiles.toSeq.sorted
    require(files.nonEmpty, s"no parquet files under $dir")
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .map { uri =>
        val meta = ParquetFileReader.readFooter(
          conf.value, new Path(uri), ParquetMetadataConverter.NO_FILTER)
        val blocks = meta.getBlocks.asScala
        (uri, blocks.map(_.getRowCount).sum,
          blocks.map(_.getCompressedSize).sum)
      }
      .toDF("file", "n_rows", "n_bytes")
  }

  /** Sequential first-fit bin assignment ([[withBin]]) shared by
    * [[compactionPlan]] and the oracle-graded `q_s_compaction`: a unit lands in bin
    * `exclusive-prefix-bytes DIV target` (integer division, exact at any
    * byte count), so bins tile the ordered stream and every bin except
    * possibly the last holds ≥ `target` bytes once closed (a unit larger
    * than `target` owns its bins alone). One window over the ordering
    * key — no driver loop, no quadratic assignment; the rule is a pure
    * column recipe DuckDB runs verbatim. The caller's frame must carry
    * `n_bytes`. */
  def withBin(df: DataFrame, orderBy: Seq[org.apache.spark.sql.Column],
      target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderBy: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__cum0", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum0 DIV ${target}L"))
      .drop("__cum0")
  }

  /** SMALL-FILES COMPACTION PLAN — the operational companion to the
    * stats audit: group the directory's files into rewrite bins of
    * ~`targetBytes` each (first-fit over the path-ordered file list via
    * [[withBin]]), one output row per bin with the files it merges.
    * At 100 TB this is the planner a nightly compaction job reads: the
    * input is O(files) footer metadata, the plan is O(bins), and the
    * rewrite itself is embarrassingly parallel per bin. The global
    * window over O(files) metadata rows is the documented small-frame
    * exception (same as W1) — file COUNTS are manifest-sized even when
    * data is not. */
  def compactionPlan(spark: SparkSession, dir: String,
      targetBytes: Long): DataFrame = {
    withBin(fileSizes(spark, dir), Seq(col("file")), targetBytes)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_bytes").as("n_bytes"),
        sort_array(collect_list(col("file"))).as("files"))
      .orderBy("bin")
  }
}
