package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Testdata table loader (TESTDATA.md). All graded queries take the
  * scale-factor directory as a parameter. */
object Tables {

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark only reads as a long (`nanosAsLong`). Values are µs-aligned,
    * so the micros conversion below is lossless and matches what DuckDB
    * sees (TIMESTAMP, µs). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case None    => df
    }
  }

  /** Shared query-function shape: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Spread a DataFrame across all cores. Small single-file parquet inputs
    * arrive as ONE split (file < maxPartitionBytes), which would serialize
    * any expensive per-row/per-pair work downstream onto one task. The
    * round-robin shuffle is O(input) — negligible next to the work it
    * parallelizes. On a real cluster with large inputs the scan is already
    * split and this is a near-no-op (numPartitions ≈ default parallelism). */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
