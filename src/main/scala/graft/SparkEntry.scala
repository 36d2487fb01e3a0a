package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ScoreOps, TextOps, TimeOps}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2, ✦ marks);
  * every entry has a DuckDB oracle in `oracleSql` generated from the same
  * constants the Spark plans use. ML/streaming operators (N3–N8, S2/S7,
  * T1–T6) are exercised by ScalaTest instead, per the contract.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.3): the reference's inference hot path
    * minus ML — scan, join, null filter, full regex clean chain, time
    * extraction, virality CASE WHEN, sink projection, ordering — on
    * sf0.001. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val events = Tables.t(spark, dir, "events")
    docs.join(events, docs("doc_id") === events("event_id"))          // J2
      .where(col("text").isNotNull)                                   // P3
      .withColumn("text_clean", TextOps.cleanText(col("text")))       // F1-F4
      .withColumn("sentiment",
        new graft.ml.LexiconSentiment().score(col("text")))           // U1
      .withColumn("hour", hour(col("ts")))                            // D4
      .withColumn("viralite",
        ScoreOps.virality(col("value"), hot = 150.0, up = 75.0))      // M2
      .select(col("event_id").as("id"),
        col("text_clean").as("text_content"),
        col("sentiment"), col("hour"), col("viralite"),
        col("ts").as("creation_date"))                                // P5
      .orderBy("id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ SamplingQueries.queries ++
      CurationQueries.queries ++ CdcQueries.queries ++
      MlEvalQueries.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ SamplingQueries.oracles ++
      CurationQueries.oracles ++ CdcQueries.oracles ++
      MlEvalQueries.oracles).toMap
}
