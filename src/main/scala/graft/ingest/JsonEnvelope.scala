package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** P1/P2: binary→string cast + JSON parse + struct flatten
  * (SURVEY.md §2.2; reference `spark/engine.py:245-247`).
  *
  * The reference's Kafka envelope is `value: binary` holding a JSON
  * record; the same pattern applies to any JSON-payload column
  * (testdata `events.props`). Always an explicit schema — never
  * schema inference (reference supplies `StructType` at
  * `spark/engine.py:224-231`), so malformed messages become null
  * structs instead of failing the stream.
  */
object JsonEnvelope {

  /** P1: `selectExpr("CAST(value AS STRING)")`. */
  def castToString(df: DataFrame, colName: String = "value"): DataFrame =
    df.selectExpr(s"CAST($colName AS STRING) AS $colName")

  /** P2: parse a JSON string column with an explicit schema and flatten
    * `data.*` alongside the other columns. */
  def flatten(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val others = df.columns.filter(_ != jsonCol).toIndexedSeq.map(col)
    df.withColumn("__data", from_json(col(jsonCol), schema))
      .select(others :+ col("__data.*"): _*)
  }

  /** Single-field extraction without a full parse — stays scalar so
    * Catalyst can collapse it into the surrounding projection. */
  def extract(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path)

  /** S9: the producer-side inverse of [[flatten]] — every column packed
    * into one JSON `value` (reference `data_ingestion.py:127-135` builds
    * the message dict by hand; `df.write.format("kafka")` takes exactly
    * this shape). */
  def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}
