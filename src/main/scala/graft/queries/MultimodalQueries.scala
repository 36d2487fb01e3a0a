package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord
import graft.queries.Tables.{t, Q}

/** Multimodal plumbing in the declared inventory (builder brief): binary
  * media columns manufactured from the documents table (payload = utf8
  * bytes; kinds cycled), run through the typed feature-extraction path.
  * Rows-only check — the codec is the documented stub, so there is no
  * SQL oracle; the Spark-side shape (schema, narrow per-partition map,
  * binary never shuffled) is the thing under test (plus
  * `MultimodalOpsSpec` for exact semantics). */
object MultimodalQueries {

  private val Kinds = Seq("image", "audio", "video")

  private val mmFeatures: Q = (s, dir) => {
    import s.implicits._
    val media = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), pmod(col("doc_id"), lit(3)).cast("int").as("k"))
      .as[(Long, String, Int)]
      .map { case (id, text, k) =>
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        MediaRecord(id, Kinds(k), bytes,
          width = 32, height = 32, sampleRate = 16000,
          nFrames = if (Kinds(k) == "video") 8 else 1)
      }
    MultimodalOps.extractFeatures(media, dim = 8)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 8), 4).as("f7"))
      .orderBy("media_id")
  }

  /** Metadata-only profile of the manufactured media table, but
    * oracle-checkable (unlike the codec path): per-kind counts and
    * payload byte sizes, where the payload is the utf8 encoding of
    * `text` — byte lengths agree across engines by construction. At
    * scale this is the query shape that never reads the binary column
    * region (only its length), the first thing a media-curation job
    * runs. */
  private val mmProfile: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(
        expr("CASE CAST(pmod(doc_id, 3) AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("kind"),
        length(coalesce(col("text"), lit("")).cast("binary")).as("n_bytes"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").cast("long").as("sum_bytes"),
        max("n_bytes").cast("long").as("max_bytes"))
      .orderBy("kind")

  val queries: Seq[(String, Q)] = Seq(
    "q_mm_features" -> mmFeatures,
    "q_mm_profile"  -> mmProfile)

  val oracles: Seq[(String, String)] = Seq(
    "q_mm_profile" ->
      """SELECT
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | count(*) AS n,
        | CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS sum_bytes,
        | CAST(max(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS max_bytes
        | FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)
}
