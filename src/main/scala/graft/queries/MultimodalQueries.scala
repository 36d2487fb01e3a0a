package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord
import graft.queries.Tables.{t, Q}

/** Multimodal plumbing in the declared inventory (builder brief): binary
  * media columns manufactured from the documents table (payload = utf8
  * bytes; kinds cycled), run through the typed feature-extraction path.
  * The graded query runs the [[MultimodalOps.PortableCodec]] (md5-derived
  * integer features) through the REAL mapPartitions plumbing, so the
  * whole path — schema, typed Dataset, narrow per-partition map, binary
  * never shuffled — is hash-verified against a DuckDB transliteration of
  * the codec; `MultimodalOpsSpec` covers the stub codec's semantics. */
object MultimodalQueries {

  private val Kinds = Seq("image", "audio", "video")

  private val FeatureDim = 8

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
    MultimodalOps.extractFeatures(media, dim = FeatureDim,
        codec = MultimodalOps.PortableCodec)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("features"), 1).cast("long").as("f0"),
        element_at(col("features"), FeatureDim).cast("long").as("f7"))
      .orderBy("media_id")
  }

  /** Last-16-bit value of md5 of an expression — the DuckDB-side
    * transliteration of [[MultimodalOps.PortableCodec]]'s per-dimension
    * feature. Delegates to the ONE instr-based md5 hex parse
    * (`SamplingQueries.hexBucketSql`, digits 29..32) so the cross-engine
    * hash contract has a single definition. */
  private def last16(payloadExpr: String): String =
    "(" + SamplingQueries.hexBucketSql(payloadExpr, 4) + ")"

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
    "q_mm_features" ->
      s"""SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
        | CAST(${last16("coalesce(text, '') || ':0'")} AS BIGINT) AS f0,
        | CAST(${last16(s"coalesce(text, '') || ':${FeatureDim - 1}'")} AS BIGINT) AS f7
        | FROM documents ORDER BY media_id""".stripMargin,
    "q_mm_profile" ->
      """SELECT
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | count(*) AS n,
        | CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS sum_bytes,
        | CAST(max(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS max_bytes
        | FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)
}
