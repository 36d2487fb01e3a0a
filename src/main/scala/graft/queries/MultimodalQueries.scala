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

  val queries: Seq[(String, Q)] = Seq("q_mm_features" -> mmFeatures)
  val oracles: Seq[(String, String)] = Seq.empty
}
