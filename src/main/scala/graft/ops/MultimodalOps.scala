package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (builder brief):
  * image/audio/video as opaque `binary` columns with typed metadata,
  * plus decode / feature-extract / resize / frame-sample plumbing.
  *
  * The decode step is a clearly-marked STUB — the real image/audio codecs
  * are not in this container. Everything AROUND the stub is real and
  * load-bearing: the schema, the typed Dataset shape, the per-partition
  * batching, and the partition strategy are exactly what a production
  * decoder plugs into (swap `StubCodec` for a JNI/ffmpeg-backed `Codec`).
  *
  * Scale shape: media rows are heavy (MBs of binary each), so every
  * operator here is a narrow per-partition map — no shuffle touches the
  * binary payload; metadata-only queries prune the binary column at the
  * parquet scan (columnar → the bytes are never read). The typed
  * `Dataset.mapPartitions` used here is the Scala equivalent of PySpark's
  * `mapInPandas` batch-UDF shape: per-partition iteration, codec state
  * amortized across the partition, arrow-friendly fixed-width output.
  */
object MultimodalOps {

  /** One media asset: binary payload + typed metadata. Kind ∈
    * {image, audio, video}. */
  case class MediaRecord(
      media_id: Long,
      kind: String,
      media: Array[Byte],
      width: Int, height: Int,          // image/video
      sampleRate: Int,                  // audio
      nFrames: Int)                     // video/audio

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sampleRate", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false)))

  /** The codec seam. Implementations must be deterministic per byte
    * content (idempotent re-runs at scale). */
  trait Codec extends Serializable {
    /** Decode + embed: bytes → fixed-dim feature vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    /** Resize an image payload to (w, h). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Sample every `stride`-th frame of a video payload. */
    def sampleFrames(bytes: Array[Byte], nFrames: Int, stride: Int): Array[Byte]
  }

  /** STUB codec — the real decoder libs are absent in this container.
    * Deterministic fakes with the right types/shapes: features are a
    * seeded hash-fold of the bytes; resize/sampleFrames produce
    * proportionally-sized payloads. Replace with an ffmpeg/turbojpeg
    * `Codec` in production; no Spark-side code changes. */
  object StubCodec extends Codec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L                   // deterministic fold seed
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var d = 0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17  // xorshift per dim
        out(d) = (h % 1000L) / 1000.0f
        d += 1
      }
      out
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, math.max(1, w * h)))
    def sampleFrames(bytes: Array[Byte], nFrames: Int, stride: Int): Array[Byte] = {
      if (nFrames <= 0) return bytes
      val frameLen = math.max(1, bytes.length / nFrames)
      (0 until nFrames by stride).flatMap { f =>
        bytes.slice(f * frameLen, math.min((f + 1) * frameLen, bytes.length))
      }.toArray
    }
  }

  /** Oracle-portable deterministic fake: feature `d` is the last-16-bit
    * value of `md5(bytes ++ ":d")` — unlike [[StubCodec]]'s JVM-wraparound
    * fold, this is expressible byte-for-byte in any engine with `md5`
    * (the DuckDB oracle of `q_mm_features` transliterates it), so the
    * whole mapPartitions plumbing can be hash-verified cross-engine.
    * Same `Codec` seam, same output shapes; values are integers in
    * [0, 65536) carried exactly by Float. */
  object PortableCodec extends Codec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        md.reset()
        md.update(bytes)
        md.update((":" + d).getBytes("UTF-8"))
        val dig = md.digest()
        out(d) = (((dig(14) & 0xff) << 8) | (dig(15) & 0xff)).toFloat
        d += 1
      }
      out
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      StubCodec.resize(bytes, w, h)
    def sampleFrames(bytes: Array[Byte], nFrames: Int, stride: Int): Array[Byte] =
      StubCodec.sampleFrames(bytes, nFrames, stride)
  }

  /** Feature extraction: one narrow per-partition pass over the typed
    * Dataset; the binary column never crosses a shuffle. Output is a
    * compact (id, features) frame that DOES shuffle cheaply into the
    * similarity/dedup operators (graft.sim.Similarity). */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64,
                      codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
          codec.features(bytes, dim))
      }
    }
  }

  /** Image resize over the binary column, metadata kept consistent. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   codec: Codec = StubCodec): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "image" && r.media != null)
        r.copy(media = codec.resize(r.media, w, h), width = w, height = h)
      else r
    }
  }

  /** Video frame sampling (every `stride`-th frame). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int,
                   codec: Codec = StubCodec): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "video" && r.media != null)
        r.copy(media = codec.sampleFrames(r.media, r.nFrames, stride),
          nFrames = (r.nFrames + stride - 1) / stride)
      else r
    }
  }

  /** Metadata-only profile: never touches the binary column — with
    * columnar storage the payload bytes are not even read (ReadSchema
    * excludes `media`). */
  def profile(mediaDf: DataFrame): DataFrame =
    mediaDf.groupBy("kind").agg(
      count(lit(1)).as("n"),
      avg("width").as("avg_w"), avg("height").as("avg_h"),
      max("nFrames").as("max_frames"))

  /** One content-defined chunk of a binary payload (byte offsets are
    * 1-based to match SQL substring addressing in the oracle). */
  case class ByteChunk(
      media_id: Long,
      chunk_idx: Long,
      n_bytes: Long,
      byte_start: Long,
      chunk_fp: String)

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Content-defined chunking over BYTES — the binary-payload twin of
    * the token-level rule in `graft.queries.DedupQueries.cdcChunkFrame`
    * (a unit opens a chunk iff its own local hash hits the anchor
    * condition; rsync/LBFS anchoring). Here the unit is a TWO-BYTE
    * window: byte `i` (0-based, i ≥ 1) opens a new chunk iff
    * `md5(bytes[i-1..i])`'s last hex nibble is 0 — expected anchor rate
    * 1/16 ⇒ ~16-byte mean chunks. A single-byte window degenerates on
    * low-entropy payloads (text corpora use few distinct byte values,
    * and whether ANY of them anchors is a coin flip); two-byte windows
    * see the value space squared. Boundaries depend only on the two
    * local bytes, so an edit re-fingerprints the chunk holding it and
    * leaves every other chunk untouched (spec-pinned shift-robustness).
    *
    * md5-per-window is the PORTABLE stand-in (the DuckDB oracle of
    * `q_mm_chunks` transliterates it character-for-character); a
    * production deployment swaps a gear/buzhash rolling hash behind this
    * same signature with no Spark-side changes — same seam discipline as
    * [[Codec]]. Pure per-payload JVM work: callers run it inside a
    * narrow `flatMap`, so chunking shuffles nothing and the chunk-fp
    * table (O(payload bytes / 16) rows) is what downstream joins
    * consume. */
  def cdcByteChunks(mediaId: Long, bytes: Array[Byte]): Seq[ByteChunk] = {
    if (bytes.isEmpty) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    def anchor(i: Int): Boolean = {
      md.reset()
      md.update(bytes, i - 1, 2)
      (md.digest()(15) & 0x0f) == 0
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[ByteChunk]
    var chunkIdx = 0L
    var start = 0
    var i = 1
    def emit(end: Int): Unit = {            // [start, end) as one chunk
      md.reset()
      md.update(bytes, start, end - start)
      out += ByteChunk(mediaId, chunkIdx, (end - start).toLong,
        start + 1L, hex(md.digest()))
    }
    while (i < bytes.length) {
      if (anchor(i)) { emit(i); chunkIdx += 1; start = i }
      i += 1
    }
    emit(bytes.length)
    out.toSeq
  }
}
