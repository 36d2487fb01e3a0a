package graft.ops

import graft.SparkSpec
import graft.ops.MultimodalOps._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, kind: String, n: Int) = MediaRecord(
    id, kind, Array.tabulate(n)(i => ((id * 31 + i) % 251).toByte),
    width = 32, height = 16, sampleRate = 16000, nFrames = 10)

  private lazy val media = spark.createDataset(Seq(
    rec(1, "image", 512), rec(2, "image", 512),
    rec(3, "audio", 2048), rec(4, "video", 4000)))

  test("extractFeatures: fixed dim, deterministic, distinct for distinct payloads") {
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 16))
    assert(f1.map(_.features.toSeq) sameElements f2.map(_.features.toSeq)) // deterministic
    assert(f1(0).features.toSeq != f1(1).features.toSeq)                   // content-sensitive
    assert(f1.map(_.n_bytes).toSeq == Seq(512L, 512L, 2048L, 4000L))
  }

  test("resizeImages touches only image rows and updates metadata") {
    val out = resizeImages(media, 8, 8).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).media.length == 64 && out(1L).width == 8 && out(1L).height == 8)
    assert(out(3L).media.length == 2048 && out(3L).width == 32) // audio untouched
  }

  test("sampleFrames halves a 10-frame video at stride 2") {
    val out = sampleFrames(media, 2).collect().map(r => r.media_id -> r).toMap
    assert(out(4L).nFrames == 5)
    assert(out(4L).media.length == 2000) // 5 of 10 frames × 400 bytes
    assert(out(1L).media.length == 512)  // image untouched
  }

  test("profile aggregates metadata without reading payloads") {
    val p = profile(media.toDF()).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == Map("image" -> 2L, "audio" -> 1L, "video" -> 1L))
  }

  test("cdcByteChunks: chunks tile the payload exactly, in order") {
    val bytes = rec(7, "image", 4096).media
    val chunks = cdcByteChunks(7L, bytes)
    assert(chunks.nonEmpty)
    assert(chunks.map(_.chunk_idx) == chunks.indices.map(_.toLong))
    // 1-based offsets, contiguous, summing to the payload length.
    assert(chunks.head.byte_start == 1L)
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(b.byte_start == a.byte_start + a.n_bytes)
      case _         =>
    }
    assert(chunks.map(_.n_bytes).sum == bytes.length.toLong)
    assert(cdcByteChunks(7L, Array.emptyByteArray).isEmpty)
  }

  test("cdcByteChunks: a one-byte edit re-fingerprints only local chunks") {
    val bytes = rec(9, "audio", 8192).media
    val edited = bytes.clone()
    val at = 4000
    edited(at) = (edited(at) ^ 0x55).toByte
    val before = cdcByteChunks(9L, bytes)
    val after  = cdcByteChunks(9L, edited)
    // The edit can only disturb anchor windows touching bytes
    // [at-1, at+1] (0-based); every chunk wholly outside that range must
    // keep its exact fingerprint — the content-locality the CDC rule
    // exists to provide (an offset-based chunker would shift everything).
    def untouched(c: ByteChunk): Boolean = {
      val lo = c.byte_start - 1          // 0-based inclusive
      val hi = lo + c.n_bytes - 1
      hi < at - 1 || lo > at + 1
    }
    val fpBefore = before.filter(untouched).map(c => c.byte_start -> c.chunk_fp)
    val fpAfter  = after.filter(untouched).map(c => c.byte_start -> c.chunk_fp)
    assert(fpBefore == fpAfter)
    assert(before.map(_.chunk_fp) != after.map(_.chunk_fp)) // the edit IS visible
  }
}
