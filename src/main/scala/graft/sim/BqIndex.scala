package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BINARY-QUANTIZATION code sidecar — the build-once /
  * scan-many store behind the 1-bit serving path (`q_sim_bq_served`).
  *
  * Unlike [[IvfIndex]]/[[PqIvfIndex]] there is NO trained state: a
  * vector's code is a pure function of its signs ([[BqIndex.codes]] —
  * ONE definition, read by the store and the inline graded twin), so
  *  - append is trivially exact (codes of the delta, nothing re-read),
  *  - there is no codebook to freeze, swap, or drift, and
  *  - a rebuild can never change a surviving row's code.
  *
  * Layout: `segments/seg-<uuid>/` of (id, lo, hi) rows — 8 B of code
  * per vector, 32× under the f32 vector — and a manifest `m=N` listing
  * the live segments, published by temp-write + ONE atomic rename (the
  * shared [[graft.ops.VersionedPaths.publish]] race rules, optimistic
  * basedOn+1 versioning like every store here). `forget` rewrites the
  * live segments without the victims (survivor rows bit-unchanged);
  * `compact` is a pure union; `vacuum` shares [[IndexVacuum]].
  *
  * [[search]] is the deployment read pattern this store exists for:
  * the symmetric Hamming coarse scan runs over the 16 B/pair code
  * table (two codegen'd `bit_count(xor)` ops) through the bounded-heap
  * TopKPerKey to a rescore budget `c`, and ONLY the c·queries
  * candidate rows join back to the caller's full-vector frame for the
  * exact-cosine rerank — the sidecar holds no vectors; floats stay in
  * the base table and are read as point lookups, never scanned. */
final class BqIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {

  private def fs = new Path(indexDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentVersion(): Option[Long] =
    graft.ops.VersionedPaths.listNumbered(fs, new Path(indexDir), "m=",
        dirsOnly = false)
      .map(_._2).sorted.lastOption

  private[sim] def segmentsAt(v: Long): Seq[String] = {
    val (segs, _) = graft.ops.BatchHorizon.split(manifestLinesAt(v))
    require(segs.nonEmpty, s"empty manifest m=$v under $indexDir")
    segs
  }

  private def horizonAt(v: Long): Option[Long] =
    graft.ops.BatchHorizon.split(manifestLinesAt(v))._2

  private def manifestLinesAt(v: Long): Seq[String] = {
    val in = fs.open(new Path(indexDir, s"m=$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def resolvedOrFail(): Long = currentVersion().getOrElse(
    throw new IllegalStateException(s"no complete index under $indexDir"))

  private def publishManifest(segs: Seq[String],
      horizon: Option[Long], basedOn: Option[Long]): Long = {
    val body = segs ++ graft.ops.BatchHorizon.lines(horizon)
    val tmp = new Path(indexDir, s".manifest-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((body.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    graft.ops.VersionedPaths.publish(fs, new Path(indexDir), tmp, "m=",
      basedOn.map(_ + 1).getOrElse(0L))
  }

  private def bestEffortDelete(paths: Path*): Unit =
    paths.foreach { p =>
      try fs.delete(p, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  private def writeSegment(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int): String = {
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try BqIndex.codes(graft.queries.Tables.fanout(emb), idCol, vecCol, dim)
      .write.mode(SaveMode.Overwrite).parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    seg
  }

  /** Full (re)build: pack the corpus into one segment, publish. */
  def build(emb: DataFrame, idCol: String, vecCol: String, dim: Int): Long = {
    val cv = currentVersion()
    publishManifest(Seq(writeSegment(emb, idCol, vecCol, dim)),
      horizon = None, basedOn = cv)
  }

  /** Incremental append: pack ONLY the delta (codes are per-vector, so
    * any append sequence equals a one-shot build over the union —
    * spec-pinned). Batches must be id-disjoint, the shared ingest
    * contract. */
  def append(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int): Long = {
    val v0 = resolvedOrFail()
    publishManifest(
      segmentsAt(v0) :+ writeSegment(emb, idCol, vecCol, dim),
      horizonAt(v0), basedOn = Some(v0))
  }

  /** IDEMPOTENT per-batch append for the streaming maintainer
    * ([[graft.stream.BqIngest]]) — the shared replay rule: segment
    * name derives from the batch id and the manifest gains it at most
    * once (an at-least-once redelivery converges); a batch at or below
    * the replay horizon no-ops LOUDLY-checked (a forget already
    * realized — and possibly redacted — its rows; re-appending would
    * resurrect victims). Unlike build this cannot create the index. */
  private[graft] def appendAsBatch(emb: DataFrame, idCol: String,
      vecCol: String, dim: Int, batchId: Long): Long = {
    val v0 = resolvedOrFail()
    val segs = segmentsAt(v0)
    val h = horizonAt(v0)
    val seg = s"seg-batch-$batchId"
    if (segs.contains(seg) ||
        graft.ops.BatchHorizon.realizedLoud(h, batchId, indexDir))
      return v0
    val out = new Path(indexDir, s"segments/$seg")
    try BqIndex.codes(graft.queries.Tables.fanout(emb), idCol, vecCol, dim)
      .write.mode(SaveMode.Overwrite).parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    publishManifest(segs :+ seg, h, basedOn = Some(v0))
  }

  /** Deletion propagated into the derived store: rewrite live segments
    * without the victims into one segment; survivors bit-unchanged. */
  def forget(ids: Seq[Long]): Long =
    forgetImpl(_.where(!col("id").isin(ids: _*)))

  /** Mass-erasure form: victim frame end to end, LEFT ANTI on `id`
    * (first column cast to BIGINT) — no driver materialization. */
  def forget(victims: DataFrame): Long = {
    val v = victims.select(
      col(victims.columns.head).cast("long").as("id"))
    forgetImpl(_.join(v, Seq("id"), "left_anti"))
  }

  private def forgetImpl(screen: DataFrame => DataFrame): Long = {
    val v0 = resolvedOrFail()
    val segs = segmentsAt(v0)
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try screen(readUnion(segs))
      .write.mode(SaveMode.Overwrite).parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    // The fold advances the replay horizon so a redelivered pre-forget
    // batch cannot re-append and resurrect the victims just erased.
    publishManifest(Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** Merge live segments into one — pure IO, search-invariant. */
  def compact(): Long = {
    val v0 = resolvedOrFail()
    val segs = segmentsAt(v0)
    if (segs.size <= 1) return v0
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try readUnion(segs)
      .write.mode(SaveMode.Overwrite).parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    publishManifest(Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** Keep the newest `keep` versions, sweep older manifests and
    * unreferenced segment dirs. */
  def vacuum(keep: Int = 1): (Int, Int) =
    IndexVacuum.vacuum(fs, indexDir, keep, v => segmentsAt(v),
      Seq("segments" -> "seg-"))

  private def readSeg(seg: String): DataFrame =
    spark.read.parquet(s"$indexDir/segments/$seg")

  private def readUnion(segs: Seq[String]): DataFrame =
    segs.map(readSeg).reduce(_ unionByName _)

  /** The live (id, lo, hi) code table. */
  def codesTable(): DataFrame = readUnion(segmentsAt(resolvedOrFail()))

  /** Hamming coarse scan over the stored codes: top-`c` candidates per
    * query by (ham asc, id asc) through the bounded-heap TopKPerKey.
    * Queries are packed on the fly by the SAME rule as the store. */
  def coarse(queries: DataFrame, idCol: String, vecCol: String, dim: Int,
      c: Int): DataFrame = {
    val qc = BqIndex.codes(queries, idCol, vecCol, dim)
      .select(col("id").as("qid"), col("lo").as("qlo"),
        col("hi").as("qhi"))
    val scored = codesTable().join(broadcast(qc))
      .withColumn("ham",
        expr("CAST(bit_count(lo ^ qlo) + bit_count(hi ^ qhi) AS BIGINT)"))
      .select(col("qid"), col("id").as("cid"), col("ham"))
    graft.plans.GraftOps.topKPerKey(scored, Seq("qid"),
      Seq("ham" -> true, "cid" -> true), c)
  }

  /** The full two-tier read: Hamming coarse to `c` candidates, then
    * exact-cosine rerank to top-`k` joining ONLY candidate rows back
    * to `corpus` (the caller's full-vector frame — the store holds no
    * vectors). Output (qid, rnk, cid, cos_ppm), the inline twin's
    * schema and determinism rules (floor ppm, ties → smallest cid). */
  def search(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, c: Int): DataFrame = {
    val cand = coarse(queries, idCol, vecCol, dim, c).select("qid", "cid")
    val qe = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val ce = corpus.select(col(idCol).as("cid"), col(vecCol).as("ce"))
    cand.join(ce, Seq("cid")).join(broadcast(qe), Seq("qid"))
      .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
      .withColumn("cos_ppm",
        expr("CAST(floor(1000000.0 * cos) AS BIGINT)"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos_ppm").desc, col("cid").asc)).cast("int"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("cos_ppm"))
  }
}

object BqIndex {

  /** Sign-bit packing of the `width`-dim slice of `vecCol` starting at
    * 0-based `off` into one BIGINT: bit i set iff dim (off+i) ≥ 0.
    * Disjoint bits, so `+` IS bitwise-or — and `+` is the form both
    * engines fold identically. ONE definition read by the store, the
    * inline graded twin, and (transliterated) the DuckDB oracle. */
  def wordSql(vecCol: String, off: Int, width: Int): String =
    s"""aggregate(zip_with(slice($vecCol, ${off + 1}, $width),
       |  sequence(0, ${width - 1}),
       |  (x, i) -> IF(CAST(x AS DOUBLE) >= 0.0,
       |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
       | CAST(0 AS BIGINT), (a, v) -> a + v)""".stripMargin

  /** (id, lo, hi) sign-bit codes of `emb` — `dim` must be even; each
    * word packs dim/2 bits. */
  def codes(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    require(dim % 2 == 0, s"dim must be even, got $dim")
    emb.select(col(idCol).as("id"),
      expr(wordSql(vecCol, 0, dim / 2)).as("lo"),
      expr(wordSql(vecCol, dim / 2, dim / 2)).as("hi"))
  }
}
