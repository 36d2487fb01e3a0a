package graft.sim

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the FAISS `IndexIVFPQ` shape (Jégou et al.
  * 2011), and the configuration a 100 TB vector store actually deploys:
  * [[IvfIndex]] prunes WHICH postings a query reads (cell partitions),
  * product quantization shrinks WHAT each posting stores (an M-byte code
  * instead of the float vector) and WHAT search computes (an integer
  * table-lookup sum instead of a full-dimension distance). Composing
  * them multiplies the savings: per query, IO ∝ probes/cells of the
  * code table (codes are ~64× smaller than vectors), and distance math
  * touches only the O(M·K) query table — the corpus vectors themselves
  * are never read at search time.
  *
  * Store layout (the [[IvfIndex]] segment economics, one extra artifact):
  *
  *   - `codebooks/cb-<uuid>/` — (cell, centroid) COARSE table, O(cells)
  *     rows: the IVF routing quantizer.
  *   - `pq/pq-<uuid>/` — (s, cell, centroid) SUBSPACE table, M·K rows:
  *     the product codebooks. Geometry (M, dsub, K) is carried by the
  *     table itself — s ∈ [0, M), K distinct cells per s, dsub =
  *     len(centroid) — so no side metadata can disagree with the data.
  *   - `segments/seg-<uuid>/` — (cell, id, codes array<int>) postings,
  *     PARTITIONED BY cell; `codes[s]` is the subspace-s centroid index.
  *     One row per vector, M small ints of payload — the compressed
  *     representation IS the stored row.
  *   - `m=N` — manifest: coarse codebook, pq codebook, then live
  *     segments; temp write + ONE atomic rename (the shared
  *     [[graft.ops.VersionedPaths.publish]] race rules).
  *
  * BOTH codebooks freeze at [[build]] (Faiss `add` semantics): appends
  * encode only the delta against the live codebooks — O(delta·(cells +
  * M·K)), never O(corpus) — at the price that routing balance and code
  * distortion degrade as the corpus drifts; rebuild when they do.
  *
  * Cross-engine FP discipline, shared with the inline graded twin
  * (`q_sim_ivfpq_adc`): centroid means ride the bounded order-pinned
  * fold tree ([[graft.ops.OrderedFold]] — buffers ≤ FanIn structs, never
  * O(cell members)); per-subspace distances floor-quantize to ppm
  * BEFORE any cross-subspace reduction, so encode argmins compare
  * integers (ties → smallest cell) and the ADC total is an EXACT
  * integer sum of M table entries; coarse routing ranks by ppm-floored
  * cosine (ties → smallest cell). Every rule lives once in this
  * companion object and is read by the store AND the inline query, so
  * the two serving paths cannot drift (`PqIvfIndexSpec` pins
  * bit-identity; parquet round-trips doubles exactly). */
final class PqIvfIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {
  import PqIvfIndex._

  private def fs = new Path(indexDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentVersion(): Option[Long] =
    graft.ops.VersionedPaths.listNumbered(fs, new Path(indexDir), "m=",
        dirsOnly = false)
      .map(_._2).sorted.lastOption

  /** (coarse codebook, pq codebook, segments) at manifest version `v`;
    * an optional `bh <id>` replay-horizon line
    * ([[graft.ops.BatchHorizon]]) is split off, see [[horizonAt]]. */
  private[sim] def manifestAt(v: Long): (String, String, Seq[String]) = {
    val (lines, _) = graft.ops.BatchHorizon.split(manifestLinesAt(v))
    require(lines.length >= 2, s"torn manifest m=$v under $indexDir")
    (lines(0), lines(1), lines.drop(2))
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

  /** Publish OPTIMISTICALLY against the version the caller's reads
    * were based on (None = no store observed): target = basedOn + 1,
    * loud on collision — the shared lost-update guard
    * ([[IvfIndex]]'s publishManifest rule). */
  private def publishManifest(coarse: String, pq: String,
      segs: Seq[String], horizon: Option[Long] = None,
      basedOn: Option[Long]): Long = {
    val body = (coarse +: pq +: segs) ++ graft.ops.BatchHorizon.lines(horizon)
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

  /** Encode `emb` under the given codebooks into one cell-partitioned
    * code segment. The assignment fan-out rule is [[IvfIndex]]'s: the
    * coarse ranking and the M·K encode join are the hot stages. */
  private def writeNamedSegment(emb: DataFrame, idCol: String,
      vecCol: String, coarseCb: DataFrame, pqCb: DataFrame,
      seg: String): String = {
    val out = new Path(indexDir, s"segments/$seg")
    try {
      val fanned = graft.queries.Tables.fanout(
        emb.select(col(idCol), col(vecCol)))
      val cells = coarseRank(fanned, idCol, vecCol, coarseCb)
        .where(col("rnk") === 1).select(col("id"), col("cell"))
      encode(subvectors(fanned, idCol, vecCol, pqCb), pqCb)
        .join(cells, Seq("id"))
        .select(col("cell"), col("id"), col("codes"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").parquet(out.toString)
    } catch {
      case e: Throwable => bestEffortDelete(out); throw e
    }
    seg
  }

  /** Full (re)build: train BOTH codebooks on `emb` (coarse cells seeded
    * by `seedCol`, pq cells seeded by `idCol` mod `pqK`), encode the
    * corpus into one segment, publish. Train on the corpus you serve —
    * query vectors never enter the store. */
  def build(emb: DataFrame, idCol: String, vecCol: String, seedCol: String,
            m: Int, dsub: Int, pqK: Int): Long = {
    val cv = currentVersion() // the basedOn CAS anchor
    val cb = s"cb-${java.util.UUID.randomUUID()}"
    val pq = s"pq-${java.util.UUID.randomUUID()}"
    val cbPath = new Path(indexDir, s"codebooks/$cb")
    val pqPath = new Path(indexDir, s"pq/$pq")
    val seg =
      try {
        coarseCentroids(emb, idCol, vecCol, seedCol)
          .write.mode(SaveMode.Overwrite).parquet(cbPath.toString)
        pqCodebook(subvectors(emb, idCol, vecCol, m, dsub), pqK)
          .write.mode(SaveMode.Overwrite).parquet(pqPath.toString)
        writeNamedSegment(emb, idCol, vecCol,
          spark.read.parquet(cbPath.toString),
          spark.read.parquet(pqPath.toString),
          s"seg-${java.util.UUID.randomUUID()}")
      } catch {
        case e: Throwable => bestEffortDelete(cbPath, pqPath); throw e
      }
    publishManifest(cb, pq, Seq(seg), basedOn = cv)
  }

  /** Incremental APPEND under the live FROZEN codebooks: encode only the
    * delta, publish old segments + the new one. Encoding is per-vector,
    * so segment boundaries are invisible to search (spec-pinned: append
    * ≡ one full build-encode of the union under the same codebooks). */
  def append(emb: DataFrame, idCol: String, vecCol: String): Long = {
    val v0 = resolvedOrFail()
    val (cb, pq, segs) = manifestAt(v0) // resolve FIRST
    val seg = writeNamedSegment(emb, idCol, vecCol, coarseCodebook(cb),
      pqCodebookDf(pq), s"seg-${java.util.UUID.randomUUID()}")
    publishManifest(cb, pq, segs :+ seg, horizonAt(v0),
      basedOn = Some(v0))
  }

  /** Idempotent per-batch append — the [[IvfIndex.appendAsBatch]] rule
    * verbatim: batch-named segment, manifest gains it at most once, a
    * segment already live is a TRUE no-op, and a codebook swap
    * mid-stream fails loudly (restart to adopt a rebuild). */
  private[graft] def appendAsBatch(emb: DataFrame, idCol: String,
      vecCol: String, batchId: Long, requireCoarse: String): Long = {
    val v0 = resolvedOrFail()
    val (cb, pq, segs) = manifestAt(v0)
    require(cb == requireCoarse,
      s"index $indexDir now serves codebook $cb, not $requireCoarse — " +
        "a rebuild happened mid-stream; restart the ingest to adopt it")
    val h = horizonAt(v0)
    val seg = s"seg-batch-$batchId"
    // Second no-op trigger: the batch is at or below the replay
    // horizon — a forget/compact already realized (and possibly
    // redacted) its rows; re-appending would resurrect victims.
    if (segs.contains(seg) || graft.ops.BatchHorizon.realizedLoud(h, batchId, indexDir))
      return v0
    writeNamedSegment(emb, idCol, vecCol, coarseCodebook(cb),
      pqCodebookDf(pq), seg)
    publishManifest(cb, pq, segs :+ seg, h, basedOn = Some(v0))
  }

  private[graft] def coarseName(): String = manifestAt(resolvedOrFail())._1

  /** Merge live segments into one (pure per-cell file union, no
    * re-encoding); search is bit-identical before and after. */
  def compact(): Long = {
    val v0 = resolvedOrFail()
    val (cb, pq, segs) = manifestAt(v0)
    if (segs.size <= 1) return v0
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try readUnion(segs)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    // Fold advances the replay horizon (BatchHorizon): a redelivery of
    // a folded batch no-ops instead of re-adding its rows.
    publishManifest(cb, pq, Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** FORGET: rewrite live segments without the victims under the SAME
    * codebooks (deletion propagated into the derived store; surviving
    * codes bit-unchanged, so post-forget search ≡ pre-forget search
    * minus the victims — spec-pinned). Codebooks are aggregates and
    * stay; full statistical erasure is [[build]] on the redacted
    * corpus + [[vacuum]]. */
  def forget(ids: Seq[Long]): Long =
    forgetImpl(_.where(!col("id").isin(ids: _*)))

  /** MASS-erasure forget: victims stay a DataFrame end to end (LEFT
    * ANTI join on `id`; first column cast to BIGINT) — the
    * [[graft.sim.IvfIndex.forget]] overload contract. */
  def forget(victims: DataFrame): Long = {
    val v = victims.select(
      col(victims.columns.head).cast("long").as("id"))
    forgetImpl(_.join(v, Seq("id"), "left_anti"))
  }

  private def forgetImpl(screen: DataFrame => DataFrame): Long = {
    val v0 = resolvedOrFail()
    val (cb, pq, segs) = manifestAt(v0)
    val seg = s"seg-${java.util.UUID.randomUUID()}"
    val out = new Path(indexDir, s"segments/$seg")
    try screen(readUnion(segs))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(out.toString)
    catch { case e: Throwable => bestEffortDelete(out); throw e }
    // The fold advances the replay horizon so a redelivered pre-forget
    // batch cannot re-append and resurrect the victims just erased.
    publishManifest(cb, pq, Seq(seg),
      graft.ops.BatchHorizon.afterFold(horizonAt(v0), segs),
      basedOn = Some(v0))
  }

  /** Keep the newest `keep` versions, sweep unreferenced dirs. */
  def vacuum(keep: Int = 1): (Int, Int) =
    IndexVacuum.vacuum(fs, indexDir, keep,
      v => { val (cb, pq, segs) = manifestAt(v); cb +: pq +: segs },
      Seq("codebooks" -> "cb-", "pq" -> "pq-", "segments" -> "seg-"))

  private def coarseCodebook(cb: String): DataFrame =
    spark.read.parquet(s"$indexDir/codebooks/$cb")
  private def pqCodebookDf(pq: String): DataFrame =
    spark.read.parquet(s"$indexDir/pq/$pq")
  private def readSeg(seg: String): DataFrame =
    spark.read.parquet(s"$indexDir/segments/$seg")
  private def readUnion(segs: Seq[String]): DataFrame =
    segs.map(readSeg).reduce(_ unionByName _)

  def centroids(): DataFrame = coarseCodebook(manifestAt(resolvedOrFail())._1)
  def pqCentroids(): DataFrame = pqCodebookDf(manifestAt(resolvedOrFail())._2)
  def postings(): DataFrame = readUnion(manifestAt(resolvedOrFail())._3)

  /** ADC top-k per query over the persisted index: route each query to
    * its `probes` nearest cells, build its O(M·K) distance table against
    * the persisted pq codebook, then score the probed cells' CODES by
    * integer table-lookup sum — the corpus vectors are never read. The
    * manifest is resolved ONCE (the [[IvfIndex.search]] torn-read rule).
    * Scale shape: the probed cell ids collect to a driver list BOUNDED
    * BY THE CODEBOOK (≤ cells values regardless of corpus or query-set
    * size — the [[MinHashIndex]] probe discipline) and prune the code
    * scan at PLANNING time (`PartitionFilters` on the cell partition
    * column — pinned in `PlanAuditSpec`); the per-query routing then
    * rides a broadcast join over the pruned scan; the qtab join
    * broadcasts O(queries·M·K) small ints; the only shuffle is the
    * final per-query rank over rows already reduced to (qid, cid, adc). */
  /** CANDIDATE IDS from the coarse probe alone — the routing half of
    * [[search]] without the PQ-ADC ranking, for cascades that score the
    * survivors with their own kernel (the matryoshka prefix-dim rerank,
    * `q_sim_mrl_ivf_cascade`). Same frozen-codebook routing, same
    * codebook-bounded driver cell list, same partition-pruned postings
    * scan — and ONLY `id` is read from the probed cells (the codes
    * column stays cold; the caller brings its own scorer). Returns
    * (qid, cid). */
  def probeCandidates(queries: DataFrame, idCol: String, vecCol: String,
      probes: Int): DataFrame = {
    val (cb, _, segs) = manifestAt(resolvedOrFail())
    val probed = PqIvfIndex.coarseRank(
        queries.select(col(idCol), col(vecCol)), idCol, vecCol,
        coarseCodebook(cb))
      .where(col("rnk") <= probes)
      .select(col("id").as("qid"), col("cell"))
    val probedCells: Seq[Any] = probed.select("cell").distinct()
      .collect().toIndexedSeq.map(_.get(0))
    readUnion(segs).where(col("cell").isin(probedCells: _*))
      .select("cell", "id")
      .join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id").as("cid"))
  }

  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, probes: Int): DataFrame = {
    val (cb, pq, segs) = manifestAt(resolvedOrFail())
    val coarse = coarseCodebook(cb)
    val pqCb   = pqCodebookDf(pq)
    val probed = coarseRank(
        queries.select(col(idCol), col(vecCol)), idCol, vecCol, coarse)
      .where(col("rnk") <= probes)
      .select(col("id").as("qid"), col("cell"))
    // Driver list bounded by O(cells); the routing recompute for this
    // collect is O(queries·cells) — cheaper than a checkpoint's block
    // lifetime in a serving loop.
    val probedCells: Seq[Any] = probed.select("cell").distinct()
      .collect().toIndexedSeq.map(_.get(0))
    val qtab = qtable(
      subvectors(queries.select(col(idCol), col(vecCol)), idCol, vecCol,
        pqCb), pqCb)
    readUnion(segs).where(col("cell").isin(probedCells: _*))
      .join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id").as("cid"),
        posexplode(col("codes")).as(Seq("s", "code")))
      .join(broadcast(qtab), Seq("qid", "s", "code"))
      .groupBy("qid", "cid").agg(sum("d2q_ppm").as("adc_ppm"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("adc_ppm").asc, col("cid").asc)))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"),
        col("cid"), col("adc_ppm"))
  }
}

/** The shared rules: ONE definition of coarse routing, codebook
  * training, encoding, and the query table, read by the store above AND
  * the inline `q_sim_ivfpq_adc` query — the two serving paths cannot
  * drift (their oracles transliterate these rules once). */
object PqIvfIndex {

  /** (id, s, subvec array<double>) — vector split into `m` subspaces of
    * `dsub` dims, inputs widened to double once (the only widening). */
  def subvectors(df: DataFrame, idCol: String, vecCol: String,
                 m: Int, dsub: Int): DataFrame =
    df.select(col(idCol).as("id"), posexplode(expr(
      s"""transform(sequence(0, ${m - 1}),
         |  si -> transform(slice($vecCol, si * $dsub + 1, $dsub),
         |    x -> CAST(x AS DOUBLE)))""".stripMargin))
      .as(Seq("s", "subvec")))

  /** Subvectors with (m, dsub) read off an existing pq codebook — the
    * geometry lives in the data, not in side metadata. */
  def subvectors(df: DataFrame, idCol: String, vecCol: String,
                 pqCb: DataFrame): DataFrame = {
    val row = pqCb.select(
        (max(col("s")) + 1).as("m"),
        max(size(col("centroid"))).as("dsub"))
      .head()
    subvectors(df, idCol, vecCol, row.getAs[Int]("m"), row.getAs[Int]("dsub"))
  }

  /** Per-subspace codebook (s, cell, centroid) from corpus subvectors:
    * seed cell = id mod `k`, element means via the bounded order-pinned
    * fold tree (buffers ≤ FanIn regardless of cell population). */
  def pqCodebook(sub: DataFrame, k: Int): DataFrame =
    graft.ops.OrderedFold.boundedSumCount(
        sub.select(col("id"), (col("id") % k).as("cell"), col("s"),
          posexplode(col("subvec")).as(Seq("pos", "v"))),
        keys = Seq("s", "cell", "pos"), ordCol = "id", valCol = "v",
        sumName = "sv", cntName = "cnt")
      .withColumn("m", col("sv") / col("cnt"))
      .groupBy("s", "cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("centroid"))

  /** Coarse codebook (cell, centroid) seeded by `seedCol`, means via the
    * same bounded fold (the `collect_list` here is O(dim), not
    * O(members)). */
  def coarseCentroids(df: DataFrame, idCol: String, vecCol: String,
                      seedCol: String): DataFrame =
    graft.ops.OrderedFold.boundedSumCount(
        df.select(col(idCol).as("id"), col(seedCol).as("cell"),
          posexplode(expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))"))
            .as(Seq("pos", "v"))),
        keys = Seq("cell", "pos"), ordCol = "id", valCol = "v",
        sumName = "sv", cntName = "cnt")
      .withColumn("m", col("sv") / col("cnt"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("centroid"))

  /** Squared L2 between `subvec` and `centroid`, floor-quantized to ppm
    * — integers from here on (the `q_sim_pq_adc` discipline). */
  private def d2ppm: Column = expr(
    """CAST(floor(1000000.0 * aggregate(
      |  zip_with(subvec, centroid, (x, y) -> (x - y) * (x - y)),
      |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) AS BIGINT)""".stripMargin)

  /** Coarse routing: every vector ranked against the broadcast coarse
    * codebook by ppm-floored cosine desc, cell asc — rnk 1 = assignment,
    * rnk ≤ probes = the probe set. Integer ranking keeps the discrete
    * cut off the cross-engine last-ulp question. */
  def coarseRank(vecs: DataFrame, idCol: String, vecCol: String,
                 cents: DataFrame): DataFrame =
    vecs.select(col(idCol).as("id"), col(vecCol).as("vector"))
      .join(broadcast(cents))
      .select(col("id"), col("cell"),
        floor(lit(1000000.0) * Similarity.cosine(col("vector"), col("centroid")))
          .cast("long").as("aff_ppm"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("aff_ppm").desc, col("cell").asc)))

  /** Codes (id, codes array<int>): per-subspace argmin centroid
    * (integer d2 ppm, ties → smallest cell) via the bounded heap,
    * reassembled in subspace order. */
  def encode(sub: DataFrame, pqCb: DataFrame): DataFrame =
    graft.plans.GraftOps.topKPerKey(
        sub.join(broadcast(pqCb), Seq("s")).withColumn("d2_ppm", d2ppm)
          .select(col("id"), col("s"), col("cell"), col("d2_ppm")),
        keyCols = Seq("id", "s"),
        orderBy = Seq("d2_ppm" -> true, "cell" -> true), k = 1)
      .groupBy("id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(s, cell))), x -> CAST(x.cell AS INT))")
        .as("codes"))

  /** Query distance table (qid, s, code, d2q_ppm) — the FULL M·K table
    * per query (broadcast-sized by construction), no argmin. */
  def qtable(sub: DataFrame, pqCb: DataFrame): DataFrame =
    sub.join(broadcast(pqCb), Seq("s")).withColumn("d2q_ppm", d2ppm)
      .select(col("id").as("qid"), col("s"), col("cell").as("code"),
        col("d2q_ppm"))
}
