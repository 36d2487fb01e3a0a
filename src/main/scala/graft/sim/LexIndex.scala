package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LEXICAL (BM25) index — the build-once / query-many twin of
  * [[IvfIndex]] on the sparse-retrieval side: the inline `q_text_bm25`
  * re-derives corpus statistics per query; this index pays tokenization,
  * document frequencies, and length statistics ONCE and answers every
  * future keyword query from disk.
  *
  * Layout per version (`indexDir/v=N/`, staged-atomic publication via
  * the shared [[graft.ops.VersionedPaths.publish]], `_SUCCESS`-gated
  * reads — the [[IvfIndex]] discipline verbatim):
  *   - `postings/` — (term, doc_id, tf, dl), PARTITIONED BY `b`
  *     (term-hash bucket 0..[[LexIndex.Buckets]]−1 from the md5-60-bit
  *     idiom) so a probe reads only its terms' buckets — directory-level
  *     partition pruning, the lexical analogue of IVF's cell pruning;
  *     `dl` is denormalized onto every posting so scoring never joins a
  *     doc-length table.
  *   - `stats/`    — (term, df, n_docs, dl_sum), vocabulary-sized; the
  *     global (n_docs, Σdl) pair rides every row so one broadcast-sized
  *     read carries all scoring inputs.
  *
  * Search probes the query terms' buckets, joins the broadcast
  * term-stats slice, and scores with the EXACT integer BM25 kernel
  * shared with the oracle-graded inline query ([[graft.ops.Bm25]] —
  * one definition, so index and query cannot drift); the top-k rides
  * `TakeOrderedAndProject`. At 100 TB a query reads
  * ~|terms|/[[LexIndex.Buckets]] of the postings from disk and shuffles
  * only the per-doc contribution rows. */
final class LexIndex(spark: SparkSession, val indexDir: String)
    extends Serializable {
  import LexIndex._

  /** Newest version whose postings AND stats are complete (name filter
    * before `_SUCCESS` probes — [[graft.ops.VersionedPaths]] rule 1). */
  def currentVersion(): Option[Long] = {
    val dir = new Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.VersionedPaths.listNumbered(fs, dir, "v=", dirsOnly = true)
      .filter { case (p, _) =>
        fs.exists(new Path(p, "postings/_SUCCESS")) &&
          fs.exists(new Path(p, "stats/_SUCCESS")) }
      .map(_._2)
      .sorted.lastOption
  }

  /** Build and publish the next index version from a (id, text) corpus.
    * One tokenize pass feeds postings, document lengths, document
    * frequencies, and the global stats; zero-term docs contribute no
    * postings and are excluded from N and Σdl — exactly the inline
    * query's `dl > 0` population, so scores agree by construction. */
  def build(docs: DataFrame, idCol: String, textCol: String): Long = {
    val staging = new Path(indexDir, s".staging-${java.util.UUID.randomUUID()}")
    val out = staging.toString
    try {
      val tf = graft.queries.Tables.fanout(docs)
        .select(col(idCol).as("doc_id"),
          explode(graft.ops.TokenOps.terms(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true) // postings, dl, df, and globals read it once
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      tf.join(dl, Seq("doc_id"))
        .withColumn("b", expr(bucketSql("term")))
        .select("b", "term", "doc_id", "tf", "dl")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("b").parquet(s"$out/postings")
      val globals = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("dl_sum"))
      tf.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(globals))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/stats")
    } catch {
      case e: Throwable =>
        try staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(staging, true)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.VersionedPaths.publish(fs, new Path(indexDir), staging, "v=",
      currentVersion().map(_ + 1).getOrElse(0L))
  }

  private def resolvedOrFail(): Long = currentVersion().getOrElse(
    throw new IllegalStateException(s"no complete index under $indexDir"))

  private def read(v: Long, table: String): DataFrame =
    spark.read.parquet(s"$indexDir/v=$v/$table")

  def postings(): DataFrame = read(resolvedOrFail(), "postings")
  def stats(): DataFrame = read(resolvedOrFail(), "stats")

  /** Top-k BM25 docs for a bag of query terms, from the persisted index
    * only. The version is resolved ONCE for both tables (the torn-read
    * rule, as in [[IvfIndex.search]]); probed buckets are computed with
    * the SAME Spark expression the build used (a driver-side O(|terms|)
    * evaluation — not a collect of data), so the probe can never hash
    * differently from the layout. Output schema matches `q_text_bm25`:
    * (doc_id, dl, n_hit, score_un). */
  def search(terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val v = resolvedOrFail()
    import spark.implicits._
    val probe = spark.createDataset(terms).toDF("term")
      .withColumn("b", expr(bucketSql("term")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val buckets = probe.map(_._2).distinct
    val termStats = read(v, "stats")
      .where(col("term").isin(terms: _*))
      .withColumn("a_milli",
        expr(graft.ops.Bm25.aMilliSql("dl_sum", "n_docs", "DIV")))
      .withColumn("idf_un", expr(graft.ops.Bm25.idfUnSql("n_docs", "df")))
      .select("term", "idf_un", "a_milli")
    read(v, "postings")
      .where(col("b").isin(buckets: _*) && col("term").isin(terms: _*))
      .join(broadcast(termStats), Seq("term"))
      .withColumn("contrib",
        expr(graft.ops.Bm25.contribSql("idf_un", "a_milli", "tf", "dl", "DIV")))
      .groupBy("doc_id")
      .agg(max("dl").as("dl"), count(lit(1)).cast("int").as("n_hit"),
        sum("contrib").as("score_un"))
      .where(col("score_un") > 0)
      .orderBy(col("score_un").desc, col("doc_id"))
      .limit(k)
  }
}

object LexIndex {
  /** Term-hash partition count. At corpus scale each bucket holds
    * ~vocab/Buckets terms' postings; a query touches |terms| buckets. */
  val Buckets = 64

  /** The build/probe bucket rule — ONE definition (the md5-60-bit hex
    * parse idiom), evaluated through Spark expressions on both sides so
    * layout and probe can never disagree. */
  private[sim] def bucketSql(termCol: String): String =
    s"CAST(conv(substring(md5($termCol), 1, 15), 16, 10) AS BIGINT) % $Buckets"
}
