package graft.gov

import org.apache.spark.sql.SparkSession

/** MASS-ERASURE ANCHOR at CLAIMED magnitude — the measured form of the
  * [[ForgetPipeline.executeVictims]] 10⁶⁺-victim story
  * (`ANCHOR_forget.json`). The per-round `q_gov_forget_victims` scaling
  * block proves shape (×1/×4/×8, victim set ∝ corpus) but its ×1 ledger
  * is ~550 rows — the 10⁷–10⁸ claim stayed extrapolation. This main
  * drives ONE erasure request with ≥10⁶ victims through all SEVEN store
  * shapes over a heavily amplified corpus and bars it output-linear
  * against the ×1 baseline.
  *
  * Protocol differences from the scaling block, deliberate:
  *  - only `documents` and `embeddings` amplify (the only tables the
  *    fixture reads — amplifying the TPC-H spine at ×400 would cost an
  *    hour of parquet writes that measure nothing);
  *  - the seven-store fixture builds OUTSIDE the clock
  *    ([[ForgetScale.prewarm]]) — the claim under audit is the erasure,
  *    and at this magnitude the build is too large to hide inside a
  *    min-of-2 exclusion;
  *  - victim denominator [[Mod]] = 2 (vs the block's 64): each timed
  *    pass erases HALF the corpus ids — 10⁶ victims at ×400 — and the
  *    two available slices give exactly the min-of-2 without a fixture
  *    rebuild.
  *
  * Bar: the output-linear envelope at the anchor factor
  * ([[graft.Scaling.gBarAt]]) — ledger rows (victims × 7 stores) scale
  * ∝ f by construction, and forget work is O(store + victims) with
  * per-publish fixed overhead that amortizes under amplification.
  * Band: one [[graft.Calib.bwParSec]] probe brackets each factor's
  * timed passes; a contended window marks the artifact skewed (the
  * Bench/Scaling verdict rule — re-measure, don't grade noise). */
object ForgetAnchor {

  val Mod = 2

  private val Tables = Seq("documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = if (args.nonEmpty) args(0) else "ANCHOR_forget.json"
    val factors = sys.env.getOrElse("SPARK_GRAFT_FORGET_FACTORS", "1,400")
      .split(",").map(_.trim.toInt).toSeq
    require(factors.head == 1, "first factor must be the ×1 baseline")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val rows = factors.map { f =>
      val dir = s"/tmp/graft_fanchor/x$f"
      System.err.println(s"[fanchor] amplifying ${Tables.mkString("+")} " +
        s"$srcDir -> $dir (x$f)")
      val tAmp0 = System.nanoTime()
      Tables.foreach { t =>
        val base = graft.queries.Tables.t(spark, srcDir, t)
        (0 until f).map(graft.Scaling.shifted(base, _))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      System.err.println(f"[fanchor] amplify x$f done in " +
        f"${(System.nanoTime() - tAmp0) / 1e9}%.1f s")
      // Store build, OUTSIDE the clock (see object doc).
      val tB0 = System.nanoTime()
      ForgetScale.prewarm(spark, dir, Mod)
      System.err.println(f"[fanchor] fixture build x$f done in " +
        f"${(System.nanoTime() - tB0) / 1e9}%.1f s")
      val probePre = graft.Calib.bwParSec(spark.sparkContext, cpus.toInt)
      // Min-of-2 timed erasures (slices 0 and 1 — disjoint halves; the
      // Bench storage hygiene between passes).
      val per = (1 to 2).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        ForgetScale.frameAt(spark, dir, Mod)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val ledger = ForgetScale.lastFrame(spark, dir, Mod).count()
        System.err.println(f"[fanchor] x$f pass: $sec%.1f s, " +
          s"$ledger ledger rows")
        (sec, ledger)
      }
      // Post probe with a bounded settle: immediately after a
      // multi-GB erasure the box pays its own dirty-page writeback,
      // which reads as bandwidth contention but is the factor's own
      // wake, not a co-tenant. Re-probe up to 3 times at 30 s spacing
      // and keep the min — a genuinely contended window stays high
      // through the settle and still flags the artifact.
      var probePost = graft.Calib.bwParSec(spark.sparkContext, cpus.toInt)
      var settles = 3
      while (probePost > graft.Calib.BandSkewRatio * probePre &&
          settles > 0) {
        System.err.println(f"[fanchor] x$f post probe $probePost%.3f " +
          "high — settling 30 s")
        Thread.sleep(30000)
        probePost = math.min(probePost,
          graft.Calib.bwParSec(spark.sparkContext, cpus.toInt))
        settles -= 1
      }
      val sec = per.map(_._1).min
      val ledger = per.map(_._2).max
      (f, sec, ledger, probePre, probePost)
    }

    val t1 = rows.head._2
    // Band verdict over ALL bracket probes (two per factor): with only
    // two factors a max-per-factor median would grade itself — the
    // full probe list at least exposes a pre-vs-post spread (a post
    // probe inflated by the factor's own page-cache churn reads
    // differently from a contended pre probe; both are recorded).
    val probes = rows.flatMap(r => Seq(r._4, r._5))
    val quietRef = probes.sorted.apply(probes.size / 2)
    val skewed = probes.exists(_ > graft.Calib.BandSkewRatio * quietRef)
    val fMax = factors.max
    val gMax = rows.last._2 / (fMax * t1)
    val bar = graft.Scaling.gBarAt(fMax)
    val barsOk = fMax == 1 || gMax <= bar
    val blocks = rows.map { case (f, sec, ledger, pre, post) =>
      s""""x$f":{"t":${d3(sec)},"ledger_rows":$ledger,""" +
        s""""victims":${ledger / 7},"probe_pre":${d3(pre)},""" +
        s""""probe_post":${d3(post)}}"""
    }.mkString(",")
    val json = s"""{"metric":"forget_anchor","sf":"$srcDir","mod":$Mod,""" +
      s""""factors":[${factors.mkString(",")}],$blocks,""" +
      s""""g$fMax":${d3(gMax)},"g_bar":${d3(bar)},""" +
      s""""band":"${if (skewed) "skewed" else "ok"}",""" +
      s""""bars":${if (barsOk) "\"ok\"" else "\"broken\""}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
    if (!barsOk) {
      System.err.println(f"[fanchor] BAR BROKEN: g$fMax $gMax%.3f > $bar%.3f")
      sys.exit(1)
    }
  }
}
