package graft.sim

import java.nio.file.Files

import graft.SparkSpec

/** The persisted lexical index's contract: index-served BM25 equals the
  * oracle-graded inline query bit-for-bit, probes prune to the query
  * terms' partitions, and versioned publication behaves like IvfIndex's
  * (the shared VersionedPaths.publish). */
class LexIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  /** Must match TextQueries' Bm25Terms/Bm25TopK (the inline query's
    * constants) — the parity test below fails loudly if either drifts. */
  private val terms = Seq("hash", "vector", "window")
  private val topK = 20

  private lazy val idx: LexIndex = {
    val i = new LexIndex(spark,
      Files.createTempDirectory("lex").toString + "/index")
    i.build(graft.queries.Tables.t(spark, dir, "documents"),
      "doc_id", "text")
    i
  }

  test("index-served BM25 equals the inline oracle-graded query exactly") {
    val fromIndex = idx.search(terms, topK).collect().toSeq
    val inline = graft.SparkEntry.queries("q_text_bm25")(spark, dir)
      .collect().toSeq
    assert(fromIndex == inline,
      s"index search diverged from q_text_bm25:\n$fromIndex\nvs\n$inline")
  }

  test("a probe reads only the query terms' postings partitions") {
    val allParts = idx.postings().select("b").distinct().count()
    val search = idx.search(terms, topK)
    val scan = search.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings")) => s
    }.get
    assert(scan.metadata("PartitionFilters").contains("b#"),
      scan.metadata.mkString("\n"))
    val probed = scan.selectedPartitions.partitionCount
    assert(probed > 0 && probed <= terms.size && probed < allParts,
      s"expected <= ${terms.size} of $allParts partitions after pruning, got $probed")
  }

  test("search is deterministic across invocations") {
    val a = idx.search(terms, topK).collect().toSeq
    val b = idx.search(terms, topK).collect().toSeq
    assert(a == b)
  }

  test("rebuild publishes the next version and reads stay _SUCCESS-gated") {
    val v0 = idx.currentVersion().get
    val v1 = idx.build(graft.queries.Tables.t(spark, dir, "documents"),
      "doc_id", "text")
    assert(v1 == v0 + 1)
    assert(idx.currentVersion().contains(v1))
    // Identical corpus => identical answers from the new version.
    val fromIndex = idx.search(terms, topK).collect().toSeq
    val inline = graft.SparkEntry.queries("q_text_bm25")(spark, dir)
      .collect().toSeq
    assert(fromIndex == inline)
  }

  test("search fails loudly when no complete version exists") {
    val empty = new LexIndex(spark,
      Files.createTempDirectory("lex-empty").toString + "/index")
    val e = intercept[IllegalStateException] { empty.search(terms, 5) }
    assert(e.getMessage.contains("no complete index"))
  }
}
