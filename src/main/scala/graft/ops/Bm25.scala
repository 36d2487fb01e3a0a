package graft.ops

/** BM25 scoring kernel (Robertson et al.; Lucene's non-negative idf
  * variant), shared between the oracle-graded inline query
  * (`TextQueries.bm25` / `q_text_bm25`) and the persisted lexical index
  * ([[graft.sim.LexIndex]]) so the two can never score differently.
  *
  * Everything is EXACT int64 once the idf is quantized:
  *  - idf = ln(1 + (N−df+½)/(df+½)) in integer micronats — the ratio is
  *    formed as (2N−2df+1)/(2df+1), so the only floating-point surface
  *    is one ln + floor (the tfidf quantization discipline);
  *  - tf normalization tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) with
  *    k1 = 6/5, b = 3/4 clears to integers by multiplying numerator and
  *    denominator through by 10·A (A = avgdl in millitokens):
  *    22·A·tf / (10·A·tf + 3·A + 9000·dl).
  *
  * The generators emit engine-portable SQL except for the integer
  * division token (`DIV` on Spark, `//` on DuckDB), which the caller
  * passes. */
object Bm25 {

  /** Average document length in millitokens, A = 1000·Σdl / N. */
  def aMilliSql(dlSum: String, nDocs: String, div: String): String =
    s"1000 * $dlSum $div $nDocs"

  /** Lucene idf ln(1 + (N−df+½)/(df+½)) in integer micronats. */
  def idfUnSql(nDocs: String, df: String): String =
    s"CAST(floor(1000000.0 * ln(1.0 + (2.0 * $nDocs - 2.0 * $df + 1.0)" +
      s" / (2.0 * $df + 1.0))) AS BIGINT)"

  /** Per-(doc, term) BM25 contribution in micronats — exact int64 given
    * integer tf, dl, aMilli and the quantized idf. */
  def contribSql(idfUn: String, aMilli: String, tf: String, dl: String,
      div: String): String =
    s"$idfUn * (22 * $aMilli * $tf)" +
      s" $div (10 * $aMilli * $tf + 3 * $aMilli + 9000 * $dl)"
}
