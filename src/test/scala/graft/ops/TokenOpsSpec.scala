package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("removeStopWords keeps duplicates (StopWordsRemover parity, not array_except)") {
    val toks = Seq(Seq("the", "cat", "cat", "is", "fast", "")).toDF("w")
      .select(TokenOps.removeStopWords($"w")).as[Seq[String]].head()
    assert(toks == Seq("cat", "cat", "fast")) // dup "cat" survives; stopwords+empties dropped
  }

  test("terms == ml Tokenizer + StopWordsRemover on cleaned text") {
    import org.apache.spark.ml.feature.{StopWordsRemover, Tokenizer}
    val df = Seq(
      "The QUICK brown fox, jumps!", "a b https://x.io c", "  spaced   out  ")
      .toDF("text")
      .withColumn("cleaned", TextOps.cleanText($"text"))
    val mlOut = new StopWordsRemover().setInputCol("words").setOutputCol("f")
      .setStopWords(TokenOps.StopWords.toArray)
      .transform(new Tokenizer().setInputCol("cleaned").setOutputCol("words")
        .transform(df))
      .select("f").as[Seq[String]].collect().toSeq
    val ours = df.select(TokenOps.terms($"text")).as[Seq[String]].collect().toSeq
    assert(ours == mlOut)
  }

  test("vocabulary: minDF filter and (tf desc, term asc) top-K") {
    val docs = Seq(
      (1L, "alpha beta beta"), (2L, "alpha beta gamma"), (3L, "alpha delta"),
      (4L, "beta alpha"), (5L, "gamma gamma"))
      .toDF("doc_id", "text")
    val v = TokenOps.vocabulary(docs, "doc_id", "text", minDF = 2, vocabSize = 2)
      .as[(String, Long, Long)].collect().toSeq
    // alpha: df 4 tf 4; beta: df 3 tf 4; gamma: df 2 tf 3; delta df 1 (dropped)
    assert(v == Seq(("alpha", 4L, 4L), ("beta", 3L, 4L)))
  }
}
