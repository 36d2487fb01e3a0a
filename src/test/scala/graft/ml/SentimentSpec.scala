package graft.ml

import graft.SparkSpec

class SentimentSpec extends SparkSpec {
  import spark.implicits._

  test("lexicon scorer labels by positive/negative token counts") {
    val df = Seq(
      ("p", "BTC to the MOON, big gains!"),        // 2 pos
      ("n", "total crash, panic sell everywhere"), // 3 neg
      ("z", "the market did things today"),        // 0/0
      ("m", "gain now, crash later"))              // 1/1 → neutral
      .toDF("id", "text")
    val out = new LexiconSentiment().withSentiment(df, "text")
      .select("id", "sentiment").as[(String, String)].collect().toMap
    assert(out == Map("p" -> "positive", "n" -> "negative",
      "z" -> "neutral", "m" -> "neutral"))
  }

  test("remote scorer batches per partition and degrades to neutral on failure") {
    val calls = spark.sparkContext.collectionAccumulator[Int]("calls")
    val transport: Seq[String] => Seq[String] = { texts =>
      calls.add(texts.size)
      if (texts.exists(_.contains("poison"))) throw new RuntimeException("boom")
      texts.map(t => if (t.contains("up")) "positive" else "negative")
    }
    val df = (1 to 7).map(i => (i, if (i == 5) "poison pill" else s"up $i"))
      .toDF("id", "text").repartition(2)
    val out = new RemoteSentiment(transport, batchSize = 3)
      .withSentiment(df, "text").select("id", "sentiment")
      .as[(Int, String)].collect().toMap
    assert(out(5) == "neutral")                  // poisoned batch → whole chunk neutral
    assert(out.count(_._2 == "neutral") <= 3)    // only the poisoned chunk degraded
    assert(out.filterNot(kv => out(5) == kv._2 && kv._1 != 5).nonEmpty)
    assert(calls.value.size >= 3)                // ≥3 transport calls for 7 rows @ batch 3 over 2 partitions
  }
}
