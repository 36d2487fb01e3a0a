package graft.ml

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpServer

import graft.SparkSpec

/** Exercises the real HTTP transport against an in-process stub of the
  * reference's `/predict` contract (`distilbert_fin/app.py:17-27`), plus
  * the degradation path through [[RemoteSentiment]]. */
class HttpSentimentTransportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** Stub service: label = "positive" iff the text contains "up". */
  private def withStubServer(status: Int = 200)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/predict", exchange => {
      val texts = mapper.readTree(exchange.getRequestBody).get("texts")
      val out = mapper.createObjectNode()
      val labels = out.putArray("labels")
      (0 until texts.size()).foreach { i =>
        labels.add(if (texts.get(i).asText().contains("up")) "positive" else "neutral")
      }
      val body = mapper.writeValueAsString(out).getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/predict")
    finally server.stop(0)
  }

  test("POSTs batches to /predict and maps labels back in order") {
    withStubServer() { url =>
      val transport = HttpSentimentTransport(url)
      assert(transport(Seq("going up", "flat day")) == Seq("positive", "neutral"))
      assert(transport(Seq.empty) == Seq.empty)
    }
  }

  test("end-to-end through RemoteSentiment over a DataFrame") {
    withStubServer() { url =>
      val scorer = new RemoteSentiment(HttpSentimentTransport(url), batchSize = 2)
      val df = Seq("up and away", "sideways", "up again", "meh", "nothing")
        .toDF("text")
      val out = scorer.withSentiment(df, "text").select("text", "sentiment")
        .as[(String, String)].collect().toMap
      assert(out("up and away") == "positive")
      assert(out("sideways") == "neutral")
      assert(out("up again") == "positive")
    }
  }

  test("non-200 response degrades the whole batch to neutral (preprocessor.py:53-56)") {
    withStubServer(status = 503) { url =>
      val scorer = new RemoteSentiment(HttpSentimentTransport(url), batchSize = 10)
      val out = scorer.withSentiment(Seq("up", "down").toDF("text"), "text")
        .select("sentiment").as[String].collect().toSeq
      assert(out == Seq("neutral", "neutral"))
    }
  }

  test("connection failure degrades the whole batch to neutral") {
    // Port 1 is never listening; the connect error must become "neutral".
    val scorer = new RemoteSentiment(
      HttpSentimentTransport("http://127.0.0.1:1/predict"), batchSize = 10)
    val out = scorer.withSentiment(Seq("up", "down").toDF("text"), "text")
      .select("sentiment").as[String].collect().toSeq
    assert(out == Seq("neutral", "neutral"))
  }

  test("label-count mismatch is an error the caller degrades, not silent truncation") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/predict", exchange => {
      val body = """{"labels": ["positive"]}""".getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val t = HttpSentimentTransport(
        s"http://127.0.0.1:${server.getAddress.getPort}/predict")
      assertThrows[RuntimeException](t(Seq("a", "b", "c")))
    } finally server.stop(0)
  }
}
