package graft.sources.sse

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Minimal streaming SSE HTTP client — the engine-side analog of the
  * reference's `requests.get(stream=True)` + sseclient connection setup
  * (pipeline.py:74-84): a keep-alive GET with `Accept: text/event-stream`
  * and a caller-identifying `User-Agent`, `?since=` resume on the first
  * connect (pipeline.py:76-78), `Last-Event-ID` on reconnects (the SSE
  * spec's resume mechanism, which Wikimedia EventStreams honors alongside
  * `since`).
  *
  * Deliberately a thin connection layer: protocol-frame assembly stays in
  * [[graft.sources.SseFrames]] and durability/replay in the capture file +
  * `sse-file` tail source, so every consumer shares one parser.
  */
object SseHttpClient {

  /** An open SSE connection: the HTTP status, the raw protocol lines as
    * they arrive (terminators stripped; blocks on the socket between
    * events), and a close handle. Closing mid-read makes the iterator's
    * next pull throw an IOException, which reconnect loops treat as a
    * connection drop. */
  final case class Connection(status: Int, lines: Iterator[String],
      close: () => Unit)

  /** Open the stream. `since` is appended as a query parameter exactly like
    * the reference (`?since=<ISO8601>`, pipeline.py:76-78), composing with
    * any query string already on the url; `lastEventId` becomes the
    * standard `Last-Event-ID` request header. */
  def connect(url: String, userAgent: String,
      since: Option[String] = None, lastEventId: Option[String] = None,
      connectTimeoutMs: Long = 10000L): Connection = {
    val full = since match {
      case Some(s) =>
        val sep = if (url.contains("?")) "&" else "?"
        url + sep + "since=" + java.net.URLEncoder.encode(s, "UTF-8")
      case None => url
    }
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = {
      val b = HttpRequest.newBuilder(URI.create(full))
        .header("Accept", "text/event-stream")
        .header("User-Agent", userAgent)
        .GET()
      lastEventId.filter(_.nonEmpty).foreach(b.header("Last-Event-ID", _))
      b.build()
    }
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    val in = resp.body()
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
    Connection(resp.statusCode(), lines,
      () => try in.close() catch { case _: Exception => () })
  }
}
