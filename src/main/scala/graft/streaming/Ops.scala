package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Observability parity with the reference (SURVEY.md §2.7 T7, S8):
  * Prometheus-style counters fed by a `StreamingQueryListener`, plus the
  * ops HTTP endpoints `/healthz` (always 200), `/readyz` (503 until the
  * first processed row, 200 after — `internal/pipeline/pipeline.go:55-60`)
  * and `/metrics` (text exposition, same metric names as
  * `internal/observability/metrics.go:20-66`).
  */
final class Metrics {
  val messagesConsumed = new AtomicLong(0)
  val messagesProduced = new AtomicLong(0)
  val transformErrors = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val pipelineRunning = new AtomicBoolean(false)
  val ready = new AtomicBoolean(false)

  def render: String = {
    val sb = new StringBuilder
    def c(name: String, v: Long): Unit = {
      sb.append(s"# TYPE $name counter\n")
      sb.append(s"$name $v\n")
    }
    c("storm_etl_messages_consumed_total", messagesConsumed.get)
    c("storm_etl_messages_produced_total", messagesProduced.get)
    c("storm_etl_transform_errors_total", transformErrors.get)
    c("storm_etl_batches_total", batches.get)
    sb.append("# TYPE storm_etl_pipeline_running gauge\n")
    sb.append(s"storm_etl_pipeline_running ${if (pipelineRunning.get) 1 else 0}\n")
    sb.toString
  }
}

/** Listener bridging query progress into [[Metrics]] — numInputRows feeds
  * the consumed counter; readiness flips on the first non-empty batch.
  * `queryName` (when set) scopes the counters to one named query, so other
  * streams on the same session can't inflate them or flip readiness. */
final class MetricsListener(m: Metrics, queryName: Option[String] = None)
    extends StreamingQueryListener {
  override def onQueryStarted(event: QueryStartedEvent): Unit =
    if (queryName.forall(_ == event.name)) m.pipelineRunning.set(true)

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    if (queryName.forall(_ == event.progress.name)) {
      val rows = event.progress.numInputRows
      m.messagesConsumed.addAndGet(rows)
      m.batches.incrementAndGet()
      if (rows > 0) m.ready.set(true)
    }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    m.pipelineRunning.set(false)
}

/** Minimal ops HTTP server (JDK built-in httpserver — no extra deps). */
final class OpsServer(metrics: Metrics, bindPort: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress(bindPort), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/healthz", (ex: HttpExchange) => respond(ex, 200, "ok\n"))
  server.createContext("/readyz", (ex: HttpExchange) =>
    if (metrics.ready.get) respond(ex, 200, "ready\n")
    else respond(ex, 503, "not ready\n"))
  server.createContext("/metrics", (ex: HttpExchange) =>
    respond(ex, 200, metrics.render))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort
}
