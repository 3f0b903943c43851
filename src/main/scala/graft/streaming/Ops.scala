package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicLongArray}

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
/** Prometheus-style histogram with fixed upper bounds: lock-free observe
  * (bucket counters + double-bits CAS sum) and the text exposition's
  * cumulative `_bucket{le=...}` / `_sum` / `_count` rendering. */
final class PromHistogram(val upperBounds: Array[Double]) {
  private val counts = new AtomicLongArray(upperBounds.length + 1) // +Inf last
  private val sumBits = new AtomicLong(java.lang.Double.doubleToLongBits(0.0))

  def observe(v: Double): Unit = {
    var i = 0
    while (i < upperBounds.length && v > upperBounds(i)) i += 1
    counts.incrementAndGet(i)
    var done = false
    while (!done) {
      val prev = sumBits.get
      val next = java.lang.Double.doubleToLongBits(
        java.lang.Double.longBitsToDouble(prev) + v)
      done = sumBits.compareAndSet(prev, next)
    }
  }

  def count: Long = (0 to upperBounds.length).map(counts.get).sum
  def sum: Double = java.lang.Double.longBitsToDouble(sumBits.get)

  // Prometheus renders bounds in shortest form ("1", "0.01", "2.5")
  private def le(b: Double): String =
    if (b == b.toLong.toDouble) b.toLong.toString else b.toString

  def render(name: String, sb: StringBuilder): Unit = {
    sb.append(s"# TYPE $name histogram\n")
    var cum = 0L
    upperBounds.indices.foreach { i =>
      cum += counts.get(i)
      sb.append(s"""${name}_bucket{le="${le(upperBounds(i))}"} $cum""" + "\n")
    }
    cum += counts.get(upperBounds.length)
    sb.append(s"""${name}_bucket{le="+Inf"} $cum""" + "\n")
    sb.append(s"${name}_sum $sum\n")
    sb.append(s"${name}_count $cum\n")
  }
}

final class Metrics {
  val messagesConsumed = new AtomicLong(0)
  val messagesProduced = new AtomicLong(0)
  val transformErrors = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val pipelineRunning = new AtomicBoolean(false)
  val ready = new AtomicBoolean(false)
  // the reference's two batch histograms with its exact bucket bounds
  // (internal/observability/metrics.go:42-53)
  val batchSize = new PromHistogram(
    Array(1, 5, 10, 20, 30, 40, 50, 75, 100))
  val batchProcessingDuration = new PromHistogram(
    Array(0.01, 0.05, 0.1, 0.5, 1, 2.5, 5, 10))

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
    batchSize.render("storm_etl_batch_size", sb)
    batchProcessingDuration.render(
      "storm_etl_batch_processing_duration_seconds", sb)
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
      // the reference observes both histograms only for non-empty batches
      // (pipeline.go:103-106 batch size after extract; :113-116 duration
      // only when rows loaded)
      if (rows > 0) {
        m.batchSize.observe(rows.toDouble)
        m.batchProcessingDuration.observe(
          event.progress.batchDuration / 1000.0)
        m.ready.set(true)
      }
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
