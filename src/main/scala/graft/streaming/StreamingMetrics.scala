package graft.streaming

import graft.engine.EngineMetrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming side of [[graft.engine.EngineMetrics]] — the feed-rate
  * meters of the reference's metrics module (reference metrics/
  * MetricsReporter.scala samples per-operation meters into rates; here
  * the rates come from Structured Streaming's own progress events, so
  * recording costs nothing beyond the listener bus the runtime already
  * runs).
  *
  * Counter names: `stream.queries.started` / `stream.queries.terminated`,
  * `stream.triggers`, `stream.rows` (input rows across all queries), and
  * `stream.rows.<queryName>` per named query (unnamed queries aggregate
  * under `stream.rows.unnamed`). Sampling `snapshot` twice and dividing
  * by wall time gives the reference-style rate.
  *
  * Progress events are delivered ASYNCHRONOUSLY on the listener bus —
  * after `processAllAvailable()` the counters converge, they are not
  * synchronous with the trigger. */
object StreamingMetrics {

  /** Attach a listener feeding the session's registry. Returns the
    * listener so callers can `spark.streams.removeListener` it. */
  def attach(spark: SparkSession): StreamingQueryListener = {
    val reg = EngineMetrics(spark)
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        reg.inc("stream.queries.started")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        reg.inc("stream.triggers")
        reg.add("stream.rows", e.progress.numInputRows)
        val name = Option(e.progress.name).getOrElse("unnamed")
        reg.add(s"stream.rows.$name", e.progress.numInputRows)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        reg.inc("stream.queries.terminated")
    }
    spark.streams.addListener(l)
    l
  }
}
