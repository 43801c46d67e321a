package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the Structured Streaming shape for
  * continuous analytics over the event stream (readStream → window agg →
  * writeStream).
  *
  * The watermark is the state bound: a tumbling window finalizes (append
  * mode emits it) once event time passes window end + delay, and later
  * rows for it are DROPPED — at cluster scale the state store holds only
  * the open windows, not history. The same transformation runs unchanged
  * on a batch DataFrame (withWatermark is a no-op in batch mode), which
  * is what the driver's oracle entry checks. */
object Streams {

  /** Tumbling-window event counts. `tsCol` must be a timestamp column. */
  def windowedCounts(events: DataFrame, tsCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("cnt"))

  /** Per-key session windows (gap-based): a session extends while
    * consecutive events arrive within `gap`; an event at-or-past the
    * previous window's end (diff >= gap) opens a new session — Spark's
    * native `session_window`, whose merging state the streaming runtime
    * bounds with the watermark exactly like tumbling windows. The same
    * transformation runs unchanged in batch (the oracle shape): one
    * shuffle by key, sessionization inside the aggregation. */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("w.start").as("session_start"), col("n_events"))
}
