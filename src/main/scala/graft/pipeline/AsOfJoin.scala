package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, backward (default) or forward: for every left row, attach
  * the single right row with the greatest timestamp at-or-before — or,
  * `forward`, the smallest at-or-after — the left row's timestamp within
  * the same key. Event attribution, "state as of", point-in-time feature
  * lookup, time-to-next-event. Left-join semantics: a left row with no
  * matching right row keeps nulls.
  *
  * Spark-first plan: NOT a range join — a `l.ts >= r.ts` non-equi join
  * explodes to every prior candidate per left row and re-aggregates.
  * Instead the two sides are UNION-tagged and processed with ONE shuffle
  * by key and ONE window sort: `last(right payload, ignoreNulls)` over
  * (key ORDER BY ts, side) hands each left row the most recent right row
  * at-or-before it (the right side sorts first on timestamp ties, so
  * "at-or-before" is inclusive, matching ASOF semantics). Cost: one
  * shuffle + one sort of |L|+|R| — the same shape as a groupBy; no
  * broadcast; skew follows the key distribution like any keyed op.
  */
object AsOfJoin {

  /** `key` and `ts` must exist on both sides. The right side contributes
    * `rightCols`, suffixed to avoid collisions; every left column is kept
    * as-is.
    *
    * SQL join semantics on NULL keys: a NULL key never matches (right
    * rows with a NULL key are dropped; left rows with one keep null right
    * columns) — without the gate the window partition would happily match
    * NULL to NULL. Right rows tying on (key, ts) resolve
    * DETERMINISTICALLY toward the greatest right payload (struct order),
    * so repeated runs pick the same row. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], suffix: String = "_right",
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val lPayload = struct(leftCols.map(left(_)): _*)
    val rPayload = struct(rightCols.map(right(_)): _*)
    val lType = left.select(lPayload).schema.head.dataType
    val rType = right.select(rPayload).schema.head.dataType
    val combined = left.select(col(key), col(ts), lit(1).as("__side"),
        lPayload.as("__l"), lit(null).cast(rType).as("__r"))
      .unionByName(right.filter(col(key).isNotNull)
        .select(col(key), col(ts), lit(0).as("__side"),
          lit(null).cast(lType).as("__l"), rPayload.as("__r")))
    // __r last: right-side ties on (ts) order by payload, so last() picks
    // the greatest — a deterministic choice (ASOF engines pick an
    // arbitrary one; any fixed rule is equally valid).
    // forward = the time-mirrored scan: descending ts finds the NEAREST
    // right row at-or-AFTER each left row ("time to next event") with the
    // identical one-shuffle one-sort shape; __side still sorts the right
    // row first at timestamp ties, so "at-or-after" stays inclusive
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(key).orderBy(tsOrder, col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(c + suffix)): _*)
  }
}
