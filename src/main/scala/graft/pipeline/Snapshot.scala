package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison: what changed between two versions of a
  * dataset — the audit step before promoting a refreshed crawl (how much
  * churn did this refresh introduce? did the "incremental" job silently
  * rewrite half the corpus?).
  */
object Snapshot {

  /** Delta between two snapshots keyed by `idCol`: one row per difference,
    * `change` ∈ added (id only in `cur`), removed (id only in `old`),
    * changed (both, different `textCol` content by md5 fingerprint).
    * Unchanged rows are NOT emitted — at 100 TB the delta is the only
    * thing that should ever leave the join, and rows collapse to
    * (id, 16-byte hash) BEFORE the shuffle, so the exchange never carries
    * document bodies. One hash-shuffle per side on the unique id (no skew
    * by construction); AQE picks the join strategy from the real sizes —
    * both sides are corpus-scale, so no broadcast hint belongs here.
    *
    * Presence is tracked with explicit marker columns, NOT hash
    * nullability: a NULL `textCol` must read as "id present with NULL
    * content" (text→NULL is 'changed' via the null-safe compare;
    * NULL→NULL is unchanged), never as "id absent". */
  def diff(old: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = old.select(col(idCol).as("id"), md5(col(textCol)).as("__h_old"),
      lit(true).as("__in_old"))
    val c = cur.select(col(idCol).as("id"), md5(col(textCol)).as("__h_new"),
      lit(true).as("__in_new"))
    o.join(c, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__h_old") <=> col("__h_new")), "changed"))
      .filter(col("change").isNotNull)
      .select(col("id"), col("change"))
  }
}
