package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership prefilter.
  *
  * The continuous-ingestion / decontamination shape: a bounded reference
  * set (eval-benchmark fingerprints, a takedown blocklist, yesterday's
  * corpus keys) must be probed by a 100 TB batch. A semi join ships the
  * batch's keys through a shuffle; this prefilter instead compresses the
  * reference set to an m-bit array once, and the probe becomes a
  * shuffle-free codegen'd projection inside the batch scan
  * ([[graft.functions.BitsetContains]] — a two-instruction mask test per
  * hash). Only the (typically tiny) surviving candidate set pays for exact
  * verification.
  *
  * Determinism: the j bit positions of a key are pmod(md5Hash60(i + ":" +
  * key), m) for i in 0..j-1 — no RNG, no engine-private hash — so the
  * filter's exact false-positive set replays in any SQL engine: a probe
  * hits iff ALL its positions are in the reference side's distinct
  * position set. The oracle never needs the bitset mechanics, just that
  * set-membership outcome.
  *
  * Sizing: the builder's collect is bounded by min(|keys|·j, m) distinct
  * positions ≤ m longs (m = 2²⁶ ⇒ at most 8 MiB of bitset on the driver —
  * same order as any broadcast join side). False-positive rate ≈
  * (1 − e^(−j·n/m))^j; saturate m and every probe degrades to a candidate,
  * which is slow-but-correct (the verify step still filters).
  */
object Bloom {

  /** The j bit positions of `key` in an m-bit filter (array<long>). */
  def positions(key: Column, m: Int, j: Int): Column =
    array((0 until j).map { i =>
      pmod(Sampling.md5Hash60(concat(lit(s"$i:"), key)), lit(m.toLong))
    }: _*)

  /** Build the packed bit array from the reference side's keys — ONE
    * two-phase distinct aggregation (map-side combine folds duplicate
    * positions per task), then a driver-side collect bounded by m bits.
    */
  def build(ref: DataFrame, keyCol: Column, m: Int, j: Int): Array[Byte] = {
    require(m > 0 && (m & 7) == 0, s"bloom: m must be a positive multiple of 8, got $m")
    val bits = new Array[Byte](m / 8)
    // NULL keys contribute no bits (their position array is NULL — the
    // collect below would NPE); probes of NULL keys are likewise false
    ref.filter(keyCol.isNotNull)
      .select(explode(positions(keyCol, m, j)).as("p")).distinct()
      .collect().foreach { r =>
        val p = r.getLong(0)
        bits((p >>> 3).toInt) = (bits((p >>> 3).toInt) | (1 << (p & 7).toInt)).toByte
      }
    bits
  }

  /** Boolean probe column: ALL j positions of `key` set in `bits`. A pure
    * projection — no join, no shuffle; runs inside the batch's scan stage. */
  def probe(key: Column, bits: Array[Byte], m: Int, j: Int): Column =
    (0 until j).map { i =>
      graft.functions.SketchFunctions.bitset_contains(
        lit(bits),
        pmod(Sampling.md5Hash60(concat(lit(s"$i:"), key)), lit(m.toLong)))
    }.reduce(_ && _)

  /** Prefilter + exact verify in one plan: keep only the batch rows whose
    * key Bloom-hits the reference set (a shuffle-free filter inside the
    * scan — non-candidates never leave it), then mark each candidate
    * `confirmed` via an exact join against the reference keys. The join's
    * probe side is the CANDIDATE set, not the batch — that is the point;
    * the false positives are exactly the ¬confirmed survivors.
    */
  def prefilterVerify(
      batch: DataFrame, ref: DataFrame, keyCol: String,
      m: Int, j: Int): DataFrame = {
    val bits = build(ref, col(keyCol), m, j)
    val cands = batch.filter(probe(col(keyCol), bits, m, j))
    val refKeys = ref.select(col(keyCol)).distinct()
      .withColumn("confirmed", lit(true))
    cands.join(refKeys, Seq(keyCol), "left_outer")
      .withColumn("confirmed", coalesce(col("confirmed"), lit(false)))
  }
}
