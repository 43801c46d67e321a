package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators are hash-derived and fully reproducible across engines
  * (the 60-bit md5 key hash replays in any SQL dialect — same trick as
  * [[Dedup.md5TokenHash]]), so even the "random" sample is oracle-checkable.
  */
object Sampling {

  /** Uniform 60-bit hash of a key: first 15 hex chars of md5 parsed as an
    * integer in [0, 2^60). DuckDB: `('0x'||substr(md5(k),1,15))::BIGINT`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Threshold for [[hashSample]] at `fraction` — exposed so oracle SQL can
    * inline the identical literal. */
  def hashThreshold(fraction: Double): Long = (fraction * (1L << 60)).toLong

  /** Shuffle-free deterministic sample: keep rows whose key hash falls
    * below `fraction` of the hash space. The 100 TB path — a pure filter
    * that runs inside the scan (no shuffle, no state, no RNG), samples the
    * SAME rows on every run and on every engine, and composes with
    * partition pruning. Fraction is approximate (binomial around p·n). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(md5Hash60(col(keyCol)) < lit(hashThreshold(fraction)))

  /** Exact stratified sample: per stratum, the ceil(fraction·n) rows with
    * the smallest key hashes (hash order = deterministic shuffle of the
    * stratum). Costs ONE shuffle on the stratum key; both window functions
    * share that partitioning. Use when per-stratum quotas must be exact
    * (e.g. balancing languages in a training mix); prefer [[hashSample]]
    * when approximate fractions are fine. Skewed strata sort within the
    * partition — for few huge strata, range-partition the window key. */
  def stratifiedExact(
      df: DataFrame, strataCol: String, keyCol: String,
      fraction: Double): DataFrame = {
    val byHash = Window.partitionBy(col(strataCol))
      .orderBy(md5Hash60(col(keyCol)), col(keyCol))
    val whole = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(byHash))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  /** Domain mixing: [[stratifiedExact]] with a PER-STRATUM fraction — the
    * "data mix" step that re-weights sources/domains/languages to a target
    * composition before training. Strata absent from `mix` keep `default`
    * (0.0 default = drop unlisted domains). Same determinism and
    * single-shuffle cost as stratifiedExact; the fraction lookup is a
    * literal CASE expression, not a join. */
  def mixExact(
      df: DataFrame, strataCol: String, keyCol: String,
      mix: Map[String, Double], default: Double = 0.0): DataFrame = {
    val frac = mix.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    val byHash = Window.partitionBy(col(strataCol))
      .orderBy(md5Hash60(col(keyCol)), col(keyCol))
    val whole = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(byHash))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }
}
