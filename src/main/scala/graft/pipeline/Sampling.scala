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

  /** Temperature-flattened mixing — the multilingual/multi-source
    * re-balancing step (p_s ∝ n_s^τ, τ < 1 flattens the size distribution
    * so giant sources stop drowning small ones). No upsampling: each
    * stratum keeps quota_s = min(n_s, ceil((n_min·n_s)^τ́)) rows where the
    * anchor is the SMALLEST stratum — at τ = ½ that is the geometric mean
    * of (n_min, n_s): equality at the smallest source, progressively
    * deeper cuts for bigger ones, and τ = ½ keeps every arithmetic step
    * engine-exact (integer product → one double cast → sqrt → ceil: cast
    * and sqrt are both correctly-rounded single IEEE ops; no transcendental
    * pow, no order-dependent Σ n^τ normalizer). Rows are chosen in
    * deterministic md5-hash order; costs the stratum-count aggregate (tiny)
    * plus ONE shuffle for the window, same as [[stratifiedExact]].
    * Long product n_min·n_s is exact below 2⁶³ (~3·10⁹ rows per side). */
  def temperatureHalf(
      df: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val quotas = counts
      .crossJoin(broadcast(counts.agg(min("__n").as("__nmin"))))
      .select(col(strataCol),
        least(col("__n"),
          ceil(sqrt((col("__nmin") * col("__n")).cast("double"))))
          .as("__quota"))
    val byHash = Window.partitionBy(col(strataCol))
      .orderBy(md5Hash60(col(keyCol)), col(keyCol))
    df.join(broadcast(quotas), strataCol)
      .withColumn("__rn", row_number().over(byHash))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
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
