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

  /** Token-budget sampling: keep a deterministic pseudo-random subset of
    * documents whose combined token mass fills (to within one document
    * tail) a fixed budget — "give me a 1B-token slice of this corpus",
    * the step between corpus curation and a training run. Selection is
    * systematic in md5-hash order, so the subset is stable across runs
    * and engines, and growing the budget only ADDS documents (nested
    * samples: the 1B slice is a prefix of the 2B slice per shard).
    *
    * Mechanics mirror [[Packing.packSequences]]: rows shard by
    * `pmod(hash, shards)`, each shard lays its documents out contiguously
    * in hash order, and a document is kept iff its start offset is below
    * the shard's quota (budget/shards, the first budget%shards shards
    * taking one extra token). Entirely integer arithmetic on exact token
    * counts — replays exactly in SQL. Per shard the kept mass overshoots
    * its quota by at most one document, so the total is within `shards`
    * document tails of the budget.
    *
    * Shape for 100 TB: ONE shuffle (hash-partition on the shard key) +
    * per-shard window sort, identical to packSequences — shards bound the
    * sort and spread the corpus; no global sort, no driver state.
    *
    * Output: the kept rows with (shard, start_tok, n_tok) attached. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, tokenCount: Column,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val h = md5Hash60(col(idCol))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perShard = budget / shards
    val extra = budget % shards
    df.select(col("*"), h.as("__h"),
        pmod(h, lit(shards.toLong)).as("shard"),
        tokenCount.cast("long").as("n_tok"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("start_tok") <
        lit(perShard) + when(col("shard") < extra, 1L).otherwise(0L))
      .drop("__h")
  }

  /** Epoch-aware upsampling to per-stratum row quotas — the other half of
    * the mixing story ([[mixExact]]/[[temperatureHalf]] only cut): small
    * high-quality sources are REPEATED whole epochs until the quota is
    * reached (the "Wikipedia × 5" training-mix recipe), with the final
    * partial epoch truncated in deterministic md5-hash order. Every
    * output row carries its `epoch` (0-based) so a loader can shuffle
    * epochs apart; quota ≤ n degenerates to an exact cut (epoch 0 only).
    *
    * Exact and engine-replayable: repeats = ceil(quota/n) via integer
    * arithmetic, the partial epoch keeps the quota − (repeats−1)·n
    * smallest-hash rows. Shapes at 100 TB: stratum counts are a tiny
    * aggregate (broadcast), the rank window is the same single shuffle
    * as [[stratifiedExact]], and the epoch explode is a narrow transform
    * AFTER the window — rows duplicate inside the scan stage, never
    * through a shuffle. */
  def upsampleEpochs(
      df: DataFrame, strataCol: String, keyCol: String,
      quotas: Map[String, Long], default: Long = 0L): DataFrame = {
    val quota = quotas.foldLeft(lit(default)) { case (acc, (k, q)) =>
      when(col(strataCol) === k, lit(q)).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val byHash = Window.partitionBy(col(strataCol))
      .orderBy(md5Hash60(col(keyCol)), col(keyCol))
    df.join(broadcast(counts), strataCol)
      .withColumn("__q", quota)
      .filter(col("__q") > 0)
      // integer ceil — (q + n − 1) div n — not a double round-trip, which
      // can misround for quotas near 2^53
      .withColumn("__r", expr("(__q + __n - 1) div __n"))
      .withColumn("__rn", row_number().over(byHash))
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__r") - 1, lit(1L))))
      // full epochs keep everything; the LAST epoch keeps the smallest-
      // hash prefix that lands the stratum exactly on its quota
      .filter(col("epoch") < col("__r") - 1 ||
        col("__rn") <= col("__q") - (col("__r") - 1) * col("__n"))
      .drop("__n", "__q", "__r", "__rn")
  }

  /** Hashed-n-gram importance weighting — the DSIR recipe (Xie et al.
    * 2023) reduced to its engine-exact core: score every raw document by
    * how much its token distribution looks like a TARGET corpus, using
    * token counts bucketed into a fixed hash space so the "model" is two
    * `buckets`-row tables, never a vocabulary.
    *
    * Weight = ((Σ_tok target_mass[bucket(tok)] + 1) /
    *           (Σ_tok raw_mass[bucket(tok)] + 1)) · (R_total / T_total) —
    * the document's average RELATIVE bucket frequency under the target vs
    * the raw corpus (the totals factor normalizes counts to frequencies;
    * without it a target that is a subset of the raw corpus could never
    * score above 1). Masses are INTEGER sums (order-independent, exact);
    * the two divisions and one product are fixed-order IEEE ops, so the
    * weight is bit-replayable in any engine. The classical DSIR
    * log-likelihood ratio Σ log(p_t/p_r) needs per-token transcendentals
    * and an order-dependent float sum; this rational form ranks the same
    * direction (documents heavy in target-typical buckets score > 1) and
    * hash-matches.
    *
    * Shape at 100 TB: the two bucket tables are O(buckets) rows built by
    * one aggregation each, COLLECTED to the driver (the "model" is
    * bounded by construction — that is DSIR's point) and inlined as
    * literal lookup arrays, so the scoring pass is one explode + two
    * codegen'd element_at probes + one per-doc aggregation: no broadcast
    * joins, no totals cross-join, no cached intermediates. `kept`
    * (weight > 1) is a shuffle-free gate — resample the kept set with
    * [[hashSample]] downstream.
    *
    * Output: (idCol, t_mass, r_mass, weight, kept). */
  def importanceWeights(
      df: DataFrame, idCol: String, textCol: Column, target: DataFrame,
      targetTextCol: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(buckets <= (1 << 20),
      "the bucket model must stay driver-sized — use a smaller hash space")
    def mass(d: DataFrame, t: Column): Array[Long] = {
      val out = new Array[Long](buckets)
      d.select(explode(split(t, " ")).as("__tok"))
        .filter(col("__tok") =!= "")
        .select(pmod(md5Hash60(col("__tok")), lit(buckets.toLong)).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as("__m"))
        .collect().foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
      out
    }
    val tm = mass(target, targetTextCol)
    val rm = mass(df, textCol)
    val (tt, rt) = (tm.sum, rm.sum)
    // same single IEEE division the column form performed per row; an
    // EMPTY corpus previously produced a null total (sum over no rows)
    // and a null weight — preserved
    val ratio =
      if (tt == 0L || rt == 0L) lit(null).cast("double")
      else lit(rt.toDouble / tt.toDouble)
    val tmArr = typedlit(tm.toSeq)
    val rmArr = typedlit(rm.toSeq)
    val b = pmod(md5Hash60(col("__tok")), lit(buckets.toLong))
      .cast("int") + lit(1) // element_at is 1-based
    df.select(col(idCol),
        explode(split(textCol, " ")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(idCol))
      .agg(sum(element_at(tmArr, b)).as("t_mass"),
        sum(element_at(rmArr, b)).as("r_mass"))
      .withColumn("weight",
        (col("t_mass").cast("double") + lit(1.0)) /
          (col("r_mass").cast("double") + lit(1.0)) * ratio)
      .withColumn("kept", col("weight") > lit(1.0))
  }

  /** Deterministic weighted sampling — the resample half of the DSIR
    * recipe ([[importanceWeights]] scores, this selects): each row is
    * kept with probability min(1, fraction·weight), decided by the SAME
    * hash-threshold trick as [[hashSample]] — keep iff
    * hash(key) < min(1, f·w)·2^60. Shuffle-free (a filter inside the
    * scan), deterministic across runs and engines, and MONOTONE in both
    * arguments: raising the fraction or a row's weight only ever ADDS
    * rows (nested samples), because the threshold moves one way while the
    * hash is fixed.
    *
    * The comparison runs entirely in doubles on BOTH engines — the hash
    * is cast to double (correctly rounded, identical everywhere) and
    * tested against min(1, f·w)·2^60 computed in the same op order, so
    * the kept set replays in SQL as
    * `CAST(h AS DOUBLE) < least(1.0, f*w) * 1152921504606846976.0`.
    * Rows with weight ≤ 0 are never kept. */
  def weightedHashSample(
      df: DataFrame, keyCol: String, weightCol: Column,
      fraction: Double): DataFrame = {
    val p = least(lit(1.0), lit(fraction) * weightCol)
    df.filter(md5Hash60(col(keyCol)).cast("double") <
      p * lit((1L << 60).toDouble))
  }

  /** Deterministic train/validation/test assignment — the split every
    * curation pipeline ends with, as a COLUMN, not a materialized
    * three-way copy. Each row's 60-bit key hash is tested against
    * cumulative fraction boundaries: hash < f₁·2^60 ⇒ split 1,
    * < (f₁+f₂)·2^60 ⇒ split 2, … anything past the last boundary gets
    * the final label. Shuffle-free, stable across runs/engines (the
    * boundaries are plan-time Long literals computed with the same
    * left-to-right partial sums an oracle inlines), and STABLE UNDER
    * CORPUS GROWTH: a document's split never changes when other
    * documents arrive — the property a random split lacks and
    * leakage-free eval needs. */
  def assignSplits(
      df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = md5Hash60(col(keyCol))
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), b), rest) =>
      when(h < lit((b * (1L << 60)).toLong), name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic global shuffle order — the "shuffle the corpus once
    * per epoch" step a training loader needs, as a PERMUTATION COLUMN
    * rather than a materialized reordering. Every row gets its position
    * in md5-hash order; the order is stable across runs and engines, and
    * changing `shards` changes only the grouping, not the determinism.
    *
    * Scale shape: rows shard by pmod(hash, shards) (ONE shuffle), each
    * shard ranks its rows in hash order (per-shard window sort — the
    * sort is bounded by the shard, never global), and the global position
    * is shard_offset + local rank where the offsets are an exclusive
    * cumulative sum over the `shards`-row count table (a tiny broadcast).
    * Global order = ascending (shard, hash, id) — a fixed interleave of
    * the shards, which is exactly as "shuffled" as any hash order.
    *
    * Output: input columns + (shard, pos, global_pos), pos 1-based within
    * the shard, global_pos 0-based over the corpus. */
  def shuffleOrder(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = md5Hash60(col(idCol))
    val withShard = df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
    // the offsets branch deliberately RE-SCANS rather than persisting:
    // Catalyst column-prunes it to the id column alone (one narrow scan +
    // a shards-row aggregate), which at corpus scale is far cheaper than
    // caching the full-width rows the window branch needs
    val offsets = withShard.groupBy("shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__n")
    val byHash = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    withShard
      .withColumn("pos", row_number().over(byHash).cast("long"))
      .join(broadcast(offsets), "shard")
      .withColumn("global_pos", col("__off") + col("pos") - 1)
      .drop("__h", "__off")
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
