package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k with the QUERY side broadcast — the
  * corpus never shuffles; cost is one scan × |queries|. Scale path:
  * random-hyperplane LSH bucketing — candidates come from the query's
  * bucket (plus Hamming-1 multiprobes), then exact re-rank; corpus is
  * bucketed once and reused.
  *
  * All math is `zip_with`/`aggregate` in double precision — codegen'd, no
  * UDF.
  */
object Similarity {

  /** Codegen'd native loop ([[graft.functions.DotProduct]]); the
    * zip_with/aggregate formulation stays available but is interpreted. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** id + double vector + precomputed norm. */
  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Brute-force cosine top-k: for each query row (queryPred), the k most
    * similar OTHER rows. Exact — the oracle baseline. Broadcast the
    * (small) query side; rank per query with a window. */
  def cosineTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    val queries = prep(df.filter(queryPred), idCol, vecCol)
      .withColumnRenamed("id", "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    val scored = corpus.join(broadcast(queries), col("id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs, EXACT: every pair with
    * cosine >= threshold. The right side is broadcast and the predicate is
    * non-equi, so this is quadratic — the oracle baseline for small/medium
    * corpora; use [[cosineNearDupPairsLsh]] as the bucketed scale path. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = prep(df, idCol, vecCol)
    val b = prep(df, idCol, vecCol)
      .withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb")
      .withColumnRenamed("nrm", "nrmb")
    a.join(broadcast(b), col("id") < col("id_b"))
      .withColumn("sim", dot(col("v"), col("vb")) / (col("nrm") * col("nrmb")))
      .filter(col("sim") >= threshold)
      .select(col("id").as("id_a"), col("id_b"), col("sim"))
  }

  /** Sign-bucket LSH candidate pairs under Hamming-1 multiprobe — the
    * shared candidate generator for [[cosineNearDupPairsLsh]] and
    * [[knnGraph]]. Each left row explodes to its probe ball (own bucket
    * + `planes` one-bit flips) and joins the right side's bucket; pairs
    * are kept by `pairPred` on (id, id_b). The probe masks are DISTINCT,
    * so a qualifying pair (buckets within Hamming distance 1) arises
    * from exactly one probe — no dedup pass exists or is needed. Both
    * join sides re-derive the corpus (scan + cast + norm + bucket twice)
    * rather than caching it: at corpus scale a persist trades a second
    * columnar scan and bucket kernel for corpus-sized cache pressure,
    * and the cache would leak besides (the result is lazy and
    * caller-consumed, so no safe unpersist point exists here).
    * Output: (id, v, nrm) ⊗ (id_b, vb, nrmb) candidate rows. */
  private def lshProbeCandidates(base: DataFrame, planes: Int,
      pairPred: (Column, Column) => Column): DataFrame = {
    val probes = array(
      col("bucket") +: (0 until planes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val a = base.select(col("id"), col("v"), col("nrm"),
      explode(probes).as("probe"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nrmb"), col("bucket").as("bucket_b"))
    a.join(b, col("probe") === col("bucket_b") &&
        pairPred(col("id"), col("id_b")))
      .select(col("id"), col("id_b"), col("v"), col("vb"),
        col("nrm"), col("nrmb"))
  }

  /** Scale path for cosine near-dup: candidates limited to pairs whose
    * sign-buckets are within Hamming distance 1 (probabilistic recall);
    * exact cosine verification on candidates only. */
  def cosineNearDupPairsLsh(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 6, dim: Int = 64): DataFrame = {
    val base = prep(df, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    lshProbeCandidates(base, planes, _ < _)
      .withColumn("sim", dot(col("v"), col("vb")) / (col("nrm") * col("nrmb")))
      .filter(col("sim") >= threshold)
      .select(col("id").as("id_a"), col("id_b"), col("sim"))
  }

  /** k-NN GRAPH over the whole corpus — every vector's k nearest
    * neighbors by cosine: the neighborhood structure SemDeDup-style
    * semantic dedup, graph clustering and diversity pruning consume.
    * Candidates come from sign-bucket LSH with Hamming-1 multiprobe (the
    * [[cosineNearDupPairsLsh]] scale shape — work ∝ bucket collisions,
    * never corpus²), exact cosine runs on candidates only, and each node
    * ranks its own candidates by (sim DESC, neighbor ASC). A (node,
    * neighbor) candidate arises from EXACTLY one probe (the one flipping
    * their buckets' differing bit, or the identity probe when the buckets
    * are equal), so no dedup shuffle is needed — the DAG is one
    * probe⋈bucket join plus the per-node rank window. Nodes whose
    * Hamming-1 ball holds no other vector emit no rows — the LSH recall
    * trade; `planes` tunes ball occupancy (more planes = smaller, purer
    * buckets; at corpus scale raise planes so buckets stay bounded). */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 6, dim: Int = 64): DataFrame = {
    val base = prep(df, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    val cand = lshProbeCandidates(base, planes, _ =!= _)
      .withColumn("sim", dot(col("v"), col("vb")) / (col("nrm") * col("nrmb")))
    val w = Window.partitionBy("id").orderBy(col("sim").desc, col("id_b"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as("node_id"), col("id_b").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash-derived value in [-1, 1]. Fixed by construction — no RNG, no
    * Date.now; identical across runs and executors. */
  private def planeComponent(p: Int, j: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((p, j, 0x5eed))
    (h.toDouble / Int.MaxValue.toDouble)
  }

  /** The full hyperplane `p` as plain doubles — public so an external
    * oracle can replay the exact bucket function (the constants, rendered
    * shortest-round-trip, parse back to the identical doubles). */
  def planeVector(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => planeComponent(p, j))

  /** [[planeVector]] quantized to FLOAT precision (24-bit mantissas).
    * For operators whose raw dot VALUES are outputs (not just signs or
    * ranks), this makes every product float-input × float-representable
    * constant EXACT in a double — so an engine whose dot kernel fuses
    * multiply-add (FMA rounds a·b+s once; observed in DuckDB's
    * list_dot_product) computes bit-identically to a separate
    * multiply-then-add loop. Full-precision constants leave inexact
    * products, and the two kernels drift a last ulp apart. */
  def planeVectorF(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => planeComponent(p, j).toFloat.toDouble)

  /** Johnson–Lindenstrauss random projection: embed each vector into the
    * k deterministic hash-derived directions ([[planeVector]] — the same
    * constants the sign-LSH buckets use, kept REAL-valued instead of
    * thresholded). The classic cheap-similarity / ANN-prefilter space:
    * distances are approximately preserved (JL), storage drops dim→k,
    * and any downstream exact re-rank still runs on the originals.
    *
    * Shuffle-free: k codegen'd [[graft.functions.DotProduct]] kernels
    * per row against PLAN-TIME literal directions — no join, no model
    * table; and engine-exact (the literals round-trip through their
    * shortest rendering, the dot sums left-to-right on both engines).
    *
    * Output: (id, p0 … p(k−1)) as doubles. */
  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int = 64): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    val projCols = (0 until k).map { p =>
      dot(col("v"), typedlit(planeVectorF(p, dim))).as(s"p$p")
    }
    corpus.select(col("id") +: projCols: _*)
  }

  /** Scalar int8 quantization (SQ8) of the embedding column — the
    * memory-compression companion to [[trainPq]]'s product quantizer:
    * per-DIMENSION global [min, max] calibration, then every component
    * maps to round((x − min)/(max − min) · 255) ∈ [0, 255]. Storage
    * drops 8× vs doubles; a scorer reads back x̂ = min + code/255 ·
    * (max − min) (asymmetric-distance style, like the PQ ADC path).
    *
    * Shape: calibration is ONE dim-bounded aggregate (posexplode →
    * two-phase min/max per dimension — at 100 TB the shuffle carries
    * dim rows per partial), collected to the driver (2·dim doubles —
    * model-table class) and inlined as plan-time literals; quantization
    * is then a shuffle-free codegen'd projection, the JL-projection
    * idiom. Engine-exact: min/max are selections, the map is three
    * fixed-order IEEE ops and a nonnegative half-up round, identical in
    * any engine; a constant dimension (max = min) quantizes to 0 rather
    * than dividing by zero.
    *
    * Output: (id, codes array<long>, dim entries in dimension order). */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    // per-index two-phase min/max via posexplode — robust to ragged or
    // null-bearing corpora (bounds come from the indices actually
    // present), and the aggregate stays narrow at any dimensionality (a
    // 2·dim-column single aggregate would hit the wide-HashAggregate
    // codegen-compile wall simhashSignatures documents)
    val cal = corpus
      .select(posexplode(col("v")).as(Seq("i", "e")))
      .groupBy("i").agg(min("e").as("mn"), max("e").as("mx"))
      .orderBy("i").collect()
    require(cal.nonEmpty, "empty corpus — nothing to calibrate")
    val codes = cal.map { r =>
      val (mn, mx) = (r.getDouble(1), r.getDouble(2))
      if (mx == mn) lit(0L)
      else round((col("v")(r.getInt(0)) - lit(mn)) / (lit(mx) - lit(mn))
        * lit(255.0d)).cast("long")
    }
    corpus.select(col("id"), array(codes.toIndexedSeq: _*).as("codes"))
  }

  /** Robust per-dimension whitening (sklearn RobustScaler shape): center
    * by the per-dimension MEDIAN, scale by the per-dimension MAD (median
    * absolute deviation) — the embedding-normalization step before cosine
    * dedup / ANN when the corpus carries outlier vectors that would wreck
    * mean/std calibration.
    *
    * Medians are EXACT lower order statistics via [[Stats.groupQuantiles]]
    * (q(0.5) = smallest value whose cumulative count reaches ceil(n/2)) —
    * order-independent selections, so unlike a mean/std whitening (whose
    * float sums are shuffle-order-dependent) every output replays
    * bit-identically in an external engine: (x − med) is one exact IEEE
    * subtraction and /mad one correctly-rounded division. A constant
    * dimension (mad = 0) scales to 0 rather than dividing by zero.
    *
    * Scale note: the exact median windows sort |corpus| values per
    * dimension (dim-way parallelism) — the honest exact formulation this
    * operator's oracle requires. A 100 TB deployment swaps the stats pass
    * for [[Stats.sampleQuantiles]] (deterministic bottom-k sample, bounded
    * state) feeding the SAME dim-sized broadcast join + projection —
    * the per-row scaling path is identical either way.
    *
    * Output: (id, dim_idx INT 0-based, scaled DOUBLE). */
  def robustScale(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vals = df.select(col(idCol).as("id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
    // Median AND MAD from one fused window chain — TWO shuffles end to
    // end (the r9 shape ran two full groupQuantiles passes with join-backs
    // and a persisted exploded corpus: 4 corpus-sized exchanges, 16 AQE
    // stage jobs). Here: (1) the per-dimension value-count aggregate
    // compresses the corpus to its value domain; (2) one repartition by
    // dimension, inside which everything else happens as window
    // expressions over the SAME partitioning — cumulative count sorted by
    // value ⇒ median as a partition-wide min-over-threshold, deviations
    // |x − med| per row (no join: med is a window column), cumulative
    // count re-sorted by deviation ⇒ MAD the same way (RANGE frames make
    // tied deviations cumulate together, identical to aggregating
    // deviation counts first), and the dim-sized stats collapse via a
    // groupBy that rides the window's exchange. The corpus never
    // shuffles for scaling: the stats broadcast onto a column-pruned
    // second scan. Same discrete order statistics as Stats.groupQuantiles
    // (q(p) = min{v : cum ≥ max(1, ceil(p·n))}) — bit-replayable.
    val wd = Window.partitionBy("d")
    val half = (n: Column) => greatest(lit(1L), ceil(n * lit(0.5d)))
    val stats = vals.filter(col("x").isNotNull)
      .groupBy("d", "x").agg(count(lit(1)).as("c"))
      .withColumn("n", sum("c").over(wd))
      .withColumn("cum", sum("c").over(wd.orderBy("x")))
      .withColumn("med",
        min(when(col("cum") >= half(col("n")), col("x"))).over(wd))
      .withColumn("dev", abs(col("x") - col("med")))
      .withColumn("cumdev", sum("c").over(wd.orderBy("dev")))
      .withColumn("mad",
        min(when(col("cumdev") >= half(col("n")), col("dev"))).over(wd))
      .groupBy("d").agg(first("med").as("med"), first("mad").as("mad"))
    vals.join(broadcast(stats), "d")
      .select(col("id"), col("d").as("dim_idx"),
        when(col("mad") === 0d, lit(0d))
          .otherwise((col("x") - col("med")) / col("mad")).as("scaled"))
  }

  /** Sign-bit bucket of a vector under `planes` random hyperplanes. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    (0 until planes).map { p =>
      val plane = typedlit((0 until dim).map(j => planeComponent(p, j)))
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-flat ANN with DETERMINISTIC coarse centroids: the first `nlist`
    * corpus vectors in id order serve as the coarse quantizer — no
    * training iterations, so the whole structure is reproducible by an
    * external oracle (a production deployment plugs k-means centroids
    * into the same shape). One bucketing pass assigns every corpus vector
    * to its nearest centroid (ties broken by centroid id); each query
    * probes its `nprobe` nearest centroid lists and exact-reranks.
    * Candidates ∝ probed-list occupancy ≈ nprobe/nlist of the corpus —
    * the classic IVF trade, never N². */
  def annIvfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    ivfSearch(df, idCol, vecCol, queryPred, k, nprobe, corpus,
      centroidTable(df, idCol, vecCol, nlist))
  }

  /** Deterministic first-`nlist` coarse-centroid table (cid, cv, cnrm) —
    * the STORABLE artifact form of [[annIvfTopK]]'s quantizer. Write it
    * as parquet next to the assignment/code tables; doubles round-trip
    * parquet bit-exactly, so a reloaded table probes identically. */
  def centroidTable(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame =
    prep(df, idCol, vecCol).orderBy("id").limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))

  /** The stored IVF-FLAT index: every corpus vector assigned to its
    * nearest inverted list — one (cid, id, v, nrm) row per vector, the
    * durable parquet artifact the serving path reads so repeated query
    * batches over a static corpus never re-assign the corpus
    * (the minhashDedupAgainstTables pattern applied to ANN; the
    * reference's analog is its durable index tables — IndexStore). */
  def annIvfAssignTable(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    centroidScored(prep(df, idCol, vecCol), centroids)
      .filter(col("crn") === 1)
      .select(col("cid"), col("id"), col("v"), col("nrm"))

  /** IVF-flat query batch over STORED tables: `assigned` and `centroids`
    * are the parquet artifacts written at index-build time; only the
    * query side is computed per batch. Identical results to
    * [[annIvfTopK]]/[[annIvfTopKWithCentroids]] over the same quantizer
    * (spec-pinned through a real parquet round trip). */
  def annIvfTopKFromTables(assigned: DataFrame, centroids: DataFrame,
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nprobe: Int): DataFrame =
    ivfRerank(assigned, ivfProbes(df, idCol, vecCol, queryPred, centroids,
      nprobe), k)

  /** IVF with TRAINED coarse centroids: the same inverted-file search as
    * [[annIvfTopK]], but the quantizer is the deterministic k-medians
    * Lloyd loop ([[Clustering.kmediansCentroids]] — exact medians, so
    * the trained vectors replay in an external oracle) instead of the
    * first-nlist seed rows. Trained lists are far closer to balanced on
    * clustered data, which is what bounds probe cost at scale; training
    * is BUILD-time work (a stored artifact in production — memoize it
    * behind the entry, like the PQ codebooks). */
  def annIvfTrainedTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nlist: Int, nprobe: Int,
      trainIters: Int): DataFrame =
    annIvfTopKWithCentroids(df, idCol, vecCol, queryPred, k, nprobe,
      Clustering.kmediansCentroids(df, idCol, vecCol, nlist, trainIters))

  /** IVF search over PRE-TRAINED centroids (e.g. a memoized or stored
    * quantizer) — the caller owns the training parameters, so none are
    * restated (and silently ignored) here. */
  def annIvfTopKWithCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nprobe: Int,
      cents: IndexedSeq[Array[Double]]): DataFrame =
    ivfSearch(df, idCol, vecCol, queryPred, k, nprobe,
      prep(df, idCol, vecCol), centroidFrame(df, cents))

  /** Driver-side centroid vectors as a (cid, cv, cnrm) frame — the SAME
    * norm formula as prep() so cosines against them replay identically. */
  private def centroidFrame(
      df: DataFrame, cents: IndexedSeq[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("cid", "cv")
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
  }

  /** Embedding OUTLIER screen: the k corpus vectors farthest (1 − cosine)
    * from their assigned trained centroid — the curation pass that
    * surfaces corrupt/mislabeled/off-distribution embeddings before they
    * poison a semantic-dedup or retrieval index. One broadcast-centroid
    * assignment scan (corpus never shuffles) + TakeOrdered top-k; scores
    * are one subtraction from the replayable cosine. */
  def centroidOutliers(
      df: DataFrame, idCol: String, vecCol: String,
      cents: IndexedSeq[Array[Double]], k: Int): DataFrame = {
    centroidScored(prep(df, idCol, vecCol), centroidFrame(df, cents))
      .filter(col("crn") === 1)
      .select(col("id"), col("cid"),
        (lit(1.0d) - col("csim")).as("outlier_score"))
      .orderBy(col("outlier_score").desc, col("id").asc)
      .limit(k)
  }

  /** Shared inverted-file search over a (cid, cv, cnrm) centroid table:
    * assign corpus rows to their nearest list, probe each query's nprobe
    * lists, exact-rerank candidates. */
  /** The ONE nearest-centroid scoring idiom (broadcast centroids, cosine
    * csim, rank crn by (csim DESC, cid)) — shared by the IVF search, the
    * SemDeDup assignment and the outlier screen so a tie-break or norm
    * fix can never drift between them (and their oracles). */
  private def centroidScored(side: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = side.join(broadcast(centroids))
      .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
    val w = Window.partitionBy("id").orderBy(col("csim").desc, col("cid"))
    scored.withColumn("crn", row_number().over(w))
  }

  private def ivfSearch(
      df: DataFrame, idCol: String, vecCol: String, queryPred: Column,
      k: Int, nprobe: Int, corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = centroidScored(corpus, centroids)
      .filter(col("crn") === 1)
      .select(col("cid"), col("id"), col("v"), col("nrm"))
    ivfRerank(assigned,
      ivfProbes(df, idCol, vecCol, queryPred, centroids, nprobe), k)
  }

  /** Each query's `nprobe` nearest inverted lists — the per-batch query
    * side shared by the inline and stored-table IVF paths. */
  private def ivfProbes(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroids: DataFrame, nprobe: Int): DataFrame =
    centroidScored(prep(df.filter(queryPred), idCol, vecCol), centroids)
      .filter(col("crn") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cid"))

  /** Probed-list candidate join + exact rerank — the IVF-flat search
    * core over an assignment table (inline-built or parquet-loaded). */
  private def ivfRerank(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val cands = assigned.join(broadcast(probes),
        Seq("cid")).filter(col("id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))
    // no distinct (unlike the LSH multiprobe): each corpus vector lives in
    // exactly ONE inverted list and a query's probes carry distinct cids,
    // so (query_id, id) pairs are already unique — a dedup here would be
    // a pure extra shuffle over the candidate set
    cands.select("query_id", "id", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("sim"))
  }

  /** Semantic dedup (cluster-then-compare, the SemDeDup recipe): assign
    * every embedding to its nearest coarse centroid, then search for
    * near-duplicate pairs ONLY within each cluster — pairwise cost is
    * bounded by cluster occupancy (≈ n/nlist per cell), never corpus².
    * Approximate by design: cross-cluster near-dups are unseen (the
    * recall/cost trade the technique is named for); complements the
    * random-projection candidates of [[cosineNearDupPairsLsh]].
    *
    * Centroids are the deterministic first-`nlist` rows in id order —
    * the same reproducible coarse quantizer as [[annIvfTopK]], so an
    * external oracle can replay the full structure; production plugs
    * k-means centroids into the identical shape. Scale: centroids are
    * broadcast for assignment (corpus never shuffles there); the
    * within-cluster self-join shuffles on `cid` once. */
  def semanticDedupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    val centroids = corpus.orderBy("id").limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    semanticPairs(corpus, centroids, threshold)
  }

  /** [[semanticDedupPairs]] with the TRAINED k-medians quantizer (the
    * production form its scaladoc promises): balanced cells bound the
    * within-cluster pairwise cost that first-nlist seeding leaves to
    * luck. Same search, same replayability (exact-median centroids). */
  def semanticDedupPairsTrained(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      cents: IndexedSeq[Array[Double]]): DataFrame =
    semanticPairs(prep(df, idCol, vecCol), centroidFrame(df, cents), threshold)

  private def semanticPairs(
      corpus: DataFrame, centroids: DataFrame, threshold: Double): DataFrame = {
    // persist: both self-join sides reuse the assignment — without the
    // barrier the scan + centroid scoring + top-1 window run twice.
    // merge hints: both sides are corpus-sized; never let a stale static
    // estimate broadcast one (same rationale as Dedup.lshCandidatePairs)
    val assigned = centroidScored(corpus, centroids)
      .filter(col("crn") === 1)
      .select(col("cid"), col("id"), col("v"), col("nrm"))
      .persist()
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nrmb")).hint("merge")
    assigned.hint("merge").join(b, Seq("cid")).filter(col("id") < col("id_b"))
      .withColumn("sim", dot(col("v"), col("vb")) / (col("nrm") * col("nrmb")))
      .filter(col("sim") >= threshold)
      .select(col("cid"), col("id").as("id_a"), col("id_b"), col("sim"))
  }

  /** Product-quantization ANN (inner-product / ADC flavor): the corpus is
    * stored as `m` small code indexes per vector — `m · log2(ncodes)` bits
    * instead of `dim` floats (64-dim float32 → 8 bytes at m=8, a 32×
    * memory cut) — and queries score candidates WITHOUT decompressing:
    * the asymmetric-distance trick, score ≈ Σⱼ ⟨query-subvector-j,
    * codeword(code_j)⟩, each term one small dot product against the
    * query's own sub-lookup. At 100 TB this is what makes a
    * billion-vector index fit executor memory; IVF ([[annIvfTopK]])
    * prunes WHICH vectors are scored, PQ shrinks WHAT is stored — a
    * production deployment composes both (IVF-PQ) by feeding this
    * encoding to the probed lists.
    *
    * Deterministic by construction, like the IVF coarse quantizer:
    * codebooks SEED as the subvectors of the first `ncodes` corpus vectors
    * in id order, then train with `trainIters` Lloyd rounds — L2-argmin
    * assignment and an exact component-wise MEDIAN update (the
    * [[Clustering.kmediansAssign]] recipe: a median is an order-independent
    * selection, so the trained book replays bit-identically in an external
    * engine, which a distributed double mean never could). An empty cell
    * keeps its previous codeword. Encoding minimizes exact L2 (expanded as
    * (s·s − 2·s·w) + w·w, fixed association so an external oracle replays
    * the double sequence bit-identically); ties take the lowest code.
    * Scoring sums the m sub-dot-products left-associated, ranks by ADC
    * score desc then id.
    *
    * Scale shape: codebooks are driver-collected literals (m × ncodes ×
    * dim/m doubles — bounded, tiny); training adds `trainIters` jobs, each
    * one corpus scan + a codebook-sized quantile aggregate (driver state
    * never exceeds the book); encoding is a shuffle-free codegen'd
    * projection; the scored join carries only (id, m codes) per corpus
    * row — the full vectors never leave the encode scan. Approximate by
    * design: quantization error can reorder near-ties vs exact search. */
  def annPqTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, m: Int = 8, ncodes: Int = 8,
      trainIters: Int = 2, trained: Option[PqBook] = None): DataFrame = {
    val book = trained.getOrElse(
      pqTrain(prep(df, idCol, vecCol), m, ncodes, trainIters))
    pqAdcRank(annPqEncodeTable(df, idCol, vecCol, book),
      pqQueries(df, idCol, vecCol, queryPred), book, k)
  }

  /** The stored PQ index: one (id, k0..k{m-1}) row per corpus vector —
    * m small integer codes, vectors dropped. Written as parquet at
    * index-build time (alongside [[pqBookTable]]); repeated query
    * batches then read it via [[annPqTopKFromTable]] and never pay
    * train or encode again — the production serving shape. Codes are
    * exact integers, so the stored table ≡ the inline encode. */
  def annPqEncodeTable(df: DataFrame, idCol: String, vecCol: String,
      book: PqBook): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
    corpus.select(
      col("id") +: (0 until book.m).map(j => pqEncode(book, j).as(s"k$j")): _*)
  }

  /** PQ query batch over the STORED code table: only the query side is
    * computed per batch; scoring is ADC against the (reloaded) book.
    * Identical results to [[annPqTopK]] with the same book. */
  def annPqTopKFromTable(codes: DataFrame, df: DataFrame, idCol: String,
      vecCol: String, queryPred: Column, k: Int, book: PqBook): DataFrame =
    pqAdcRank(codes, pqQueries(df, idCol, vecCol, queryPred), book, k)

  private def pqQueries(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column): DataFrame =
    prep(df.filter(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"))

  /** ADC scoring + per-query top-k over a code table (inline-built or
    * parquet-loaded) — the PQ search core. */
  private def pqAdcRank(encoded: DataFrame, queries: DataFrame,
      book: PqBook, k: Int): DataFrame = {
    val scored = encoded.join(broadcast(queries), col("id") =!= col("query_id"))
      .withColumn("score", pqAdcScore(book))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("score"))
  }

  /** PQ codebooks: per subspace `j`, `ncodes` codewords of dim/m doubles —
    * driver-collected literals (m × ncodes × dim/m doubles, bounded and
    * tiny). */
  case class PqBook(m: Int, ncodes: Int, sub: Int,
      words: IndexedSeq[IndexedSeq[Seq[Double]]]) // words(j)(c)

  /** Train the PQ codebooks once and reuse them across queries — at
    * scale, training runs at index-build time and the book (m × ncodes ×
    * dim/m doubles, driver-bounded) is a stored artifact; the ANN entry
    * points accept it so repeated query batches (and the IVF-PQ composed
    * index, which shares the same book) never pay the Lloyd rounds
    * again. */
  def trainPq(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ncodes: Int = 8, trainIters: Int = 2): PqBook =
    pqTrain(prep(df, idCol, vecCol), m, ncodes, trainIters)

  /** The codebook as a STORABLE table — one (j, c, word) row per
    * (subspace, code); write it as parquet next to the code table and
    * reload with [[pqBookFromTable]]. Doubles round-trip parquet
    * bit-exactly, so the reloaded book scores identically. */
  def pqBookTable(spark: org.apache.spark.sql.SparkSession,
      book: PqBook): DataFrame = {
    import spark.implicits._
    (for { j <- 0 until book.m; c <- 0 until book.ncodes }
      yield (j, c, book.words(j)(c))).toDF("j", "c", "word")
  }

  /** Reload a stored codebook. The collect is MODEL-sized by
    * construction (m × ncodes rows, like the driver-held book itself) —
    * never corpus data. */
  def pqBookFromTable(df: DataFrame): PqBook = {
    val rows = df.select(col("j").cast("int"), col("c").cast("int"),
      col("word").cast("array<double>")).collect()
    require(rows.nonEmpty, "empty PQ book table")
    val m = rows.map(_.getInt(0)).max + 1
    val ncodes = rows.map(_.getInt(1)).max + 1
    val byJC = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    require(byJC.size == m * ncodes,
      s"PQ book table is not a full m×ncodes grid: ${byJC.size} of ${m * ncodes}")
    val words = (0 until m).map(j => (0 until ncodes).map(c => byJC((j, c))))
    PqBook(m, ncodes, words.head.head.length, words)
  }

  /** Seed = subvector slices of the first `ncodes` vectors in id order,
    * then `iters` joint Lloyd rounds over ALL m subspaces at once: ONE
    * corpus-scan job per round assigns every (vector, subspace) pair to
    * its L2-argmin codeword and medians per (subspace, code, position)
    * come back through the compressed-quantile aggregate — the same
    * engine-replayable update as [[Clustering.kmediansAssign]]. An empty
    * (j, c) cell keeps its previous codeword. */
  private def pqTrain(
      corpus: DataFrame, m: Int, ncodes: Int, iters: Int): PqBook = {
    val seeds = corpus.orderBy("id").limit(ncodes)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == ncodes, s"corpus smaller than ncodes=$ncodes")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m subspaces $m")
    val sub = dim / m
    var words: IndexedSeq[IndexedSeq[Seq[Double]]] = (0 until m).map(j =>
      (0 until ncodes).map(c => seeds(c).slice(j * sub, (j + 1) * sub).toSeq))
    if (iters > 0) {
      // (j, s): every subvector of every corpus vector, one explode —
      // persisted because each round re-scans it (same barrier rationale
      // as kmediansAssign's corpus persist)
      val subs = corpus.select(explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col("v"), j * sub + 1, sub).as("s"))): _*)).as("e"))
        .select(col("e.j").as("j"), col("e.s").as("s"))
        .persist()
      for (_ <- 1 to iters) {
        val assign = (1 until m).foldLeft(
          when(col("j") === 0, pqArgmin(words(0), col("s")))) {
            case (acc, j) => acc.when(col("j") === j, pqArgmin(words(j), col("s")))
          }.otherwise(lit(ncodes - 1)) // unreachable: j ∈ [0, m)
        val comps = subs.withColumn("c", assign)
          .select(col("j"), col("c"), posexplode(col("s")).as(Seq("pos", "comp")))
          .withColumn("g",
            ((col("j") * ncodes + col("c")) * sub + col("pos")).cast("long"))
        val med = Stats.groupQuantiles(comps, "g", col("comp"), Seq(0.5))
          .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
        words = (0 until m).map { j =>
          (0 until ncodes).map { c =>
            val old = words(j)(c)
            (0 until sub).map { p =>
              med.getOrElse(((j * ncodes + c) * sub + p).toLong, old(p))
            }
          }
        }
      }
      subs.unpersist()
    }
    PqBook(m, ncodes, sub, words)
  }

  /** Argmin over `wordsJ` of exact L2 to the subvector in `s` (expanded as
    * (s·s − 2·s·w) + w·w — fixed association so an external oracle replays
    * the double sequence), ties → lowest code. */
  private def pqArgmin(wordsJ: IndexedSeq[Seq[Double]], s: Column): Column = {
    val d2s = wordsJ.map { wd =>
      val w = typedlit(wd)
      (dot(s, s) - lit(2.0) * dot(s, w)) + dot(w, w)
    }
    val g = least(d2s: _*)
    (1 until wordsJ.size).foldLeft(when(d2s(0) === g, lit(0))) {
      case (acc, c) => acc.when(d2s(c) === g, lit(c))
    }.otherwise(lit(wordsJ.size - 1))
  }

  /** Code of subspace `j` for the vector in `v`. */
  private def pqEncode(book: PqBook, j: Int): Column =
    pqArgmin(book.words(j), slice(col("v"), j * book.sub + 1, book.sub))

  /** ADC score from the query vector in `qv` against codes `k0..k{m-1}`:
    * per subspace, decode the code to its literal codeword and dot it with
    * the query's OWN subvector; left-associated sum. */
  private def pqAdcScore(book: PqBook): Column =
    (0 until book.m).map { j =>
      val qs = slice(col("qv"), j * book.sub + 1, book.sub)
      val decoded = (1 until book.ncodes).foldLeft(
        when(col(s"k$j") === 0, typedlit(book.words(j)(0)))) {
          case (acc, c) => acc.when(col(s"k$j") === c, typedlit(book.words(j)(c)))
        }
      dot(qs, decoded)
    }.reduce(_ + _)

  /** IVF-PQ: the composed billion-vector index — IVF prunes WHICH vectors
    * are scored (each query probes `nprobe` of `nlist` inverted lists),
    * PQ shrinks WHAT is stored (each list entry is m byte-sized codes, not
    * dim floats). The stored structure per corpus vector is (id, cid,
    * m codes) — at 100 TB this is what turns a petabyte of float32 into a
    * few terabytes of scannable index. Candidates join on the probed list
    * id (an EQUI join — queries broadcast, corpus never shuffles), are
    * scored by ADC without decompression, and the top-k comes off a
    * per-query window.
    *
    * Deterministic like its parents: coarse centroids are the first
    * `nlist` vectors in id order; codebooks seed from the first `ncodes`
    * and train with `trainIters` median-update Lloyd rounds (see
    * [[annPqTopK]]). Codes quantize RAW vectors here; the classic
    * residual refinement (v − centroid through a shared codebook, the
    * FAISS default) is [[annIvfPqResidualTopK]].
    * Approximate on two axes: list pruning loses cross-list neighbors,
    * quantization can reorder near-ties. */
  def annIvfPqTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ncodes: Int = 8, trainIters: Int = 2,
      trained: Option[PqBook] = None): DataFrame = {
    val book = trained.getOrElse(
      pqTrain(prep(df, idCol, vecCol), m, ncodes, trainIters))
    val centroids = centroidTable(df, idCol, vecCol, nlist)
    ivfPqRerank(annIvfPqEncodeTable(df, idCol, vecCol, book, centroids),
      ivfPqProbes(df, idCol, vecCol, queryPred, centroids, nprobe), book, k)
  }

  /** RESIDUAL IVF-PQ (the FAISS `by_residual` default): the shared
    * product quantizer encodes `v − centroid(v)` instead of the raw
    * vector — residuals concentrate near zero, so the same codebook
    * budget spends its codewords on the part of the vector the coarse
    * quantizer didn't already explain (higher recall at identical
    * storage). Scoring uses the inner-product expansion
    * `q·(c + r̂) = q·c + ADC(q, codes)` — one exact dot per probed list
    * plus the standard ADC fold, so cross-list candidates stay
    * comparable.
    *
    * Replay discipline: residuals are FLOAT-quantized after the double
    * subtraction (double-sub is one correctly-rounded IEEE op; the float
    * round-trip makes every downstream product EXACT again — the same
    * trick that keeps all PQ arithmetic FMA-safe in any engine), and the
    * codebook trains on those quantized residuals with the deterministic
    * seed/median rounds of [[trainPq]].
    *
    * Same scale shape as [[annIvfPqTopK]]: stored structure per vector
    * is (cid, m codes), candidates equi-join on probed list ids, queries
    * broadcast, corpus never shuffles. */
  def annIvfPqResidualTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ncodes: Int = 8, trainIters: Int = 2,
      trained: Option[PqBook] = None): DataFrame = {
    val centroids = centroidTable(df, idCol, vecCol, nlist)
    val assigned = residualAssigned(df, idCol, vecCol, centroids)
    val book = trained.getOrElse(
      trainPq(assigned, "id", "rv", m, ncodes, trainIters))
    val indexed = annPqEncodeTable(assigned, "id", "rv", book)
      .join(assigned.select(col("id"), col("cid")), Seq("id"))
    residualRerank(indexed,
      residualProbes(df, idCol, vecCol, queryPred, centroids, nprobe),
      book, k)
  }

  /** The stored RESIDUAL IVF-PQ index: one (cid, id, k0..k{m-1}) row per
    * corpus vector, codes over the FLOAT-quantized residual `v − cv`.
    * With [[centroidTable]] and [[pqBookTable]] (holding the
    * [[trainResidualPq]] book) this completes the durable three-table
    * artifact for the by_residual form — the per-vector q·c term the
    * residual score needs is NOT stored: it depends on the query, and
    * the centroids table already carries the `cv` each probe dots with
    * its own query vector. Codes are exact integers, so stored ≡ inline
    * bit-for-bit. Maintenance is append-only against the frozen
    * centroids + book, like the raw-PQ table. */
  def annIvfPqResidualEncodeTable(df: DataFrame, idCol: String,
      vecCol: String, book: PqBook, centroids: DataFrame): DataFrame = {
    val assigned = residualAssigned(df, idCol, vecCol, centroids)
      .select(col("cid"), col("id"), col("rv").as("v"))
    assigned.select(col("cid") +: col("id") +:
      (0 until book.m).map(j => pqEncode(book, j).as(s"k$j")): _*)
  }

  /** Residual IVF-PQ query batch over the STORED tables — the serving
    * twin of [[annIvfPqResidualTopK]] (the gap the r11 review named):
    * query batches read the residual code table, the centroid table and
    * the reloaded residual book, and compute only their own probes —
    * no re-train, no re-assignment, no re-encode of the corpus. The
    * q·c expansion term comes from dotting each probe's query vector
    * with the stored `cv` (doubles round-trip parquet bit-exactly), so
    * results are identical to the inline form with the same artifacts
    * (spec-pinned through a real parquet round trip). */
  def annIvfPqResidualTopKFromTables(index: DataFrame, centroids: DataFrame,
      book: PqBook, df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nprobe: Int): DataFrame =
    residualRerank(index,
      residualProbes(df, idCol, vecCol, queryPred, centroids, nprobe),
      book, k)

  /** Each query's nprobe lists plus its exact q·c term per probed list —
    * the per-batch query side shared by the inline and stored-table
    * residual paths (ONE derivation, so the expansion term can never
    * drift between them). */
  private def residualProbes(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroids: DataFrame, nprobe: Int): DataFrame =
    centroidScored(prep(df.filter(queryPred), idCol, vecCol), centroids)
      .filter(col("crn") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"),
        dot(col("v"), col("cv")).as("qc"))

  /** Probed-list equi join + (q·c + ADC) scoring + per-query top-k —
    * the residual search core over a code table (inline-built or
    * parquet-loaded). */
  private def residualRerank(index: DataFrame, probes: DataFrame,
      book: PqBook, k: Int): DataFrame = {
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("score", col("qc") + pqAdcScore(book))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rank"), col("score"))
  }

  /** Each corpus vector's list id + FLOAT-quantized residual `v − cv` —
    * the training/encoding input of [[annIvfPqResidualTopK]]. */
  private def residualAssigned(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame): DataFrame =
    centroidScored(prep(df, idCol, vecCol), centroids)
      .filter(col("crn") === 1)
      .select(col("cid"), col("id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b)
          .cast("array<float>").cast("array<double>").as("rv"))

  /** Train the residual codebook once (BUILD-time work — memoize it or
    * store it via [[pqBookTable]], like the raw-PQ books) and pass it to
    * [[annIvfPqResidualTopK]] so repeated query batches skip the Lloyd
    * rounds. */
  def trainResidualPq(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int = 8, ncodes: Int = 8,
      trainIters: Int = 2): PqBook =
    trainPq(residualAssigned(df, idCol, vecCol,
      centroidTable(df, idCol, vecCol, nlist)), "id", "rv", m, ncodes,
      trainIters)

  /** The stored IVF-PQ index: one (cid, id, k0..k{m-1}) row per corpus
    * vector — inverted-list id + m small integer codes, vectors dropped.
    * With [[centroidTable]] and [[pqBookTable]] this is the COMPLETE
    * durable index (three parquet tables); query batches read them via
    * [[annIvfPqTopKFromTables]] and never re-train, re-assign or
    * re-encode the corpus. */
  def annIvfPqEncodeTable(df: DataFrame, idCol: String, vecCol: String,
      book: PqBook, centroids: DataFrame): DataFrame =
    centroidScored(prep(df, idCol, vecCol), centroids)
      .filter(col("crn") === 1)
      .select(col("cid") +: col("id") +:
        (0 until book.m).map(j => pqEncode(book, j).as(s"k$j")): _*)

  /** IVF-PQ query batch over the STORED tables (codes + centroids, with
    * the book reloaded via [[pqBookFromTable]]): only the query side is
    * computed per batch. Identical results to [[annIvfPqTopK]] with the
    * same artifacts (spec-pinned through a real parquet round trip). */
  def annIvfPqTopKFromTables(index: DataFrame, centroids: DataFrame,
      book: PqBook, df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nprobe: Int): DataFrame =
    ivfPqRerank(index,
      ivfPqProbes(df, idCol, vecCol, queryPred, centroids, nprobe), book, k)

  private def ivfPqProbes(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroids: DataFrame, nprobe: Int): DataFrame =
    centroidScored(prep(df.filter(queryPred), idCol, vecCol), centroids)
      .filter(col("crn") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"))

  /** Probed-list equi join + ADC scoring + per-query top-k — the IVF-PQ
    * search core over a code table (inline-built or parquet-loaded).
    * No dedup needed: each corpus vector lives in exactly one inverted
    * list and a query's probes carry distinct cids (same argument as
    * the IVF-flat rerank). */
  private def ivfPqRerank(index: DataFrame, probes: DataFrame,
      book: PqBook, k: Int): DataFrame = {
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("score", pqAdcScore(book))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("score"))
  }

  /** LSH-bucketed ANN: corpus hashed once into sign buckets; each query
    * probes its own bucket plus all Hamming-1 neighbor buckets (multiprobe)
    * and exact-reranks the candidates. Approximate (recall < 1 by design);
    * candidates ∝ bucket occupancy, never N². */
  def annLshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    val corpus = prep(df, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    // multiprobe set: own bucket + each single-bit flip (static unroll)
    val probes = array(
      col("bucket") +: (0 until planes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val queries = prep(df.filter(queryPred), idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), explode(probes).as("probe"))
    val cands = corpus.join(broadcast(queries),
        col("bucket") === col("probe") && col("id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))
    cands.select("query_id", "id", "sim").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("sim"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell/Goldstein) — the RAG
    * diversification step: greedily pick `outK` of the query's `poolK`
    * nearest candidates, each pick maximizing
    * `mmr = ½·rel − ½·max_{s∈selected} cos(c, s)` (first pick: the max-sim
    * term is exactly 0.0) — near-duplicate passages stop crowding out
    * coverage. λ is fixed at the dyadic ½ so every arithmetic step is an
    * exact-input IEEE op and the whole selection replays in an oracle.
    *
    * Greedy selection is inherently sequential PER QUERY, so it runs as
    * a typed flatMapGroups kernel over each query's candidate group —
    * bounded at poolK rows by construction (the corpus-scale work
    * happened in [[cosineTopK]]); queries parallelize across the
    * cluster. The kernel's arithmetic mirrors the engine expression
    * exactly: float-derived products are exact, so the sequential dot
    * fold, `sqrt·sqrt` denominator and ½-scaled combination are
    * bit-identical to the SQL replay; ties break to the smallest id
    * (ascending scan with strict improvement). Zero-norm vectors are the
    * caller's contract (their cosine is NaN in ANY engine).
    *
    * Output: (query_id, neighbor_id, mmr_rank, mmr_score). */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, poolK: Int = 20, outK: Int = 5): DataFrame = {
    require(outK >= 1 && outK <= poolK,
      s"need 1 <= outK ($outK) <= poolK ($poolK)")
    val pool = cosineTopK(df, idCol, vecCol, queryPred, poolK)
    val withVec = pool.join(
      df.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv")),
      Seq("neighbor_id"))
    val sess = df.sparkSession
    import sess.implicits._
    withVec
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("sim").cast("double"), col("__nv").cast("array<float>"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (q: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val cands = it.map(t => (t._2, t._3, t._4)).toArray.sortBy(_._1)
        val n = cands.length
        val chosen = new Array[Boolean](n)
        val sel = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        var r = 1
        while (r <= math.min(outK, n)) {
          var bi = -1
          var bs = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              // max-sim to the already-selected set; exactly 0.0 when
              // nothing is selected yet (the documented first-pick form)
              var ms = 0.0
              if (sel.nonEmpty) {
                ms = Double.NegativeInfinity
                sel.foreach { s =>
                  val c = cosExact(cands(i)._3, s)
                  if (c > ms) ms = c
                }
              }
              val mmr = 0.5 * cands(i)._2 - 0.5 * ms
              // strict improvement + ascending-id scan = ties to min id
              if (mmr > bs) { bs = mmr; bi = i }
            }
            i += 1
          }
          // bi = -1 ⇔ every remaining candidate scored NaN (NaN > -∞ is
          // false) ⇔ a NaN-component or zero-norm vector broke the
          // documented contract (under ANSI the zero-norm form already
          // fails in cosineTopK's division; NaN components reach here) —
          // fail loudly with context instead of an opaque array crash
          require(bi >= 0, s"query $q: all remaining candidates scored " +
            "NaN mmr (NaN or zero-norm vector in the pool?)")
          chosen(bi) = true
          sel += cands(bi)._3
          res += ((q, cands(bi)._1, r.toLong, bs))
          r += 1
        }
        res
      }
      .toDF("query_id", "neighbor_id", "mmr_rank", "mmr_score")
  }

  /** Cosine of two float vectors with the ENGINE's exact association:
    * sequential product-sum folds (each float×float product is exact, so
    * this equals both the codegen'd kernel and DuckDB's fused
    * list_dot_product), then dot / (√aa · √bb). */
  private def cosExact(a: Array[Float], b: Array[Float]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) {
      ab += a(i).toDouble * b(i)
      aa += a(i).toDouble * a(i)
      bb += b(i).toDouble * b(i)
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Recall@k of an approximate neighbor list against the exact one —
    * THE evaluation every ANN deployment runs before trusting an index
    * (tune nlist/nprobe/planes until recall clears the bar, then ship).
    * Both inputs carry (queryCol, idCol) rows — the top-k tables the
    * search operators emit; output one row per exact-side query:
    * (query, hits, recall = hits/k). Queries the approximate side missed
    * entirely score 0, not absent.
    *
    * Exact arithmetic: hits is an integer intersection count, recall one
    * IEEE division by the literal k. Shape at scale: both inputs are
    * per-query top-k tables (bounded by construction), so the membership
    * join and per-query counts are candidate-sized — the corpus-scale
    * work already happened inside the search operators. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "neighbor_id"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val hits = approx.select(col(queryCol), col(idCol))
      .join(exact.select(col(queryCol), col(idCol)), Seq(queryCol, idCol))
      .groupBy(queryCol).agg(count(lit(1)).as("hits"))
    exact.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left_outer")
      .select(col(queryCol), coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall", col("hits").cast("double") / k)
  }
}
