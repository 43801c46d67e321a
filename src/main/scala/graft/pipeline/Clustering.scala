package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic embedding clustering (Lloyd-style k-medians) — the
  * clustering stage behind corpus curation: semantic-dedup cells, data-mix
  * balancing, topic bucketing.
  *
  * Design choices are driven by exact reproducibility at scale:
  *
  *   - **Assignment is a shuffle-free codegen'd projection**: k dot
  *     products per row against LITERAL centroid vectors (argmax cosine,
  *     ties → lowest centroid index). No join, no window — the corpus is
  *     scanned, never shuffled, once per iteration.
  *   - **The update step is a component-wise exact MEDIAN** (k-medians),
  *     not a mean: a median is an order-independent selection from
  *     observed values, so it replays bit-exactly in any engine, while a
  *     distributed double mean depends on summation order (the one thing
  *     no engine promises). The median is the ceil(n/2)-th order
  *     statistic selected by POSITION in one window over (cluster,
  *     position) groups — a single shuffle per round ([[Stats
  *     .groupQuantiles]]'s distinct-value compression buys nothing on
  *     high-cardinality doubles and costs two more shuffles; same
  *     count-threshold definition, same values). A production run that
  *     prefers classic k-means swaps the median selection for `avg`
  *     without changing any other shape.
  *   - **Init is the first k vectors in id order** — the same
  *     reproducible seeding as [[Similarity.annIvfTopK]]'s coarse
  *     quantizer (k-means++ plugs in where determinism isn't required).
  *   - Driver state is k×dim doubles per iteration — trivially bounded;
  *     an empty cluster keeps its previous centroid.
  */
object Clustering {

  /** Cluster index (LongType) of the nearest centroid by cosine over a
    * column `v` with precomputed norm `nrm` — first index wins ties. A
    * zero-norm centroid (possible if a median update collapses, or a
    * degenerate seed) scores -1 instead of 0/0 = NaN: under Spark's
    * NaN-is-greatest ordering a single NaN column would otherwise win
    * `greatest` for EVERY row and swallow the whole corpus into one
    * cluster (and diverge from the oracle, whose NaN ordering differs).
    * Zero-norm ROWS are the caller's concern (embeddings are non-zero by
    * contract). */
  private def assignTo(cents: IndexedSeq[Array[Double]]): Column =
    // the codegen'd kernel evaluates the identical arithmetic the old
    // k-literal-column formulation did (same dot fold, same division,
    // first index wins ties) but carries the centroid matrix as a
    // REFERENCE OBJECT: successive Lloyd rounds generate byte-identical
    // source, so analysis stays linear in k and the per-round Janino
    // compile collapses to a codegen-cache hit
    graft.functions.VectorFunctions.nearest_centroid(
      col("v"), col("nrm"), cents.map(_.toSeq))

  /** (id, cluster) after `iters` k-medians update rounds. Per round: one
    * corpus scan for assignment (projection only) + the compressed
    * quantile aggregation; k×dim medians come back to the driver and are
    * inlined into the next round's assignment expression. */
  def kmediansAssign(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    // persist: every round re-reads (id, v, nrm) — same load-bearing
    // barrier as Dedup.minhashDedupPairs' shingle set
    val corpus = prepCorpus(df, idCol, vecCol).persist()
    val cents = trainCentroids(corpus, k, iters)
    corpus.withColumn("cluster", assignTo(cents))
      .select(col("id"), col("cluster"))
  }

  /** The trained centroid VECTORS alone — for callers that use the Lloyd
    * loop as a coarse-quantizer TRAINING step (e.g. the trained-IVF ANN
    * index) rather than for row assignment. Same determinism contract as
    * [[kmediansAssign]]: exact medians, engine-replayable. */
  def kmediansCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    val corpus = prepCorpus(df, idCol, vecCol).persist()
    try trainCentroids(corpus, k, iters)
    finally corpus.unpersist()
  }

  private def prepCorpus(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dot_product(col("v"), col("v"))))

  /** The shared Lloyd loop: `iters` rounds of literal-centroid assignment
    * + exact component-wise median update over the (persisted) prepared
    * corpus. Driver state = k×dim doubles per round. */
  private def trainCentroids(
      corpus: DataFrame, k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    require(k >= 2, "need at least 2 clusters")
    require(iters >= 1, "need at least 1 update round")
    // one init job, not two: dim comes from the seed vectors themselves
    // (embeddings are fixed-width by contract) instead of a separate first()
    var cents: IndexedSeq[Array[Double]] = corpus.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray).toIndexedSeq
    require(cents.nonEmpty, "empty corpus")
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val comps = corpus.withColumn("cluster", assignTo(cents))
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "comp")))
        .withColumn("g", col("cluster") * dim + col("pos"))
      // exact median by position: q(.5) = min{v : |x <= v| >= ceil(n/2)}
      // = the ceil(n/2)-th order statistic — one window shuffle on the
      // group key (equal values give the same selected VALUE whatever
      // row_number's tie order; groups spread a cluster over dim keys,
      // so no single sort partition carries a whole cluster)
      val wOrd = Window.partitionBy("g").orderBy("comp")
      val wAll = Window.partitionBy("g")
      val med = comps
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") === greatest(lit(1L), ceil(col("n") * lit(0.5))))
        .select(col("g"), col("comp"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      cents = cents.indices.map { c =>
        val arr = cents(c).clone()
        (0 until dim).foreach { p =>
          med.get(c.toLong * dim + p).foreach(m => arr(p) = m)
        }
        arr
      }
    }
    cents
  }
}
