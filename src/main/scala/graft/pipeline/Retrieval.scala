package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Ranked full-text retrieval over a document corpus — the "find the
  * training examples most relevant to this probe" step (eval-set curation,
  * targeted decontamination audits, nearest-neighbour text search when no
  * embedding exists).
  *
  * Scoring is BM25 with one deliberate substitution: the classical
  * `ln((N − df + ½)/(df + ½))` idf is replaced by its ARGUMENT, the
  * Robertson–Spärck-Jones odds `(N − df + ½)/(df + ½)`. The odds are a
  * strictly monotone transform of the classical idf, so single-term
  * rankings are identical, and rational arithmetic keeps every step an
  * exact-input, correctly-rounded IEEE op — no transcendental whose last
  * ulp differs between a JVM `Math.log` intrinsic and a libm `log`. That
  * makes the whole score hash-replayable in any engine, which a ln-based
  * score is not.
  *
  * THE SCORE CONTRACT LIVES IN TWO FUNCTIONS ONLY: [[partialScore]] (the
  * Catalyst expression) and [[partialScoreSql]] (its DuckDB mirror,
  * association order identical — `(x / (s/n))` is never rearranged to
  * `(x · (n/s))`; they differ in the last ulp). Both operators and both
  * oracle generators call them; any change to k1/b handling or operation
  * order is made exactly once per engine.
  *
  * Shape at 100 TB: candidate generation computes per-(doc, term) tfs
  * INSIDE the corpus scan via the codegen'd TermCounts kernel (plan-time
  * term lookup, one hash probe per token) — no token explode, no
  * broadcast join, no (doc, term) aggregation shuffle; only candidate
  * docs survive the scan. Corpus stats (N, Σdl) are one column-scan
  * aggregate; per-term dfs are candidate-bounded aggregates; all
  * broadcast to the scoring join. Top-k is a TakeOrdered (single query)
  * or a per-query window (batch).
  */
object Retrieval {

  /** One term's BM25 partial score. Expects integer columns; `dl`, `n`,
    * `sumdl` are the document length and corpus stats. Every cast,
    * literal, and association here is mirrored by [[partialScoreSql]]. */
  private def partialScore(tf0: Column, dfc: Column, dl: Column,
      n: Column, sumdl: Column, k1: Double, b: Double): Column = {
    val avgdl = sumdl.cast("double") / n.cast("double")
    val tf = tf0.cast("double")
    val idf = ((n - dfc).cast("double") + lit(0.5)) /
      (dfc.cast("double") + lit(0.5))
    idf * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / avgdl))
  }

  /** Non-dyadic double constant for DuckDB: VARCHAR→DOUBLE parse is
    * correctly rounded; a bare numeric literal lands in DECIMAL whose
    * double conversion is NOT (measured one-ulp drift). */
  private def dlit(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  /** SQL string literal: o'brien → 'o''brien'. */
  private def slit(t: String): String = s"'${t.replace("'", "''")}'"

  /** [[partialScore]]'s DuckDB mirror, given the SQL names of the tf and
    * df columns; `dl`/`n`/`sumdl` are expected in scope. */
  private def partialScoreSql(
      tfSql: String, dfSql: String, k1: Double, b: Double): String =
    s"""(((CAST(n - $dfSql AS DOUBLE) + 0.5) / (CAST($dfSql AS DOUBLE) + 0.5))
       |     * (CAST($tfSql AS DOUBLE) * ${dlit(k1 + 1.0)})
       |     / (CAST($tfSql AS DOUBLE)
       |        + ${dlit(k1)} * (${dlit(1.0 - b)}
       |            + ${dlit(b)} * CAST(dl AS DOUBLE)
       |              / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))"""
      .stripMargin

  /** Shared oracle scaffolding: the per-document (id, dl) CTE body
    * (mirrors TextAnalysis.tokenCount) and the corpus-stats CTE. */
  private def baseSql(table: String, idCol: String): String =
    s"""base AS (
       |  SELECT $idCol AS id,
       |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
       |              END AS BIGINT) AS dl
       |  FROM $table),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(dl) AS BIGINT) AS sumdl FROM base)""".stripMargin

  /** BM25 (rational-idf) top-k. `terms` is the query; a document is a
    * candidate iff it contains at least one term. The multi-term sum
    * folds in FIXED query order as one left-folded expression (a column
    * per term, no aggregation over terms), so the floating-point
    * addition order is identical on every engine and every run. Output:
    * (idCol, score DOUBLE, rank LONG), rank 1..topK by
    * (score DESC, id ASC). */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")

    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      textCol.as("__text"))
    // the kernel lookup is built on the DISTINCT terms; a repeated query
    // term maps through `slot` so each duplicate still contributes its
    // full tf partial to the score chain, exactly like the previous
    // k-column formulation and the oracle's per-index SUM columns
    val distinctTerms = terms.distinct
    val slot = terms.map(distinctTerms.indexOf(_))
    val tc = graft.functions.TextFunctions.term_counts(
      col("__text"), distinctTerms)

    // PASS 1 — one corpus aggregate computes EVERYTHING global: corpus
    // size, token mass, and every per-term df (docs with tf > 0), all
    // exact integers, collected to the driver (k + 2 longs). The tf
    // vector comes from the codegen'd TermCounts kernel inside the scan —
    // no token explode, no (doc, term) shuffle, no broadcast round-trips.
    val (n, sumdl, dfs) = collectStats(base, tc, distinctTerms.size)
    if (n == 0L) return emptyResult(base, idCol, withQueryId = false)

    // PASS 2 — score in the scan with the stats as literals: the same
    // exact integers partialScore would have read from broadcast columns,
    // folded left-to-right in query order (identical association to the
    // oracle's `+` chain). Non-candidates drop at the filter.
    val score = terms.indices.map { i =>
      partialScore(col("__tc")(slot(i)), lit(dfs(slot(i))), col("__dl"),
        lit(n), lit(sumdl), k1, b)
    }.reduceLeft(_ + _)
    import org.apache.spark.sql.expressions.Window
    val ranked = base
      .select(col("__id"), col("__dl"), tc.as("__tc"))
      .filter(array_max(col("__tc")) > 0)
      .select(col("__id").as(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    // rank re-derived on the k collected rows — a window over topK rows,
    // not the corpus
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol)))
        .cast("long"))
  }

  /** One-pass global stats: (corpus size, token mass, per-term df). */
  private def collectStats(base: DataFrame, tc: Column,
      k: Int): (Long, Long, IndexedSeq[Long]) = {
    val aggCols = count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
      (0 until k).map(i =>
        sum(when(col("__tc")(i) > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val row = base.select(col("__dl"), tc.as("__tc"))
      .agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val n = row.getLong(0)
    if (n == 0L) (0L, 0L, IndexedSeq.fill(k)(0L))
    else (n, row.getLong(1), (0 until k).map(i => row.getLong(i + 2)))
  }

  /** Zero-row result with the operator's output shape (empty corpus). */
  private def emptyResult(base: DataFrame, idCol: String,
      withQueryId: Boolean): DataFrame = {
    val none = base.filter(lit(false))
    if (withQueryId)
      none.select(lit(0L).as("query_id"), col("__id").as(idCol),
        lit(0.0).as("score"), lit(0L).as("rank"))
    else
      none.select(col("__id").as(idCol), lit(0.0).as("score"),
        lit(0L).as("rank"))
  }

  /** Batched BM25 — [[bm25TopK]] for a QUERY TABLE: thousands of eval
    * queries against the corpus in one job (eval-set retrieval, hard-
    * negative mining). Same rational-idf score, different sum machinery:
    * with arbitrary query tables the per-term partial scores live in
    * ROWS, and a float sum over grouped rows has no deterministic order —
    * so each (query, doc) collects its (term, partial) pairs, sorts them
    * by term (canonical order), and folds left-to-right from a 0.0 seed
    * via the codegen'd [[graft.functions.SeriesKernels.seqSum]] kernel.
    * It runs only on the CANDIDATE set (docs sharing ≥1 term with a
    * query), whose size is ∝ query-term postings — bounded, never the
    * corpus.
    *
    * Scale shape: corpus stats are one broadcast row; the distinct term
    * list is query-table-bounded and rides into the scan as the
    * codegen'd TermCounts kernel's plan-time lookup, so the only
    * corpus-wide work is ONE projection scan (no token explode, no
    * (doc, term) aggregation shuffle — candidates emerge directly);
    * per-term dfs are a candidate-bounded aggregate broadcast back; the
    * final rank windows per query over its candidates.
    *
    * Output: (query_id, idCol, score, rank), rank 1..topK per query by
    * (score DESC, id). */
  def bm25BatchTopK(
      df: DataFrame, idCol: String, textCol: Column, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame =
    bm25BatchTopKBounded(df, idCol, textCol, queries, k1, b, topK,
      MaxCollectedQueryPairs)

  /** [[bm25BatchTopK]] with the driver-collect bound injectable — the
    * spec entry point that lets a test drive the distributed large-table
    * path without materializing 64Ki query pairs. */
  private[pipeline] def bm25BatchTopKBounded(
      df: DataFrame, idCol: String, textCol: Column, queries: DataFrame,
      k1: Double, b: Double, topK: Int, maxCollected: Int): DataFrame = {
    // PROBE the query-table size before any driver collect (the
    // boilerplateLineDedup convention): tables up to
    // MaxCollectedQueryPairs come to the driver once and run the
    // zero-query-side-job compiled paths; anything larger stays fully
    // DISTRIBUTED — an unconditional collect would OOM the driver on a
    // mining-scale query table before any cutoff could help.
    val qdist = queries.select(col("query_id").cast("long"), col("term"))
      .distinct().persist()
    val probed = qdist.limit(maxCollected + 1).collect()
    if (probed.isEmpty) {
      // empty query table -> empty result, not an exception (the
      // pre-round-8 contract for callers that filter queries upstream)
      qdist.unpersist()
      val base = df.select(col(idCol).as("__id"))
      return emptyResult(base, idCol, withQueryId = true)
    }
    if (probed.length <= maxCollected) {
      qdist.unpersist()
      val local = probed.map(r => (r.getLong(0), r.getString(1))).toSeq
      bm25BatchTopKLocal(df, idCol, textCol, local, k1, b, topK)
    } else bm25BatchDistributed(df, idCol, textCol, qdist, k1, b, topK)
  }

  /** Query tables up to this many distinct (query, term) pairs are
    * collected to the driver (the compiled literal/row paths); larger
    * ones run [[bm25BatchDistributed]]. 64Ki pairs of short terms is a
    * few MB on the driver and keeps the row path's term-array literal
    * plan-safe. */
  private val MaxCollectedQueryPairs = 1 << 16

  /** Fully distributed batch BM25 for query tables past the driver
    * bound: postings from one corpus explode joined with the (deduped)
    * term table, per-term dfs aggregated from the candidate-bounded
    * postings, and the same canonical-order seqSum fold / window as the
    * row path. The term/query/df joins carry NO broadcast hints: this
    * path exists precisely because the query table may be too large to
    * materialize on the driver, and a `broadcast()` hint would collect it
    * there anyway (BroadcastExchange builds driver-side) — AQE still
    * promotes any side that turns out small at runtime, and past that
    * size a term-keyed shuffle join is the honest cost. Only the 1-row
    * stats frame is explicitly broadcast. Returns a PERSISTED frame the
    * caller owns (Bpe.learn convention); `qdist` is released here. */
  private def bm25BatchDistributed(
      df: DataFrame, idCol: String, textCol: Column, qdist: DataFrame,
      k1: Double, b: Double, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      split(textCol, " ").as("__toks"))
    val stats = base.agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
    val terms = qdist.select("term").distinct()
    // corpus-wide stage: explode once; the term join keeps only
    // query-term occurrences, so the aggregate below is candidate-bounded
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__tok"))
      .join(terms, col("__tok") === col("term"))
      .groupBy(col("__id"), col("term"))
      .agg(max(col("__dl")).as("__dl"), count(lit(1)).as("__tf"))
      .persist()
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val part = partialScore(col("__tf"), col("__df"), col("__dl"),
      col("__n"), col("__sumdl"), k1, b)
    val parts = tf
      .join(qdist, "term")
      .join(dfs, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("__id"), col("term"), part.as("__part"))
    val scored = parts
      .groupBy(col("query_id"), col("__id"))
      .agg(graft.functions.SeriesFunctions.seqSum(
        sort_array(collect_list(struct(col("term"), col("__part"))))
          .getField("__part")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("__id"))
    val out = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("__id").as(idCol), col("score"),
        col("rank"))
      .persist()
    out.count() // materialize while tf/qdist caches are live
    tf.unpersist()
    qdist.unpersist()
    out
  }

  /** Literal-path cutoff: query tables with at most this many distinct
    * (query, term) pairs are compiled INTO the scan (one score expression
    * per query); larger tables use the row formulation so generated code
    * stays bounded. */
  private val MaxInlinedQueryPairs = 256

  /** UTF-8 binary string order — what DuckDB's `ORDER BY term` and
    * Spark's `sort_array` both use; Java String order differs for
    * supplementary characters, so sorts that must replay use this. */
  private val utf8Order: Ordering[String] =
    Ordering.comparatorToOrdering(
      (a: String, b: String) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))

  /** [[bm25BatchTopK]] with the query table as a LOCAL sequence — the
    * common case (a literal eval-query list); skips every query-table
    * Spark job: terms become the TermCounts kernel's plan-time lookup and
    * each query's score a compiled expression.
    *
    * Small tables (≤ [[MaxInlinedQueryPairs]] pairs) run the fully
    * inlined plan: PASS 1 aggregates corpus size, token mass, and every
    * per-term df in one scan (k + 2 longs to the driver); PASS 2 scores
    * every (query, doc) pair inside the scan with those integers as
    * literals and windows out the top-k. Two corpus scans, zero
    * broadcasts, zero candidate-side aggregation shuffles.
    *
    * Fold parity with the row formulation and the oracle: each query's
    * terms fold in UTF-8-binary term order from a 0.0 seed; a term with
    * tf = 0 contributes exactly +0.0 (zero numerator, positive
    * denominator), and x + 0.0 == x bit-exactly for the non-negative
    * partial sums here — so inlining absent terms changes no bit. */
  def bm25BatchTopKLocal(
      df: DataFrame, idCol: String, textCol: Column,
      queries: Seq[(Long, String)],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "query table must be non-empty")
    val qpairs = queries.distinct
    if (qpairs.size > MaxInlinedQueryPairs)
      return bm25BatchRows(df, idCol, textCol, qpairs, k1, b, topK)
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      textCol.as("__text"))
    val termList = qpairs.map(_._2).distinct.sorted(utf8Order)
    val idx = termList.zipWithIndex.toMap
    val tc = graft.functions.TextFunctions.term_counts(col("__text"), termList)
    val (n, sumdl, dfs) = collectStats(base, tc, termList.size)
    if (n == 0L) return emptyResult(base, idCol, withQueryId = true)
    // one struct per query: its score folds the query's terms in
    // ascending term order (indices into the sorted termList), its hit
    // flag keeps only docs sharing ≥ 1 term with the query
    val qStructs = qpairs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (qid, ps) =>
        val tis = ps.map(p => idx(p._2)).sorted
        val score = tis.map { i =>
          partialScore(col("__tc")(i), lit(dfs(i)), col("__dl"),
            lit(n), lit(sumdl), k1, b)
        }.reduceLeft(_ + _)
        val hit = tis.map(i => col("__tc")(i) > 0).reduceLeft(_ || _)
        struct(lit(qid).as("query_id"), score.as("score"), hit.as("hit"))
    }
    val scored = base
      .select(col("__id"), col("__dl"), tc.as("__tc"))
      .filter(array_max(col("__tc")) > 0)
      .select(col("__id"), explode(array(qStructs: _*)).as("__q"))
      .filter(col("__q.hit"))
      .select(col("__q.query_id").as("query_id"), col("__id"),
        col("__q.score").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("__id").as(idCol), col("score"),
        col("rank"))
  }

  /** Row-formulation batch scoring for LARGE query tables (inlining
    * would blow up generated code): per-(doc, term) tf rows from the
    * TermCounts kernel, query/df joins against local relations, and the
    * canonical-order fold via the codegen'd SeqSum kernel. Identical
    * results to the inlined path (same fold order, same candidates). */
  private def bm25BatchRows(
      df: DataFrame, idCol: String, textCol: Column,
      qpairs: Seq[(Long, String)],
      k1: Double, b: Double, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      textCol.as("__text"))
    val stats = base.agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
    val qterms = qpairs.toDF("query_id", "term")
    val termList = qpairs.map(_._2).distinct.sorted(utf8Order)
    val tc = graft.functions.TextFunctions.term_counts(col("__text"), termList)
    val termArr = typedlit(termList)
    val tf = base
      .select(col("__id"), col("__dl"),
        posexplode(tc).as(Seq("__ti", "__tf")))
      .filter(col("__tf") > 0)
      .select(col("__id"), col("__dl"),
        element_at(termArr, col("__ti") + 1).as("term"), col("__tf"))
      .persist()
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val part = partialScore(col("__tf"), col("__df"), col("__dl"),
      col("__n"), col("__sumdl"), k1, b)
    val parts = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("__id"), col("term"), part.as("__part"))
    val scored = parts
      .groupBy(col("query_id"), col("__id"))
      .agg(graft.functions.SeriesFunctions.seqSum(
        sort_array(collect_list(struct(col("term"), col("__part"))))
          .getField("__part")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("__id"))
    // this is the LARGE-query-table path: queries × topK can be millions
    // of rows, so the result must stay DISTRIBUTED — Bpe.learn's cache
    // contract instead of a driver collect: the returned frame is
    // persisted and materialized, tf's candidate cache is released, and
    // the caller owns the returned cache (unpersist after use)
    val out = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("__id").as(idCol), col("score"),
        col("rank"))
      .persist()
    out.count() // materialize while tf's cache is live, then release it
    tf.unpersist()
    out
  }

  /** DuckDB replay of [[bm25BatchTopK]]: the query table inlined as
    * VALUES, every count CAST to BIGINT, and the per-(query, doc) sum
    * replayed as `list_reduce(0.0-seeded, list(part ORDER BY term))` —
    * the same canonical term order and left fold as the Spark side. */
  def bm25BatchOracleSql(
      table: String, idCol: String, queries: Seq[(Long, String)],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): String = {
    // CAST: a bare VALUES integer is INT32 in DuckDB; the Spark side's
    // query_id is BIGINT and the driver hasher is type-sensitive
    val values = queries.map { case (q, t) =>
      s"(CAST($q AS BIGINT), ${slit(t)})"
    }.mkString(",\n         ")
    s"""WITH q(query_id, term) AS (
       |  VALUES $values),
       |${baseSql(table, idCol)},
       |tf AS (
       |  SELECT id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT $idCol AS id, unnest(string_split(text, ' ')) AS tok
       |        FROM $table)
       |  WHERE tok IN (SELECT DISTINCT term FROM q)
       |  GROUP BY 1, 2),
       |dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |        FROM tf GROUP BY 1),
       |parts AS (
       |  SELECT q.query_id, tf.id, tf.term,
       |    ${partialScoreSql("tf", "df", k1, b)}
       |      AS part
       |  FROM tf
       |  JOIN q USING (term) JOIN dfs USING (term) JOIN base USING (id)
       |  CROSS JOIN stats),
       |scored AS (
       |  SELECT query_id, id,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |             list(part ORDER BY term)),
       |           (a, x) -> a + x) AS score
       |  FROM parts GROUP BY query_id, id),
       |ranked AS (
       |  SELECT query_id, id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                ORDER BY score DESC, id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, id AS $idCol, score, rank FROM ranked
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of [[bm25TopK]]: same integers, the double expression
    * via [[partialScoreSql]], summed left-to-right in query order —
    * identical association to the Spark reduceLeft. */
  def bm25OracleSql(
      table: String, idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): String = {
    val tf = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN tok = ${slit(t)} THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(",\n         ")
    val dfAgg = terms.indices.map { i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val score = terms.indices
      .map(i => partialScoreSql(s"tf$i", s"df$i", k1, b))
      .mkString("\n  + ")
    s"""WITH ${baseSql(table, idCol)},
       |toks AS (
       |  SELECT $idCol AS id, unnest(string_split(text, ' ')) AS tok
       |  FROM $table),
       |perdoc AS (
       |  SELECT id, $tf
       |  FROM toks WHERE tok IN (${terms.map(slit).mkString(", ")})
       |  GROUP BY id),
       |dfs AS (SELECT $dfAgg FROM perdoc),
       |final AS (
       |  SELECT id,
       |  $score AS score
       |  FROM perdoc JOIN base USING (id) CROSS JOIN stats CROSS JOIN dfs)
       |SELECT id AS $idCol, score,
       |       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
       |         AS rank
       |FROM final
       |ORDER BY score DESC, id LIMIT $topK""".stripMargin
  }

  /** The expansion-term miner behind [[bm25PrfTopK]], exposed so the
    * mined vocabulary itself is testable: tokens of the `fbDocs`
    * top-BM25 documents, minus the original terms, minus tokens shorter
    * than 3 chars (the cheap stopword-ish floor — deterministic, unlike
    * a curated list), ranked by total occurrence count with ties broken
    * by term. Returns at most `fbTerms` terms, most frequent first.
    *
    * Driver state: `fbDocs` ids + `fbTerms` strings — model-sized, the
    * same bounded-collect discipline as [[collectStats]]'s k+2 longs. */
  def prfExpansionTerms(
      df: DataFrame, idCol: String, textCol: Column, terms: Seq[String],
      fbDocs: Int = 5, fbTerms: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): Seq[String] = {
    require(terms.nonEmpty, "query must have at least one term")
    require(fbDocs > 0, s"fbDocs must be positive, got $fbDocs")
    require(fbTerms >= 0, s"fbTerms must be >= 0, got $fbTerms")
    val distinctTerms = terms.distinct
    val fbIds = bm25TopK(df, idCol, textCol, distinctTerms, k1, b, fbDocs)
      .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSeq
    if (fbIds.isEmpty || fbTerms == 0) Nil
    else df.filter(col(idCol).isin(fbIds: _*))
      .select(explode(split(textCol, " ")).as("tok"))
      .filter(col("tok") =!= "" && length(col("tok")) >= 3 &&
        !col("tok").isin(distinctTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(fbTerms).collect().map(_.getString(0)).toSeq
  }

  /** Pseudo-relevance-feedback retrieval (the RM3 recipe reduced to its
    * exact-arithmetic core): rank `fbDocs` documents by BM25 on the
    * original terms, mine the `fbTerms` most frequent NEW terms from
    * them ([[prfExpansionTerms]]), and re-retrieve with the union term
    * set through the batch scorer — whose canonical term-sorted fold
    * keeps the score deterministic however many terms the expansion
    * adds (the original fixed-order column chain only works for a
    * plan-time term list; an expanded set is data, so it takes the
    * batch path's row fold).
    *
    * Scale shape: two corpus projection scans (the two retrieval
    * rounds — inherent to PRF) + one scan FILTERED to the feedback ids
    * (pushed to the parquet reader) for term mining; candidate shuffles
    * are postings-bounded both rounds; no token explode over the
    * corpus. The expanded vocabulary (≤ |terms| + fbTerms) rides into
    * round 2 as the TermCounts kernel's plan-time lookup, exactly like
    * a hand-written query.
    *
    * Output: (idCol, score DOUBLE, rank LONG), rank 1..topK by
    * (score DESC, id). */
  def bm25PrfTopK(
      df: DataFrame, idCol: String, textCol: Column, terms: Seq[String],
      fbDocs: Int = 5, fbTerms: Int = 5,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val distinctTerms = terms.distinct
    val expansion = prfExpansionTerms(df, idCol, textCol, distinctTerms,
      fbDocs, fbTerms, k1, b)
    bm25BatchTopKLocal(df, idCol, textCol,
        (distinctTerms ++ expansion).map(t => (0L, t)), k1, b, topK)
      .select(col(idCol), col("score"), col("rank"))
  }

  /** DuckDB replay of [[bm25PrfTopK]]: round 1 is [[bm25OracleSql]]'s
    * per-index column chain (fixed original-term order) LIMITed to the
    * feedback set, the expansion mine is a grouped count over the
    * feedback docs' tokens, and round 2 is [[bm25BatchOracleSql]]'s
    * row-fold shape with the query CTE built from originals ∪ mined
    * terms. */
  def bm25PrfOracleSql(
      table: String, idCol: String, terms: Seq[String],
      fbDocs: Int = 5, fbTerms: Int = 5,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): String = {
    val distinctTerms = terms.distinct
    val termIn = distinctTerms.map(slit).mkString(", ")
    val tf1 = distinctTerms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN tok = ${slit(t)} THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(",\n         ")
    val dfAgg1 = distinctTerms.indices.map { i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val score1 = distinctTerms.indices
      .map(i => partialScoreSql(s"tf$i", s"df$i", k1, b))
      .mkString("\n  + ")
    val origRows = distinctTerms
      .map(t => s"SELECT CAST(0 AS BIGINT) AS query_id, ${slit(t)} AS term")
      .mkString("\n  UNION ALL ")
    s"""WITH ${baseSql(table, idCol)},
       |toks AS (
       |  SELECT $idCol AS id, unnest(string_split(text, ' ')) AS tok
       |  FROM $table),
       |perdoc AS (
       |  SELECT id, $tf1
       |  FROM toks WHERE tok IN ($termIn)
       |  GROUP BY id),
       |dfs1 AS (SELECT $dfAgg1 FROM perdoc),
       |fb AS (
       |  SELECT id,
       |  $score1 AS score
       |  FROM perdoc JOIN base USING (id) CROSS JOIN stats CROSS JOIN dfs1
       |  ORDER BY score DESC, id LIMIT $fbDocs),
       |exp AS (
       |  SELECT tok AS term FROM toks
       |  WHERE id IN (SELECT id FROM fb) AND tok <> ''
       |    AND length(tok) >= 3 AND tok NOT IN ($termIn)
       |  GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT $fbTerms),
       |q AS (
       |  SELECT CAST(0 AS BIGINT) AS query_id, term FROM exp
       |  UNION ALL $origRows),
       |tfx AS (
       |  SELECT id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks
       |  WHERE tok IN (SELECT DISTINCT term FROM q)
       |  GROUP BY 1, 2),
       |dfsx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |         FROM tfx GROUP BY 1),
       |parts AS (
       |  SELECT q.query_id, tfx.id, tfx.term,
       |    ${partialScoreSql("tf", "df", k1, b)}
       |      AS part
       |  FROM tfx
       |  JOIN q USING (term) JOIN dfsx USING (term) JOIN base USING (id)
       |  CROSS JOIN stats),
       |scored AS (
       |  SELECT id,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |             list(part ORDER BY term)),
       |           (a, x) -> a + x) AS score
       |  FROM parts GROUP BY query_id, id)
       |SELECT id AS $idCol, score,
       |       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS BIGINT)
       |         AS rank
       |FROM scored
       |ORDER BY score DESC, id LIMIT $topK""".stripMargin
  }

  /** The inverted index as DURABLE parquet artifacts — the
    * index-as-stored-table discipline the ANN family follows
    * (annPqEncodeTable / minhashDedupAgainstTables), applied to lexical
    * retrieval: (postings, doclens, stats) tables written once at
    * index-build time; [[bm25TopKFromTables]] then serves query batches
    * whose cost is postings-pruned and independent of the corpus text —
    * no re-tokenization, no corpus re-scan. Postings carry exact integer
    * (term, id, tf); doclens the same token counts [[bm25TopK]] computes;
    * stats one (n, sumdl) row — so the stored path scores BIT-IDENTICALLY
    * to the inline path. */
  def bm25IndexTables(df: DataFrame, idCol: String, textCol: Column)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = df.select(col(idCol).as("id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("dl"),
      textCol.as("__text"))
    val postings = base
      .select(col("id"), explode(split(col("__text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))
    val doclens = base.select(col("id"), col("dl"))
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    (postings, doclens, stats)
  }

  /** Incremental maintenance for the stored BM25 index — the missing
    * maintenance story the r12 review named (reference discipline:
    * incremental index maintenance, PrimaryWorker.scala:183-215; the ANN
    * tables' append gates are the in-repo precedent). A new document
    * batch is tokenized ONCE: its (term, id, tf) postings and (id, dl)
    * doclens rows APPEND to the stored tables (ids must be new — the
    * same append-only id discipline the ANN encode tables assume), and
    * the one-row stats table folds incrementally (n += Δn,
    * sumdl += Δsumdl) without touching the old corpus. All three pieces
    * are exact integer arithmetic, and per-term dfs already derive at
    * query time from the pruned postings, so the appended index serves
    * BIT-IDENTICALLY to a full rebuild over old ∪ new — for both
    * [[bm25TopKFromTables]] and [[bm25BatchTopKFromTables]] (spec-pinned
    * through a real parquet append on the postings/doclens paths).
    *
    * Returns (postingsDelta, doclensDelta, mergedStats): the deltas are
    * what a deployment writes with parquet `mode("append")` — the old
    * postings files are never rewritten, so at scale the append costs
    * O(|new batch|), not O(corpus) — and the merged one-row stats frame
    * replaces the stored stats table. An empty stored-stats side (fresh
    * index) folds as (0, 0). */
  def bm25AppendToTables(newDocs: DataFrame, idCol: String, textCol: Column,
      stats: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val (postingsDelta, doclensDelta, statsDelta) =
      bm25IndexTables(newDocs, idCol, textCol)
    val norm = (df: DataFrame) => df.select(
      coalesce(col("n"), lit(0L)).cast("long").as("n"),
      coalesce(col("sumdl"), lit(0L)).cast("long").as("sumdl"))
    // n and sumdl are both longs: the incremental fold is exact, and the
    // rebuilt-corpus empty-sum NULL convention is preserved so the merged
    // row is byte-identical to what bm25IndexTables writes over old ∪ new
    val merged = norm(stats).unionByName(norm(statsDelta))
      .agg(sum(col("n")).as("n"),
        when(sum(col("n")) === 0L, lit(null).cast("long"))
          .otherwise(sum(col("sumdl"))).as("sumdl"))
    (postingsDelta, doclensDelta, merged)
  }

  /** Incremental DELETION from the stored BM25 index — the other half
    * of the maintenance story next to [[bm25AppendToTables]] (reference
    * discipline: crash-durable index delete, HyperStorage index
    * DELETE → IndexManager cascade): drop the deleted ids' postings and
    * doclens rows and fold the one-row stats DOWN (n −= |deleted ∩
    * index|, sumdl −= Σ their dl — exact longs; ids absent from the
    * index are no-ops, and the empty-corpus (n=0, sumdl=NULL)
    * convention is restored when the last document leaves). Per-term
    * dfs derive at QUERY time from the pruned postings, so a deleted
    * document stops contributing to every term's df without any
    * term-level bookkeeping. Serving over the shrunk tables is
    * BIT-identical to a full rebuild on the remaining corpus —
    * spec-pinned for both stored serving paths.
    *
    * The returned frames are the LOGICAL post-delete index. A
    * deployment realizes them either as a snapshot rewrite (small
    * indexes) or as delete-vector sidecars merged at scan time (the
    * lakehouse pattern — the anti join below is exactly the scan-time
    * merge); either realization must preserve the serving semantics
    * pinned here. Both anti joins broadcast the deleted-id set when it
    * is small (the common case) — the postings table is never
    * shuffled. */
  def bm25DeleteFromTables(deleteIds: DataFrame, idCol: String,
      postings: DataFrame, doclens: DataFrame, stats: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val ids = deleteIds.select(col(idCol).cast("long").as("id")).distinct()
    val newPostings = postings.join(ids, Seq("id"), "left_anti")
    val newDoclens = doclens.join(ids, Seq("id"), "left_anti")
    // the fold-down delta comes from the doclens rows actually present:
    // deleting an unknown id changes nothing
    val delta = doclens.join(ids, Seq("id"), "left_semi")
      .agg(count(lit(1)).as("__dn"),
        coalesce(sum(col("dl")), lit(0L)).as("__dsum"))
    val merged = stats.crossJoin(broadcast(delta))
      .select(
        (coalesce(col("n"), lit(0L)).cast("long") - col("__dn")).as("__n"),
        (coalesce(col("sumdl"), lit(0L)).cast("long") - col("__dsum"))
          .as("__s"))
      .select(col("__n").as("n"),
        when(col("__n") === 0L, lit(null).cast("long"))
          .otherwise(col("__s")).as("sumdl"))
    (newPostings, newDoclens, merged)
  }

  /** BM25 over the STORED index: the scan touches only the query terms'
    * postings (an `isin` filter that reaches the parquet scan — at scale,
    * term-partitioned postings prune to the touched terms' files), global
    * stats are one stored row, dfs are candidate-bounded counts. Score
    * expression, fold order, tie-break and rank derivation are the same
    * code path as [[bm25TopK]] — identical results with the same index. */
  def bm25TopKFromTables(postings: DataFrame, doclens: DataFrame,
      stats: DataFrame, idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")
    val distinctTerms = terms.distinct
    val slot = terms.map(distinctTerms.indexOf(_))
    val pruned = postings.filter(col("term").isin(distinctTerms: _*))
    // ONE blocking action for everything global: the per-term document
    // frequencies (a candidate-bounded aggregate, k longs — model-sized)
    // cross-joined with the one-row stored stats row — a serving-path
    // query batch pays one driver round trip, not two. Every sum is
    // coalesced: an all-miss term set aggregates zero rows to NULLs, and
    // an EMPTY corpus writes (n=0, sumdl=NULL).
    val dfAggs = distinctTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === t, 1L).otherwise(0L)), lit(0L))
        .as(s"__df$i")
    }
    val gRow = pruned.agg(dfAggs.head, dfAggs.tail: _*)
      .crossJoin(broadcast(stats.select(col("n").cast("long").as("__n"),
        coalesce(col("sumdl"), lit(0L)).cast("long").as("__sumdl"))))
      .collect()(0)
    val dfs = distinctTerms.indices.map(i => gRow.getLong(i))
    val n = gRow.getLong(distinctTerms.size)
    val sumdl = gRow.getLong(distinctTerms.size + 1)
    val none = postings.filter(lit(false))
      .select(col("id").as(idCol), lit(0.0).as("score"), lit(0L).as("rank"))
    if (n == 0L) return none
    // candidate docs = docs holding at least one query-term posting;
    // fold the postings to one tf column per distinct term
    val tfAggs = distinctTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"__tf$i")
    }
    val cand = pruned.groupBy("id").agg(tfAggs.head, tfAggs.tail: _*)
      .join(doclens, Seq("id"))
    val score = terms.indices.map { i =>
      partialScore(col(s"__tf${slot(i)}"), lit(dfs(slot(i))),
        col("dl"), lit(n), lit(sumdl), k1, b)
    }.reduceLeft(_ + _)
    import org.apache.spark.sql.expressions.Window
    val ranked = cand.select(col("id").as(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol)))
        .cast("long"))
  }

  /** Batched BM25 over the STORED index — [[bm25TopKFromTables]]' query-
    * table twin and the mining-scale serving shape the r11 review named:
    * thousands of eval queries against a static corpus, per batch
    * touching only the query terms' postings (the `isin` prune that
    * reaches the parquet scan; term-partitioned postings prune to the
    * touched terms' files at scale) — the corpus text is never
    * re-tokenized, never re-scanned. Scoring mirrors
    * [[bm25BatchTopKLocal]] exactly: small query tables pivot the
    * pruned postings to per-term tf columns (one id-keyed shuffle) and
    * compile each query's score with the stats as literals; tables past
    * [[MaxInlinedQueryPairs]] fall back to the row formulation
    * (canonical-order SeqSum fold). A term absent from a candidate doc
    * contributes exactly +0.0 in the sorted-term fold, so skipping its
    * (absent) posting row changes no bit: stored ≡ inline, spec-pinned
    * through a real parquet round trip on both paths.
    *
    * Output: (query_id, idCol, score, rank), rank 1..topK per query by
    * (score DESC, id). Queries whose terms occur nowhere yield no rows,
    * like the inline batch paths. */
  def bm25BatchTopKFromTables(postings: DataFrame, doclens: DataFrame,
      stats: DataFrame, idCol: String, queries: Seq[(Long, String)],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "query table must be non-empty")
    val qpairs = queries.distinct
    val termList = qpairs.map(_._2).distinct.sorted(utf8Order)
    val pruned = postings.filter(col("term").isin(termList: _*))
    val statsRow = stats.select(col("n").cast("long").as("__n"),
      coalesce(col("sumdl"), lit(0L)).cast("long").as("__sumdl"))
    if (qpairs.size > MaxInlinedQueryPairs)
      return bm25BatchRowsFromTables(pruned, doclens, statsRow, idCol,
        qpairs, k1, b, topK)
    // compiled path (the bm25BatchTopKLocal shape over stored postings):
    // pivot each candidate's pruned postings to one tf column per term —
    // ONE id-keyed shuffle over ONE postings scan — then score every
    // (query, doc) pair and window out the top-k. ZERO driver actions:
    // the per-term dfs come from a one-row aggregate over the PIVOTED
    // candidate table (a doc holds term i ⟺ it is a candidate with
    // __tc_i > 0, so this equals the corpus df; the pivot's exchange is
    // reused, the raw postings are never re-scanned) and ride back as a
    // broadcast row next to the stored stats — same longs the inline
    // path collects as literals, identical double arithmetic. An absent
    // (doc, term) posting pivots to tf = 0 and contributes exactly +0.0
    // to the sorted-term fold, so scores are bit-equal to the inline
    // batch; an empty corpus yields the empty result shape naturally.
    val tfAggs = termList.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"__tc$i")
    }
    val cand = pruned.groupBy("id").agg(tfAggs.head, tfAggs.tail: _*)
    val dfAggs = termList.indices.map { i =>
      coalesce(sum(when(col(s"__tc$i") > 0, 1L).otherwise(0L)), lit(0L))
        .as(s"__df$i")
    }
    val globals = cand.agg(dfAggs.head, dfAggs.tail: _*)
      .crossJoin(broadcast(statsRow))
    val idx = termList.zipWithIndex.toMap
    val qStructs = qpairs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (qid, ps) =>
        val tis = ps.map(p => idx(p._2)).sorted
        val score = tis.map { i =>
          partialScore(col(s"__tc$i"), col(s"__df$i"), col("dl"),
            col("__n"), col("__sumdl"), k1, b)
        }.reduceLeft(_ + _)
        val hit = tis.map(i => col(s"__tc$i") > 0).reduceLeft(_ || _)
        struct(lit(qid).as("query_id"), score.as("score"), hit.as("hit"))
    }
    val scored = cand.join(doclens, Seq("id"))
      .crossJoin(broadcast(globals))
      .select(col("id"), explode(array(qStructs: _*)).as("__q"))
      .filter(col("__q.hit"))
      .select(col("__q.query_id").as("query_id"), col("id"),
        col("__q.score").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("id").as(idCol), col("score"),
        col("rank"))
  }

  /** Row-formulation stored-batch scoring for query tables past the
    * inlining cutoff — per-(query, doc) partials from the pruned
    * postings, canonical-order SeqSum fold (identical results to the
    * compiled path; the bm25BatchRows large-table shape minus its
    * corpus scan). Like the compiled path, zero driver actions: dfs are
    * a per-term count over the pruned postings (one row per query term,
    * broadcast), stats ride as a broadcast row. */
  private def bm25BatchRowsFromTables(pruned: DataFrame,
      doclens: DataFrame, statsRow: DataFrame, idCol: String,
      qpairs: Seq[(Long, String)], k1: Double, b: Double,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = pruned.sparkSession
    import spark.implicits._
    val qterms = qpairs.toDF("query_id", "term")
    val dfTable = pruned.groupBy("term").agg(count(lit(1)).as("__df"))
    val part = partialScore(col("tf"), col("__df"), col("dl"),
      col("__n"), col("__sumdl"), k1, b)
    val parts = pruned.join(doclens, Seq("id"))
      .join(broadcast(qterms), "term")
      .join(broadcast(dfTable), "term")
      .crossJoin(broadcast(statsRow))
      .select(col("query_id"), col("id"), col("term"), part.as("__part"))
    val scored = parts
      .groupBy(col("query_id"), col("id"))
      .agg(graft.functions.SeriesFunctions.seqSum(
        sort_array(collect_list(struct(col("term"), col("__part"))))
          .getField("__part")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("id").as(idCol), col("score"),
        col("rank"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-ranked BM25 candidates that are NOT known positives — the
    * lexically-confusable documents a retriever must learn to push
    * below the true answers. `positives` carries (query_id, idCol)
    * pairs; depth > topK overfetches so filtered positives don't
    * starve the negative list.
    *
    * Shape at 100 TB: the corpus-scale work is [[bm25BatchTopK]]
    * (candidate generation inside the scan); the positive filter is a
    * left-anti hash join between two query-bounded tables, and the
    * re-rank is a per-query window over ≤ depth rows. The negative
    * rank re-numbers by the RETRIEVER's rank (unique per query), so
    * output order is engine-exact. */
  def hardNegatives(df: DataFrame, idCol: String, textCol: Column,
      queries: DataFrame, positives: DataFrame,
      k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10, depth: Int = 50): DataFrame = {
    require(depth >= topK,
      s"depth ($depth) must be >= topK ($topK) — the overfetch absorbs positives")
    val cands = bm25BatchTopK(df, idCol, textCol, queries, k1, b, depth)
    val negs = cands.join(
      positives.select(col("query_id"), col(idCol)),
      Seq("query_id", idCol), "left_anti")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("rank"))
    negs.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= topK)
      .select(col("query_id"), col(idCol), col("score"), col("neg_rank"))
  }

  /** DCG rank discounts 1/log2(i+1) for i = 1..k and their LEFT-FOLDED
    * prefix sums (the ideal-DCG values for 1..k relevant results). Both
    * [[ndcgAtK]] and its oracle embed these exact doubles as literals —
    * the transcendental is computed ONCE here, never re-derived by an
    * engine, so the score replays bit-identically (the VARCHAR-cast
    * literal discipline). */
  def dcgDiscounts(k: Int): (IndexedSeq[Double], IndexedSeq[Double]) = {
    val d = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    (d.toIndexedSeq, d.scanLeft(0.0)(_ + _).drop(1).toIndexedSeq)
  }

  /** Per-query nDCG@k with binary relevance — the graded companion to
    * [[reciprocalRank]]: DCG folds the per-rank discount terms
    * left-to-right (each term is a literal from [[dcgDiscounts]] or
    * exact 0.0, so the fold is hash-replayable); ideal DCG is the
    * prefix-sum literal at min(|qrels_q|, k); nDCG is one IEEE
    * division. Queries with no relevant docs at all score 0.0; queries
    * absent from `ranked` are absent (the retriever never saw them).
    *
    * Shape at scale: candidate-bounded joins and a per-query aggregate
    * over ≤ k rows — the corpus work happened in the retriever. */
  def ndcgAtK(ranked: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val (discs, idcgs) = dcgDiscounts(k)
    val marked = ranked.filter(col("rank") <= k)
      .join(qrels.select(col(queryCol), col(idCol))
          .withColumn("__rel", lit(1)),
        Seq(queryCol, idCol), "left_outer")
    val termCols = (1 to k).map { i =>
      sum(when(col("rank") === i && col("__rel") === 1, lit(discs(i - 1)))
        .otherwise(lit(0.0))).as(s"__t$i")
    }
    val agg = marked.groupBy(queryCol).agg(termCols.head, termCols.tail: _*)
    val dcg = (1 to k).map(i => col(s"__t$i")).foldLeft(lit(0.0))(_ + _)
    val rcounts = qrels.groupBy(queryCol).agg(count(lit(1)).as("__r"))
    val idcg = (1 to k).foldLeft(
        when(col("__rk") === 0L, lit(Double.NaN))) { (acc, j) =>
      acc.when(col("__rk") === j.toLong, lit(idcgs(j - 1)))
    }
    agg.join(rcounts, Seq(queryCol), "left_outer")
      .withColumn("__rk", least(coalesce(col("__r"), lit(0L)), lit(k.toLong)))
      .withColumn("dcg", dcg)
      .withColumn("ndcg",
        when(col("__rk") === 0L, lit(0.0)).otherwise(col("dcg") / idcg))
      .select(col(queryCol), col("dcg"), col("ndcg"))
  }

  /** Per-query reciprocal rank — the MRR building block (the retrieval
    * quality gate next to [[graft.pipeline.Similarity.recallAtK]]'s ANN
    * recall): for each query in `ranked`, the rank of the FIRST relevant
    * result within the top k and its reciprocal; queries with no
    * relevant hit in the top k emit (null, 0.0), queries with no
    * candidates at all are absent (the retriever never saw them).
    * `rr` is one IEEE division of an exact integer — hash-replayable;
    * callers average it per slice as a final bounded aggregate.
    *
    * Shape at 100 TB: `ranked` is a per-query top-k table (bounded);
    * the qrels join and per-query min are candidate-sized. */
  def reciprocalRank(ranked: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val rel = ranked.filter(col("rank") <= k)
      .join(qrels.select(col(queryCol), col(idCol)), Seq(queryCol, idCol))
      .groupBy(queryCol).agg(min("rank").as("first_rel_rank"))
    ranked.select(col(queryCol)).distinct()
      .join(rel, Seq(queryCol), "left_outer")
      .select(col(queryCol), col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)).as("rr"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher): fuse N ranked
    * lists into one consensus ranking — the standard hybrid-retrieval
    * combiner (BM25 lexical + dense ANN) RAG pipelines run, robust to
    * incomparable score scales because only RANKS enter the formula:
    * `score(d) = Σ_lists 1/(c + rank_l(d))`, a document absent from a
    * list contributing exactly 0.0.
    *
    * Every input carries columns `keys :+ rank` (the last key is the
    * document id; any leading keys identify the query for batch fusion).
    * Hash-replayability: each term is one IEEE division of exact
    * integers and the terms fold LEFT-TO-RIGHT in list order — an oracle
    * replays the identical association.
    *
    * Shape at 100 TB: the inputs are per-query top-N tables (bounded by
    * construction — the retrievers did the corpus-scale work), so the id
    * union and the N left joins are candidate-sized, never corpus-sized;
    * the final rank is a per-query window over ≤ N·topN rows. */
  def rrfFuse(lists: Seq[DataFrame], keys: Seq[String], c: Int = 60,
      topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(keys.nonEmpty, "need at least the document id key")
    require(c >= 1, s"rrf constant must be positive (got $c)")
    val named = lists.zipWithIndex.map { case (l, i) =>
      l.select(keys.map(col) :+ col("rank").cast("long").as(s"__r$i"): _*)
    }
    val ids = named.map(_.select(keys.map(col): _*))
      .reduce(_ unionByName _).distinct()
    val joined = named.foldLeft(ids)((acc, l) => acc.join(l, keys, "left_outer"))
    val score = lists.indices.map { i =>
      coalesce(lit(1.0) / (lit(c.toLong) + col(s"__r$i")), lit(0.0))
    }.reduceLeft(_ + _)
    import org.apache.spark.sql.expressions.Window
    val queryKeys = keys.dropRight(1)
    val w = (if (queryKeys.isEmpty) Window.partitionBy()
             else Window.partitionBy(queryKeys.map(col): _*))
      .orderBy(col("rrf_score").desc, col(keys.last))
    joined.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(keys.map(col) :+ col("rrf_score") :+ col("rank"): _*)
  }
}
