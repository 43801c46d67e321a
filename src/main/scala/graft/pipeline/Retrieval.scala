package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Shape at 100 TB: candidate generation explodes tokens but FILTERS to
  * the query terms before the aggregation — the shuffle carries only the
  * query terms' postings (∝ occurrences of the query terms, not the
  * corpus). Corpus stats (N, Σdl) are one column-scan aggregate; per-term
  * dfs are candidate-bounded aggregates; all broadcast to the scoring
  * join. Top-k is a TakeOrdered (single query) or a per-query window
  * (batch).
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

    // one column-scan aggregate: corpus size and total token mass; the
    // double division in partialScore is the only place avgdl exists, so
    // both engines derive it from the same two integers
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      split(textCol, " ").as("__toks"))
    val stats = base.agg(count(lit(1)).as("n"), sum(col("__dl")).as("sumdl"))

    // postings of the query terms only: the explode is corpus-wide but the
    // filter runs inside the generated stage, so the aggregation shuffle
    // carries just the matching (doc, term) occurrences
    val hits = base
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__tok") === t, 1L).otherwise(0L)).as(s"__tf$i")
    }
    val aggCols = max(col("__dl")).as("__dl") +: tfCols
    // persist barrier: the candidate table feeds BOTH the df aggregate
    // and the scoring join — without it the postings explode+aggregate
    // runs twice (plan-verified). Candidates are bounded by the query
    // terms' postings, not the corpus, so caching them is cheap at scale.
    val perDoc = hits.groupBy(col("__id"))
      .agg(aggCols.head, aggCols.tail: _*)
      .persist()

    // per-term document frequencies: a single k-column row over the
    // candidates (df counts docs with tf > 0), broadcast like the stats
    val dfCols = terms.indices.map { i =>
      sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")
    }
    val dfs = perDoc.agg(dfCols.head, dfCols.tail: _*)

    val scored = perDoc
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
    val score = terms.indices.map { i =>
      partialScore(col(s"__tf$i"), col(s"__df$i"), col("__dl"),
        col("n"), col("sumdl"), k1, b)
    }.reduceLeft(_ + _)

    import org.apache.spark.sql.expressions.Window
    val ranked = scored.select(col("__id").as(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    // rank re-derived on the k collected rows — a window over topK rows,
    // not the corpus
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol)))
        .cast("long"))
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
    * Scale shape: corpus stats are one broadcast row; the distinct-term
    * and per-term df tables are query-table-sized broadcasts; the only
    * corpus-wide work is the token explode filtered by the term
    * broadcast (shuffle ∝ matching occurrences); the final rank windows
    * per query over its candidates.
    *
    * Output: (query_id, idCol, score, rank), rank 1..topK per query by
    * (score DESC, id). */
  def bm25BatchTopK(
      df: DataFrame, idCol: String, textCol: Column, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__dl"),
      split(textCol, " ").as("__toks"))
    val stats = base.agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
    val qterms = queries.select(col("query_id"), col("term")).distinct()
      .persist()
    val terms = qterms.select("term").distinct()
    // postings of any query term: the corpus-wide stage — explode, then
    // the broadcast term join keeps only matching occurrences
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__tok"))
      .join(broadcast(terms), col("__tok") === col("term"))
      .groupBy(col("__id"), col("term"))
      .agg(max(col("__dl")).as("__dl"), count(lit(1)).as("__tf"))
      .persist()
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val part = partialScore(col("__tf"), col("__df"), col("__dl"),
      col("__n"), col("__sumdl"), k1, b)
    val parts = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("__id"), col("term"), part.as("__part"))
    // canonical-order fold: sort the (term, part) pairs, then seed 0.0
    // and add left-to-right — the one float-sum order both engines can
    // replay exactly. The fold is the codegen'd SeqSum kernel over the
    // extracted part column (sort_array + GetArrayStructFields are both
    // codegen'd): the equivalent `aggregate` higher-order function runs
    // interpreted and was the board's worst honest bench ratio (r7)
    val scored = parts
      .groupBy(col("query_id"), col("__id"))
      .agg(graft.functions.SeriesFunctions.seqSum(
        sort_array(collect_list(struct(col("term"), col("__part"))))
          .getField("__part")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("__id").as(idCol), col("score"),
        col("rank"))
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
}
