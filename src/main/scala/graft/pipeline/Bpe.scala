package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer TRAINING — the vocabulary-learning step of
  * an LLM data pipeline (the reference has no tokenizer; this is part of
  * the beyond-reference training-prep surface, like Packing/Sampling).
  *
  * Classic BPE (Sennrich et al. 2016, public algorithm): words split to
  * characters (+ an end-of-word marker), then `nMerges` rounds of "merge
  * the most frequent adjacent symbol pair". The crucial scale property is
  * that learning runs on the WORD-FREQUENCY TABLE, not the corpus: the
  * corpus is scanned exactly once (one two-phase hash aggregation) and
  * every merge round after that is a vocabulary-sized job — at 100 TB the
  * vocabulary is millions of rows where the corpus is billions, so the
  * loop costs nMerges × (seconds), not nMerges × (corpus scans).
  *
  * Determinism contract (what makes the DuckDB oracle replay exact):
  *  - symbol strings are single-space-joined and space-wrapped
  *    (" l o w </w> "); adjacent pairs come from the codegen'd
  *    [[graft.functions.WordPairs]] kernel (empty tokens filtered);
  *  - the best pair is (SUM(count) DESC, pair ASC) — integer counts, total
  *    order, no float scores;
  *  - a merge is applied as a single-pass left-to-right non-overlapping
  *    string replace of " a b " with " ab " (Spark `replace` ≡ DuckDB
  *    `replace`; within a run of identical symbols this merges the same
  *    disjoint occurrences on both engines). This is the documented merge
  *    semantics — it differs from the per-word index-walk of the original
  *    implementation only inside 5+-symbol identical runs, where ANY fixed
  *    rule is equally valid for vocabulary learning.
  *
  * Driver state: one (pair, total) row per round + the nMerges merge list —
  * O(nMerges), never vocabulary- or corpus-sized.
  */
object Bpe {

  /** One learned merge: `lhs`+`rhs` → `merged`, chosen at `rank` with
    * `pairCount` weighted occurrences. */
  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, pairCount: Long)

  /** End-of-word marker symbol (multi-char, space-free — symbols are
    * space-delimited so any space-free string works). */
  val EowMarker = "</w>"

  /** The word-frequency table with initial symbolization: one row per
    * distinct single-space token — (w, cnt, sym) where sym is the
    * space-wrapped character split plus the end-of-word marker.
    * Vocabulary-sized: the ONLY corpus-wide pass in BPE learning. */
  def wordTable(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "),
          lit(EowMarker + " ")))

  /** Learn `nMerges` merges; returns the merge list and the FINAL word
    * table (w, cnt, sym) whose symbols are the learned tokenization.
    * Each round = two vocabulary-sized jobs (pair count + re-symbolize);
    * the previous round's table is unpersisted only after the next is
    * materialized, so lineage never re-derives the chain. Stops early if
    * no pair remains (every word a single symbol). */
  def learn(df: DataFrame, textCol: Column, nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"bpe: nMerges must be >= 1, got $nMerges")
    // ONE Spark job per round: round r's pair-count aggregate is the
    // action that materializes cur_r's persist as a side effect, so no
    // separate count() job is needed; cur_{r-1} is unpersisted only
    // AFTER that aggregate ran (its cache fed cur_r's materialization —
    // dropping it earlier would re-derive the whole replace chain).
    var prev: Option[DataFrame] = None
    var cur = wordTable(df, textCol).persist()
    val merges = ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val top = cur
        .select(explode(TextFunctions.word_pairs(col("sym"))).as("pr"),
          col("cnt"))
        .groupBy("pr").agg(sum("cnt").as("total"))
        .orderBy(col("total").desc, col("pr").asc)
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = Some(cur)
      if (top.isEmpty) done = true
      else {
        val pr = top(0).getString(0)
        val total = top(0).getLong(1)
        val sp = pr.indexOf(' ')
        val (a, b) = (pr.substring(0, sp), pr.substring(sp + 1))
        cur = cur.withColumn("sym",
          replace(col("sym"), lit(" " + pr + " "),
            lit(" " + a + b + " "))).persist()
        merges += Merge(r, a, b, a + b, total)
      }
      r += 1
    }
    // materialize the final frame once so the last predecessor cache can
    // be dropped here instead of leaking to the caller (one job — the
    // per-round materializations all rode the pair-count aggregates);
    // on early stop prev IS cur (already materialized) — nothing to do
    prev.filter(_ ne cur).foreach { p => cur.count(); p.unpersist() }
    (merges.toSeq, cur)
  }

  /** The merge list as a DataFrame (merge_rank, lhs, rhs, merged,
    * pair_count) ordered by rank — the `text_bpe_learn` entry shape. */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Token vocabulary induced by the final symbolization: top-k tokens by
    * weighted frequency (count DESC, token ASC) — the `text_bpe_vocab`
    * entry shape. Vocabulary-sized aggregation + TakeOrdered top-k. */
  def vocab(finalWords: DataFrame, k: Int): DataFrame =
    finalWords
      .select(explode(split(col("sym"), " ")).as("tok"), col("cnt"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)
}
