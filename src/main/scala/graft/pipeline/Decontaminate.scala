package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (train-test overlap).
  *
  * Shape for 100 TB: the EVAL side is the small one (benchmarks are
  * thousands of documents, the corpus is billions) — its distinct n-grams
  * are broadcast, so the corpus never shuffles for candidate generation.
  * The corpus side is a projection + explode that runs inside the scan;
  * the only shuffle is the per-document hit count, whose volume is
  * proportional to the CONTAMINATED n-gram occurrences, not the corpus.
  *
  * Shingling reuses the codegen'd [[graft.functions.WordShingles]] kernel
  * (distinct n-gram sets, rows shorter than n shingle to the whole text,
  * NULL text ⇒ excluded) so decontamination and MinHash dedup agree on
  * what an n-gram is.
  */
object Decontaminate {

  /** Distinct word n-grams of the eval set — the broadcast side. */
  def evalNgrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(Dedup.shingles(col(textCol), n)).as("__gram"))
      .distinct()

  /** Per-document count of distinct n-grams shared with the eval set.
    * Returns (idCol, ngram_hits) for CONTAMINATED documents only —
    * downstream joins this back as an anti-join (drop) or a flag.
    *
    * At 100 TB the eval n-gram set stays a few million strings (8-gram
    * sets of benchmark suites) — comfortably broadcast; if a deployment
    * ever needs a corpus-sized "eval" side, the same plan without the
    * broadcast hint degrades gracefully to a shuffled semi-join. */
  def overlapHits(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = corpus.select(col(idCol),
      explode(Dedup.shingles(col(textCol), n)).as("__gram"))
    grams.join(broadcast(evalNgrams(eval, textCol, n)), "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("ngram_hits"))
  }

  /** The corpus with contaminated rows removed — the pipeline binding
    * (filter-before-training). Left-anti join against the flagged ids. */
  def decontaminated(
      corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(overlapHits(corpus, eval, idCol, textCol, n)
        .select(col(idCol)), Seq(idCol), "left_anti")
}
