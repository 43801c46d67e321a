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
  *  - a merge is applied as TWO nested left-to-right non-overlapping
  *    string replaces of " a b " with " ab " (Spark `replace` ≡ DuckDB
  *    `replace`). One pass alone skips every occurrence that shares its
  *    leading space with the previous match's trailing space (" a b a b "
  *    → " ab a b "); the second pass catches exactly those, and two
  *    passes are always a fixpoint: a skipped occurrence is never
  *    adjacent to another skipped occurrence (skips only happen
  *    immediately after a match), so pass 2 faces only disjoint
  *    occurrences with intact delimiters. For a distinct pair (a ≠ b)
  *    occurrences never overlap, so the fixpoint equals the classic
  *    per-word greedy index-walk (Sennrich et al.); for a == b it can
  *    differ from the index-walk only inside runs of 5+ identical
  *    symbols (e.g. "a a a a a" → [aa, a, aa] vs the walk's
  *    [aa, aa, a]), where any fixed deterministic rule is equally valid
  *    for vocabulary learning.
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

  /** Private-use escape for '<' in CONTENT: a raw corpus word containing
    * '<' (e.g. "a</w>" from un-stripped HTML) would otherwise split to
    * symbols "< / w >" whose merges can reconstruct a content token equal
    * to the marker string, conflating it with the marker in vocab counts
    * and later merge rounds. Escaping '<' at symbolization makes that
    * impossible; [[unescapeTok]] restores it on OUTPUT tokens (after
    * aggregation, so a content token that merely renders as "&lt;/w&gt;"
    * stays a distinct row from the marker). */
  val LtEscape = "\uE000"

  private[pipeline] def escapeContent(c: Column): Column =
    replace(c, lit("<"), lit(LtEscape))

  /** Restore escaped '<' in an output token/pair column. */
  def unescapeTok(c: Column): Column = replace(c, lit(LtEscape), lit("<"))

  /** The word-frequency table with initial symbolization: one row per
    * distinct single-space token — (w, cnt, sym) where sym is the
    * space-wrapped character split plus the end-of-word marker.
    * Vocabulary-sized: the ONLY corpus-wide pass in BPE learning. */
  def wordTable(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        concat(lit(" "),
          regexp_replace(escapeContent(col("w")), "(.)", "$1 "),
          lit(EowMarker + " ")))

  /** Word-table row bound for the in-memory learn path: below this the
    * collected (w, cnt, sym) rows are at most a few tens of MB and the
    * merge loop runs on the driver (the shape every production BPE
    * trainer uses — the model-table class, like the PQ codebooks); above
    * it the distributed per-round loop takes over. Probed with a
    * limit(N+1) collect, the same honest cutover as
    * [[Retrieval.bm25BatchTopK]]'s query-table probe. */
  private[pipeline] val MaxInlinedVocab = 65536

  /** Learn `nMerges` merges; returns the merge list and the FINAL word
    * table (w, cnt, sym) whose symbols are the learned tokenization.
    * Stops early if no pair remains (every word a single symbol).
    *
    * The corpus is scanned exactly once either way (the word-table
    * aggregate). When the vocabulary fits [[MaxInlinedVocab]] the merge
    * rounds run on the DRIVER over the collected word table — Spark's
    * per-job floor would otherwise dominate nMerges sequential
    * vocabulary-sized jobs — with bit-identical semantics (same pair
    * kernel, same UTF-8-binary tie-break, same two-pass replace).
    * Larger vocabularies fall back to the distributed loop: each round =
    * two vocabulary-sized jobs (pair count + re-symbolize); the previous
    * round's table is unpersisted only after the next is materialized,
    * so lineage never re-derives the chain. */
  def learn(df: DataFrame, textCol: Column, nMerges: Int,
      maxInlined: Int = MaxInlinedVocab): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"bpe: nMerges must be >= 1, got $nMerges")
    val wt = wordTable(df, textCol).persist()
    val probe = wt.limit(maxInlined + 1).collect()
    if (probe.length <= maxInlined) {
      wt.unpersist()
      learnLocal(df.sparkSession, probe, nMerges)
    } else learnDistributed(wt, nMerges)
  }

  /** Driver-memory merge loop over a probed-small word table. Mirrors the
    * distributed loop exactly: pairs = adjacent non-empty space-split
    * symbols (the [[graft.functions.TextKernels.wordPairs]] contract),
    * best = (total DESC, pair ASC in UTF-8 BYTE order — Spark's
    * UTF8_BINARY collation, not Java's UTF-16 compareTo), merge = two
    * nested left-to-right non-overlapping replaces (`String.replace` ≡
    * Spark/DuckDB `replace`). */
  private def learnLocal(spark: SparkSession,
      rows: Array[org.apache.spark.sql.Row], nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    import java.nio.charset.StandardCharsets.UTF_8
    def utf8Lt(x: String, y: String): Boolean =
      java.util.Arrays.compareUnsigned(
        x.getBytes(UTF_8), y.getBytes(UTF_8)) < 0
    val (iw, ic, is) = rows.headOption.map { r =>
      (r.fieldIndex("w"), r.fieldIndex("cnt"), r.fieldIndex("sym"))
    }.getOrElse((0, 1, 2))
    val ws = rows.map(_.getString(iw))
    val cnts = rows.map(_.getLong(ic))
    val syms = rows.map(_.getString(is))
    val merges = ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i < syms.length) {
        val toks = syms(i).split(' ').filter(_.nonEmpty)
        val c = cnts(i)
        var j = 0
        while (j < toks.length - 1) {
          counts.merge(toks(j) + " " + toks(j + 1), c, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) done = true
      else {
        var bestPr: String = null
        var bestTotal = Long.MinValue
        counts.forEach { (pr, tot) =>
          if (tot > bestTotal || (tot == bestTotal && utf8Lt(pr, bestPr)))
            { bestPr = pr; bestTotal = tot }
        }
        val sp = bestPr.indexOf(' ')
        val (a, b) = (bestPr.substring(0, sp), bestPr.substring(sp + 1))
        val pat = " " + bestPr + " "
        val rep = " " + a + b + " "
        i = 0
        while (i < syms.length) {
          syms(i) = syms(i).replace(pat, rep).replace(pat, rep)
          i += 1
        }
        def un(x: String) = x.replace(LtEscape, "<")
        merges += Merge(r, un(a), un(b), un(a + b), bestTotal)
      }
      r += 1
    }
    import spark.implicits._
    val out = ws.indices.map(i => (ws(i), cnts(i), syms(i)))
      .toDF("w", "cnt", "sym")
    (merges.toSeq, out)
  }

  /** Distributed fallback for vocabularies beyond [[MaxInlinedVocab]];
    * `cur` is the already-persisted word table. */
  private def learnDistributed(wordTbl: DataFrame, nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    // ONE Spark job per round: round r's pair-count aggregate is the
    // action that materializes cur_r's persist as a side effect, so no
    // separate count() job is needed; cur_{r-1} is unpersisted only
    // AFTER that aggregate ran (its cache fed cur_r's materialization —
    // dropping it earlier would re-derive the whole replace chain).
    var prev: Option[DataFrame] = None
    var cur = wordTbl
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
        // two nested replaces = guaranteed fixpoint (see object scaladoc):
        // pass 1 skips occurrences sharing a delimiter with the previous
        // match; pass 2 catches exactly those (never adjacent to another
        // skip, so no third pass can match)
        val pat = lit(" " + pr + " ")
        val rep = lit(" " + a + b + " ")
        cur = cur.withColumn("sym",
          replace(replace(col("sym"), pat, rep), pat, rep)).persist()
        // the Merge record renders content '<' restored (the loop's pr/a/b
        // stay escaped — they must match the sym strings)
        def un(x: String) = x.replace(LtEscape, "<")
        merges += Merge(r, un(a), un(b), un(a + b), total)
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

  /** Token-ID encoding of a corpus under the LEARNED tokenizer — the
    * tokenize-to-ids step between [[learn]] and sequence packing (the
    * step an LLM data pipeline actually ships to training): every
    * document becomes its dense token-id sequence.
    *
    * IDs are the full vocabulary ranked (weighted count DESC, token ASC)
    * — dense 1..V, deterministic, engine-replayable (the ESCAPED token
    * string orders on both engines; ids are opaque so escaping never
    * surfaces). The id assignment is one vocabulary-sized global sort —
    * the same driver-bounded model-table class as the merge list; at
    * 100 TB the vocabulary is millions of rows, a seconds-long single
    * sort amortized over the corpus-sized encode that follows.
    *
    * Encode shape: per-word symbol-id sequences are built once on the
    * VOCABULARY (two merge-hinted vocabulary joins, ordered collect per
    * word — word-sized lists), then the corpus pays one split + one
    * vocabulary merge join + one per-document ordered reassembly; the
    * shuffle carries (doc, word-position, word-ids) rows, each list
    * bounded by the longest word's symbol count.
    *
    * Output: (id, n_tokens, head_ids) — the full length plus the first
    * `headIds` ids (the gate-friendly prefix; a production encode writes
    * the whole array to parquet the same way). */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
      finalWords: DataFrame, headIds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(headIds >= 1, s"headIds must be >= 1, got $headIds")
    // dense vocabulary ids = global rank by (n DESC, tok ASC). The global
    // window IS single-partition, and that is fine here: the rank runs
    // over the TOKEN table, and BPE tokens are model-sized by
    // construction — |alphabet| + nMerges symbols (PQ-codebook class),
    // never word- or corpus-scale. Alternatives that parallelize the sort
    // (range-partition + per-range offsets) recompute the aggregate on
    // both sides of a driver collect, and RangePartitioner's sampled
    // boundaries are not guaranteed stable across those two executions on
    // a real cluster — a silent mis-rank for a sort that never needed
    // parallelizing.
    val ids = finalWords
      .select(explode(split(col("sym"), " ")).as("tok"), col("cnt"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(sum("cnt").as("n"))
      .withColumn("tok_id",
        row_number().over(Window.orderBy(col("n").desc, col("tok").asc))
          .cast("long"))
      .select("tok", "tok_id")
    val wordIds = finalWords
      .select(col("w"), posexplode(split(col("sym"), " ")).as(Seq("spos", "tok")))
      .filter(col("tok") =!= "")
      .hint("merge").join(ids.hint("merge"), "tok")
      .groupBy("w")
      .agg(sort_array(collect_list(struct(col("spos"), col("tok_id"))))
        .getField("tok_id").as("wids"))
    df.select(idCol.as("id"), posexplode(split(textCol, " ")).as(Seq("wpos", "w")))
      .filter(col("w") =!= "")
      .hint("merge").join(wordIds.hint("merge"), "w")
      .groupBy("id")
      .agg(flatten(sort_array(collect_list(struct(col("wpos"), col("wids"))))
        .getField("wids")).as("ids"))
      .select(col("id"), size(col("ids")).cast("long").as("n_tokens"),
        slice(col("ids"), 1, headIds).as("head_ids"))
  }

  /** Token vocabulary induced by the final symbolization: top-k tokens by
    * weighted frequency (count DESC, token ASC) — the `text_bpe_vocab`
    * entry shape. Vocabulary-sized aggregation + TakeOrdered top-k. */
  def vocab(finalWords: DataFrame, k: Int): DataFrame =
    finalWords
      .select(explode(split(col("sym"), " ")).as("tok"), col("cnt"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(sum("cnt").as("n"))
      // order + top-k on the ESCAPED token (the oracle replays the same),
      // then restore '<' for display — after the aggregate, so a content
      // token that renders as "</w>" stays distinct from the marker
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)
      .select(unescapeTok(col("tok")).as("tok"), col("n"))
      // re-sort on the UNESCAPED form so the presentation order is
      // well-defined independent of the escape codepoint's collation
      .orderBy(col("n").desc, col("tok").asc)
}
