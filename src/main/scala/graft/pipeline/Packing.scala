package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-batch assembly: assign
  * documents to fixed token-budget packs in a reproducible pseudo-random
  * order (md5 hash order — the same engine-replayable shuffle trick as
  * [[Sampling]]).
  *
  * Semantics: within each shard, documents are laid out contiguously in
  * hash order and a document belongs to the pack where its first token
  * lands (`pack_no = floor(start_tok / budget)`) — concat-and-chunk
  * assignment; a pack can overflow by at most one document tail, and no
  * document is split across shards. `start_tok` is the document's offset
  * in the shard's virtual token stream, so a loader can slice exact
  * budget-sized sequences from it.
  *
  * Shape for 100 TB: ONE shuffle (hash-partition on the shard key), then
  * a per-shard window sort — shards bound both the sort size and the
  * packing parallelism, exactly how a real loader shards its data mix.
  * No global sort, no driver state; thousands of shards spread any corpus.
  */
object Packing {

  /** (doc, shard, pack_no, start_tok) for every input row. `tokenCol` is
    * the document's token count (any deterministic counter; pipelines here
    * use [[TextAnalysis.tokenCount]]). */
  def packSequences(
      df: DataFrame, idCol: String, tokenCount: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val h = Sampling.md5Hash60(col(idCol))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col("*"), h.as("__h"),
        pmod(h, lit(shards.toLong)).as("shard"),
        tokenCount.cast("long").as("__tok"))
      .withColumn("start_tok",
        coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("pack_no", floor(col("start_tok") / budget))
      .drop("__h", "__tok")
  }
}
