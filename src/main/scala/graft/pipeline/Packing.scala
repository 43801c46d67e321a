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

  /** Export-shard manifest for a training run: assign every document to
    * one of `shards` by id hash and reduce each shard to the integrity
    * metadata a loader (or a later audit) verifies the exported files
    * against — row count, token mass, byte mass, id range, and an
    * ORDER-INDEPENDENT content checksum (sum over rows of
    * `contentHash mod p`, p = 1e9+7 — commutative, so the manifest of a
    * shard is identical however its rows were partitioned or ordered
    * when written, and Σ over 2^33 rows still fits a BIGINT).
    *
    * Hash sharding (not round-robin) makes a document's shard stable
    * under corpus growth — an appended batch only ever ADDS rows to a
    * shard, so yesterday's manifest stays a valid prefix check; and the
    * assignment is engine-replayable (md5 order, the [[Sampling]] trick),
    * so an external verifier can recompute any shard's line from the
    * source table alone.
    *
    * Scale shape: one hash-partial aggregation — the map-side combine
    * reduces each input partition to at most `shards` rows before the
    * exchange, so the shuffle moves O(partitions × shards) manifest rows
    * regardless of corpus size. Output: (shard, n_docs, n_tokens,
    * n_bytes, checksum, min_id, max_id), one row per non-empty shard. */
  def shardManifest(
      df: DataFrame, idCol: String, tokenCount: Column,
      byteCount: Column, contentHash: Column, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.select(
        pmod(Sampling.md5Hash60(col(idCol)), lit(shards.toLong)).as("shard"),
        col(idCol).cast("long").as("__id"),
        tokenCount.cast("long").as("__tok"),
        byteCount.cast("long").as("__bytes"),
        pmod(contentHash, lit(1000000007L)).as("__chk"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        sum("__bytes").as("n_bytes"),
        sum("__chk").as("checksum"),
        min("__id").as("min_id"),
        max("__id").as("max_id"))
  }
}
