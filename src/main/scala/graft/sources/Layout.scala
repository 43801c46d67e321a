package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton) clustering.
  *
  * A 100 TB table is usually range-filtered on MORE than one column
  * (time AND tenant, doc length AND language bucket, …), but parquet
  * row-group pruning only helps along the sort order. Z-ordering sorts by
  * the bit-interleaving of several dimensions, so rows close in ANY
  * dimension land close on disk and every dimension's min/max footer
  * stats stay tight — one layout serves all of them.
  *
  * The pruning contract (pinned by LayoutSpec): coordinate-wise dominance
  * is order-preserving, `x1 <= x2 && y1 <= y2  ==>  z(x1,y1) <= z(x2,y2)`
  * (interleaving is monotone per coordinate with the other fixed;
  * transitivity chains the two steps). A rectangle query therefore maps
  * to the z-interval of its corners plus a residual filter, and a
  * z-clustered file whose [min,max] z-range misses that interval is
  * skipped without being read.
  *
  * Everything is a static unroll of shift/and/or over the low `bits` of
  * each coordinate — pure codegen'd expressions, replayable verbatim in
  * any SQL engine (the oracle generates the same unrolled formula).
  */
object Layout {

  /** Z-address of two non-negative integer coordinates: bit `i` of `x`
    * goes to position `2i`, bit `i` of `y` to `2i+1`. Coordinates are
    * masked to the low `bits` (caller quantizes wider domains first —
    * e.g. `ts div 3600e3` for hourly cells). `bits <= 31` keeps the
    * address in a positive BIGINT. */
  def zAddress(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same unrolled formula as ANSI-ish SQL text, for replaying the
    * address in an external engine. */
  def zAddressSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster `df` for writing: compute the z-address of (`xCol`, `yCol`),
    * range-partition into `numFiles` splits by it and sort each split.
    * Range partitioning gives files PAIRWISE-DISJOINT z-ranges (pinned by
    * spec) — exactly what footer-stats pruning needs; the sampled range
    * boundaries also equalize file sizes, so a skewed dimension doesn't
    * produce one giant file. One shuffle; the sort is within partitions
    * only (no global merge). The z column is kept (callers typically
    * `.write.parquet(...)` the result and may drop it first). */
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, zName: String = "z"): DataFrame =
    df.withColumn(zName, zAddress(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(zName))
      .sortWithinPartitions(zName)

  /** Small-file compaction planning (the OPTIMIZE/bin-packing shape; the
    * reference's store plays this role via Cassandra compaction —
    * db/scheme.cql:1-11 relies on it to keep one physical row per key).
    * An incrementally-written 100 TB table accumulates millions of
    * undersized files; the planner takes the file INVENTORY (a metadata
    * table: partition, file, bytes — never the data itself) and assigns
    * every undersized file to a rewrite bin of ~`targetBytes`.
    *
    * Semantics (pinned by LayoutSpec): files with `bytes >= targetBytes`
    * are already compact and keep `bin = -1` (left in place — rewriting
    * them would be wasted I/O). Within each partition the undersized
    * files are laid out largest-first (bytes DESC, then file name for
    * determinism) along a virtual byte stream; a file belongs to the bin
    * where its first byte lands (`bin = floor(start_byte/targetBytes)` —
    * the same concat-and-chunk assignment as
    * [[graft.pipeline.Packing.packSequences]]). The operational bounds
    * (pinned by LayoutSpec): every bin holds < 2·targetBytes (member
    * files each < target and first-byte offsets within one bin span <
    * target, so no rewrite task blows up), a partition plans at most
    * `floor((totalSmallBytes-1)/targetBytes)+1` bins (average fill ≈
    * target — the task count shrinks the file count by ~target/avgSize),
    * and bins never span partitions (a rewrite task reads files from one
    * directory). Largest-first keeps tails small but bins are NOT
    * guaranteed >= target individually — a just-overflowed predecessor
    * can leave a short bin; the count bound is the real guarantee.
    *
    * Scale shape: ONE hash shuffle on the partition key + a per-partition
    * window sort over FILE COUNTS (metadata cardinality, not data size);
    * the inventory for a million-file table is a few hundred MB spread
    * over the cluster. Deterministic, so a re-run after a planner crash
    * reproduces the same bins — rewrite tasks are idempotently retryable.
    *
    * Output: the inventory columns plus `start_byte` (the file's offset
    * in its partition's undersized stream; -1 for kept files) and `bin`.
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val small = files.filter(col(bytesCol) < targetBytes)
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val planned = small
      .withColumn("start_byte",
        coalesce(sum(col(bytesCol).cast("long")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start_byte div $targetBytes"))
    files.filter(col(bytesCol) >= targetBytes)
      .withColumn("start_byte", lit(-1L))
      .withColumn("bin", lit(-1L))
      .unionByName(planned)
  }
}
