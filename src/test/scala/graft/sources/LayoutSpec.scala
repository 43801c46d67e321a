package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Z-order layout: address correctness, the dominance (pruning) contract,
  * and disjoint per-file z-ranges from the range-partitioned write. */
class LayoutSpec extends AnyFreeSpec with Matchers with SparkFixture {

  /** Reference Morton interleave, independent of the Column formulation. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  "zAddress matches the reference interleave over a coordinate grid" in {
    import spark.implicits._
    val grid = for (x <- 0L until 33L; y <- 0L until 33L) yield (x, y)
    val got = grid.toDF("x", "y")
      .withColumn("z", Layout.zAddress(col("x"), col("y"), 16))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- grid)
      withClue(s"($x,$y): ") { got((x, y)) shouldBe zRef(x, y, 16) }
  }

  "dominance is order-preserving: a box query maps to one z-interval" in {
    // the pruning contract: x in [xa,xb], y in [ya,yb] implies
    // z in [z(xa,ya), z(xb,yb)] — so a rectangle scan is a z-range scan
    // plus residual filter, and files outside the range are skipped
    val (xa, xb, ya, yb) = (5L, 19L, 7L, 23L)
    val lo = zRef(xa, ya, 16)
    val hi = zRef(xb, yb, 16)
    for (x <- xa to xb; y <- ya to yb) {
      val z = zRef(x, y, 16)
      z should be >= lo
      z should be <= hi
    }
  }

  "zorder writes files with pairwise-disjoint z-ranges" in {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (0L until 4096L).map(i => (i, (i * 2654435761L) % 1024))
      .toDF("id", "len")
    Layout.zorder(df, "id", "len", bits = 16, numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.length should be > 1
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      lo2 should be > hi1 // strictly after: no overlap between files
    }
  }

  "zAddressSql renders the formula Spark computes" in {
    import spark.implicits._
    val df = Seq((37L, 1019L), (0L, 0L), (65535L, 65535L)).toDF("x", "y")
    val viaSql = df.selectExpr(s"${Layout.zAddressSql("x", "y", 16)} AS z")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Layout.zAddress(col("x"), col("y"), 16))
      .collect().map(_.getLong(0)).toSeq
    viaSql shouldBe viaCol
  }

  "a partitionBy(lang) layout prunes lang predicates before IO" in {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-srcpart").toString
    val df = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L),
      (4L, "fr", 40L)).toDF("doc_id", "lang", "n_chars")
    df.write.partitionBy("lang").mode("overwrite").parquet(base)
    val read = spark.read.parquet(base).filter(col("lang") === "en")
    // the predicate lands in PartitionFilters (directory pruning), never
    // in PushedFilters/DataFilters — no non-en file is opened
    val scan = read.queryExecution.executedPlan.toString
    scan should include regex "PartitionFilters: \\[[^\\]]*lang[^\\]]*en[^\\]]*\\]"
    scan should not include regex ("DataFilters: \\[[^\\]]*lang[^\\]]*\\]")
    read.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    // and the partition column round-trips from directory names
    spark.read.parquet(base).select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1) shouldBe df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
  }

  "compactionPlan: hand-checked bins, kept files, and the fill invariant" in {
    import spark.implicits._
    val inv = Seq(
      // partition a: 5 small files, largest-first stream
      // 90, 70, 50, 30, 10 → starts 0, 90, 160, 210, 240
      // target 100 → bins 0, 0, 1, 2, 2
      ("a", "f1", 90L), ("a", "f2", 70L), ("a", "f3", 50L),
      ("a", "f4", 30L), ("a", "f5", 10L),
      // partition b: one file already compact, two small
      ("b", "g1", 100L), ("b", "g2", 60L), ("b", "g3", 60L)
    ).toDF("part", "file", "bytes")
    val plan = Layout.compactionPlan(inv, "part", "file", "bytes", 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    plan(("a", "f1")) shouldBe ((0L, 0L))
    plan(("a", "f2")) shouldBe ((90L, 0L))
    plan(("a", "f3")) shouldBe ((160L, 1L))
    plan(("a", "f4")) shouldBe ((210L, 2L))
    plan(("a", "f5")) shouldBe ((240L, 2L))
    // g1 is at target: kept in place, sentinel offsets
    plan(("b", "g1")) shouldBe ((-1L, -1L))
    plan(("b", "g2")) shouldBe ((0L, 0L))
    plan(("b", "g3")) shouldBe ((60L, 0L))
    plan.size shouldBe inv.count()
  }

  "compactionPlan: the size and count bounds hold; plans are idempotent" in {
    import spark.implicits._
    val target = 1000L
    val inv = (1 to 400).map { i =>
      (s"p${i % 7}", f"f$i%03d", (i * 37 % 900 + 17).toLong)
    }.toDF("part", "file", "bytes")
    val plan = Layout.compactionPlan(inv, "part", "file", "bytes", target)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly the undersized files are binned; the rest keep -1
    plan.foreach { case (_, _, bytes, _, bin) =>
      withClue(s"bytes=$bytes: ") {
        (bin >= 0) shouldBe (bytes < target)
      }
    }
    // every bin rewrites < 2*target bytes (bounded task size) and a
    // partition plans at most floor((total-1)/target)+1 bins (bounded
    // task count => average fill ~ target); bins never span partitions
    // by construction of the per-(part, bin) grouping below
    plan.filter(_._5 >= 0).groupBy(t => (t._1, t._5)).foreach {
      case ((part, bin), files) =>
        withClue(s"$part bin $bin oversized: ") {
          files.map(_._3).sum should be < 2 * target
        }
    }
    plan.filter(_._5 >= 0).groupBy(_._1).foreach { case (part, files) =>
      val total = files.map(_._3).sum
      val bins = files.map(_._5).distinct.size
      withClue(s"$part: $bins bins for $total bytes: ") {
        bins.toLong should be <= (total - 1) / target + 1
      }
    }
    // deterministic: a re-run plans identical bins (idempotent retries)
    val again = Layout.compactionPlan(inv, "part", "file", "bytes", target)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    again.sortBy(t => (t._1, t._2)) shouldBe plan.sortBy(t => (t._1, t._2))
  }
}
