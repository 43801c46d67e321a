package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.SaveMode
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files

/** Physical layout: crc32-partitioned parquet store with per-URI
  * directory pruning (reference TransactionLogic.scala:26-30 scheme). */
class ContentStoreSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def tempStore(): String =
    Files.createTempDirectory("graft-store").toString

  "ContentStore" - {
    "round-trips a log and serves queries" in {
      val r = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}"""),
        WriteOp(2, "PUT", "docs~/b", """{"x":2}"""),
        WriteOp(3, "PUT", "other~/z", """{"x":3}""")))
      val path = tempStore()
      ContentStore.write(r.log, path, SaveMode.Overwrite)
      val st = ContentStore.open(spark, path)
      st.query("docs~").rows.collect()
        .map(_.getAs[String]("item_id")).toSeq shouldBe Seq("a", "b")
      st.get("other~/z").map(_.getAs[String]("body")) shouldBe
        Some("""{"x":3,"id":"z"}""")
    }

    "per-URI reads prune to one directory partition (PartitionFilters)" in {
      val r = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}"""),
        WriteOp(2, "PUT", "other~/z", """{"x":3}""")))
      val path = tempStore()
      ContentStore.write(r.log, path, SaveMode.Overwrite)
      val st = ContentStore.open(spark, path)
      val plan = st.getDF("docs~/a").queryExecution.executedPlan.toString
      val expected = ContentStore.partitionOf("docs~")
      plan should include(s"part#")
      plan should include("PartitionFilters")
      plan should include(s"= $expected)")
    }

    "partitionCol and driver-side partitionOf agree" in {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val uris = Seq("docs~", "other~", "a/b/c", "collection-1~").toDF("u")
      val fromSpark = uris.select(col("u"), ContentStore.partitionCol(col("u")))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      fromSpark.foreach { case (u, p) =>
        ContentStore.partitionOf(u) shouldBe p
      }
    }

    "compaction keeps reads invariant and shrinks to one row per key" in {
      import org.apache.spark.sql.functions.col
      val path = tempStore()
      val r1 = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}"""),
        WriteOp(2, "PUT", "docs~/b", """{"x":2}""")))
      ContentStore.write(r1.log, path, SaveMode.Overwrite)
      val st1 = ContentStore.open(spark, path)
      val r2 = st1.applySeq(Seq(
        WriteOp(3, "PATCH", "docs~/a", """{"y":9}"""),
        WriteOp(4, "DELETE", "docs~/b", null),
        WriteOp(5, "PUT", "docs~/c", """{"x":3}""")))
      ContentStore.write(r2.appended, path) // the delta rows only
      // capture pre-compaction observations NOW: the old file listing is
      // invalid after the swap
      val before = ContentStore.open(spark, path)
      val rowsBefore = before.log.count()
      val revBefore = before.revisionOf("docs~")
      ContentStore.compact(spark, path)
      val after = ContentStore.open(spark, path)
      // reads invariant: latest values, tombstone still hides b,
      // revisions preserved
      after.query("docs~").rows.collect()
        .map(r => r.getAs[String]("item_id") -> r.getAs[String]("body"))
        .toSeq.sorted shouldBe Seq(
          "a" -> """{"x":1,"id":"a","y":9}""", "c" -> """{"x":3,"id":"c"}""")
      // per-collection sequential revisions: batch 2 continues at 3
      after.get("docs~/a").map(_.getAs[Long]("revision")) shouldBe Some(3L)
      after.revisionOf("docs~") shouldBe revBefore
      // physically one row per key (a, b-tombstone, c) < the 5-write log
      val rowsAfter = after.log.count()
      rowsAfter shouldBe 3
      rowsAfter should be < rowsBefore
      // pruning still works on the rewritten layout
      val plan = after.getDF("docs~/a").queryExecution.executedPlan.toString
      plan should include("PartitionFilters")
    }

    "batch-store compaction keeps the newest batch raw for replay" in {
      import org.apache.spark.sql.functions.col
      val path = tempStore()
      // batch 1: three writes, two of them to the same key
      val r1 = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}"""),
        WriteOp(2, "PUT", "docs~/a", """{"x":2}"""),
        WriteOp(3, "PUT", "docs~/b", """{"x":3}""")), batchTsMillis = 60000L)
      ContentStore.writeBatch(r1.appended, path, 60000L)
      // batch 2: one more revision of a
      val st1 = ContentStore.open(spark, path)
      val r2 = st1.applySeq(Seq(
        WriteOp(4, "PATCH", "docs~/a", """{"y":9}""")), batchTsMillis = 120000L)
      ContentStore.writeBatch(r2.appended, path, 120000L)
      ContentStore.compact(spark, path) // default: newest batch stays raw
      val log = spark.read.parquet(path)
      // prefix folded (a@rev2, b@rev3), tail raw (a@rev4 under batch 120000)
      log.count() shouldBe 3
      log.filter(col("batch") === 120000L).count() shouldBe 1
      // a replay of batch 120000 still sees the exact pre-batch state
      val preState = Content.latestRows(log.filter(col("batch") =!= 120000L))
      preState.filter(col("item_id") === "a").collect()
        .map(_.getAs[Long]("revision")).toSeq shouldBe Seq(2L)
      // reads unchanged
      ContentStore.open(spark, path).get("docs~/a")
        .map(_.getAs[String]("body")) shouldBe Some("""{"x":2,"id":"a","y":9}""")
      // explicit full fold once everything is known complete
      ContentStore.compact(spark, path, Some(Long.MaxValue))
      spark.read.parquet(path).count() shouldBe 2
    }

    "a compaction swap that crashed before rename is healed on open" in {
      val path = tempStore()
      val r = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}""")))
      ContentStore.write(r.log, path, SaveMode.Overwrite)
      // simulate the crash window: committed tmp exists, live dir deleted
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(s"$path.compact")
      fs.rename(new org.apache.hadoop.fs.Path(path), tmp)
      val st = ContentStore.open(spark, path) // adopts the tmp
      st.get("docs~/a").map(_.getAs[String]("body")) shouldBe
        Some("""{"x":1,"id":"a"}""")
    }

    "writes after applyOps keep serving (append mode)" in {
      val path = tempStore()
      val r1 = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
        WriteOp(1, "PUT", "docs~/a", """{"x":1}""")))
      ContentStore.write(r1.log, path, SaveMode.Overwrite)
      val st1 = ContentStore.open(spark, path)
      val r2 = st1.applySeq(Seq(WriteOp(2, "PATCH", "docs~/a", """{"y":2}""")))
      // append only the delta rows (the new revisions)
      ContentStore.write(r2.log.filter(org.apache.spark.sql.functions
        .col("revision") > 1), path)
      val st2 = ContentStore.open(spark, path)
      st2.get("docs~/a").map(_.getAs[Long]("revision")) shouldBe Some(2L)
      st2.get("docs~/a").map(_.getAs[String]("body")) shouldBe
        Some("""{"x":1,"id":"a","y":2}""")
    }
  }
}
