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
