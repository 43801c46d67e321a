package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Ledger / recovery semantics (reference scheme.cql:13-29,
  * RecoveryWorker.scala:204-356). */
class LedgerSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def feedOf(uris: (String, Long)*) = {
    import spark.implicits._
    uris.toSeq.map { case (u, rev) => FeedEvent(u, "", "feed:put", rev, "{}") }
      .toDF()
  }

  "Ledger" - {
    "txn ids are deterministic; completion is idempotent" in {
      val l = Ledger.fromFeed(feedOf("a" -> 1L, "b" -> 1L), 60000L)
      val ids = l.select("txn_id").collect().map(_.getString(0)).toSet
      ids shouldBe Set("a/#1", "b/#1")
      val once = Ledger.complete(l, l.filter(col("document_uri") === "a").select("txn_id"))
      val twice = Ledger.complete(once, once.filter(col("document_uri") === "a").select("txn_id"))
      Ledger.incomplete(twice).select("document_uri").collect()
        .map(_.getString(0)).toSeq shouldBe Seq("b")
    }

    "checkpoint is the low-water mark below the first incomplete quantum" in {
      val f = feedOf("a" -> 1L)
      val l1 = Ledger.complete(Ledger.fromFeed(f, 60000L),
        Ledger.fromFeed(f, 60000L).select("txn_id"))  // quantum 1 complete
      val l2 = Ledger.fromFeed(f, 180000L)            // quantum 3 incomplete
      val cp = Ledger.checkpoints(l1.unionByName(l2)).collect()
      cp.length shouldBe 1
      cp(0).getAs[Long]("checkpoint_quantum") shouldBe 2L
    }

    "transaction_list shows a document's pending txns in revision order" in {
      import spark.implicits._
      val feed = Seq(
        FeedEvent("d~", "i2", "feed:put", 2L, "{}"),
        FeedEvent("d~", "i1", "feed:put", 1L, "{}"),
        FeedEvent("d~", "i3", "feed:put", 3L, "{}"),
        FeedEvent("e~", "x", "feed:put", 1L, "{}")).toDF()
      val l = Ledger.complete(Ledger.fromFeed(feed, 60000L),
        feedOf().sparkSession.createDataset(Seq("d~/i2#2")).toDF("txn_id"))
      val rows = Ledger.transactionList(l).orderBy("document_uri").collect()
      rows.map(_.getString(0)).toSeq shouldBe Seq("d~", "e~")
      // revision-ordered, completed txn (i2#2) excluded
      rows(0).getSeq[String](1) shouldBe Seq("d~/i1#1", "d~/i3#3")
      rows(1).getSeq[String](1) shouldBe Seq("e~/x#1")
      // fully-completed documents disappear from the list
      val all = Ledger.complete(l, l.select("txn_id"))
      Ledger.transactionList(all).count() shouldBe 0
    }

    "fully-complete partition checkpoints at its max quantum" in {
      val f = feedOf("a" -> 1L)
      val l = Ledger.complete(Ledger.fromFeed(f, 300000L),
        Ledger.fromFeed(f, 300000L).select("txn_id"))
      Ledger.checkpoints(l).collect()(0)
        .getAs[Long]("checkpoint_quantum") shouldBe 5L
    }

    "recovery work list returns incomplete txns in revision order" in {
      val f = feedOf("a" -> 2L, "a" -> 1L, "b" -> 1L)
      val l = Ledger.fromFeed(f, 60000L)
      val wl = Ledger.recoveryWorkList(l, 0L, 10L).collect()
        .map(r => (r.getAs[String]("document_uri"), r.getAs[Long]("revision"))).toSeq
      wl shouldBe Seq(("a", 1L), ("a", 2L), ("b", 1L))
    }

    "scanCell prunes to one (quantum, partition) cell" in {
      val l = Ledger.fromFeed(feedOf("a" -> 1L, "b" -> 1L), 60000L)
      val part = l.filter(col("document_uri") === "a")
        .select("partition").collect()(0).getInt(0)
      val cell = Ledger.scanCell(l, 1L, part)
      cell.select("document_uri").collect().map(_.getString(0)) should contain("a")
    }
  }
}
