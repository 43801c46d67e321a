package graft.streaming

import graft.SparkFixture
import graft.engine.{FeedEvent, WriteOp}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** Collects deliveries across executor threads (local mode: same JVM).
  * Keyed idempotently on (uri, item, revision) — the reference's
  * completed_at contract. */
object TestSink {
  val delivered = new TrieMap[(String, String, Long), String]()
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failOn: Option[String] = None

  def send(e: FeedEvent): Unit = {
    attempts.incrementAndGet()
    if (failOn.contains(e.item_id)) {
      failOn = None // fail exactly once, like the reference's faulty transport
      throw new RuntimeException(s"faulty publish for ${e.item_id}")
    }
    delivered.put((e.document_uri, e.item_id, e.revision), e.method)
  }

  def reset(): Unit = { delivered.clear(); attempts.set(0); failOn = None }
}

/** ST1/ST2/ST6 — gapless streaming revisions, per-key ordering,
  * at-least-once redelivery after a faulty publish (port of the reference
  * HyperStorageSpec.scala:298-372 faulty-transport scenario). */
class ChangeFeedSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def newCheckpoint(): String =
    Files.createTempDirectory("graft-ckpt").toString

  "ChangeFeed" - {
    "assigns gapless revisions per document across micro-batches (ST6)" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val source = MemoryStream[WriteOp]
      val feed = ChangeFeed.assignRevisions(source.toDS())
      val q = feed.writeStream.format("memory").queryName("revs")
        .option("checkpointLocation", newCheckpoint())
        .outputMode("append").start()
      try {
        source.addData(
          WriteOp(1, "PUT", "docs~/a", "{}"),
          WriteOp(2, "PUT", "docs~/b", "{}"),
          WriteOp(3, "PUT", "other~/z", "{}"))
        q.processAllAvailable()
        source.addData(WriteOp(4, "PATCH", "docs~/a", "{}"))
        q.processAllAvailable()
        val rows = spark.table("revs").as[FeedEvent].collect()
        val docs = rows.filter(_.document_uri == "docs~").sortBy(_.revision)
        docs.map(e => (e.item_id, e.method, e.revision)).toSeq shouldBe Seq(
          ("a", "feed:put", 1L), ("b", "feed:put", 2L), ("a", "feed:patch", 3L))
        rows.filter(_.document_uri == "other~")
          .map(_.revision).toSeq shouldBe Seq(1L)
      } finally q.stop()
    }

    "end-to-end streaming CRUD: ops stream → state store → queries (ST6+S6)" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      import graft.engine._
      val storePath = Files.createTempDirectory("graft-stream-store").toString
      val source = MemoryStream[WriteOp]
      // the write pipeline: each micro-batch folds through applyOps (per-key
      // serialized) and appends the produced revisions to the content store
      val q = source.toDS().writeStream
        .option("checkpointLocation", newCheckpoint())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[WriteOp], _: Long) =>
          val s = batch.sparkSession
          val existing =
            if (new java.io.File(storePath).listFiles() != null &&
              new java.io.File(storePath).list().nonEmpty)
              ContentStore.open(s, storePath)
            else HyperStorage(s, Content.empty(s))
          val before = existing.revisionOf("c~")
          val r = existing.applyOps(batch)
          ContentStore.write(
            r.log.filter(org.apache.spark.sql.functions.col("revision") > before),
            storePath)
        }.start()
      try {
        source.addData(WriteOp(1, "PUT", "c~/a", """{"x":1}"""))
        q.processAllAvailable()
        source.addData(WriteOp(2, "PATCH", "c~/a", """{"y":2}"""),
          WriteOp(3, "PUT", "c~/b", """{"x":9}"""))
        q.processAllAvailable()
      } finally q.stop()
      val st = ContentStore.open(spark, storePath)
      st.revisionOf("c~") shouldBe 3
      st.get("c~/a").map(_.getAs[String]("body")) shouldBe
        Some("""{"x":1,"id":"a","y":2}""")
      st.query("c~").rows.collect().map(_.getAs[String]("item_id")).toSeq shouldBe
        Seq("a", "b")
    }

    "delivers at-least-once with idempotent completion after a faulty publish (ST2)" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      TestSink.reset()
      TestSink.failOn = Some("i2")
      val ckpt = newCheckpoint()
      val source = MemoryStream[WriteOp]
      val feed = ChangeFeed.assignRevisions(source.toDS())
      source.addData(
        WriteOp(1, "PUT", "c~/i1", "{}"),
        WriteOp(2, "PUT", "c~/i2", "{}"),
        WriteOp(3, "PUT", "c~/i3", "{}"))

      // first attempt: the publish of i2 fails ⇒ the batch (and query) fail
      val q1 = ChangeFeed.deliver(feed, ckpt)(TestSink.send)
      val failed = intercept[Exception] { q1.processAllAvailable() }
      failed.getMessage should include("faulty publish")
      q1.stop()
      TestSink.delivered.keySet.map(_._2) should not contain "i2"

      // restart from the same checkpoint: the batch REPLAYS (at-least-once;
      // already-delivered events arrive again — idempotent map absorbs them)
      val attemptsBefore = TestSink.attempts.get()
      val q2 = ChangeFeed.deliver(feed, ckpt)(TestSink.send)
      try {
        q2.processAllAvailable()
      } finally q2.stop()
      TestSink.attempts.get() should be > attemptsBefore
      TestSink.delivered.keySet.map(_._2) shouldBe Set("i1", "i2", "i3")
      // per-document revisions are intact and gapless after redelivery
      TestSink.delivered.keys.toSeq.filter(_._1 == "c~").map(_._3).sorted shouldBe
        Seq(1L, 2L, 3L)
    }
  }

  "StreamingMetrics" - {
    "meters triggers and input rows through a real micro-batch run" in {
      implicit val sql = spark.sqlContext
      import spark.implicits._
      val reg = graft.engine.EngineMetrics(spark)
      reg.reset()
      val listener = StreamingMetrics.attach(spark)
      val source = MemoryStream[WriteOp]
      val q = ChangeFeed.assignRevisions(source.toDS())
        .writeStream.format("memory").queryName("metered")
        .option("checkpointLocation", newCheckpoint())
        .outputMode("append").start()
      try {
        source.addData(
          WriteOp(1, "PUT", "m~/a", "{}"), WriteOp(2, "PUT", "m~/b", "{}"))
        q.processAllAvailable()
        source.addData(WriteOp(3, "PATCH", "m~/a", "{}"))
        q.processAllAvailable()
      } finally {
        q.stop()
        // progress events post asynchronously on the listener bus —
        // poll until the 3 input rows have landed (bounded wait)
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (reg.get("stream.rows") < 3L && System.nanoTime() < deadline)
          Thread.sleep(50)
        spark.streams.removeListener(listener)
      }
      reg.get("stream.queries.started") shouldBe 1L
      reg.get("stream.rows") shouldBe 3L
      reg.get("stream.rows.metered") shouldBe 3L
      reg.get("stream.triggers") should be >= 2L
    }
  }
}
