package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.SparkFixture
import graft.engine._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Config-pluggable sink factory under test: collects into process-global
  * state (local mode: executors share the JVM) and records lifecycle. */
object RecordingSinkState {
  val events = new ConcurrentLinkedQueue[FeedEvent]()
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  @volatile var lastOptions: Map[String, String] = Map.empty
  def reset(): Unit = {
    events.clear(); opens.set(0); closes.set(0); lastOptions = Map.empty
  }
}

/** Callback-side collector: executor closures resolve object statics back
  * in the shared local-mode JVM (a captured local queue would be a
  * serialized COPY and stay empty on the driver). */
object CallbackState {
  val events = new ConcurrentLinkedQueue[FeedEvent]()
  def send(e: FeedEvent): Unit = { events.add(e); () }
}

final case class RecordingSinkFactory(options: Map[String, String])
    extends FeedSinkFactory {
  def open(): FeedSink = {
    RecordingSinkState.opens.incrementAndGet()
    RecordingSinkState.lastOptions = options
    new FeedSink {
      def send(e: FeedEvent): Unit = RecordingSinkState.events.add(e)
      override def close(): Unit = { RecordingSinkState.closes.incrementAndGet(); () }
    }
  }
}

/** S11 sink pluggability: `spark.graft.feed.sink` swaps the publish sink
  * with zero pipeline-code change; unset keeps the in-process callback
  * (the FakeBrokerSpec contract path). */
class FeedSinkSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def ops(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i =>
      WriteOp(i.toLong, "PUT", s"conf-sink~/it$i", s"""{"v":$i}""")).toDS()
  }

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  "unset conf publishes through the caller's callback" in {
    spark.conf.unset(FeedSink.ConfKey)
    CallbackState.events.clear()
    FeedPipeline.runBatch(ops(5), 60000L, tmp("sinkstore"),
      tmp("sinkledger"))(CallbackState.send)
    CallbackState.events.asScala.map(_.item_id).toSet shouldBe
      (1 to 5).map(i => s"it$i").toSet
  }

  "a configured factory class replaces the callback, gets its options, and is closed" in {
    RecordingSinkState.reset()
    CallbackState.events.clear()
    spark.conf.set(FeedSink.ConfKey,
      classOf[RecordingSinkFactory].getName)
    spark.conf.set(FeedSink.OptionPrefix + "bootstrap.servers", "fake:9092")
    try {
      FeedPipeline.runBatch(ops(7), 120000L, tmp("sinkstore2"),
        tmp("sinkledger2"))(CallbackState.send)
    } finally {
      spark.conf.unset(FeedSink.ConfKey)
      spark.conf.unset(FeedSink.OptionPrefix + "bootstrap.servers")
    }
    CallbackState.events.isEmpty shouldBe true // the callback was displaced
    RecordingSinkState.events.asScala.map(_.item_id).toSet shouldBe
      (1 to 7).map(i => s"it$i").toSet
    RecordingSinkState.lastOptions shouldBe Map("bootstrap.servers" -> "fake:9092")
    // one sink per publish partition, every opened sink closed
    RecordingSinkState.opens.get() should be > 0
    RecordingSinkState.closes.get() shouldBe RecordingSinkState.opens.get()
  }

  "a non-factory class is rejected" in {
    spark.conf.set(FeedSink.ConfKey, "java.lang.String")
    try {
      an[Exception] should be thrownBy
        FeedPipeline.runBatch(ops(1), 180000L, tmp("sinkstore3"),
          tmp("sinkledger3"))(_ => ())
    } finally spark.conf.unset(FeedSink.ConfKey)
  }
}
