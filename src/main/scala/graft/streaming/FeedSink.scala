package graft.streaming

import graft.engine.FeedEvent
import org.apache.spark.sql.SparkSession

/** One open connection to a feed sink, used executor-side for the span of
  * one publish partition. Implementations must tolerate at-least-once
  * redelivery (idempotence on (uri, item, revision) — the reference's
  * Kafka contract, pinned by FakeBrokerSpec). */
trait FeedSink {
  def send(e: FeedEvent): Unit
  def close(): Unit = ()
}

/** S11 sink pluggability: the factory is what ships to executors (a
  * producer/connection is never serializable — each publish partition
  * opens its own sink, sends its ordered run of events, and closes).
  *
  * Deployments select the sink via Spark conf with NO code change here:
  *
  *   spark.graft.feed.sink = com.example.KafkaFeedSinkFactory
  *   spark.graft.feed.sink.option.bootstrap.servers = broker:9092
  *
  * The named class must implement [[FeedSinkFactory]] with either a
  * `(Map[String, String])` constructor (receives every
  * `spark.graft.feed.sink.option.*`, prefix stripped) or a zero-arg one.
  * Unset (the default — this sandbox has no broker) routes to the caller's
  * in-process callback, which is also what FakeBrokerSpec drives the
  * ordering/replay contract through. */
trait FeedSinkFactory extends Serializable {
  /** Called once per publish partition, executor-side. */
  def open(): FeedSink
}

object FeedSink {
  val ConfKey = "spark.graft.feed.sink"
  val OptionPrefix = "spark.graft.feed.sink.option."

  /** The in-process default: every partition "opens" the same callback. */
  final case class Callback(f: FeedEvent => Unit) extends FeedSinkFactory {
    def open(): FeedSink = new FeedSink {
      def send(e: FeedEvent): Unit = f(e)
    }
  }

  /** Resolve the sink factory from Spark conf; unset (or the literal
    * `callback`) keeps the supplied in-process default. */
  def resolve(spark: SparkSession, default: FeedEvent => Unit): FeedSinkFactory =
    spark.conf.getOption(ConfKey) match {
      case None | Some("callback") => Callback(default)
      case Some(clsName) =>
        val opts: Map[String, String] = spark.conf.getAll.collect {
          case (k, v) if k.startsWith(OptionPrefix) =>
            k.stripPrefix(OptionPrefix) -> v
        }
        val cls = Class.forName(clsName)
        require(classOf[FeedSinkFactory].isAssignableFrom(cls),
          s"$ConfKey=$clsName does not implement FeedSinkFactory")
        val withOpts = cls.getConstructors.find(
          _.getParameterTypes.toSeq == Seq(classOf[Map[String, String]]))
        withOpts match {
          case Some(c) => c.newInstance(opts).asInstanceOf[FeedSinkFactory]
          case None =>
            cls.getDeclaredConstructor().newInstance()
              .asInstanceOf[FeedSinkFactory]
        }
    }
}
