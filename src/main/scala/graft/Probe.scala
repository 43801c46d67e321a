package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "plans"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (what == "pipe") {
      import spark.implicits._
      import graft.engine._
      val base = java.nio.file.Files.createTempDirectory("probe-pipe").toString
      val (sp, lp) = (s"$base/store", s"$base/ledger")
      def ops(xs: (Long, String, String, String)*) =
        spark.createDataset(xs.map(t => WriteOp(t._1, t._2, t._3, t._4)))
      graft.streaming.FeedPipeline.runBatch(
        ops((1, "PUT", "c~/a", """{"x":1}"""), (2, "PUT", "c~/b", """{"x":2}""")),
        60000L, sp, lp)(e => println(s"SENT1 ${e.item_id}#${e.revision}"))
      println("after b1: " + ContentStore.open(spark, sp).log
        .select("item_id", "revision").collect().toSeq)
      graft.streaming.FeedPipeline.runBatch(
        ops((3, "PATCH", "c~/a", """{"y":9}"""), (4, "DELETE", "c~/b", null)),
        120000L, sp, lp)(e => println(s"SENT2 ${e.item_id}#${e.revision}"))
      println("after b2: " + ContentStore.open(spark, sp).log
        .select("item_id", "revision").collect().toSeq)
      spark.stop(); return
    }
    if (what == "plans") {
      for (q <- Seq("q3_shipping", "q1_agg", "w1_window_rank", "s4_index_scan")) {
        println(s"\n===== $q =====")
        val df = SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        println(plan.linesIterator.take(30).mkString("\n"))
      }
    }
    spark.stop()
  }
}
