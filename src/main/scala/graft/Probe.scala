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
