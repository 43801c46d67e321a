package graft

import graft.engine._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    time("warmup count")(orders.count())
    val log = Content.fromTable(orders, "orders~", "o_orderkey")
    time("fromTable materialize count")(log.count())
    val st = HyperStorage(spark, log)
    time("staticRow")(st.staticRow("orders~"))
    time("staticRow again")(st.staticRow("orders~"))
    time("full o4 query + count") {
      val q = st.query("orders~", filter = Some("o_totalprice > 1000"),
        sort = Seq(SortBy("o_totalprice", descending = true)), size = 50)
      q.rows.count()
    }
    time("result only (skipMax disabled)") {
      val q = st.query("orders~", filter = Some("o_totalprice > 1000"),
        sort = Seq(SortBy("o_totalprice", descending = true)), size = 50,
        skipMax = -1)
      q.rows.count()
    }
    spark.stop()
  }
}
