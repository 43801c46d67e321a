package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** The co-location contract: joins and aggregations on the bucket key plan
  * zero Exchange operators over bucketed tables. */
class BucketedStoreSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def withSortMergeOnly[A](f: => A): A = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  "bucketed tables join and aggregate with no shuffle" in withSortMergeOnly {
    import spark.implicits._
    // a fresh (in-memory) catalog doesn't know tables from a previous test
    // JVM, but their warehouse directories survive — clear both layers or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS
    for (t <- Seq("bk_facts", "bk_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val facts = (1 to 1000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "a")
    val dims = (1 to 500).map(i => (i.toLong % 97, i * 1.5)).toDF("k", "b")
    BucketedStore.write(facts, "bk_facts", "k", buckets = 8)
    BucketedStore.write(dims, "bk_dims", "k", buckets = 8)

    val joined = BucketedStore.colocatedJoin(spark, "bk_facts", "bk_dims", "k")
    joined.count() shouldBe
      facts.join(dims, "k").count() // same result as the plain join
    val joinPlan = joined.queryExecution.executedPlan.toString
    joinPlan should not include "Exchange" // neither side shuffles

    val agg = BucketedStore.read(spark, "bk_facts").groupBy("k").count()
    agg.queryExecution.executedPlan.toString should not include "Exchange"

    // a NON-bucketed copy of the same data does shuffle — the contract is
    // the layout, not the data size
    val plain = facts.join(dims, "k")
    plain.queryExecution.executedPlan.toString should include("Exchange")
  }
}
