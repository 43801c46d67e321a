package graft.engine

import graft.SparkFixture
import graft.indexing.{IndexManager, IndexSortItem, QueryPlanner}
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** EngineMetrics — the per-session counter surface mirroring the
  * reference's metrics module: index choice, rows scanned/accepted/
  * skipped, skip-guard activity, write batches. Counters publish only
  * numbers the query paths already computed; these specs pin the exact
  * values for known fixtures (the s4_index_scan scenario included). */
class EngineMetricsSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private def metrics = EngineMetrics(spark)

  private def freshStorage: HyperStorage = {
    val r = HyperStorage(spark, Content.empty(spark)).applySeq(Seq(
      WriteOp(1, "PUT", "collection-1~/item1", """{"a":"hello","b":100500}"""),
      WriteOp(2, "PUT", "collection-1~/item2", """{"a":"goodbye","b":1}"""),
      WriteOp(3, "PUT", "collection-1~/item3", """{"a":"way way","b":12}""")))
    HyperStorage(spark, r.log)
  }

  "registry basics: unknown reads 0, snapshot diffs, reset clears" in {
    val reg = new EngineMetrics.Registry
    reg.get("nope") shouldBe 0L
    reg.inc("a"); reg.add("a", 2L); reg.add("b", 5L)
    reg.get("a") shouldBe 3L
    reg.snapshot shouldBe Map("a" -> 3L, "b" -> 5L)
    reg.reset()
    reg.snapshot shouldBe Map.empty
  }

  "primary query publishes exact scanned/accepted/skipped from the static agg" in {
    val st = freshStorage
    metrics.reset()
    st.query("collection-1~", Some("""a = "hello"""")).rows.collect()
    metrics.get("query.selects") shouldBe 1L
    metrics.get("query.rows.scanned") shouldBe 3L
    metrics.get("query.rows.accepted") shouldBe 1L
    metrics.get("query.rows.skipped") shouldBe 2L
    metrics.get("query.skip_guard.boundary") shouldBe 0L // page filled early
  }

  "skip-guard rejection is counted" in {
    val st = freshStorage
    metrics.reset()
    a[QuerySkippedRowsLimited] should be thrownBy
      st.query("collection-1~", Some("b > 1000000"), skipMax = 1)
    metrics.get("query.skip_guard.exceeded") shouldBe 1L
  }

  "index-served query reports the chosen index and its skip counts" in {
    // the s4_index_scan shape: filtered index on b, residual narrows it
    val im = new IndexManager(freshStorage)
    im.createIndex("collection-1~", "by_b",
      Seq(IndexSortItem("b", Some("decimal"), Some("asc"))), Some("b > 10"))
    metrics.reset()
    // b>10 rides the index's own membership filter; a="hello" is NOT a
    // typed index column, so it stays residual and rejects one member
    val (plan, q) = QueryPlanner.query(im, "collection-1~",
      Some("""b > 10 and a = "hello""""), Seq(SortBy("b")))
    q.rows.collect()
    plan.source shouldBe "by_b" // the per-query EXPLAIN
    metrics.get("planner.selects") shouldBe 1L
    metrics.get("planner.source.by_b") shouldBe 1L
    metrics.get("planner.source.primary") shouldBe 0L
    // index carries b>10 members (item1, item3); the residual keeps only
    // item1 — one scanned row is a residual reject
    metrics.get("index.rows.scanned") shouldBe 2L
    metrics.get("index.rows.accepted") shouldBe 1L
    metrics.get("index.rows.skipped") shouldBe 1L
    // a fully-pushable residual scans only what the pushdown admits
    metrics.reset()
    val (p2, q2) = QueryPlanner.query(im, "collection-1~",
      Some("b > 100"), Seq(SortBy("b")))
    q2.rows.collect()
    p2.source shouldBe "by_b"
    metrics.get("planner.pushdown.filters") should be >= 1L
    metrics.get("index.rows.scanned") shouldBe 1L
    metrics.get("index.rows.skipped") shouldBe 0L
  }

  "primary-path planner choice is counted too" in {
    val im = new IndexManager(freshStorage)
    metrics.reset()
    val (plan, _) = QueryPlanner.query(im, "collection-1~", None, Nil)
    plan.source shouldBe "primary"
    metrics.get("planner.source.primary") shouldBe 1L
  }

  "write batches are metered" in {
    metrics.reset()
    freshStorage // applySeq inside runs one batch
    metrics.get("write.batches") shouldBe 1L
  }
}
