package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** GraphAnalytics.pageRank — integer-scaled exact PageRank. The reference
  * is an independent driver-side fold over the same integer recurrence, so
  * the distributed result must match it EXACTLY (no tolerance). */
class GraphAnalyticsSpec extends AnyFunSpec with Matchers with SparkFixture {
  import spark.implicits._

  private val Scale = GraphAnalytics.PageRankScale

  /** Driver-side replay of the documented recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      dangling: Boolean = false): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val incoming = edges
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      val g = if (!dangling) 0L
        else nodes.filterNot(outdeg.contains).map(r).sum / n
      r = nodes.map(v =>
        v -> (Scale * 15L / (n * 100L) +
          85L * (incoming.getOrElse(v, 0L) + g) / 100L)
      ).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      dangling: Boolean = false): Map[Long, Long] =
    GraphAnalytics.pageRank(
        edges.toDF("src", "dst"), "src", "dst", iters = iters,
        danglingRedistribution = dangling)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  describe("pageRank") {
    val triangle = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))

    it("matches the driver-side integer recurrence exactly (3 iters)") {
      run(triangle, 3) shouldBe reference(triangle, 3)
    }

    it("matches on a graph with an in-degree-0 source and a dangling sink") {
      // 4 only emits, 5 only receives (dangling: its mass leaks)
      val g = Seq((1L, 2L), (2L, 1L), (4L, 1L), (1L, 5L))
      run(g, 3) shouldBe reference(g, 3)
      // the dangling sink is still ranked (received mass + base)
      run(g, 1).keySet should contain(5L)
    }

    it("total scaled mass never exceeds scale (floor truncation only loses)") {
      val r = run(triangle, 3)
      r.values.sum should be <= Scale
      // and stays within 1% of it on a leak-free graph (every node emits)
      r.values.sum should be >= (Scale * 99L / 100L)
    }

    it("a symmetric cycle ranks uniformly at every iteration count") {
      val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
      val r = run(cycle, 2)
      r.values.toSet.size shouldBe 1
      r(1L) shouldBe Scale / 3 +- 1 // fixpoint of the uniform start
    }

    it("is deterministic across runs") {
      run(triangle, 3) shouldBe run(triangle, 3)
    }

    it("matches the driver recurrence on seeded random graphs (incl. hubs and sinks)") {
      // deterministic LCG — no Math.random in specs; graphs include
      // self-avoiding duplicates-allowed edges, hub skew, and sinks
      def lcg(seed: Long): Iterator[Long] =
        Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)
      for (seed <- Seq(7L, 41L, 1009L)) {
        val rnd = lcg(seed)
        val edges = (1 to 60).map { _ =>
          val a = math.floorMod(rnd.next(), 25L) + 1L
          val b = math.floorMod(rnd.next(), 25L) + 1L
          (a, if (a == b) math.floorMod(b, 24L) + 2L else b) // no self-loop
        }.distinct
        withClue(s"seed $seed: ") {
          run(edges, 3) shouldBe reference(edges, 3)
        }
      }
    }

    it("dangling redistribution matches the recurrence and conserves mass") {
      // star-into-sink: 1..4 → 5, 5 emits nothing. Without redistribution
      // the sink's mass leaks every round; with it, total scaled mass
      // stays within integer-floor loss of scale.
      val g = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (1L, 2L))
      run(g, 4, dangling = true) shouldBe reference(g, 4, dangling = true)
      val withR = run(g, 4, dangling = true).values.sum
      val withoutR = run(g, 4).values.sum
      withR should be > withoutR // leaked mass really is put back
      withR should be >= (Scale * 97L / 100L)
      // seeded random graphs with sinks, redistribution on
      def lcg(seed: Long): Iterator[Long] =
        Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)
      val rnd = lcg(97L)
      val edges = (1 to 50).map { _ =>
        val a = math.floorMod(rnd.next(), 20L) + 1L
        val b = math.floorMod(rnd.next(), 30L) + 1L // dsts 21..30 are sinks
        (a, if (a == b) b + 30L else b)
      }.distinct
      run(edges, 3, dangling = true) shouldBe
        reference(edges, 3, dangling = true)
    }

    it("personalized: matches a driver-side replay of the seeded recurrence") {
      def ppr(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int)
          : Map[Long, Long] = {
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
        val s = nodes.filter(seeds.contains)
        val ns = s.size.toLong
        val outdeg = edges.groupBy(_._1)
          .map { case (a, es) => a -> es.size.toLong }
        var r = nodes.map(v =>
          v -> (if (seeds(v)) Scale / ns else 0L)).toMap
        for (_ <- 1 to iters) {
          val incoming = edges
            .map { case (a, d) => d -> r(a) / outdeg(a) }
            .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
          val g = nodes.filterNot(outdeg.contains).map(r).sum / ns
          r = nodes.map(v => v -> (
            (if (seeds(v)) Scale * 15L / (ns * 100L) else 0L) +
              85L * (incoming.getOrElse(v, 0L) +
                (if (seeds(v)) g else 0L)) / 100L)).toMap
        }
        r
      }
      def runP(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int)
          : Map[Long, Long] =
        GraphAnalytics.personalizedPageRank(
            edges.toDF("src", "dst"), "src", "dst",
            seeds.toSeq.toDF("node"), "node", iters = iters)
          .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      // hand graph with a sink (5) and a node unreachable from the
      // seed (4 has no in-edges): rank(4) must converge to exactly 0
      val g = Seq((1L, 2L), (2L, 1L), (4L, 1L), (1L, 5L))
      val got = runP(g, Set(1L), 3)
      got shouldBe ppr(g, Set(1L), 3)
      got(4L) shouldBe 0L
      // seeded random graphs with sinks and hubs
      def lcg(seed: Long): Iterator[Long] =
        Iterator.iterate(seed)(s =>
          s * 6364136223846793005L + 1442695040888963407L).drop(1)
      for (seed <- Seq(11L, 503L)) {
        val rnd = lcg(seed)
        val edges = (1 to 50).map { _ =>
          val a = math.floorMod(rnd.next(), 20L) + 1L
          val b = math.floorMod(rnd.next(), 30L) + 1L
          (a, if (a == b) b + 30L else b)
        }.distinct
        val seeds = Set(1L, 2L, 3L)
        withClue(s"seed $seed: ") {
          runP(edges, seeds, 3) shouldBe ppr(edges, seeds, 3)
        }
      }
      // seeds covering EVERY node degenerate to uniform teleport: the
      // result must BIT-match pageRank with dangling redistribution
      val allNodes = (g.map(_._1) ++ g.map(_._2)).toSet
      runP(g, allNodes, 4) shouldBe run(g, 4, dangling = true)
      // a seed id absent from the graph is dropped, not invented
      val withGhost = GraphAnalytics.personalizedPageRank(
          g.toDF("src", "dst"), "src", "dst",
          Seq(1L, 999L).toDF("node"), "node", iters = 2)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      withGhost shouldBe ppr(g, Set(1L), 2)
      withGhost.keySet should not contain 999L
      // an effectively-empty seed set fails fast at construction
      an[IllegalArgumentException] should be thrownBy
        GraphAnalytics.personalizedPageRank(
          g.toDF("src", "dst"), "src", "dst",
          Seq(999L).toDF("node"), "node", iters = 2)
    }

    it("long runs checkpoint: plan depth is bounded at iters=20") {
      val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      val df20 = GraphAnalytics.pageRank(g.toDF("src", "dst"), "src", "dst",
        iters = 20, checkpointEvery = 5)
      // lineage is truncated at the round-15 localCheckpoint: the final
      // plan carries at most checkpointEvery rounds of join/agg, not 20
      val lines20 = df20.queryExecution.optimizedPlan.treeString
        .linesIterator.size
      val df5 = GraphAnalytics.pageRank(g.toDF("src", "dst"), "src", "dst",
        iters = 5, checkpointEvery = 100)
      val lines5 = df5.queryExecution.optimizedPlan.treeString
        .linesIterator.size
      lines20 should be <= lines5
      // and the checkpointed run still matches the exact recurrence
      df20.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        reference(g, 20)
    }

    it("rejects a zero-iteration or out-of-range damping request") {
      an[IllegalArgumentException] should be thrownBy
        GraphAnalytics.pageRank(triangle.toDF("src", "dst"), "src", "dst",
          iters = 0)
      an[IllegalArgumentException] should be thrownBy
        GraphAnalytics.pageRank(triangle.toDF("src", "dst"), "src", "dst",
          iters = 1, dampNum = 100, dampDen = 100)
    }
  }

  describe("robustScale") {
    it("centers by the lower median and scales by the MAD, exactly") {
      // dim 0 values: 1, 2, 4, 8 -> n=4, median = value at ceil(2) = 2;
      // deviations |x-2|: 1, 0, 2, 6 -> MAD = value at ceil(2) = 1
      // dim 1 is constant -> mad 0 -> scaled 0
      val df = Seq(
        (1L, Seq(1.0f, 7.0f)), (2L, Seq(2.0f, 7.0f)),
        (3L, Seq(4.0f, 7.0f)), (4L, Seq(8.0f, 7.0f))).toDF("id", "vec")
      val got = Similarity.robustScale(df, "id", "vec")
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
        .toMap
      got((1L, 0)) shouldBe -1.0
      got((2L, 0)) shouldBe 0.0
      got((3L, 0)) shouldBe 2.0
      got((4L, 0)) shouldBe 6.0
      Seq(1L, 2L, 3L, 4L).foreach(id => got((id, 1)) shouldBe 0.0)
    }

    it("odd count: median is the middle order statistic") {
      val df = Seq((1L, Seq(10.0f)), (2L, Seq(30.0f)), (3L, Seq(20.0f)))
        .toDF("id", "vec")
      // median 20 (ceil(1.5)=2nd), deviations 10,10,0 -> MAD = 10
      val got = Similarity.robustScale(df, "id", "vec")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      got(1L) shouldBe -1.0
      got(2L) shouldBe 1.0
      got(3L) shouldBe 0.0
    }
  }

  describe("trianglesPerNode") {
    it("K4, a tailed triangle, and a triangle-free square") {
      // K4 on 1-4: every node is in C(3,2)=3 triangles
      val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
        .toDF("id_a", "id_b")
      GraphAnalytics.trianglesPerNode(k4).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
      // triangle 1-2-3 with tail 3-4: tail node sees none; duplicate
      // and reversed edges must not double-count
      val tailed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L))
        .toDF("id_a", "id_b")
      GraphAnalytics.trianglesPerNode(tailed).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L)
      // 4-cycle without diagonals: zero triangles everywhere
      val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
        .toDF("id_a", "id_b")
      GraphAnalytics.trianglesPerNode(square).collect()
        .map(r => r.getLong(1)).sum shouldBe 0L
    }

    it("plans hash joins only — no cartesian wedge explosion") {
      val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
      val plan = GraphAnalytics.trianglesPerNode(edges)
        .queryExecution.executedPlan.toString
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    }
  }

  describe("edge-cache release") {
    // the loop-invariant withDeg persist must not outlive the call: a
    // long-lived session running many rank jobs would otherwise
    // accumulate one edge-sized cache entry per call (suites run
    // sequentially in the forked test JVM, so the cleared cache-manager
    // state is ours alone)
    it("pageRank (redistribution path) leaves no cache entry behind") {
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L))
        .toDF("src", "dst")
      spark.sharedState.cacheManager.clearCache()
      GraphAnalytics.pageRank(edges, "src", "dst", iters = 3,
        danglingRedistribution = true).count() should be > 0L
      spark.sharedState.cacheManager.isEmpty shouldBe true
      // the PLAIN path keeps its edge cache alive by design (the lazy
      // pruning-transparent plan still references it) — the caller owns
      // the release; see the operator comment
      GraphAnalytics.pageRank(edges, "src", "dst", iters = 3).count()
      spark.sharedState.cacheManager.isEmpty shouldBe false
      spark.sharedState.cacheManager.clearCache()
    }

    it("personalizedPageRank leaves no cache entry behind") {
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
        .toDF("src", "dst")
      val seeds = Seq(1L).toDF("node")
      spark.sharedState.cacheManager.clearCache()
      GraphAnalytics.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 3).count() should be > 0L
      spark.sharedState.cacheManager.isEmpty shouldBe true
    }
  }
}
