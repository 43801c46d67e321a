package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

class SkewJoinSpec extends AnyFreeSpec with Matchers with SparkFixture {

  "saltedJoin equals the plain join on skewed data" in {
    import spark.implicits._
    // one heavy-hitter key (0) with 5k rows, a long tail, plus keys with
    // no build-side match and build keys with no probe rows
    val probe = ((1 to 5000).map(i => (0L, i)) ++
      (1 to 200).map(i => (i.toLong % 7 + 1, i)) ++
      Seq((99L, 1))).toDF("k", "v")
    val build = ((0L to 7L) :+ 42L).map(k => (k, s"b$k")).toDF("k", "name")

    val got = SkewJoin.saltedJoin(probe, build, Seq("k"), salts = 8)
    val want = probe.join(build, Seq("k"))
    got.count() shouldBe want.count()
    got.exceptAll(want).count() shouldBe 0L
    want.exceptAll(got).count() shouldBe 0L
    got.columns.toSeq shouldBe want.columns.toSeq // no salt column leaks
  }

  "a MapType probe column is skipped by the default salt, not a crash" in {
    import spark.implicits._
    val probe = (1 to 50).map(i => (i.toLong % 3, i, Map("a" -> i)))
      .toDF("k", "v", "attrs")
    val build = (0L to 2L).map(k => (k, s"b$k")).toDF("k", "name")
    val got = SkewJoin.saltedJoin(probe, build, Seq("k"), salts = 4)
    got.count() shouldBe 50L // analysis used to fail: hash() rejects maps
  }

  "the join key carries the salt (hot key spreads across sub-keys)" in {
    import spark.implicits._
    val probe = (1 to 100).map(i => (0L, i)).toDF("k", "v")
    val build = Seq((0L, "b")).toDF("k", "name")
    val plan = SkewJoin.saltedJoin(probe, build, Seq("k"), salts = 4)
      .queryExecution.executedPlan.toString
    plan should include("__salt") // shuffle/join condition includes the salt
  }
}
