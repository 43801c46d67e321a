package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Bloom membership prefilter: no false negatives, deterministic false
  * positives, saturation degrades to slow-but-correct, probe plan shape. */
class BloomSpec extends AnyFreeSpec with Matchers with SparkFixture {
  import spark.implicits._

  private def batch = (1 to 400).map(i => (i.toLong, s"key-$i"))
    .toDF("id", "k")
  private def ref = batch.filter(col("id") % 5 === 0) // 80 members

  "Bloom.prefilterVerify" - {
    "never drops a true member (no false negatives)" in {
      val got = Bloom.prefilterVerify(batch, ref, "k", m = 1 << 16, j = 3)
      val confirmed = got.filter(col("confirmed"))
        .select("id").collect().map(_.getLong(0)).toSet
      confirmed shouldBe (5 to 400 by 5).map(_.toLong).toSet
    }

    "false positives are deterministic and marked unconfirmed" in {
      // tiny filter (256 bits, 80 keys * 3 hashes) forces false positives
      val a = Bloom.prefilterVerify(batch, ref, "k", m = 256, j = 3)
        .select("id", "confirmed").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      val b = Bloom.prefilterVerify(batch, ref, "k", m = 256, j = 3)
        .select("id", "confirmed").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      a shouldBe b // same FP set on every run
      val fps = a.collect { case (id, false) => id }
      fps.foreach(_ % 5 should not be 0) // FPs are exactly the non-members
      a.collect { case (id, true) => id } should
        contain theSameElementsAs (5 to 400 by 5).map(_.toLong)
    }

    "a saturated filter is slow-but-correct: all rows candidates, exact verify still filters" in {
      val got = Bloom.prefilterVerify(batch, ref, "k", m = 8, j = 2)
      got.count() shouldBe 400L // every row Bloom-hits
      got.filter(col("confirmed")).count() shouldBe 80L
    }

    "the probe is a shuffle-free filter inside the scan" in {
      // parquet-backed input: a local relation would be folded at plan time
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").as("id"), md5(col("text")).as("k"))
      val bits = Bloom.build(ref, col("k"), m = 1 << 16, j = 3)
      val plan = docs.filter(Bloom.probe(col("k"), bits, 1 << 16, 3))
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include("*(1) Filter") // whole-stage-codegen'd stage
    }

    "NULL keys are excluded on both sides (no NPE, no candidate)" in {
      import org.apache.spark.sql.types._
      val rows = java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "present"),
        org.apache.spark.sql.Row(2L, null))
      val schema = StructType(Seq(StructField("id", LongType, false),
        StructField("k", StringType, true)))
      val withNull = spark.createDataFrame(rows, schema)
      val got = Bloom.prefilterVerify(withNull, withNull, "k", m = 256, j = 3)
      got.select("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    }

    "build produces at most min(n*j, m) set bits" in {
      val bits = Bloom.build(ref, col("k"), m = 1 << 16, j = 3)
      val set = bits.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
      set should be <= 240 // 80 keys * 3 hashes
      set should be > 200  // few collisions at this load factor
    }
  }
}
