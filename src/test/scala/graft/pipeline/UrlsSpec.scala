package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

class UrlsSpec extends AnyFreeSpec with Matchers with SparkFixture {
  import spark.implicits._

  "Urls.hostOf" - {
    "extracts the lowercased host via split algebra" in {
      val got = Seq(
        "https://WWW.Example.COM/p/1",
        "http://a.b.c/x/y?z=1",
        "https://host:8080/path",     // port kept (stable key, not RFC)
        "ftp://files.example.org").toDF("url")
        .select(Urls.hostOf(col("url"))).collect().map(_.getString(0)).toSeq
      got shouldBe Seq("www.example.com", "a.b.c", "host:8080",
        "files.example.org")
    }

    "takes the FIRST '//' — later ones in paths or params don't win" in {
      val got = Seq(
        "https://a.com/r?u=https://evil.com/x", // redirect param
        "https://a.com//double/slash/path",     // path double-slash
        "no-scheme-at-all/path").toDF("url")    // no '//' => empty host
        .select(Urls.hostOf(col("url"))).collect().map(_.getString(0)).toSeq
      got shouldBe Seq("a.com", "a.com", "")
    }
  }

  "Urls.domainCap" - {
    "keeps at most cap rows per host, deterministically" in {
      val docs = (1 to 300).map { i =>
        (i.toLong, s"https://site${i % 7}.example.com/p/$i")
      }.toDF("id", "url")
      val a = Urls.domainCap(docs, col("url"), col("id"), cap = 5)
      val counts = a.groupBy("host").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts.values.foreach(_ shouldBe 5L) // 7 hosts x ~43 docs, all capped
      val b = Urls.domainCap(docs, col("url"), col("id"), cap = 5)
      a.select("id").collect().map(_.getLong(0)).toSet shouldBe
        b.select("id").collect().map(_.getLong(0)).toSet
    }

    "hosts under the cap pass through whole" in {
      val docs = Seq(
        (1L, "https://small.example.com/a"),
        (2L, "https://small.example.com/b")).toDF("id", "url")
      Urls.domainCap(docs, col("url"), col("id"), cap = 10)
        .count() shouldBe 2L
    }
  }

  "Urls.normalizeUrl" - {
    def norm(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(Urls.normalizeUrl(col("u"))).collect()(0).getString(0)

    "strips fragments and tracking params, keeps real params in order" in {
      norm("https://a.com/p?keep=1&utm_source=x&id=2#frag") shouldBe
        "https://a.com/p?keep=1&id=2"
      norm("https://a.com/p?utm_a=1&fbclid=z&gclid=q") shouldBe
        "https://a.com/p" // query emptied — '?' dropped too
      norm("https://a.com/p?utm_a=1&keep=2") shouldBe
        "https://a.com/p?keep=2" // leading '&' cleaned after the strip
    }

    "lowercases scheme+host only; path stays case-sensitive" in {
      norm("HTTPS://WWW.Example.COM/Path/File?X=1") shouldBe
        "https://www.example.com/Path/File?X=1"
    }

    "degenerate inputs pass through predictably" in {
      norm("no-scheme/Path#f") shouldBe "no-scheme/Path"
      norm("https://h.com") shouldBe "https://h.com"
    }

    "plans zero shuffles (pure projection)" in {
      val df = Seq((1L, "https://A.com/p?utm_a=1")).toDF("id", "url")
        .select(Urls.normalizeUrl(col("url")).as("n"))
      df.queryExecution.executedPlan.toString should not include "Exchange"
    }
  }
}
