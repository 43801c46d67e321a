package graft.engine

import graft.SparkFixture
import graft.hql.FieldResolver
import org.apache.spark.sql.functions._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Port of the reference's CollectionOrderingTest.scala:16-38 over the
  * normalized-sort-key realization ([[HyperStorage.sortColumn]]). */
class CollectionOrderingSpec extends AnyFreeSpec with Matchers with SparkFixture {

  // QueryCollectionsSpec.scala:23-28 fixture
  private val c1 = """{"a":"hello","b":100500,"c":10,"id":"item1"}"""
  private val c2 = """{"a":"goodbye","b":1,"c":20,"id":"item2"}"""
  private val c3 = """{"a":"way way","b":12,"c":10,"id":"item3"}"""

  private def sortIds(sort: SortBy*): Seq[String] = {
    import spark.implicits._
    val df = Seq(("item1", c1), ("item2", c2), ("item3", c3))
      .toDF("item_id", "body")
    val resolver = FieldResolver.json(col("body"))
    df.orderBy(sort.map(HyperStorage.sortColumn(_, resolver)) :+ col("item_id").asc: _*)
      .select("item_id").collect().map(_.getString(0)).toSeq
  }

  "CollectionOrdering" - {
    "sort" in {
      sortIds(SortBy("a")) shouldBe Seq("item2", "item1", "item3")
    }
    "sort descending" in {
      sortIds(SortBy("a", descending = true)) shouldBe Seq("item3", "item1", "item2")
    }
    "sort two fields" in {
      sortIds(SortBy("c"), SortBy("a")) shouldBe Seq("item1", "item3", "item2")
    }
    "sort descending two fields" in {
      sortIds(SortBy("c", descending = true), SortBy("a")) shouldBe
        Seq("item2", "item1", "item3")
    }
    "numbers compare numerically, not as text" in {
      // b: 1 < 12 < 100500 (text ordering would give 1, 100500, 12)
      sortIds(SortBy("b")) shouldBe Seq("item2", "item3", "item1")
    }
    "missing field sorts last ascending" in {
      import spark.implicits._
      val df = Seq(("i1", """{"x":"b"}"""), ("i2", "{}"), ("i3", """{"x":"a"}"""))
        .toDF("item_id", "body")
      val resolver = FieldResolver.json(col("body"))
      df.orderBy(HyperStorage.sortColumn(SortBy("x"), resolver))
        .select("item_id").collect().map(_.getString(0)).toSeq shouldBe
        Seq("i3", "i1", "i2")
    }
  }
}
