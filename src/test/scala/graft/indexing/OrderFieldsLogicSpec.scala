package graft.indexing

import graft.engine.SortBy
import graft.hql._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Port of the reference's OrderFieldsLogicTest.scala:12-265 — sort
  * weighing, CK extraction, resume-key generation. */
class OrderFieldsLogicSpec extends AnyFreeSpec with Matchers {
  private def item(n: String, t: Option[String] = None, o: Option[String] = None) =
    IndexSortItem(n, t, o)

  "weighOrdering" - {
    "equal orders should be 10" in {
      IndexLogic.weighOrdering(Seq(SortBy("a")), Seq(item("a"))) shouldBe 10
      IndexLogic.weighOrdering(Seq(SortBy("a")), Seq(item("a", None, Some("asc")))) shouldBe 10
      IndexLogic.weighOrdering(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a"), item("b", None, Some("desc")))) shouldBe 10
    }
    "empty query orders should be 0" in {
      IndexLogic.weighOrdering(Seq.empty, Seq(item("a"))) shouldBe 0
    }
    "reverse index order should be 5" in {
      IndexLogic.weighOrdering(Seq(SortBy("a", descending = true)), Seq(item("a"))) shouldBe 5
      IndexLogic.weighOrdering(Seq(SortBy("a", descending = true)),
        Seq(item("a", None, Some("asc")))) shouldBe 5
      IndexLogic.weighOrdering(Seq(SortBy("a", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("desc")))) shouldBe 5
      IndexLogic.weighOrdering(Seq(SortBy("a")), Seq(item("a", None, Some("desc")))) shouldBe 5
      IndexLogic.weighOrdering(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")), item("b", None, Some("asc")))) shouldBe 5
    }
    "partially equal order should be 3" in {
      IndexLogic.weighOrdering(Seq(SortBy("a", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("asc")))) shouldBe 3
      IndexLogic.weighOrdering(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")), item("b", None, Some("desc")))) shouldBe 3
      IndexLogic.weighOrdering(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")))) shouldBe 3
    }
    "unequal order should be -10" in {
      IndexLogic.weighOrdering(Seq(SortBy("z")), Seq(item("a"))) shouldBe -10
      IndexLogic.weighOrdering(Seq(SortBy("x", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("asc")))) shouldBe -10
      IndexLogic.weighOrdering(Seq(SortBy("y"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")), item("b", None, Some("desc")))) shouldBe -10
    }
  }

  "extractIndexSortFields" - {
    "equal orders should be extracted totally" in {
      IndexLogic.extractIndexSortFields(Seq(SortBy("a")), Seq(item("a"))) shouldBe
        ((Seq(CkField("t0", ascending = true)), false))
      IndexLogic.extractIndexSortFields(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a"), item("b", Some("decimal"), Some("desc")))) shouldBe
        ((Seq(CkField("t0", ascending = true), CkField("d1", ascending = false)), false))
    }
    "empty query orders should be Seq.empty" in {
      IndexLogic.extractIndexSortFields(Seq.empty, Seq(item("a"))) shouldBe
        ((Seq.empty, false))
    }
    "reverse index order be extracted totally" in {
      IndexLogic.extractIndexSortFields(Seq(SortBy("a", descending = true)),
        Seq(item("a"))) shouldBe ((Seq(CkField("t0", ascending = false)), true))
      IndexLogic.extractIndexSortFields(Seq(SortBy("a", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("desc")))) shouldBe
        ((Seq(CkField("t0", ascending = false), CkField("t1", ascending = true)), true))
      IndexLogic.extractIndexSortFields(Seq(SortBy("a")),
        Seq(item("a", None, Some("desc")))) shouldBe
        ((Seq(CkField("t0", ascending = true)), true))
      IndexLogic.extractIndexSortFields(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")), item("b", None, Some("asc")))) shouldBe
        ((Seq(CkField("t0", ascending = true), CkField("t1", ascending = false)), true))
    }
    "partially equal order should be extracted partially" in {
      IndexLogic.extractIndexSortFields(Seq(SortBy("a", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("asc")))) shouldBe
        ((Seq(CkField("t0", ascending = false)), true))
      IndexLogic.extractIndexSortFields(Seq(SortBy("a"), SortBy("b", descending = true)),
        Seq(item("a", None, Some("desc")), item("b", None, Some("desc")))) shouldBe
        ((Seq(CkField("t0", ascending = true)), true))
    }
    "unequal order should extract Seq.empty" in {
      IndexLogic.extractIndexSortFields(Seq(SortBy("z")), Seq(item("a"))) shouldBe
        ((Seq.empty, false))
      IndexLogic.extractIndexSortFields(Seq(SortBy("x", descending = true), SortBy("b")),
        Seq(item("a"), item("b", None, Some("asc")))) shouldBe ((Seq.empty, false))
    }
  }

  "leastRowsFilterFields" - {
    val isb = Seq(item("a"), item("b"), item("c"), item("d"))
    val body = """{"a":5,"b":1,"c":2,"d":2}"""

    "simple least rows filter" in {
      IndexLogic.leastRowsFilterFields(isb, Seq.empty, 0, false, body, reversed = false) shouldBe
        Seq(FieldFilter("t0", HNumber(5), FilterEq),
          FieldFilter("t1", HNumber(1), FilterEq),
          FieldFilter("t2", HNumber(2), FilterEq),
          FieldFilter("t3", HNumber(2), FilterGt))
    }
    "simple least rows filter (reverse order)" in {
      IndexLogic.leastRowsFilterFields(isb, Seq.empty, 0, false, body, reversed = true) shouldBe
        Seq(FieldFilter("t0", HNumber(5), FilterEq),
          FieldFilter("t1", HNumber(1), FilterEq),
          FieldFilter("t2", HNumber(2), FilterEq),
          FieldFilter("t3", HNumber(2), FilterLt))
    }
    "least rows filter with existing filter" in {
      IndexLogic.leastRowsFilterFields(isb,
        Seq(FieldFilter("t0", HNumber(18), FilterEq)), 0, false, body, false) shouldBe
        Seq(FieldFilter("t1", HNumber(1), FilterEq),
          FieldFilter("t2", HNumber(2), FilterEq),
          FieldFilter("t3", HNumber(2), FilterGt))
    }
    "least rows filter with existing+previous filters" in {
      val body18 = """{"a":18,"b":1,"c":2,"d":2}"""
      IndexLogic.leastRowsFilterFields(isb,
        Seq(FieldFilter("t0", HNumber(18), FilterEq)), 4, true, body18, false) shouldBe
        Seq(FieldFilter("t1", HNumber(1), FilterEq),
          FieldFilter("t2", HNumber(2), FilterGt))
    }
    "least rows filter with existing+previous filters (not reached end)" in {
      val body18 = """{"a":18,"b":1,"c":2,"d":2}"""
      IndexLogic.leastRowsFilterFields(isb,
        Seq(FieldFilter("t0", HNumber(18), FilterEq)), 4, false, body18, false) shouldBe
        Seq(FieldFilter("t1", HNumber(1), FilterEq),
          FieldFilter("t2", HNumber(2), FilterEq),
          FieldFilter("t3", HNumber(2), FilterGt))
    }
    "least rows filter with existing filter(gt) + merge" in {
      val ff = Seq(FieldFilter("t0", HNumber(5), FilterEq),
        FieldFilter("t1", HNumber(0), FilterGt))
      val res = IndexLogic.leastRowsFilterFields(isb, ff, 0, false, body, false)
      res shouldBe Seq(FieldFilter("t1", HNumber(1), FilterEq),
        FieldFilter("t2", HNumber(2), FilterEq),
        FieldFilter("t3", HNumber(2), FilterGt))
      IndexLogic.mergeLeastQueryFilterFields(ff, res) shouldBe Seq(
        FieldFilter("t0", HNumber(5), FilterEq),
        FieldFilter("t1", HNumber(1), FilterEq),
        FieldFilter("t2", HNumber(2), FilterEq),
        FieldFilter("t3", HNumber(2), FilterGt))
    }
    "least rows filter with existing filter(gt) + previous reversed" in {
      val ff = Seq(FieldFilter("t0", HNumber(5), FilterEq),
        FieldFilter("t1", HNumber(3), FilterLt))
      val body2 = """{"a":5,"b":2,"c":2,"d":2}"""
      val res = IndexLogic.leastRowsFilterFields(isb, ff, 4, true, body2, reversed = true)
      res shouldBe Seq(FieldFilter("t1", HNumber(2), FilterEq),
        FieldFilter("t2", HNumber(2), FilterLt))
      IndexLogic.mergeLeastQueryFilterFields(ff, res) shouldBe Seq(
        FieldFilter("t0", HNumber(5), FilterEq),
        FieldFilter("t1", HNumber(2), FilterEq),
        FieldFilter("t2", HNumber(2), FilterLt))
    }
    "range-end detection yields empty" in {
      // boundary value b=3 does not match `b < 3` ⇒ range exhausted
      val ff = Seq(FieldFilter("t1", HNumber(3), FilterLt))
      val body3 = """{"a":5,"b":3,"c":2,"d":2}"""
      IndexLogic.leastRowsFilterFields(isb, ff, 0, false, body3, false) shouldBe Seq.empty
    }
  }

  "tableName / tableFieldName" - {
    "encode the sort spec" in {
      IndexLogic.tableName(Nil) shouldBe "index_content"
      IndexLogic.tableName(Seq(item("a", None, Some("asc")))) shouldBe "index_content_ta0"
      IndexLogic.tableName(Seq(item("d", Some("decimal"), Some("desc")))) shouldBe
        "index_content_dd0"
      IndexLogic.tableFieldName(item("id"), 1, 0) shouldBe "item_id"
      IndexLogic.tableFieldName(item("id"), 2, 0) shouldBe "t0"
    }
  }
}
