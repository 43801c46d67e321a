package graft.hql

import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Port of the reference's FilterFieldsExtractorTest.scala:12-83 —
  * pushdown extraction incl. operand swap, AND-only, multi-field prefix. */
class FieldFiltersSpec extends AnyFreeSpec with Matchers {
  private val idOnly = Seq(SortField("id", "item_id"))

  private def extract(expr: String, fields: Seq[SortField] = idOnly) =
    new FieldFiltersExtractor(fields).extract(HqlParser(expr))

  "FieldFiltersExtractor" - {
    "single gt filter field" in {
      extract(""" id > "10" """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterGt))
    }
    "single lt filter field" in {
      extract(""" id < "10" """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterLt))
    }
    "single gteq filter field" in {
      extract(""" id >= "10" """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterGtEq))
    }
    "single lteq filter field" in {
      extract(""" id <= "10" """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterLtEq))
    }
    "single eq filter field" in {
      extract(""" id = "10" """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterEq))
    }
    "single gt reversed filter field" in {
      extract(""" "10" < id """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterGt))
    }
    "gt filter field with some other field" in {
      extract(""" id > "10" and x < 5 """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterGt))
    }
    "eq filter field with some other fields" in {
      extract(""" id = "10" and x < 5 and z*3 > 24 """) shouldBe
        Seq(FieldFilter("item_id", HText("10"), FilterEq))
    }
    "eq filter multiple fields with some other fields" in {
      val fields = Seq(SortField("id", "t0"), SortField("x", "d1"))
      extract(""" id = "10" and x < 5 and z*3 > 24 and y = 12 """, fields) shouldBe
        Seq(FieldFilter("t0", HText("10"), FilterEq),
          FieldFilter("d1", HNumber(5), FilterLt))
    }
    "gt filter field with or expression shouldn't match" in {
      extract(""" id > "10" or x < 5 """) shouldBe Seq.empty
    }
    "range filter terminates the prefix" in {
      val fields = Seq(SortField("a", "t0"), SortField("b", "d1"))
      extract(""" a > "x" and b = 5 """, fields) shouldBe
        Seq(FieldFilter("t0", HText("x"), FilterGt))
    }
  }
}
