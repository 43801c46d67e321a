package graft.hql

import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers
import AstComparation._

/** Port of the reference's AstComparationTest.scala:11-47 — the index
  * subsumption matrix. */
class AstComparatorSpec extends AnyFreeSpec with Matchers {
  private def cmp(a: String, b: String) =
    AstComparator.compare(HqlParser(a), HqlParser(b))

  "AstComparation" - {
    "Expression can be equal" in {
      cmp("x + 5", "x + 5") shouldBe Equal
      cmp("x > 4", "x > 4") shouldBe Equal
    }

    "Expression can be not equal" in {
      cmp("x + y", "x + 5") shouldBe NotEqual
      cmp("x > 4", "x > 3") shouldBe NotEqual
    }

    "Expression can be wider for `> <`" in {
      cmp("x > 4", "x > 5") shouldBe Wider
      cmp("x >= 4", "x >= 5") shouldBe Wider
      cmp("x < 3", "x < 2") shouldBe Wider
      cmp("x <= 4", "x <= 1") shouldBe Wider
      cmp("x*4 <= 4", "x*4 <= 1") shouldBe Wider
    }

    "Expression can be wider for `has / not`" in {
      cmp("x has [1,2,3]", "x has [1,2]") shouldBe Wider
      cmp("x has not [1,2,3]", "x has not [1,2,3,4]") shouldBe Wider
    }

    "Expression can be wider for `or`" in {
      cmp("x > 5 or y < 2", "x > 5") shouldBe Wider
      cmp("x has [5,1,3,4] or y < 2", "x has [5,1,3]") shouldBe Wider
      cmp("x or y < 2", "y < 2") shouldBe Wider
      cmp("x or y", "y") shouldBe Wider
    }

    "Expression can be wider for `and`" in {
      cmp("x", "x and y = 20") shouldBe Wider
      cmp("x > 5", "x > 5 and y = 20") shouldBe Wider
      cmp("x", "x and y") shouldBe Wider
      cmp("x", "x+1 and y") shouldBe NotEqual
    }

    "constant folding applies before comparison" in {
      cmp("x > 2 + 2", "x > 4") shouldBe Equal
      cmp("x > 2 * 2", "x > 5") shouldBe Wider
    }
  }
}
