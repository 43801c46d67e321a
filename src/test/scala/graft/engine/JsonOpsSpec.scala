package graft.engine

import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** Merge-patch / null-strip semantics (reference PrimaryWorker.scala:45-60,
  * 297-304; fixture HyperStorageSpec.scala:137-152). */
class JsonOpsSpec extends AnyFreeSpec with Matchers {

  "stripNulls" - {
    "removes null-valued fields recursively" in {
      JsonOps.stripNulls("""{"a":1,"b":null,"c":{"d":null,"e":2},"f":[{"g":null,"h":3}]}""") shouldBe
        """{"a":1,"c":{"e":2},"f":[{"h":3}]}"""
    }
    "keeps non-object values" in {
      JsonOps.stripNulls(""""hello"""") shouldBe "\"hello\""
      JsonOps.stripNulls("42") shouldBe "42"
    }
    "is idempotent" in {
      Seq("""{"a":null}""", """{"a":{"b":null},"c":1}""", """{"x":[null,1]}""",
        """{"deep":{"deeper":{"v":null,"w":[{"z":null}]}}}""").foreach { s =>
        val once = JsonOps.stripNulls(s)
        JsonOps.stripNulls(once) shouldBe once
      }
    }
  }

  "mergePatch" - {
    "reference fixture: null deletes, others replace/add" in {
      // HyperStorageSpec.scala:137-152
      val existing = """{"text1":"abc","text2":"klmn"}"""
      val patch = """{"text1":"efg","text2":null,"text3":"zzz"}"""
      JsonOps.mergePatch(existing, patch) shouldBe
        Some("""{"text1":"efg","text3":"zzz"}""")
    }
    "merge is shallow: nested objects replace wholesale" in {
      JsonOps.mergePatch("""{"o":{"a":1,"b":2}}""", """{"o":{"a":9}}""") shouldBe
        Some("""{"o":{"a":9}}""")
    }
    "empty result means no body" in {
      JsonOps.mergePatch("""{"a":1}""", """{"a":null}""") shouldBe None
    }
    "empty patch keeps existing" in {
      JsonOps.mergePatch("""{"a":1}""", "{}") shouldBe Some("""{"a":1}""")
    }
    "non-object patch replaces wholesale" in {
      JsonOps.mergePatch("""{"a":1}""", """"str"""") shouldBe Some("\"str\"")
    }
  }

  "appendId" - {
    "injects id" in {
      JsonOps.appendId("""{"a":1}""", "item1") shouldBe """{"a":1,"id":"item1"}"""
    }
    "overwrites an existing id" in {
      JsonOps.appendId("""{"id":"x","a":1}""", "item1") shouldBe
        """{"id":"item1","a":1}"""
    }
  }

  "extractText" - {
    "walks dotted paths" in {
      JsonOps.extractText("""{"a":{"b":"v"}}""", "a.b") shouldBe Some("v")
      JsonOps.extractText("""{"a":2}""", "a") shouldBe Some("2")
      JsonOps.extractText("""{"a":1}""", "zz") shouldBe None
    }
  }
}
