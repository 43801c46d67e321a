package graft

import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** SQL function surface (SparkSessionExtensions / registry). */
class GraftExtensionsSpec extends AnyFreeSpec with Matchers with SparkFixture {

  "GraftFunctions" - {
    "register exposes the custom expressions to spark.sql" in {
      GraftFunctions.register(spark)
      spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0) shouldBe 11.0
      spark.sql(
        """SELECT json_merge_patch('{"a":1,"b":2}', '{"b":null,"c":3}') AS m""")
        .collect()(0).getString(0) shouldBe """{"a":1,"c":3}"""
      spark.sql("""SELECT json_null_strip('{"a":null,"b":{"c":null,"d":1}}') AS s""")
        .collect()(0).getString(0) shouldBe """{"b":{"d":1}}"""
      val kept = spark.sql(
        """SELECT hql(body, 'b > 10 and a = "x"') AS keep FROM (
          |  SELECT '{"a":"x","b":12}' AS body UNION ALL
          |  SELECT '{"a":"x","b":5}' AS body) t""".stripMargin)
        .collect().map(_.getBoolean(0)).toSeq
      kept shouldBe Seq(true, false)
    }

    "register exposes the text kernels to spark.sql" in {
      GraftFunctions.register(spark)
      spark.sql("SELECT word_shingles('a b c d', 3) AS s")
        .collect()(0).getSeq[String](0) shouldBe Seq("a b c", "b c d")
      spark.sql("SELECT char_windows('abcdef', 3, 2) AS w")
        .collect()(0).getSeq[String](0) shouldBe Seq("abc", "cde")
      spark.sql("SELECT token_stats('x y x') AS t")
        .collect()(0).getSeq[Long](0) shouldBe Seq(3L, 2L, 2L)
      spark.sql("SELECT word_pairs('a b a b') AS p")
        .collect()(0).getSeq[String](0) shouldBe Seq("a b", "b a", "a b")
      // bigrams of "a b a b a b": "a b"×3, "b a"×2 → top "a b" (3 chars)
      spark.sql("SELECT ngram_stats('a b a b a b', 2) AS g")
        .collect()(0).getSeq[Long](0) shouldBe Seq(5L, 2L, 3L, 3L)
      // fewer than n tokens → all-zero stats
      spark.sql("SELECT ngram_stats('one', 2) AS g")
        .collect()(0).getSeq[Long](0) shouldBe Seq(0L, 0L, 0L, 0L)
      // bit 9 = second byte, lsb+1: 0x0002
      spark.sql("SELECT bitset_contains(X'0002', 9L) AS b")
        .collect()(0).getBoolean(0) shouldBe true
      spark.sql("SELECT bitset_contains(X'0002', 8L) AS b")
        .collect()(0).getBoolean(0) shouldBe false
      // positions past 2³⁴ would wrap the Int byte index without the
      // long-range guard: must be false on the SQL (codegen) path too
      spark.sql("SELECT bitset_contains(b, p) AS r FROM VALUES " +
          "(X'0002', 17179869193L), (X'0002', 34359738375L), " +
          "(X'0002', -9223372036854775808L) AS t(b, p)")
        .collect().map(_.getBoolean(0)).toSeq shouldBe Seq(false, false, false)
      // running EWMA: 4; 0.25·8+0.75·4 = 5; 0.25·2+0.75·5 = 4.25
      spark.sql("SELECT ewma(array(4.0D, 8.0D, 2.0D), 0.25D) AS e")
        .collect()(0).getSeq[Double](0) shouldBe Seq(4.0, 5.0, 4.25)
      // INTEGER-literal alpha is accepted (1 ⇒ pass-through series)
      spark.sql("SELECT ewma(array(4.0D, 8.0D), 1) AS e")
        .collect()(0).getSeq[Double](0) shouldBe Seq(4.0, 8.0)
      // null elements are rejected, never silently read as 0.0
      val ex = intercept[Exception] {
        spark.sql("SELECT ewma(array(1.0D, CAST(NULL AS DOUBLE)), 0.5D) AS e")
          .collect()
      }
      ex.getMessage should include("null")
    }

    "register exposes the sketch aggregates to spark.sql" in {
      GraftFunctions.register(spark)
      // bottom_k_distinct: k smallest distinct longs, duplicates folded
      spark.sql(
        """SELECT bottom_k_distinct(v, 3) AS sk FROM (
          |  SELECT CAST(x AS BIGINT) AS v
          |  FROM VALUES (9),(1),(5),(1),(7),(3) AS t(x)) q""".stripMargin)
        .collect()(0).getSeq[Long](0) shouldBe Seq(1L, 3L, 5L)
      // hll_registers: grouped aggregate; m = 2^4 registers, all >= 0
      val regs = spark.sql(
        """SELECT g, hll_registers(h, 4) AS regs FROM (
          |  SELECT x % 2 AS g,
          |         CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15),
          |                   16, 10) AS BIGINT) AS h
          |  FROM VALUES (1),(2),(3),(4),(5),(6) AS t(x)) q
          |GROUP BY g""".stripMargin).collect()
      regs.length shouldBe 2
      regs.foreach(_.getSeq[Int](1).length shouldBe 16)
    }

    "round-11 additions: chunking, term counts, seq_sum, bottom_k_pairs" in {
      GraftFunctions.register(spark)
      // word_chunks: fixed-width word windows
      spark.sql("SELECT word_chunks('a b c d e', 2) AS c")
        .collect()(0).getSeq[String](0) shouldBe Seq("a b", "c d", "e")
      // term_counts: tf vector in the literal-array term order
      spark.sql("SELECT term_counts('a b a c', array('a', 'c')) AS tc")
        .collect()(0).getSeq[Long](0) shouldBe Seq(2L, 1L)
      // seq_sum: the order-pinned left fold
      spark.sql("SELECT seq_sum(array(1.0d, 2.0d, 4.0d)) AS s")
        .collect()(0).getDouble(0) shouldBe 7.0
      // cdc_chunks are word runs: space-joining them restores the input
      spark.sql("SELECT concat_ws(' ', cdc_chunks('hello world chunk me', 3)) AS r")
        .collect()(0).getString(0) shouldBe "hello world chunk me"
      // bottom_k_pairs: payloads of the k hash-smallest rows, hash order
      spark.sql(
        """SELECT bottom_k_pairs(CAST(x AS BIGINT), CAST(x * 10 AS DOUBLE), 2)
          |         AS p
          |FROM VALUES (9),(1),(5) AS t(x)""".stripMargin)
        .collect()(0).getSeq[Double](0) shouldBe Seq(10.0, 50.0)
      // the term list must be a literal array
      an[Exception] should be thrownBy
        spark.sql("SELECT term_counts('a', array(concat('a','b')))").collect()
      // a NULL element in a FOLDED array literal (the ArrayData branch —
      // reached when a caller hands a pre-folded Literal, not the SQL
      // CreateArray path) raises the same clean IllegalArgumentException
      // as the CreateArray branch, not an NPE from the UTF8String map
      val builder = spark.sessionState.functionRegistry
        .lookupFunctionBuilder(
          org.apache.spark.sql.catalyst.FunctionIdentifier("term_counts"))
        .get
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, StringType}
      intercept[IllegalArgumentException] {
        builder(Seq(Literal("a"),
          Literal.create(Seq("a", null), ArrayType(StringType, true))))
      }.getMessage should include("non-null string literals")
    }

    "kernel size parameters must be plan-time literals" in {
      GraftFunctions.register(spark)
      an[Exception] should be thrownBy
        spark.sql("SELECT char_windows('abc', 1 + 2, 1)").collect()
    }

    "hql rejects a non-literal filter argument" in {
      GraftFunctions.register(spark)
      an[Exception] should be thrownBy
        spark.sql("SELECT hql('{}', concat('a', '>1'))").collect()
    }

    "wrong arity raises a descriptive error, not IndexOutOfBounds" in {
      GraftFunctions.register(spark)
      val e = intercept[Exception] {
        spark.sql("SELECT dot_product(array(1.0d))").collect()
      }
      e.getMessage should include("2 arguments")
    }
  }
}
