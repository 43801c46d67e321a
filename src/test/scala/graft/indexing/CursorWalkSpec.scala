package graft.indexing

import graft.SparkFixture
import graft.engine._
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

/** O6 property pin: a FULL cursor walk (repeated queryAfter from each
  * page's last row) must equal the unpaginated scan — same rows, same
  * order, no loss, no repeats — for every sort shape × direction ×
  * range-end × page size, on BOTH the primary and the index-served path.
  *
  * The fixture is engineered to stress page boundaries: the numeric sort
  * field comes in runs of 4 equal values (every boundary inside a run
  * exercises the EQ-prefix + id-tiebreak resume clause), every 13th row
  * MISSES the field entirely (boundaries at the null-region edge exercise
  * the normKey t=2 encoding), the text field cycles 5 values, and item ids
  * are written out of order. This is the disjunctive resume-key fold —
  * the code a off-by-one at a page boundary would hide in. */
class CursorWalkSpec extends AnyFreeSpec with Matchers with SparkFixture {

  private val N = 104

  private def storage: HyperStorage = {
    val ops = (0 until N).map { i =>
      val num =
        if (i % 13 == 0) "" else s""""num":${(i / 4) * 10 + 5},"""
      val txt = ('a' + (i % 5)).toChar.toString
      WriteOp(i + 1, "PUT", f"walk~/it${(i * 37) % N}%03d",
        s"""{$num"txt":"$txt","flag":${i % 2}}""")
    }
    HyperStorage(spark,
      HyperStorage(spark, Content.empty(spark)).applySeq(ops).log)
  }

  private def rowIds(rows: Seq[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.getAs[String]("item_id"))

  /** Page until a short/empty page; returns every row in walk order. */
  private def walk(size: Int,
      first: => Seq[org.apache.spark.sql.Row],
      next: org.apache.spark.sql.Row => Seq[org.apache.spark.sql.Row])
      : Seq[org.apache.spark.sql.Row] = {
    val out = Seq.newBuilder[org.apache.spark.sql.Row]
    var page = first
    var guard = 0
    while (page.nonEmpty) {
      out ++= page
      guard += 1
      require(guard <= N + 2, "walk did not terminate — resume key loops")
      page = if (page.size < size) Seq.empty else next(page.last)
    }
    out.result()
  }

  "primary-path cursor walks equal the unpaginated scan" - {
    val cases: Seq[(String, Seq[SortBy], Option[String], Int)] = Seq(
      ("id asc, size 3", Seq(SortBy("id")), None, 3),
      ("num asc (dup runs + missing), size 3", Seq(SortBy("num")), None, 3),
      ("num desc, size 3", Seq(SortBy("num", descending = true)), None, 3),
      ("num asc + txt desc (multi-field), size 2",
        Seq(SortBy("num"), SortBy("txt", descending = true)), None, 2),
      ("txt asc under a range end (num < 200), size 3",
        Seq(SortBy("txt")), Some("num < 200"), 3),
      ("num asc narrowed to one txt value, size 1",
        Seq(SortBy("num")), Some("""txt = "c""""), 1))
    cases.foreach { case (label, sort, filter, size) =>
      label in {
        val st = storage
        val full = rowIds(
          st.query("walk~", filter, sort, size = N + 10).rows.collect().toSeq)
        val walked = rowIds(walk(size,
          st.query("walk~", filter, sort, size = size).rows.collect().toSeq,
          last => st.queryAfter("walk~", last, filter, sort, size)
            .rows.collect().toSeq))
        walked shouldBe full
        walked.distinct.size shouldBe walked.size
      }
    }
  }

  "index-path cursor walks equal the unpaginated scan and stay on the index" - {
    def managed: IndexManager = {
      val im = new IndexManager(storage)
      im.createIndex("walk~", "by_num",
        Seq(IndexSortItem("num", Some("decimal"), Some("asc"))), None)
      im
    }
    val cases: Seq[(String, Seq[SortBy], Option[String], Int)] = Seq(
      ("num asc, size 3", Seq(SortBy("num")), None, 3),
      ("num asc under a range end (num < 300), size 3",
        Seq(SortBy("num")), Some("num < 300"), 3),
      ("num desc (reversed index scan), size 3",
        Seq(SortBy("num", descending = true)), None, 3),
      ("num asc, size 1 (every row a boundary) under num < 100",
        Seq(SortBy("num")), Some("num < 100"), 1))
    cases.foreach { case (label, sort, filter, size) =>
      label in {
        val im = managed
        val (p0, q0) = QueryPlanner.query(im, "walk~", filter, sort, N + 10)
        p0.source shouldBe "by_num"
        val full = rowIds(q0.rows.collect().toSeq)
        val walked = rowIds(walk(size, {
          val (p, q) = QueryPlanner.query(im, "walk~", filter, sort, size)
          p.source shouldBe "by_num"
          q.rows.collect().toSeq
        }, { last =>
          val (p, q) = QueryPlanner.queryAfter(im, "walk~", last, filter, sort, size)
          p.source shouldBe "by_num"
          q.rows.collect().toSeq
        }))
        walked shouldBe full
        walked.distinct.size shouldBe walked.size
      }
    }
  }
}
