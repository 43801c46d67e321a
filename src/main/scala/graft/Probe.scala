package graft

import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("minhash_lsh")(println("pairs=" +
      Dedup.minhashDedupPairs(docs, "text", "doc_id").count()))
    time("ngram_jaccard")(println("pairs=" +
      Dedup.ngramJaccardPairs(docs, "text", "doc_id").count()))
    time("simhash")(println("pairs=" +
      Dedup.simhashPairs(docs, "text", "doc_id").count()))
    time("ann_brute")(println("rows=" +
      Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 5).count()))
    time("ann_lsh")(println("rows=" +
      Similarity.annLshTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 5).count()))
    spark.stop()
  }
}
