package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch-shaped decode via
  * mapPartitions, frame explode) is real and tested; the DECODE KERNEL
  * ITSELF IS A STUB — this container has no image/audio codecs, so
  * [[decodeStub]] computes deterministic fake "features" (byte histogram
  * moments) where a real deployment would call the codec. The stub is the
  * only piece to swap. */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Build a binary-media fixture from any (id, text) table: the UTF-8
    * bytes stand in for an encoded blob. Lets every downstream stage run
    * against real distributed binary data without codecs. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("media"),
      struct(lit("blob").as("kind"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate")).as("meta"))

  /** Cheap per-blob metadata (no decode): size + checksum, pure codegen. */
  def withBlobStats(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("media")))
      .withColumn("checksum", crc32(col("media")))

  /** Frame/chunk sampling: split the blob into fixed-size byte windows and
    * keep every `stride`-th one — the Spark-side shape of video frame
    * sampling (row explodes to frames; partitioning carries over). */
  def frameSample(df: DataFrame, chunkBytes: Int, stride: Int = 1): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / chunkBytes).cast("int")
    // empty media ⇒ zero frames (sequence(0, -1) would step DOWN and emit
    // phantom indices [0, -1]); explode of the empty array drops the row.
    // The stride rides in sequence()'s step argument (codegen'd) — a
    // filter(…, i % stride === 0) lambda would evaluate interpreted.
    val idxs = when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame",
        substring(col("media"), col("frame_idx") * chunkBytes + 1, lit(chunkBytes)))
  }

  /** Resize stage STUB: byte-stride subsampling stands in for pixel
    * resampling (a real impl decodes, resamples, re-encodes). Keeps the
    * schema/partitioning contract of a resize: same rows, smaller blobs,
    * meta rewritten. The stride runs in the codegen'd
    * [[graft.functions.ByteStride]] kernel — one linear copy per blob
    * (the previous HOF fold was interpreted AND quadratic in blob size). */
  def resizeStub(df: DataFrame, factor: Int): DataFrame = {
    df.withColumn("media",
        graft.functions.ByteStrideFunctions.byte_stride(col("media"), factor))
      .withColumn("meta", struct(
        col("meta.kind"), (col("meta.width") / factor).cast("int").as("width"),
        (col("meta.height") / factor).cast("int").as("height"),
        col("meta.sample_rate")))
  }

  /** Near-duplicate media pairs by sampled-frame signatures — the
    * multimodal counterpart of shingle dedup: two assets are near-dups
    * when the Jaccard similarity of their DISTINCT frame-checksum sets
    * reaches `minJaccard`. Position-free (a clip shifted in time still
    * matches on content), and the frame checksum is the only thing that
    * ever shuffles — blobs stay in the scan stage.
    *
    * Boilerplate guard: frame hashes appearing in more than `maxDf`
    * assets (black frames, silence, shared intros) are dropped from BOTH
    * the intersection and the set sizes before pairing — the same move as
    * boilerplate line dedup, and the reason the self-join is bounded:
    * candidate pairs ∝ Σ_kept df², with df ≤ maxDf, never |A|×|B|.
    *
    * Plan at 100 TB: frame explode + checksum inside the scan → one
    * two-phase distinct → df filter via a count window PARTITIONED by the
    * checksum (one shuffle, groups bounded by frame multiplicity — never
    * a global sort) → self-join on the checksum key
    * (merge-hinted: both sides are exploded-frame-sized, far beyond any
    * static broadcast estimate) → per-pair count + per-asset totals.
    * Integer counts; the Jaccard division is the single float op.
    *
    * Frame checksums use md5 (not crc32) so the whole operator replays
    * exactly in any SQL engine — crc32 exists in Spark but not DuckDB.
    *
    * Output: (id_a, id_b, matched, nf_a, nf_b, jaccard), id_a < id_b. */
  def frameDedup(df: DataFrame, chunkBytes: Int, maxDf: Int,
      minJaccard: Double): DataFrame = {
    val frames = frameSample(df, chunkBytes)
      .select(col("media_id"), md5(col("frame")).as("fh"))
      .distinct()
    val kept = frames
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fh"))))
      .filter(col("__df") <= maxDf)
      .select(col("media_id"), col("fh"))
      .persist() // totals + both join sides; the 100 TB spill point
    val totals = kept.groupBy("media_id").agg(count(lit(1)).as("nf"))
    val inter = kept.hint("merge").alias("a")
      .join(kept.hint("merge").alias("b"),
        col("a.fh") === col("b.fh") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("matched"))
    // totals is PER-ASSET (corpus-sized at scale) — merge-hint both joins
    // off the broadcast path the tiny local fixture would otherwise pick
    inter.hint("merge")
      .join(totals.select(col("media_id").as("id_a"), col("nf").as("nf_a"))
        .hint("merge"), "id_a")
      .join(totals.select(col("media_id").as("id_b"), col("nf").as("nf_b"))
        .hint("merge"), "id_b")
      .withColumn("jaccard", col("matched").cast("double") /
        (col("nf_a") + col("nf_b") - col("matched")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("matched"),
        col("nf_a"), col("nf_b"), col("jaccard"))
  }

  /** Batch-shaped decode: mapPartitions so a real codec could amortize
    * per-batch setup (model load, decoder context) across rows — the shape
    * a vectorized decode needs. STUB kernel: deterministic byte-histogram
    * moments instead of pixels. */
  def decodeStub(spark: SparkSession, df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded_ok", BooleanType)
      .add("features", ArrayType(DoubleType))
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      // per-partition setup happens once (real impl: decoder init here)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val feats: Array[Double] =
          if (bytes == null) Array.empty
          else {
            // STUB: moments of the byte distribution, deterministic
            val n = bytes.length.toDouble
            val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
            val m2 = if (n == 0) 0.0
              else bytes.map(b => math.pow((b & 0xff) - mean, 2)).sum / n
            Array(n, mean, math.sqrt(m2))
          }
        Row.fromSeq(row.toSeq :+ (bytes != null) :+ feats.toSeq)
      }
    }(enc)
  }
}
