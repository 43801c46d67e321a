package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The image path is REAL end-to-end on the JDK's own codecs
  * (`javax.imageio`, no extra dependency): [[syntheticPng]] encodes true
  * PNG blobs on the executors, [[decodeImages]] decodes any
  * PNG/JPEG/BMP/GIF blob back to pixels and reduces them to features, and
  * [[resizeImages]] decodes, nearest-neighbor-resamples and re-encodes.
  * All three run in mapPartitions so per-batch codec setup (ImageIO cache
  * off, reader reuse) amortizes across rows — the same batch shape a
  * vectorized video/audio codec would need. */
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

  /** Byte-stride subsampling over opaque (non-image) blobs — keeps the
    * schema/partitioning contract of a downsample (same rows, smaller
    * blobs, meta rewritten) for media kinds the JDK has no codec for
    * (audio/video). The stride runs in the codegen'd
    * [[graft.functions.ByteStride]] kernel — one linear copy per blob.
    * For images use [[resizeImages]], which resamples real pixels. */
  def byteSubsample(df: DataFrame, factor: Int): DataFrame = {
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
      minJaccard: Double): DataFrame =
    frameDedupFromTable(frameChecksumTable(df, chunkBytes), maxDf,
      minJaccard)

  /** The sampled-frame checksum set as a DURABLE artifact: one
    * (media_id, fh) row per distinct sampled-frame md5 per asset —
    * the frame-set analog of the perceptual dHash table
    * ([[fingerprintDedupPairs]]): at 100 TB the blob read + chunk +
    * checksum pass runs ONCE at ingest and lands next to the blobs;
    * every later sweep (re-tuned maxDf / minJaccard, new-batch
    * probes) reads the checksum rows and never touches the media
    * again. Checksums are exact strings, so the stored path pairs
    * identically to the inline [[frameDedup]]. */
  def frameChecksumTable(df: DataFrame, chunkBytes: Int): DataFrame =
    frameSample(df, chunkBytes)
      .select(col("media_id"), md5(col("frame")).as("fh"))
      .distinct()

  /** The frame-set Jaccard sweep over a STORED checksum table —
    * [[frameDedup]]'s serving twin (same split as imageDedupPairs /
    * fingerprintDedupPairs). */
  def frameDedupFromTable(frames: DataFrame, maxDf: Int,
      minJaccard: Double): DataFrame = {
    // per-asset kept-frame count `nf` RIDES each row through the
    // self-join (one window over the cached table) and folds with max()
    // in the pair aggregate, instead of joining a totals table back onto
    // the candidate-sized pair table afterwards — the old shape paid two
    // more exchanges + sorts of the PAIR table (by id_a, then id_b) for
    // a value functionally determined by the pair key (the
    // Dedup.coShingleCounts rework, applied here). Measured (sf0.1,
    // same-session A/B, bit-equal output): 1.38 → 1.03 s.
    val kept = frames.select(col("media_id"), col("fh"))
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fh"))))
      .filter(col("__df") <= maxDf)
      .select(col("media_id"), col("fh"))
      .withColumn("nf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("media_id"))))
      .persist() // both join sides; the 100 TB spill point
    kept.hint("merge").alias("a")
      .join(kept.hint("merge").alias("b"),
        col("a.fh") === col("b.fh") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("matched"),
        max(col("a.nf")).as("nf_a"), max(col("b.nf")).as("nf_b"))
      .withColumn("jaccard", col("matched").cast("double") /
        (col("nf_a") + col("nf_b") - col("matched")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("matched"),
        col("nf_a"), col("nf_b"), col("jaccard"))
  }

  // ---- real image codec path (JDK javax.imageio — no extra deps) -------

  /** Deterministic pixel function shared by [[syntheticPng]] and the
    * DuckDB oracle replay: channel values of pixel (x, y) of image `id`
    * are linear congruences mod 256, so any SQL engine can recompute the
    * exact per-image channel sums the decoder must recover. Width/height
    * vary per id so the decoder can't fake a fixed geometry. */
  private[pipeline] def synthW(id: Long): Int = (4 + Math.floorMod(id, 5L)).toInt
  private[pipeline] def synthH(id: Long): Int = (4 + Math.floorMod(id, 3L)).toInt
  private[pipeline] def synthR(id: Long, x: Int, y: Int): Int =
    Math.floorMod(7L * id + 3L * x + 5L * y, 256L).toInt
  private[pipeline] def synthG(id: Long, x: Int, y: Int): Int =
    Math.floorMod(11L * id + 5L * x + 7L * y, 256L).toInt
  private[pipeline] def synthB(id: Long, x: Int, y: Int): Int =
    Math.floorMod(13L * id + 9L * x + 2L * y, 256L).toInt

  /** Noisy-fixture pixel function for the PERCEPTUAL-DEDUP gate: the
    * linear congruence above is a degenerate dHash fixture (each
    * channel's x-gradient is constant except at mod-256 wraps, so
    * fingerprints collide massively); the middle-square mixer below is
    * pseudo-random per pixel yet still one SQL expression —
    * ((a·b + p·x + q·y + s)² mod 65536) div 256. Geometry 16-22 × 12-16
    * so the 9×8 dHash grid samples distinct pixels. */
  private[pipeline] def noisyW(id: Long): Int = (16 + Math.floorMod(id, 7L)).toInt
  private[pipeline] def noisyH(id: Long): Int = (12 + Math.floorMod(id, 5L)).toInt
  private[pipeline] def noisyChan(a: Long, p: Long, q: Long, s: Long)(
      id: Long, x: Int, y: Int): Int = {
    val v = a * id + p * x + q * y + s
    (Math.floorMod(v * v, 65536L) / 256L).toInt
  }
  private[pipeline] val noisyR = noisyChan(73, 151, 37, 11) _
  private[pipeline] val noisyG = noisyChan(89, 97, 131, 23) _
  private[pipeline] val noisyB = noisyChan(53, 61, 113, 41) _

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One render body for both synthetic-PNG fixtures: (id, basis) rows
    * in, real executor-encoded PNGs out, pixels from the supplied
    * geometry/channel functions of the basis. */
  private def renderPng(df: DataFrame, idCol: String, basisCol: String,
      wf: Long => Int, hf: Long => Int,
      rf: (Long, Int, Int) => Int, gf: (Long, Int, Int) => Int,
      bf: (Long, Int, Int) => Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val basis = if (basisCol == null) idCol else basisCol
    val in = df.select(col(idCol).cast(LongType).as("media_id"),
      col(basis).cast(LongType).as("__basis"))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file spooling
      rows.map { row =>
        val mediaId = row.getLong(0)
        val id = row.getLong(1) // pixel basis
        val w = wf(id); val h = hf(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (rf(id, x, y) << 16) | (gf(id, x, y) << 8) | bf(id, x, y))
            x += 1
          }
          y += 1
        }
        Row(mediaId, encodePng(img), Row("image/png", w, h, 0))
      }
    }(enc)
  }

  /** Image fixture: one REAL (losslessly decodable) PNG per input row,
    * pixels from the deterministic congruence above — encoded with the
    * JDK's PNG writer on the executors, never on the driver. Gives every
    * downstream decode stage true compressed image bytes whose expected
    * features an oracle can replay exactly. `basisCol` (default: the id
    * itself) feeds the pixel congruence, so planted duplicates — distinct
    * media_ids sharing one pixel basis — are one select away. */
  def syntheticPng(df: DataFrame, idCol: String,
      basisCol: String = null): DataFrame =
    renderPng(df, idCol, basisCol, synthW, synthH, synthR, synthG, synthB)

  /** [[syntheticPng]]'s noisy sibling: real PNGs whose pixels come from
    * the middle-square mixer — the fixture for perceptual-dedup gates,
    * where fingerprint entropy matters. Same basis/id contract. */
  def syntheticPngNoisy(df: DataFrame, idCol: String,
      basisCol: String = null): DataFrame =
    renderPng(df, idCol, basisCol, noisyW, noisyH, noisyR, noisyG, noisyB)

  /** Decompression-bomb cap: decoded rasters above this pixel count are
    * treated as undecodable BEFORE the int[w·h] raster is allocated —
    * 64 Mpx ≈ 256 MB of packed ints, far above any legitimate training
    * image and far below a crafted 25000² bomb's 2.5 GB. */
  private[pipeline] val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Guarded blob → (w, h, packed-RGB row-major raster) decode shared by
    * every image path. Returns null for null/undecodable/oversized
    * blobs. NonFatal, not IOException: JDK codecs throw
    * IllegalArgumentException / CMMException / array-bounds errors on
    * malformed data — at crawl scale ANY per-blob failure must land in
    * decoded_ok=false, never kill the task.
    *
    * The bomb cap is enforced from the HEADER, before any raster exists:
    * `reader.getWidth(0)/getHeight(0)` parse only the size fields
    * (PNG IHDR, JPEG SOF, BMP/GIF headers), so a crafted 25000² PNG is
    * rejected for the cost of a few header bytes — `ImageIO.read` would
    * have allocated its ~2.5 GB raster first and died with an OOM Error
    * that NonFatal deliberately does not catch. Dimensions are re-checked
    * on the decoded image (a lying header must not smuggle a bigger
    * raster past the cap), and `getRGB` uses the decoded dimensions. */
  private def decodeRGB(bytes: Array[Byte]): (Int, Int, Array[Int]) =
    if (bytes == null) null
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers == null || !readers.hasNext) null
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val hw = reader.getWidth(0); val hh = reader.getHeight(0)
              if (hw <= 0 || hh <= 0 || hw.toLong * hh > MaxDecodePixels) null
              else {
                val img = reader.read(0)
                if (img == null) null
                else {
                  val w = img.getWidth; val h = img.getHeight
                  if (w.toLong * h > MaxDecodePixels) null
                  // bulk getRGB: one color-model conversion pass, not one
                  // virtual call per pixel (12M calls on a 4000×3000 image)
                  else (w, h, img.getRGB(0, 0, w, h, null, 0, w))
                }
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => null }

  /** Real batch-shaped image decode: `javax.imageio` reads each blob
    * (PNG/JPEG/BMP/GIF — whatever the JDK's registry handles) back to
    * pixels and reduces them to typed features: geometry plus per-channel
    * means (exact integer sums, one final division). Undecodable or null
    * blobs yield `decoded_ok = false` with null features instead of
    * failing the job — at 100 TB some fraction of a crawl is always
    * corrupt. mapPartitions so codec setup is per-batch, not per-row. */
  def decodeImages(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded_ok", BooleanType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("mean_r", DoubleType)
      .add("mean_g", DoubleType)
      .add("mean_b", DoubleType)
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val px = decodeRGB(row.getAs[Array[Byte]](mediaIdx))
        if (px == null)
          Row.fromSeq(row.toSeq ++ Seq(false, null, null, null, null, null))
        else {
          val (w, h, data) = px
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < data.length) {
            val p = data(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          val n = (w.toLong * h).toDouble
          Row.fromSeq(row.toSeq ++ Seq(true, w, h, sr / n, sg / n, sb / n))
        }
      }
    }(enc)
  }

  /** dHash-64 perceptual fingerprint over REAL decoded pixels — the
    * standard difference-hash: nearest-neighbor sample the image to a 9×8
    * luma grid (grid point (i, j) reads source pixel
    * (⌊i·W/9⌋, ⌊j·H/8⌋) — exact integer coordinates, so an oracle can
    * replay the fingerprint analytically from a known pixel function),
    * then bit (j·8 + i) = luma(i+1, j) > luma(i, j). Luma is the integer
    * BT.601 combination 299·R + 587·G + 114·B (un-normalized — the
    * comparison is scale-invariant and stays integer-exact).
    *
    * The 64 bits travel as TWO 32-bit-half BIGINTs (`lo` = bits 0..31,
    * `hi` = bits 32..63): SQL engines reject `1 << 63` on signed 64-bit
    * (DuckDB raises Out of Range), and two halves replay everywhere;
    * Hamming distance is the sum of two bit_count(xor) terms.
    *
    * Output: input row + (decoded_ok, lo, hi); undecodable blobs flag
    * false with null halves, like [[decodeImages]]. */
  def imageDHash(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded_ok", BooleanType)
      .add("lo", LongType)
      .add("hi", LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val px = decodeRGB(row.getAs[Array[Byte]](mediaIdx))
        if (px == null)
          Row.fromSeq(row.toSeq ++ Seq(false, null, null))
        else {
          val (w, h, data) = px
          def luma(i: Int, j: Int): Int = {
            val x = i * w / 9; val y = j * h / 8
            val p = data(y * w + x)
            299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)
          }
          var lo = 0L; var hi = 0L
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              if (luma(i + 1, j) > luma(i, j)) {
                val b = j * 8 + i
                if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
              }
              i += 1
            }
            j += 1
          }
          Row.fromSeq(row.toSeq ++ Seq(true, lo, hi))
        }
      }
    }(enc)
  }

  /** Perceptual image near-dup pairs: images whose dHash fingerprints
    * differ in at most `maxHamming` of 64 bits — the multimodal
    * counterpart of SimHash text dedup, over REAL decoded pixels (a
    * re-encoded, slightly-filtered or resampled copy keeps most gradient
    * bits; byte-level checksums see nothing). Candidates come from
    * banding the 64 bits into `bands` exact chunks (pigeonhole: any pair
    * within maxHamming ≤ bands−1 shares at least one whole band), pair
    * expansion through [[Dedup.bucketPairs]]' occupancy split (bounded
    * buffers, spillable mega-bucket fallback — a viral meme reposted 10⁶
    * times is exactly a mega-bucket), verification is two integer
    * bit_counts where the pair is born. Blobs never shuffle: fingerprints
    * are 16 bytes/image computed in the scan stage.
    *
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def imageDedupPairs(df: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    hammingPairs64(imageDHash(df).filter(col("decoded_ok"))
        .select(col("media_id").as("id"), col("lo"), col("hi")),
      maxHamming, bands, maxBucket)

  /** Banded Hamming-≤t pairing over split-64-bit fingerprints
    * (id, lo, hi) — shared by the image and audio perceptual dedups.
    * Pigeonhole (maxHamming < bands ⇒ some exact band shared) makes the
    * banding LOSSLESS vs brute force; pair expansion goes through
    * [[Dedup.bucketPairs]]' occupancy split. */
  /** Shared pigeonhole preconditions + per-band chunk expressions over a
    * split-64-bit (lo, hi) fingerprint: band b covers bits
    * [b·bits, (b+1)·bits) and, with bits ≤ 32, sits wholly inside one
    * half. bands=1 would pass the pigeonhole and divisibility checks but
    * its 64-bit band mask (1L << 64) − 1 is 0 on the JVM (shift mod 64)
    * — every fingerprint would silently land in one mega-bucket and the
    * banding would degenerate to an all-pairs join; bands ≥ 2 ⇔
    * bits ≤ 32, which is also the one-half invariant. */
  private def bandCols64(maxHamming: Int, bands: Int): Seq[Column] = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < bands: $maxHamming >= $bands")
    require(64 % bands == 0, s"64 bits not divisible by $bands bands")
    require(bands >= 2, s"need bands >= 2 (got $bands): a single 64-bit " +
      "band cannot be masked on the JVM and degenerates to all-pairs")
    val bits = 64 / bands
    (0 until bands).map { b =>
      val start = b * bits
      val half = if (start < 32) col("lo") else col("hi")
      struct(lit(b).as("band"),
        shiftright(half, start % 32).bitwiseAND(lit((1L << bits) - 1))
          .as("bh"))
    }
  }

  private def hammingPairs64(fps: DataFrame, maxHamming: Int, bands: Int,
      maxBucket: Int): DataFrame = {
    val bandCols = bandCols64(maxHamming, bands)
    val pairs = Dedup.bucketPairs(
      fps.select(explode(array(bandCols: _*)).as("b"),
          struct(col("id"), col("lo"), col("hi")).as("m"))
        .select(col("b.band").as("band"), col("b.bh").as("bh"), col("m")),
      Seq("band", "bh"), maxBucket)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
          bit_count(col("a.hi").bitwiseXOR(col("b.hi")))).as("hamming"))
      // threshold BEFORE the cross-band dedup: the distance is a pure
      // function of the pair, so filtering first is semantically
      // identical and the dedup shuffle carries only true near-dups
      // (most band collisions are far pairs)
      .filter(col("hamming") <= maxHamming)
    pairs.groupBy("id_a", "id_b")
      .agg(first(col("hamming")).as("hamming"))
  }

  // ---- real audio codec path (JDK javax.sound.sampled — no extra deps) -

  /** Deterministic PCM sample function shared by [[syntheticWav]] and the
    * oracle replay: sample i of clip `id` is a linear congruence folded
    * into signed 16-bit range, sample count varies per id. */
  private[pipeline] def synthSamples(id: Long): Int =
    (32 + Math.floorMod(id, 17L)).toInt
  private[pipeline] def synthAmp(id: Long, i: Int): Int =
    (Math.floorMod(1103515245L * id + 12345L + 2654435761L * i, 65536L)
      - 32768L).toInt

  /** Noisy-fixture sample function for the ACOUSTIC-DEDUP gate: the
    * linear congruence above is a sawtooth mod 2^16 (the multiplier is
    * linear mod 65536), so gradient fingerprints collide broadly; the
    * middle-square mixer is pseudo-random per sample and still one SQL
    * expression. */
  private[pipeline] def synthAmpNoisy(id: Long, i: Int): Int = {
    val v = 73L * id + 151L * i + 11L
    (Math.floorMod(v * v, 65536L) - 32768L).toInt
  }

  private val WavRate = 8000

  /** Audio fixture: one REAL (losslessly decodable) WAV per input row —
    * PCM signed 16-bit mono little-endian, samples from the congruence
    * above, containerized by the JDK's own WAVE writer on the executors.
    * `basisCol` (default: the id) feeds the sample congruence, so planted
    * duplicate clips are one select away (the [[syntheticPng]] contract). */
  def syntheticWav(df: DataFrame, idCol: String,
      basisCol: String = null, noisy: Boolean = false): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val basis = if (basisCol == null) idCol else basisCol
    val in = df.select(col(idCol).cast(LongType).as("media_id"),
      col(basis).cast(LongType).as("__basis"))
    in.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(
        WavRate.toFloat, 16, 1, true, false) // signed, little-endian
      rows.map { row =>
        val mediaId = row.getLong(0)
        val id = row.getLong(1) // sample basis
        val n = synthSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val a = if (noisy) synthAmpNoisy(id, i) else synthAmp(id, i)
          pcm(2 * i) = (a & 0xff).toByte
          pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(mediaId, bos.toByteArray, Row("audio/wav", 0, 0, WavRate))
      }
    }(enc)
  }

  /** Real batch-shaped audio decode: `javax.sound.sampled` parses the
    * container (WAV/AIFF/AU — the JDK registry), recovers the format and
    * the PCM frames, and reduces them to typed features: sample count,
    * sample rate, exact amplitude sum and peak (all integers — one
    * aggregate-free projection, bit-replayable). Undecodable or null
    * blobs yield `decoded_ok = false` with null features, like
    * [[decodeImages]]. 16-bit PCM assumed for the amplitude features
    * (everything else still reports geometry). */
  def decodeAudio(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded_ok", BooleanType)
      .add("n_samples", LongType)
      .add("sample_rate", IntegerType)
      .add("sum_amp", LongType)
      .add("peak", IntegerType)
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        // container parse AND frame read both inside the guard: a valid
        // RIFF header over truncated data (the crawl norm) throws from
        // readAllBytes, not from getAudioInputStream — and like the image
        // path, NonFatal rather than IOException-only (codec internals
        // throw unchecked exceptions on malformed chunks)
        val parsed =
          if (bytes == null) null
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              (ais.getFormat, ais.readAllBytes())
            } catch { case scala.util.control.NonFatal(_) => null }
        if (parsed == null)
          Row.fromSeq(row.toSeq ++ Seq(false, null, null, null, null))
        else {
          val (fmt, pcm) = parsed
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val n = pcm.length / math.max(1, bytesPerSample)
          if (fmt.getSampleSizeInBits == 16) {
            var sum = 0L; var peak = 0
            var i = 0
            while (i + 1 < pcm.length) {
              val lo = pcm(i) & 0xff
              val hi = pcm(i + 1).toInt
              val a = if (fmt.isBigEndian) ((pcm(i).toInt << 8) | (pcm(i + 1) & 0xff))
                else ((hi << 8) | lo)
              sum += a
              if (math.abs(a) > peak) peak = math.abs(a)
              i += 2
            }
            Row.fromSeq(row.toSeq ++ Seq(true, n.toLong,
              math.round(fmt.getSampleRate), sum, peak))
          } else
            // non-16-bit PCM: geometry is real, amplitude features are
            // NOT computed — emit null, never 0 (a zero sum_amp/peak is
            // indistinguishable from a genuinely silent 16-bit clip, and
            // decodePcm16/audioDHash flag the same blob unusable)
            Row.fromSeq(row.toSeq ++ Seq(true, n.toLong,
              math.round(fmt.getSampleRate), null, null))
        }
      }
    }(enc)
  }

  /** Acoustic dHash over REAL decoded samples — the audio sibling of
    * [[imageDHash]]: nearest-neighbor sample the decoded 16-bit PCM clip
    * at 65 exact integer positions x_i = ⌊i·n/65⌋ and set bit i iff
    * s(x_{i+1}) > s(x_i) — a time-stretched or re-containerized copy of
    * the same waveform keeps its amplitude-gradient signature where a
    * byte checksum sees nothing. Same split-64-bit travel contract as
    * the image hash. Output: input row + (decoded_ok, lo, hi). */
  def audioDHash(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded_ok", BooleanType)
      .add("lo", LongType)
      .add("hi", LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { row =>
        val samples = decodePcm16(row.getAs[Array[Byte]](mediaIdx))
        if (samples == null)
          Row.fromSeq(row.toSeq ++ Seq(false, null, null))
        else {
          val n = samples.length
          var lo = 0L; var hi = 0L
          // a clip too short to carry gradients (n < 2 — even n = 0) is
          // still DECODED fine: decoded_ok stays true (decodeAudio
          // agrees on the same blob) and it hashes to the all-zero
          // fingerprint, the same convention a flat 1×1 image gets
          if (n >= 2) {
            var i = 0
            while (i < 64) {
              val xa = i * n / 65; val xb = (i + 1) * n / 65
              if (samples(xb) > samples(xa)) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
          }
          Row.fromSeq(row.toSeq ++ Seq(true, lo, hi))
        }
      }
    }(enc)
  }

  /** Guarded blob → signed 16-bit sample array decode shared by the
    * acoustic paths: container parse AND frame read inside one NonFatal
    * guard (a truncated RIFF header throws from the read, and codec
    * internals throw unchecked exceptions), frame-length bomb cap before
    * buffering, null for undecodable or non-16-bit blobs. */
  private def decodePcm16(bytes: Array[Byte]): Array[Int] =
    if (bytes == null) null
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) null
        else if (ais.getFrameLength >= 0 &&
          ais.getFrameLength * math.max(1, fmt.getFrameSize) > (1L << 30)) null
        else {
          val pcm = ais.readAllBytes()
          val big = fmt.isBigEndian
          val n = pcm.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) = if (big) ((pcm(2 * i).toInt << 8) | (pcm(2 * i + 1) & 0xff))
              else ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
            i += 1
          }
          out
        }
      } catch { case scala.util.control.NonFatal(_) => null }

  /** Perceptual audio near-dup pairs — [[imageDedupPairs]]' acoustic
    * sibling: clips whose [[audioDHash]] fingerprints differ in at most
    * `maxHamming` of 64 bits, banded lossless (pigeonhole), pair
    * expansion through the occupancy split; blobs never shuffle. */
  def audioDedupPairs(df: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    hammingPairs64(audioDHash(df).filter(col("decoded_ok"))
        .select(col("media_id").as("id"), col("lo"), col("hi")),
      maxHamming, bands, maxBucket)

  /** Banded near-dup pairing over a STORED fingerprint table (id, lo,
    * hi) — the serving shape for both perceptual dedups: at 100 TB the
    * decode + dHash pass runs ONCE at ingest (16 bytes per asset) and is
    * written as a durable parquet artifact next to the blobs; every
    * later dedup sweep (new batch vs corpus, re-tuned maxHamming) reads
    * the fingerprints and never touches a codec again — the
    * index-as-stored-table discipline of [[graft.pipeline.Similarity]]'s
    * ANN tables applied to media. Fingerprints are exact integers, so
    * the stored path pairs identically to [[imageDedupPairs]] /
    * [[audioDedupPairs]] over the same assets. */
  def fingerprintDedupPairs(fps: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    hammingPairs64(fps.select(col("id"), col("lo"), col("hi")),
      maxHamming, bands, maxBucket)

  /** Incremental media dedup: probe a NEW batch's fingerprints against
    * the STORED corpus fingerprint table — the continuous-ingestion
    * shape ([[graft.pipeline.Dedup.minhashDedupAgainstTables]] for
    * media): the corpus table never self-joins, each arriving batch
    * pays only its own banded probe, and flagged assets append their
    * fingerprints to the store afterwards (16 bytes/asset — the append
    * is a parquet `mode("append")` like the BM25/ANN tables).
    *
    * Candidates come from a bipartite equi-join of the two sides' band
    * chunks (pigeonhole: lossless at maxHamming < bands, like
    * [[fingerprintDedupPairs]]); the batch side is typically
    * broadcast-sized, and a viral corpus bucket is a plain skewed
    * equi-join AQE splits — no self-join pair expansion exists in the
    * bipartite form, so no occupancy machinery is needed. Verification
    * is two integer bit_counts where the pair is born.
    *
    * Output: (batch_id, corpus_id, hamming), one row per cross pair
    * within `maxHamming`. Batch and corpus id spaces are the caller's
    * contract to keep disjoint (same as the minhash incremental form). */
  def fingerprintDedupAgainst(batch: DataFrame, corpus: DataFrame,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val bandCols = bandCols64(maxHamming, bands)
    def banded(df: DataFrame, pre: String) = df
      .select(explode(array(bandCols: _*)).as("b"),
        col("id").as(s"${pre}id"), col("lo").as(s"${pre}lo"),
        col("hi").as(s"${pre}hi"))
      .select(col("b.band").as("band"), col("b.bh").as("bh"),
        col(s"${pre}id"), col(s"${pre}lo"), col(s"${pre}hi"))
    banded(batch, "batch_").join(banded(corpus, "corpus_"),
        Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"),
        (bit_count(col("batch_lo").bitwiseXOR(col("corpus_lo"))) +
          bit_count(col("batch_hi").bitwiseXOR(col("corpus_hi"))))
          .as("hamming"))
      // threshold BEFORE the cross-band dedup (same reasoning as the
      // self-join form: distance is a pure pair function, most band
      // collisions are far pairs)
      .filter(col("hamming") <= maxHamming)
      .groupBy("batch_id", "corpus_id")
      .agg(first(col("hamming")).as("hamming"))
  }

  /** Incremental frame-set dedup: probe an arriving batch's frame
    * checksums against the STORED corpus frame table — the
    * continuous-ingestion form of [[frameDedup]] (the corpus never
    * self-joins; each batch pays a bipartite fh equi-join bounded by
    * the corpus df cap). Boilerplate is judged by the CORPUS document
    * frequency — the store knows its dfs, an arriving batch does not —
    * and dropped from BOTH sides before totals, so a batch asset made
    * of corpus boilerplate pairs with nothing instead of everything;
    * a batch frame absent from the corpus keeps counting in the batch
    * total (it dilutes Jaccard exactly as in the self-join form).
    * Both inputs are (media_id, fh) tables ([[frameChecksumTable]]);
    * id spaces disjoint by caller contract.
    *
    * Output: (batch_id, corpus_id, matched, nf_batch, nf_corpus,
    * jaccard) for pairs at `minJaccard` or above. */
  def frameDedupAgainst(batchFrames: DataFrame, corpusFrames: DataFrame,
      maxDf: Int, minJaccard: Double): DataFrame = {
    val boiler = corpusFrames.groupBy("fh")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("fh"))
    // per-asset counts ride the rows through the probe join and fold in
    // the pair aggregate — see frameDedupFromTable (the totals join-back
    // paid two extra exchanges + sorts of the candidate-sized pair table)
    def withNf(df: DataFrame) = df
      .withColumn("nf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("media_id"))))
    val keptC = withNf(corpusFrames.select(col("media_id"), col("fh"))
        .join(boiler, Seq("fh"), "left_anti"))
      .persist() // probe side
    val keptB = withNf(batchFrames.select(col("media_id"), col("fh"))
        .join(boiler, Seq("fh"), "left_anti"))
      .persist()
    keptB.alias("a").hint("merge")
      .join(keptC.alias("b").hint("merge"), col("a.fh") === col("b.fh"))
      .groupBy(col("a.media_id").as("batch_id"),
        col("b.media_id").as("corpus_id"))
      .agg(count(lit(1)).as("matched"),
        max(col("a.nf")).as("nf_batch"), max(col("b.nf")).as("nf_corpus"))
      .withColumn("jaccard", col("matched").cast("double") /
        (col("nf_batch") + col("nf_corpus") - col("matched")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("batch_id"), col("corpus_id"), col("matched"),
        col("nf_batch"), col("nf_corpus"), col("jaccard"))
  }

  /** Real image resize: decode → nearest-neighbor downsample (output
    * pixel (x, y) = input pixel (x·factor, y·factor), so the resampled
    * image is exactly oracle-replayable) → re-encode PNG. Same rows out
    * as in; undecodable blobs pass through unchanged with their original
    * meta. Nearest-neighbor is chosen over area-averaging deliberately:
    * it is the only kernel whose output pixels are exact integers an
    * independent engine can recompute, which is what the correctness gate
    * needs — swapping in `AffineTransformOp.TYPE_BILINEAR` is one line. */
  def resizeImages(df: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val enc = RowEncoder.encoderFor(df.schema)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        // shared guarded decode (NonFatal + bomb cap); undecodable blobs
        // pass through unchanged with their original meta
        val px = decodeRGB(row.getAs[Array[Byte]](mediaIdx))
        if (px == null) row
        else {
          val (w, h, src) = px
          val ow = (w + factor - 1) / factor; val oh = (h + factor - 1) / factor
          val dst = new Array[Int](ow * oh)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              dst(y * ow + x) = src(y * factor * w + x * factor) & 0xffffff
              x += 1
            }
            y += 1
          }
          val out = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          out.setRGB(0, 0, ow, oh, dst, 0, ow)
          val meta = row.getAs[Row](metaIdx)
          val vals = row.toSeq.toArray
          vals(mediaIdx) = encodePng(out)
          vals(metaIdx) = Row(meta.get(0), ow, oh, meta.get(3))
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Aspect-ratio bucketing for image-training batch assembly (the
    * SDXL-style recipe: group images by nearest canonical aspect so a
    * batch resizes to ONE target shape with minimal distortion).
    * Assigns each row the bucket `(bn, bd)` minimizing
    * `|w/h − bn/bd|`, ties to the earliest bucket in `buckets` order —
    * but computed ENTIRELY in integer cross-multiplication:
    * `|w/h − n1/d1| < |w/h − n2/d2|  ⟺  |w·d1 − h·n1|·d2 < |w·d2 − h·n2|·d1`
    * (h, d1, d2 > 0), so the assignment is exact — no float ratio, no
    * engine-dependent rounding — and replays verbatim in any SQL engine
    * ([[aspectBucketSql]] renders the same unrolled comparison chain).
    *
    * A pure codegen'd projection (static unroll over the bucket list,
    * the [[graft.sources.Layout.zAddress]] discipline): no shuffle, no
    * state; the downstream batch assembler groups on (bucket_n,
    * bucket_d). Appends `bucket_n`/`bucket_d` INT columns. */
  def aspectBuckets(df: DataFrame, widthCol: Column, heightCol: Column,
      buckets: Seq[(Int, Int)]): DataFrame = {
    val keys = aspectKeyScale(buckets)
    val w = widthCol.cast("long")
    val h = heightCol.cast("long")
    // k_i = |w·d_i − h·n_i| · (D/d_i): the bucket errors brought to the
    // common denominator D = Π d — exact longs, directly comparable
    val k = buckets.zip(keys).map { case ((n, d), m) =>
      abs(w * d - h * n) * m
    }
    // argmin with ties-to-earliest: index i wins iff it beats every
    // earlier key strictly-or-equal from the left (k_j > k_i for j < i
    // fails ⇒ earlier keeps it) — rendered as a flat CASE chain,
    // O(|buckets|²) comparisons, one codegen'd projection
    val bestIdx = buckets.indices.init.foldRight(
      lit(buckets.size - 1)) { case (i, tail) =>
      val wins = buckets.indices.filter(_ != i).map { j =>
        if (j < i) k(j) > k(i) else k(j) >= k(i)
      }.reduce(_ && _)
      when(wins, lit(i)).otherwise(tail)
    }
    df.withColumn("__bi", bestIdx)
      .withColumn("bucket_n", element_at(
        array(buckets.map { case (n, _) => lit(n) }: _*), col("__bi") + 1))
      .withColumn("bucket_d", element_at(
        array(buckets.map { case (_, d) => lit(d) }: _*), col("__bi") + 1))
      .drop("__bi")
  }

  /** Common-denominator multipliers D/d_i (D = Π d_j), with an overflow
    * guard: keys are err · (D/d) ≤ (w·d + h·n) · D — far inside a long
    * for image geometry and single-digit bucket counts. */
  private def aspectKeyScale(buckets: Seq[(Int, Int)]): Seq[Long] = {
    require(buckets.nonEmpty, "need at least one aspect bucket")
    require(buckets.forall { case (n, d) => n > 0 && d > 0 },
      "aspect buckets must be positive ratios")
    val prod = buckets.map(_._2.toLong).product
    require(prod <= (1L << 40),
      s"bucket denominator product $prod too large for exact long keys")
    buckets.map { case (_, d) => prod / d }
  }

  /** [[aspectBuckets]]' argmin as ANSI-ish SQL over width/height
    * expressions — evaluates to the winning bucket INDEX, identical
    * comparison chain (replay in any engine). */
  def aspectBucketSql(w: String, h: String,
      buckets: Seq[(Int, Int)]): String = {
    val keys = aspectKeyScale(buckets)
    val k = buckets.zip(keys).map { case ((n, d), m) =>
      s"(abs(($w) * $d - ($h) * $n) * $m)"
    }
    buckets.indices.init.foldRight(s"${buckets.size - 1}") { case (i, tail) =>
      val wins = buckets.indices.filter(_ != i).map { j =>
        if (j < i) s"${k(j)} > ${k(i)}" else s"${k(j)} >= ${k(i)}"
      }.mkString(" AND ")
      s"(CASE WHEN $wins THEN $i ELSE $tail END)"
    }
  }
}
