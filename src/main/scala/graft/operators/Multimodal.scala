package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side architecture is real and tested — schema contract,
  * partition sizing, per-partition batched iteration (the Scala analog
  * of `mapInPandas` batch shape), and a deterministic metadata pipeline.
  * Image decode is REAL for formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[decodeOne]]); feature
  * extraction is a REAL fixed random projection of the decoded
  * statistics ([[extractFeatures]]). Payloads with no installed
  * reader (and the frame-sampling stub, which stands in for a video
  * codec) fall back to deterministic MD5-derived values, keeping
  * every pipeline total and oracle-checkable.
  */
object Multimodal {

  /** Canonical multimodal schema: id, modality tag, opaque payload,
    * typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap a text table into the media schema (payload = UTF-8 bytes) —
    * the test-data stand-in for a real binary-blob table. Pure Column
    * ops; stays in codegen. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String, modality: String = "image"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("content"),
      struct(col(sourceCol).as("source"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: deterministic pseudo image properties from the MD5 of
    * the content bytes (the fallback for payloads no installed codec
    * can read; see [[decodeOne]]). MD5-derived so an ANSI SQL oracle
    * can recompute the exact values: width/height from the first two
    * 16-bit words of the digest, mean_px from byte 4. */
  private[operators] def fakeDecode(content: Array[Byte]): (Int, Int, Double) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    val w16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    val h16 = ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    (64 + w16 % 448, 64 + h16 % 448, (d(4) & 0xff).toDouble)
  }

  /** Real decode: `javax.imageio` (JDK platform API — PNG/BMP/GIF/JPEG,
    * zero added dependencies) gives true width/height and the mean over
    * all RGB channel values. Payloads ImageIO has no reader for (e.g.
    * the text-backed test fixture) fall back to the deterministic
    * [[fakeDecode]] stub, so the metadata pipeline is total either way.
    * ImageIO's disk cache is disabled once per JVM: a temp-file write
    * per decoded row would turn a CPU-bound map stage into an IO-bound
    * one. */
  /** Magic-byte gate for the decode attempt: PNG/JPEG/GIF/BMP/TIFF —
    * every format the JDK's ImageIO ships a reader for except the
    * magic-less WBMP (whose reader "detects" by heuristic; a corpus
    * relying on WBMP should decode explicitly). Probing ImageIO's
    * reader registry costs an ImageInputStream + per-reader sniff PER
    * PAYLOAD, which at frame granularity dominated the fingerprint
    * pass (measured on mm_frame_dedup: ~100k opaque chunks/sf0.1 all
    * paying a guaranteed-failure probe). The gate never changes a
    * result: bytes without these magics are exactly the bytes every
    * registered reader rejects, so both paths fall back identically. */
  private[operators] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a))

  private[operators] def decodeOne(content: Array[Byte]): (Int, Int, Double) = {
    // NonFatal, not just IOException: a truncated/corrupt payload can
    // surface as a codec RuntimeException, and one bad blob in a
    // billion-row scan must degrade to the stub, not kill the stage.
    val img =
      if (!looksLikeImage(content)) null
      else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) fakeDecode(content)
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, sum.toDouble / (w.toLong * h * 3))
    }
  }

  /** Decoded schema appended to the media row. */
  val decodedSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_px", DoubleType, nullable = false)))

  /** Per-partition batched decode — the `mapInPandas` batch contract in
    * Scala: rows are processed in bounded batches per partition (codec
    * setup amortized per batch, memory bounded by batchSize × payload). */
  def decodeImages(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val schema = decodedSchema
    val rdd = Repartition.forCompute(media).rdd.mapPartitions { it =>
      // codec setup, once per partition (amortized across batches)
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]]("content")
          val (w, h, m) = decodeOne(bytes)
          // Seq[Any]: a bare Seq(w, h, m) would numerically widen the
          // Ints to Double and break the encoder's IntegerType fields.
          Row.fromSeq(row.toSeq ++ Seq[Any](w, h, m))
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Number of per-row statistics [[extractFeatures]] projects:
    * (width, height, mean_px, byte_mean, n_bytes). */
  val featureStatsDim: Int = 5

  /** Fixed ±1 projection entry (d, j) for [[extractFeatures]] — the
    * sign of a Rademacher JL projection matrix, derived from the md5
    * of the literal "proj:d:j" so every executor (and the SQL oracle,
    * which inlines the signs as constants) agrees without shipping a
    * matrix. */
  def projSign(d: Int, j: Int): Int = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"proj:$d:$j".getBytes("UTF-8"))
    if ((dig(0) & 1) == 0) 1 else -1
  }

  /** REAL feature extraction: a fixed Rademacher random projection
    * (the JL construction [[graft.operators.Similarity]] uses for
    * embeddings) of per-row DECODED statistics — the batched-inference
    * contract (bounded per-partition batches, codec amortized per
    * partition) carrying an actual computation instead of a digest
    * stub. Per row the statistics vector is
    * `s = (width, height, mean_px, byte_mean, n_bytes/1000)` — width/
    * height/mean_px from the REAL [[decodeOne]] (ImageIO for decodable
    * payloads, the deterministic [[fakeDecode]] fallback otherwise),
    * byte_mean the mean unsigned payload byte, size in KILObytes so
    * the components share a scale — and
    * `features[d] = Σ_j projSign(d, j) · s_j`.
    *
    * Determinism seam: each statistic is quantized HALF_UP to the
    * milli grid ([[graft.functions.Quantize.quantizeDouble]]), the
    * signed sum folds in exact longs, and the float output is that
    * integer / 1000 — so `round(f · 1000)` recovers the exact signed
    * sum whenever |s| < 2^23 (the float division costs one relative
    * rounding of 2^-24, so the recovered integer is off only past
    * 8.38M). Width and height are CLAMPED at 2048 before
    * quantization — a real ImageIO decode of a large image would
    * otherwise push w·1000 + h·1000 past the bound on its own,
    * independent of payload size — so with the clamp
    * |s| ≤ 4.61M + n_bytes and recovery is exact for any payload
    * under ~3.7 MB regardless of decoded dimensions (the md5
    * fallback's dims are ≤ 511, giving ~6.8 MB there). The SQL
    * oracle reproduces the law with integer arithmetic. */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val signs: Array[Array[Long]] =
      Array.tabulate(dim, featureStatsDim)((d, j) => projSign(d, j).toLong)
    val rdd = Repartition.forCompute(media.select("media_id", "content")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val (w0, h0, mp) = decodeOne(bytes)
          // dimension clamp: keeps the signed sum inside float's
          // exact-recovery bound (see scaladoc) for real decodes of
          // arbitrarily large images; the md5 fallback is ≤ 511.
          val w = math.min(w0, 2048)
          val h = math.min(h0, 2048)
          var bsum = 0L
          var i = 0
          while (i < bytes.length) { bsum += bytes(i) & 0xff; i += 1 }
          val bm = if (bytes.length == 0) 0.0 else bsum.toDouble / bytes.length
          val q = Array[Long](w * 1000L, h * 1000L,
            graft.functions.Quantize.quantizeDouble(mp, 3),
            graft.functions.Quantize.quantizeDouble(bm, 3),
            bytes.length.toLong)
          val feats = Array.tabulate(dim) { d =>
            var s = 0L
            var j = 0
            while (j < featureStatsDim) { s += signs(d)(j) * q(j); j += 1 }
            s.toFloat / 1000.0f
          }
          Row(id, feats.toSeq)
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** dHash pooling grid shape: 9 columns × 8 rows — one horizontal
    * gradient comparison per adjacent cell pair = 64 bits. */
  val DHashCols = 9
  val DHashRows = 8

  /** The 9×8 integer grayscale grid a dHash fingerprints — REAL
    * average-pooling for decodable payloads, a deterministic byte-pool
    * fallback otherwise. All-integer laws (sum DIV count), so the same
    * grid is reproducible by a serial oracle (real path) or an ANSI
    * SQL engine (fallback path: code point == byte for ASCII
    * payloads, the test-fixture contract).
    *
    *  - Real path (ImageIO decodes): cell (r,c) = integer mean of
    *    R+G+B over the pixel block [⌊c·w/9⌋, max(⌊(c+1)·w/9⌋, lo+1))
    *    × [⌊r·h/8⌋, …) divided by 3 — i.e. `Σ(R+G+B) DIV (3·npix)`.
    *    The max(…, lo+1) keeps every block non-empty for any w,h ≥ 1,
    *    so the law is total without a minimum-size precondition.
    *  - Fallback (no codec, e.g. the text-backed fixture): the payload
    *    bytes pooled 1-D into 72 cells by the same lo/hi law — cell i
    *    = `Σ unsigned bytes[⌊i·n/72⌋, max(⌊(i+1)·n/72⌋, lo+1)) DIV
    *    cnt`; an empty payload is all-zero cells.
    *
    * This is the "stored pixel grid" of the image-dedup family: the
    * dHash compares only ADJACENT cells, so any per-pixel noise that
    * average-pools away (recompression, mild resizing — the classic
    * near-dup transforms) leaves the fingerprint unchanged. */
  private[graft] def grayGrid(content: Array[Byte]): Array[Int] = {
    val cells = new Array[Int](DHashCols * DHashRows)
    val img =
      if (!looksLikeImage(content)) null
      else try {
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img != null) {
      val w = img.getWidth
      val h = img.getHeight
      var r = 0
      while (r < DHashRows) {
        val y0 = r * h / DHashRows
        val y1 = math.max((r + 1) * h / DHashRows, y0 + 1)
        var c = 0
        while (c < DHashCols) {
          val x0 = c * w / DHashCols
          val x1 = math.max((c + 1) * w / DHashCols, x0 + 1)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          cells(r * DHashCols + c) = (sum / (3L * (x1 - x0) * (y1 - y0))).toInt
          c += 1
        }
        r += 1
      }
    } else if (content.length > 0) {
      val n = content.length
      var i = 0
      while (i < cells.length) {
        val lo = i * n / cells.length
        val hi = math.max((i + 1) * n / cells.length, lo + 1)
        var sum = 0L
        var j = lo
        while (j < hi) { sum += content(j) & 0xff; j += 1 }
        cells(i) = (sum / (hi - lo)).toInt
        i += 1
      }
    }
    cells
  }

  /** 64-bit difference hash of a [[grayGrid]]: bit k (row r = k/8,
    * col c = k%8) is set iff cell (r,c) < cell (r,c+1) — the
    * horizontal brightness gradient sign. Strict `<` so a flat grid
    * (constant image) hashes to 0 on every engine. */
  private[graft] def dHash64(cells: Array[Int]): Long = {
    var fp = 0L
    var k = 0
    while (k < 64) {
      val idx = (k / 8) * DHashCols + (k % 8)
      if (cells(idx) < cells(idx + 1)) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /** Per-payload dHash fingerprints `(media_id, dhash)` — the image
    * analogue of the text family's simhash: one 64-bit
    * perceptual fingerprint per payload, computed in the same bounded
    * per-partition batches as [[extractFeatures]] (codec amortized,
    * memory ≤ batchSize × payload). Pure map stage — no shuffle; at
    * 100 TB of media the fingerprint table is ~6 orders of magnitude
    * smaller than the payload bytes, and everything downstream
    * (the Hamming join, survivor picks) runs on it, never on the
    * blobs again. */
  def dhashFingerprints(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val rdd = Repartition.forCompute(media.select("media_id", "content"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { row =>
            Row(row.getLong(0), dHash64(grayGrid(row.getAs[Array[Byte]](1))))
          }
        }
      }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-frame dHash fingerprints `(media_id, fh)` — the DISTINCT
    * fingerprint set of each payload's sampled frames, in one pure
    * map pass (the frame slicing happens in-JVM against the byte
    * array; no binary frame ever rides a shuffle — the same
    * never-ship-the-payload law as the span-dedup family). Frame law
    * mirrors [[sampleFrames]] exactly: chunk indices
    * `0 .. max(len/frameBytes − 1, 0)`, every `stride`-th kept, frame
    * = bytes `[i·fb, min(i·fb+fb, len))` (the whole payload when
    * shorter than one frame; an empty payload yields the all-zero
    * grid). Each frame takes the SAME [[grayGrid]]→[[dHash64]] law as
    * stills — a production frame that is itself a decodable image
    * gets real pixel pooling, the stub's opaque chunks take the
    * byte-pool fallback. */
  def frameFingerprints(media: DataFrame, frameBytes: Int = 64,
                        stride: Int = 4, batchSize: Int = 256): DataFrame = {
    require(frameBytes >= 1 && stride >= 1, s"frameBytes=$frameBytes stride=$stride")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fh", LongType, nullable = false)))
    val rdd = Repartition.forCompute(media.select("media_id", "content"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { row =>
            val id = row.getLong(0)
            val bytes = row.getAs[Array[Byte]](1)
            val nIdx = math.max(bytes.length / frameBytes, 1)
            val fhs = scala.collection.mutable.LinkedHashSet.empty[Long]
            var i = 0
            while (i < nIdx) {
              if (i % stride == 0) {
                val lo = i * frameBytes
                val hi = math.min(lo + frameBytes, bytes.length)
                fhs += dHash64(grayGrid(java.util.Arrays.copyOfRange(bytes, lo, hi)))
              }
              i += 1
            }
            fhs.iterator.map(fh => Row(id, fh))
          }
        }
      }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Resize stub: scales the decoded dimensions (a real impl would
    * resample pixels; the Spark-side contract — decoded frame in,
    * resized metadata out, pure projection, no shuffle — is what this
    * pins). */
  def resize(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame =
    decoded
      .withColumn("scale_x", lit(targetW).cast("double") / col("width"))
      .withColumn("scale_y", lit(targetH).cast("double") / col("height"))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))

  /** Frame sampling stub for video payloads: every `stride`-th chunk of
    * the payload becomes a "frame" row (id, frame_no, frame binary). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.select(col("media_id"),
      posexplode(
        filter(
          transform(
            sequence(lit(0),
              greatest((length(col("content")) / frameBytes).cast("int") - 1, lit(0))),
            i => when(i % stride === 0,
              col("content").substr(i * frameBytes + 1, lit(frameBytes)))),
          f => f.isNotNull)))
      .toDF("media_id", "frame_no", "frame")
}
