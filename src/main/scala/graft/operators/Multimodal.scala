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
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[decodeOne]]); payloads
  * with no installed reader (and the feature/frame stubs, which stand
  * in for model inference) fall back to deterministic MD5-derived
  * values, keeping every pipeline total and oracle-checkable.
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
  private[operators] def decodeOne(content: Array[Byte]): (Int, Int, Double) = {
    // NonFatal, not just IOException: a truncated/corrupt payload can
    // surface as a codec RuntimeException, and one bad blob in a
    // billion-row scan must degrade to the stub, not kill the stage.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
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

  /** Feature extraction stub: fixed-size float vector per media row
    * (stands in for an embedding model; deterministic from bytes).
    * Component d derives from md5(content ++ ":d") so an ANSI SQL
    * oracle can recompute the exact grid value
    * (first 16 digest bits mod 2000, centered, /1000). */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = Repartition.forCompute(media.select("media_id", "content")).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val feats = Array.tabulate(dim) { d =>
            md.reset()
            md.update(bytes)
            md.update(s":$d".getBytes("UTF-8"))
            val dig = md.digest()
            val v = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
            ((v % 2000) - 1000).toFloat / 1000.0f
          }
          Row(id, feats.toSeq)
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
