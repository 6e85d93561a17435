package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature /
  * resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, operator
  * signatures — is real and tested. The codec step itself is a STUB: no
  * image/audio libraries ship in this container, so `decodeStub` derives a
  * deterministic fake feature vector from the bytes (content-hash based).
  * Swapping in a real decoder means replacing ONLY the body of
  * `decodeBatch` below (its batch-iterator signature is exactly what a
  * JNI/FFI decoder wants: amortize per-partition init, stream rows).
  */
object Multimodal {

  /** Typed media row: the engine's multimodal schema. */
  case class MediaMeta(width: Int, height: Int, durationMs: Long,
                       sampleRate: Int, codec: String)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  /** Deterministic synthetic media table (for tests/bench): bytes are a
    * seeded hash stream, metadata plausible per kind. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(kinds, (pmod(xxhash64(col("id"), lit(seed)), lit(3)) + 1).cast("int")).as("kind"),
      // opaque payload: 64 deterministic bytes from the id
      unhex(concat((0 until 8).map(i =>
        lpad(hex(abs(xxhash64(col("id"), lit(seed + i)))), 16, "0")): _*)).as("bytes"),
      struct(
        (pmod(xxhash64(col("id"), lit(seed + 10)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col("id"), lit(seed + 11)), lit(1080)) + 1).cast("int").as("height"),
        (pmod(xxhash64(col("id"), lit(seed + 12)), lit(600000)) + 1).as("durationMs"),
        lit(16000).as("sampleRate"),
        lit("stub").as("codec")).as("meta"))
      .as[MediaRow]
  }

  /** Media table derived from `documents(doc_id, text)` — the payload is
    * the document's UTF-8 bytes, metadata is pure arithmetic on doc_id.
    * Unlike `synthesize` (xxhash-seeded), every derived column here is
    * reproducible by the DuckDB oracle, so the decode pipeline gets a real
    * CORRECTNESS row (q_media_features, q_frame_plan). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      element_at(kinds, (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("doc_id") * 37L, lit(1920L)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 53L, lit(1080L)) + 1).cast("int").as("height"),
        (pmod(col("doc_id") * 7919L, lit(600000L)) + 1).as("durationMs"),
        lit(16000).as("sampleRate"),
        lit("stub").as("codec")).as("meta"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic 8-dim feature = the first 8 bytes of the
    * payload's SHA-256 digest, as floats 0..255 (integral, so the values
    * survive float->double round-trips bit-exactly — the DuckDB oracle
    * recomputes them from sha256 hex). Replace this body with the real
    * codec call; everything else (partition amortization, batch shape,
    * schema) stays. */
  private def decodeStub(digest: java.security.MessageDigest,
                         bytes: Array[Byte]): Array[Float] = {
    digest.reset()
    val d = digest.digest(bytes)
    Array.tabulate(8)(i => (d(i) & 0xff).toFloat)
  }

  /** Per-partition batched decode → feature extraction. mapPartitions so a
    * real decoder initializes once per partition (the JNI/py-worker
    * pattern — here a MessageDigest instance, which is exactly the shape a
    * native codec handle takes); rows stream through without materializing
    * the partition. */
  def decodeBatch(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("SHA-256") // once per partition
      rows.map(r => MediaFeature(r.media_id, r.kind, decodeStub(digest, r.bytes)))
    }
  }

  // ---------------------------------------------------------------------
  // Real image decode (pure-JDK javax.imageio — PNG/JPEG/BMP need no
  // external jars). The synthetic pixel content is CLOSED-FORM arithmetic
  // of (media_id, x, y), so the DuckDB oracle recomputes expected channel
  // statistics without decoding anything: a green hash row verifies the
  // whole lossless encode -> decode -> aggregate roundtrip end to end.
  // ---------------------------------------------------------------------

  case class ImageRow(media_id: Long, bytes: Array[Byte])
  case class ImageFeature(media_id: Long, codec: String, width: Int, height: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic image geometry + pixel law. Mirrored verbatim in the
    * DuckDB oracle (Oracles.mediaReal) — change both together. */
  def imgWidth(id: Long): Int = (8 + (id % 16)).toInt
  def imgHeight(id: Long): Int = (8 + ((id * 3) % 16)).toInt
  private def chR(id: Long, x: Int, y: Int): Int = ((x * 31L + y * 17L + id * 7L) % 256L).toInt
  private def chG(id: Long, x: Int, y: Int): Int = ((x * 13L + y * 29L + id * 3L) % 256L).toInt
  private def chB(id: Long, x: Int, y: Int): Int = ((x * 11L + y * 23L + id * 5L) % 256L).toInt

  /** Encode one deterministic PNG (real ImageIO encode, executor-side). */
  def encodePng(id: Long): Array[Byte] = {
    val w = imgWidth(id); val h = imgHeight(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (chR(id, x, y) << 16) | (chG(id, x, y) << 8) | chB(id, x, y))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Image table keyed by the documents table's doc_ids: real PNG payloads,
    * encoded per-partition on executors (no driver loop, no shuffle — the
    * encode is a narrow map over the scan). */
  def synthesizeImages(docs: DataFrame): Dataset[ImageRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        ids.map(id => ImageRow(id, encodePng(id)))
      }
  }

  /** Real decode: javax.imageio PNG/JPEG/BMP -> per-channel mean features.
    * mapPartitions for the once-per-partition codec setup; rows stream.
    * Bytes no reader accepts fall through to the deterministic stub
    * (codec = "stub", sha256-derived values) instead of failing the batch —
    * at 100 TB a corrupt blob must cost one row, not one task retry loop. */
  def decodeImages(images: Dataset[ImageRow]): Dataset[ImageFeature] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        // NonFatal, not just IOException: ImageIO readers throw runtime
        // exceptions (NegativeArraySize, IllegalArgument, IndexOutOfBounds)
        // on corrupt-but-recognized bytes, and those must cost one stub
        // row, not a task retry loop.
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) {
          digest.reset()
          val d = digest.digest(r.bytes)
          ImageFeature(r.media_id, "stub", 0, 0,
            (d(0) & 0xff).toDouble, (d(1) & 0xff).toDouble, (d(2) & 0xff).toDouble)
        } else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          // exact integer sums, one division each: bit-identical to the
          // oracle's CAST(sum AS DOUBLE) / (width*height)
          ImageFeature(r.media_id, "png", w, h, sr / n, sg / n, sb / n)
        }
      }
    }
  }

  /** "Resize" metadata op: pure-column arithmetic on the typed meta struct
    * (the real pixel resize happens inside the decode stage; the catalog
    * metadata transform is columnar and codegen'd). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    df.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }

  /** Frame-sample plan for videos: one row per sampled frame timestamp at
    * `everyMs` — a `sequence` explode, no UDF; the frame EXTRACTION is part
    * of the decode stub. Partitioned by media_id so one video's frames
    * co-locate. */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs))).as("frame_ts_ms"))
      .repartition(col("media_id"))
}
