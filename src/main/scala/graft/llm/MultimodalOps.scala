package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star LLM pipeline): media as opaque
  * `binary` payloads + typed metadata, processed per-partition in
  * batches.
  *
  * IMAGE decode/resize are REAL (JDK `javax.imageio` — PNG/JPEG/GIF/BMP
  * ship with the JRE, no external dependency): [[decodeImageMeta]] and
  * [[resizeImages]] run actual codecs inside the batched mapPartitions
  * path. Audio/video kernels remain STUBBED with a deterministic fake
  * (no codec libraries for those in this environment), but everything
  * Spark-side is real: the schema convention, the batched mapPartitions
  * shape (the Scala analog of mapInPandas: one iterator per partition,
  * amortized per-batch setup), and the partitioning story (payloads
  * never shuffle unless the caller repartitions on a grouping key
  * first).
  */
object MultimodalOps {

  /** Schema convention for a multimodal asset column. */
  case class MediaRow(
      asset_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte], // opaque encoded bytes
      meta_width: Int,
      meta_height: Int)

  case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      byte_len: Int,
      // Stub features: deterministic digest of the payload standing in
      // for decoded pixel/sample statistics.
      checksum: Long,
      feat_mean: Double)

  /** Wrap text rows into fake media assets (test harness: the payload is
    * the UTF-8 text; a real pipeline reads encoded media files). */
  def fakeAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("asset_id"), lit("image").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      (length(col(textCol)) % 640).cast("int").as("meta_width"),
      lit(480).as("meta_height"))

  /** STUB decode kernel. A real implementation would hand `batch` to a
    * native codec (e.g. libjpeg via JNI) and emit pixel statistics; the
    * deterministic fake digests bytes so tests can assert exact values.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      var acc = 1469598103934665603L // FNV-1a over payload bytes
      var i = 0
      while (i < r.payload.length) {
        acc = (acc ^ (r.payload(i) & 0xffL)) * 1099511628211L
        i += 1
      }
      MediaFeatures(r.asset_id, r.media_type, r.payload.length, acc,
        if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length)
    }

  /** Batched per-partition feature extraction — the mapInPandas shape:
    * partition iterator → fixed-size batches → kernel call per batch.
    * No shuffle; runs wherever the payloads already live. */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** Payload-free projection for metadata-only pipelines: column pruning
    * keeps the (large) payload out of the scan entirely. */
  def metadataOnly(assets: DataFrame): DataFrame =
    assets.select("asset_id", "media_type", "meta_width", "meta_height")

  /** Video frame sampling: split the payload into fixed-stride "frames"
    * (stub codec: a real one parses container headers; the byte-stride
    * fake keeps the plumbing honest) and keep every `everyNth`-th.
    * One narrow explode per asset — frames stay on the executor that
    * holds the payload, nothing shuffles. Output: (asset_id, frame_no,
    * frame: binary). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes)
      .cast("long")
    assets
      .select(col("asset_id"), col("payload"),
        explode(filter(
          sequence(lit(0L), greatest(nFrames - 1, lit(0L))),
          i => i % everyNth === 0)).as("frame_no"))
      .withColumn("frame",
        col("payload").substr((col("frame_no") * frameBytes + 1).cast("int"),
          lit(frameBytes)))
      .drop("payload")
  }

  // ---- REAL image kernels (JDK ImageIO; headless-safe — BufferedImage
  // and the bundled PNG/JPEG readers need no display) ----

  /** Decoded image facts: negative dims + format="undecodable" mark
    * payloads no bundled reader accepts (corrupt bytes, unknown codec) —
    * surfaced as data, never an executor throw, so one bad blob in a
    * 100 TB corpus doesn't kill the stage. */
  case class ImageMeta(
      asset_id: Long, width: Int, height: Int, channels: Int,
      format: String)

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** REAL image decode over a binary payload column: actual ImageIO
    * codec per payload, batched mapPartitions (per-batch amortization
    * slot for codec/reader reuse), no shuffle — decodes run wherever the
    * payloads already live, the mapInPandas shape. */
  def decodeImageMeta(assets: DataFrame, idCol: String = "asset_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          readImage(bytes) match {
            case Some(img) => ImageMeta(id, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, "ok")
            case None => ImageMeta(id, -1, -1, -1, "undecodable")
          }
        })
      }.toDF()
  }

  /** REAL resize: decode → Graphics2D bilinear rescale → re-encode PNG,
    * in the same batched no-shuffle mapPartitions shape. Undecodable
    * payloads pass through null (left-typed: the caller filters or
    * routes them; silently dropping rows would corrupt joins keyed on
    * asset_id). */
  def resizeImages(assets: DataFrame, targetWidth: Int, targetHeight: Int,
      idCol: String = "asset_id", payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    require(targetWidth > 0 && targetHeight > 0,
      s"target dims must be positive: ${targetWidth}x$targetHeight")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          val out = readImage(bytes).map { img =>
            val dst = new java.awt.image.BufferedImage(
              targetWidth, targetHeight,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetWidth, targetHeight, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }.orNull
          (id, out)
        })
      }.toDF("asset_id", "payload")
  }

  /** Deterministic RGB PNG fixture producer (test harness — a real
    * pipeline ingests encoded media files): pixel (x,y) = a fixed affine
    * function of (x, y, seed), encoded through the real PNG writer, so
    * decode gates can state expected dimensions/channels in ANY engine
    * from the seed alone while the bytes still exercise a genuine codec
    * round trip. */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Resize stub: crop the payload to the target byte budget and update
    * the metadata accordingly (a real kernel decodes + rescales inside
    * the batched mapPartitions path above; the crop keeps schema flow
    * and pruning behavior identical). */
  def resizeStub(assets: DataFrame, targetWidth: Int, targetHeight: Int): DataFrame =
    assets
      .withColumn("payload",
        col("payload").substr(lit(1), lit(targetWidth * targetHeight)))
      .withColumn("meta_width", lit(targetWidth))
      .withColumn("meta_height", lit(targetHeight))
}
