package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star LLM pipeline): media as opaque
  * `binary` payloads + typed metadata, processed per-partition in
  * batches.
  *
  * The decode kernels themselves (JPEG/audio codecs) are STUBBED with a
  * deterministic fake — the codec libraries are not in this
  * environment — but everything Spark-side is real: the schema
  * convention, the batched mapPartitions shape (the Scala analog of
  * mapInPandas: one iterator per partition, amortized per-batch setup),
  * and the partitioning story (payloads never shuffle unless the caller
  * repartitions on a grouping key first).
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
