package graft

import graft.llm.MultimodalOps
import org.apache.spark.sql.functions._

/** Perceptual image hash: invariance to what pHash must ignore
  * (brightness shift, resize), sensitivity to structure, and the
  * undecodable arm. */
class PHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(png: Array[Byte]): Long = {
    val df = Seq((1L, png)).toDF("asset_id", "payload")
    MultimodalOps.imagePHash(df).collect()(0).getLong(1)
  }

  // five structurally distinct bases (different dims change the
  // gradient wrap frequency and orientation)
  private val bases = Seq((16, 16, 0L), (48, 16, 1L), (16, 48, 2L),
    (64, 32, 3L), (20, 40, 4L))

  test("structurally distinct images hash apart; brightness-shifted " +
    "twins collide; resize stays near") {
    val hs = bases.map { case (w, h, s) =>
      hashOf(MultimodalOps.syntheticPng(w, h, s)) }
    assert(hs.distinct.size === bases.size,
      s"base images collided: $hs")
    // a TRUE brightness shift (constant added to every gray value, no
    // channel wrap): a perceptual hash MUST collide these — the DCT
    // AC terms are shift-invariant. (syntheticPng's seed is NOT such a
    // shift: +seed wraps the blue channel at 256 boundaries and
    // changes structure.)
    def grayPng(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16; x <- 0 until 24) {
        val g = (x * 7 + y * 5) % 200 + shift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val a = hashOf(grayPng(0))
    val b = hashOf(grayPng(40))
    assert(a === b, "brightness shift changed the hash")
    // a TRUE 2x resize (pixel-doubling the same content): small
    // Hamming distance — this is the re-encode/resize case exact-byte
    // dedup misses and pHash exists to catch
    def patPng(scale: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(24 * scale, 16 * scale,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16 * scale; x <- 0 until 24 * scale) {
        val g = ((x / scale) * 11 + (y / scale) * 3 +
          ((x / scale) * (y / scale)) % 31) % 220
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val h1 = hashOf(patPng(1))
    val h2 = hashOf(patPng(2))
    val ham = java.lang.Long.bitCount(h1 ^ h2)
    assert(ham <= 10, s"resize moved the hash $ham bits")
  }

  test("undecodable payloads report ok=false, keep their row") {
    val df = Seq((1L, MultimodalOps.syntheticPng(8, 8, 0L)),
      (2L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
    val got = MultimodalOps.imagePHash(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("hash is deterministic across partitionings") {
    val assets = spark.range(40).select(col("id").as("asset_id"))
      .as[Long].map(id => (id, MultimodalOps.syntheticPng(
        16 + (id % 5).toInt * 8, 16, id % 5))).toDF("asset_id", "payload")
    val a = MultimodalOps.imagePHash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = MultimodalOps.imagePHash(assets.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
