package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** read_sas(format='sas7bdat') — READ-ONLY, uncompressed pages.
  *
  * The native SAS dataset format (reference: pandas/io/sas/sas7bdat.py:1
  * and its header comment crediting the independently-published format
  * notes; the page/subheader layout is public knowledge via that
  * documentation line). This implementation was written against the
  * spec and then byte-validated on REAL SAS-written files (the
  * reference's sas7bdat test fixtures: cars, datetime, productsales,
  * test1), so the layout constants below are interop-verified for the
  * 32-bit little-endian profile, not merely self-consistent. The
  * 64-bit (u64) offsets follow the same published tables but no real
  * u64 fixture exists in this environment — stated honestly here.
  *
  * Scope fences (all loud, none silent): little-endian only,
  * uncompressed only (SASYZCRL/SASYZCR2 pages are the classic
  * pandas-supported codecs but out of scope this round), no deleted-row
  * bitmaps.
  *
  * Layout summary (32-bit offsets; u64 widens ints to 8 and shifts the
  * tabled fields):
  *   header: magic[32], u64 flag @32 (0x33), align1 flag @35, endian
  *   @37 (1=LE), encoding @70, "SAS FILE" @84, dataset name @92[64],
  *   header_length i32 @196+a1, page_size i32 @200+a1, page_count
  *   int @204+a1.
  *   page: type u16 @bitOffset (16/32), block_count u16, subheader_count
  *   u16; pointer table @bitOffset+8, entries (offset, length, comp,
  *   type) of 12/24 bytes. Subheaders identified by leading signature:
  *   row_size F7F7F7F7 (row_length @5·L, row_count @6·L, mix-page row
  *   count @15·L), column_size F6F6F6F6 (@1·L), column_text FFFFFFFD
  *   (strings blob @+L), column_name FFFFFFFF (8-byte pointers
  *   (text idx, offset, length) u16×3, entry i based @ +L+8·(i+1)),
  *   column_attrs FFFFFFFC (entries of (row offset: L, width u32, pad,
  *   type u8) sized L+8 based @ +L+8), format FFFFFBFE in column order
  *   (format text pointer u16×3 @ +22+3·L, label @ +28+3·L).
  *   Rows: mix pages (512/640) after the pointer table 8-aligned,
  *   min(mixRowCount, rowCount) rows; data pages (256) @bitOffset+8,
  *   block_count rows. Numerics are IEEE doubles TRUNCATED to width
  *   3-8 — the stored bytes are the high-order end of the LE double;
  *   missing numeric = NaN. Strings are fixed-width, blank/NUL padded.
  *   SAS serials count from 1960-01-01: DATETIME formats in seconds →
  *   TimestampType (snapped to the ms boundary within ±2 µs, same
  *   rationale as SasXportIo/ExcelIo), DATE-family formats in days →
  *   DateType, everything else stays DoubleType.
  *
  * Scale shape: metadata (meta/mix page subheaders) parses driver-side
  * from the file head; tasks then take PAGE RANGES — pages are
  * self-describing for row extraction (type + block count in the page
  * header), so a 100 TB directory of .sas7bdat files splits by page
  * range within each file with no cross-task state, like StataIo.
  */
object SasBdatIo {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  /** SAS formats rendered as calendar DATES (days-since-1960 serials);
    * the common family from the public format documentation. */
  private val DateFormats = Set("DATE", "DAY", "DDMMYY", "DOWNAME",
    "JULDAY", "JULIAN", "MMDDYY", "MMYY", "MMYYC", "MMYYD", "MMYYN",
    "MMYYP", "MMYYS", "MONNAME", "MONTH", "MONYY", "QTR", "QTRR",
    "NENGO", "WEEKDATE", "WEEKDATX", "WEEKDAY", "WEEKV", "WORDDATE",
    "WORDDATX", "YEAR", "YYMM", "YYMMC", "YYMMD", "YYMMN", "YYMMP",
    "YYMMS", "YYMMDD", "YYMON", "YYQ", "YYQC", "YYQD", "YYQN", "YYQP",
    "YYQS", "YYQR", "MINGUO", "E8601DA", "B8601DA")

  private val DatetimeFormats = Set("DATETIME", "DTWKDATX", "B8601DN",
    "B8601DT", "B8601DX", "B8601DZ", "B8601LX", "E8601DN", "E8601DT",
    "E8601DX", "E8601DZ", "E8601LX", "DATEAMPM", "DTDATE", "DTMONYY",
    "DTMONYYP", "DTWKDATX", "DTYEAR", "TOD", "MDYAMPM")

  private val SasEpoch = LocalDate.of(1960, 1, 1)
  private val SasEpochDay: Long = SasEpoch.toEpochDay
  private val SasEpochMs: Long = SasEpochDay * 86400000L

  case class BdatColumn(name: String, rowOffset: Long, width: Int,
      isString: Boolean, format: String, label: String)

  case class BdatMeta(u64: Boolean, intLen: Int, bitOffset: Int,
      ptrLen: Int, headerLength: Long, pageSize: Int, pageCount: Long,
      rowLength: Long, rowCount: Long, mixRowCount: Long,
      utf8: Boolean, datasetName: String, columns: Seq[BdatColumn])
      extends Serializable

  private def u16(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff

  private def i32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def i64(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

  private def intAt(b: Array[Byte], off: Int, len: Int): Long =
    if (len == 8) i64(b, off) else i32(b, off).toLong

  /** Parse header + every metadata subheader. Reads pages until the
    * first pure-data page (meta/mix pages carrying subheaders lead the
    * file in uncompressed SAS output), so the driver touches O(meta)
    * bytes, not O(file). */
  def parseMeta(open: () => FSDataInputStream): BdatMeta = {
    val in = open()
    try {
      val head = new Array[Byte](288)
      in.readFully(0L, head)
      require(head.take(32).sameElements(Magic),
        "not a sas7bdat file (bad magic)")
      val u64 = head(32) == 0x33.toByte
      val align1 = if (head(35) == 0x33.toByte) 4 else 0
      require(head(37) == 0x01.toByte,
        "big-endian sas7bdat not supported (little-endian only)")
      val intLen = if (u64) 8 else 4
      val utf8 = head(70) == 20.toByte
      val datasetName =
        new String(head, 92, 64, if (utf8) UTF_8 else ISO_8859_1).trim
      val headerLength = i32(head, 196 + align1).toLong
      val pageSize = i32(head, 200 + align1)
      val pageCount = intAt(head, 204 + align1, intLen)
      val bitOffset = if (u64) 32 else 16
      val ptrLen = if (u64) 24 else 12

      var rowLength = 0L; var rowCount = 0L; var mixRowCount = 0L
      var colCount = 0L
      val textBlobs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      val namePtrs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      val attrs = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
      val formats = scala.collection.mutable.ArrayBuffer[(String, String)]()

      def str(blobIdx: Int, off: Int, len: Int): String = {
        if (len == 0 || blobIdx >= textBlobs.size) ""
        else {
          val blob = textBlobs(blobIdx)
          val end = math.min(off + len, blob.length)
          if (off >= end) ""
          else new String(blob, off, end - off,
            if (utf8) UTF_8 else ISO_8859_1).trim
        }
      }

      val page = new Array[Byte](pageSize)
      var pi = 0L
      var sawData = false
      while (pi < pageCount && !sawData) {
        in.readFully(headerLength + pi * pageSize, page)
        val pType = u16(page, bitOffset)
        val subCount = u16(page, bitOffset + 4)
        if (pType == 256) sawData = true
        else {
          require(pType == 0 || pType == 16384 || pType == 512 ||
            pType == 640,
            s"page $pi has type $pType: compressed or unknown layout " +
              "(only uncompressed sas7bdat is supported)")
          var si = 0
          while (si < subCount) {
            val po = bitOffset + 8 + si * ptrLen
            val sOff = intAt(page, po, intLen)
            val sLen = intAt(page, po + intLen, intLen)
            val comp = page(po + 2 * intLen)
            require(comp == 0 || comp == 1,
              s"page $pi subheader $si is compressed (comp=$comp): " +
                "only uncompressed sas7bdat is supported")
            // comp==1 marks a TRUNCATED pointer (the reference parser
            // skips them): its stale offset bytes can alias a real
            // signature, so parsing it would corrupt the metadata
            if (comp != 1 && sLen > 0) {
              val o = sOff.toInt
              val sig = i32(page, o).toLong & 0xffffffffL
              sig match {
                case 0xf7f7f7f7L =>
                  rowLength = intAt(page, o + 5 * intLen, intLen)
                  rowCount = intAt(page, o + 6 * intLen, intLen)
                  mixRowCount = intAt(page, o + 15 * intLen, intLen)
                case 0xf6f6f6f6L =>
                  colCount = intAt(page, o + intLen, intLen)
                case 0xfffffffdL => // column text
                  val blob = java.util.Arrays.copyOfRange(
                    page, o + intLen, o + sLen.toInt)
                  if (textBlobs.isEmpty) {
                    val probe = new String(blob, 0,
                      math.min(blob.length, 24), ISO_8859_1)
                    require(!probe.contains("SASYZCRL") &&
                      !probe.contains("SASYZCR2"),
                      "RLE/RDC-compressed sas7bdat is not supported " +
                        "(uncompressed pages only)")
                  }
                  textBlobs += blob
                case 0xffffffffL => // column names
                  val n = ((sLen - 2 * intLen - 12) / 8).toInt
                  var i = 0
                  while (i < n) {
                    val base = o + intLen + 8 * (i + 1)
                    namePtrs += ((u16(page, base), u16(page, base + 2),
                      u16(page, base + 4)))
                    i += 1
                  }
                case 0xfffffffcL => // column attributes
                  val entry = intLen + 8
                  val n = ((sLen - 2 * intLen - 12) / entry).toInt
                  var i = 0
                  while (i < n) {
                    val base = o + intLen + 8 + i * entry
                    attrs += ((intAt(page, base, intLen),
                      i32(page, base + intLen),
                      page(base + intLen + 6) & 0xff))
                    i += 1
                  }
                case 0xfffffbfeL => // format + label, in column order
                  val fb = o + 22 + 3 * intLen
                  val lb = o + 28 + 3 * intLen
                  formats += ((str(u16(page, fb), u16(page, fb + 2),
                    u16(page, fb + 4)),
                    str(u16(page, lb), u16(page, lb + 2),
                      u16(page, lb + 4))))
                case _ => // counts / column list / unknown: not needed
              }
            }
            si += 1
          }
          pi += 1
        }
      }

      require(rowLength > 0 && colCount > 0,
        "sas7bdat metadata incomplete (no row-size/column-size subheader)")
      require(namePtrs.size == colCount && attrs.size == colCount,
        s"sas7bdat metadata mismatch: $colCount columns, " +
          s"${namePtrs.size} names, ${attrs.size} attribute entries")
      val cols = (0 until colCount.toInt).map { i =>
        val (ti, toff, tlen) = namePtrs(i)
        val (rowOff, width, typ) = attrs(i)
        val (fmt, label) =
          if (i < formats.size) formats(i) else ("", "")
        BdatColumn(str(ti, toff, tlen), rowOff, width,
          isString = typ == 2, fmt, label)
      }
      BdatMeta(u64, intLen, bitOffset, ptrLen, headerLength, pageSize,
        pageCount, rowLength, rowCount, mixRowCount, utf8, datasetName,
        cols)
    } finally in.close()
  }

  /** Strip a SAS format's TRAILING w.d width suffix: "DATETIME22.3" →
    * "DATETIME", "YYMMDD10" → "YYMMDD" — but keep interior digits
    * ("E8601DA10." → "E8601DA"). */
  private def formatName(f: String): String =
    f.replaceAll("[0-9.]+$", "")

  def sparkTypeOf(c: BdatColumn): DataType =
    if (c.isString) StringType
    else {
      val f = formatName(c.format)
      if (DatetimeFormats.contains(f)) TimestampType
      else if (DateFormats.contains(f)) DateType
      else DoubleType
    }

  /** Decode one page's rows into the row buffer. Self-describing:
    * everything needed is in the page header + broadcast meta. */
  private def pageRows(m: BdatMeta, page: Array[Byte]): Seq[Int] = {
    val pType = u16(page, m.bitOffset)
    val blockCount = u16(page, m.bitOffset + 2)
    val subCount = u16(page, m.bitOffset + 4)
    if (pType == 512 || pType == 640) {
      val raw = m.bitOffset + 8 + subCount * m.ptrLen
      val base = (raw + 7) / 8 * 8
      val n = math.min(m.mixRowCount, m.rowCount).toInt
      (0 until n).map(r => base + r * m.rowLength.toInt)
    } else if (pType == 256) {
      val base = m.bitOffset + 8 + subCount * m.ptrLen
      (0 until blockCount).map(r => base + r * m.rowLength.toInt)
    } else Seq.empty // meta page: no packed rows in uncompressed files
  }

  private def decodeRow(m: BdatMeta, page: Array[Byte], base: Int): Row = {
    val arr = new Array[Any](m.columns.size)
    var i = 0
    while (i < m.columns.size) {
      val c = m.columns(i)
      val off = base + c.rowOffset.toInt
      arr(i) =
        if (c.isString) {
          var end = off + c.width
          while (end > off && (page(end - 1) == ' '.toByte ||
            page(end - 1) == 0)) end -= 1
          if (end == off) null
          else new String(page, off, end - off,
            if (m.utf8) UTF_8 else ISO_8859_1)
        } else {
          // truncated double: stored bytes are the HIGH-order end of
          // the little-endian double — pad the LOW bytes with zeros
          val b8 = new Array[Byte](8)
          System.arraycopy(page, off, b8, 8 - c.width, c.width)
          val v = ByteBuffer.wrap(b8).order(ByteOrder.LITTLE_ENDIAN)
            .getDouble
          if (java.lang.Double.isNaN(v)) null
          else {
            val f = formatName(c.format)
            if (DatetimeFormats.contains(f)) {
              // seconds serial since 1960; snap to the ms boundary
              // within ±2 µs (SasXportIo rationale)
              val raw = math.round(v * 1e6) + SasEpochMs * 1000L
              val mod = Math.floorMod(raw, 1000L)
              val micros = if (mod <= 2) raw - mod
                else if (mod >= 998) raw + (1000L - mod) else raw
              val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
              t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
              t
            } else if (DateFormats.contains(f)) {
              Date.valueOf(LocalDate.ofEpochDay(
                math.round(v) + SasEpochDay))
            } else v
          }
        }
      i += 1
    }
    Row.fromSeq(arr.toIndexedSeq)
  }

  /** read_sas(format='sas7bdat'): one file or a directory of files;
    * PAGE-RANGE split-parallel within each file. */
  def read(spark: SparkSession, path: String,
      splitBytes: Long = 64L << 20): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".sas7bdat"))
          .map(_.toString).sorted.toSeq
      else Seq(p.toString)
    require(files.nonEmpty, s"no .sas7bdat files under $path")

    val meta = parseMeta(() => fs.open(new Path(files.head)))
    val schema = StructType(meta.columns.map(c =>
      StructField(c.name, sparkTypeOf(c), nullable = true)))

    val targetBytes = math.min(math.max(1L, splitBytes), 1L << 30)
    // Per-FILE metadata: only the column layout must agree across a
    // directory — page size, header length, row counts, and the
    // 32/64-bit layout legitimately differ file to file (BUFSIZE is a
    // per-dataset SAS option), so every file decodes with ITS OWN meta,
    // broadcast as a map keyed by path.
    val metas: Map[String, BdatMeta] = files.map { f =>
      val m = if (f == files.head) meta
        else parseMeta(() => fs.open(new Path(f)))
      require(m.columns == meta.columns,
        s"$f: schema differs from ${files.head}")
      f -> m
    }.toMap
    val splits: Seq[(String, Long, Long)] = files.flatMap { f =>
      val m = metas(f)
      val pagesPer = math.max(1L, targetBytes / math.max(1, m.pageSize))
      (0L until m.pageCount by pagesPer).map(s =>
        (f, s, math.min(pagesPer, m.pageCount - s)))
    }
    if (splits.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

    val bConf = spark.sparkContext.broadcast(new SerializableHadoopConf(hconf))
    val bMetas = spark.sparkContext.broadcast(metas)
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (f, pageStart, nPages) =>
        val m = bMetas.value(f)
        val fp = new Path(f)
        val fsx = fp.getFileSystem(bConf.value.value)
        val in = fsx.open(fp)
        try {
          val page = new Array[Byte](m.pageSize)
          (0L until nPages).flatMap { k =>
            in.readFully(m.headerLength + (pageStart + k) * m.pageSize,
              page)
            pageRows(m, page).map(base => decodeRow(m, page, base))
          }
        } finally in.close()
      }
    spark.createDataFrame(rdd, schema)
  }
}
