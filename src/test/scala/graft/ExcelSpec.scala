package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.sql.{Date, Timestamp}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.ExcelIo
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** read_excel/to_excel (reference: pandas/io/excel.py:300 read_excel,
  * pandas/core/generic.py:9977 to_excel): round trips through our own
  * writer, inference rules, and a hand-built workbook simulating an
  * EXTERNAL producer (shared strings + rich text + sparse cells) that
  * our writer never emits. */
class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("excel-spec").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getPath
  }

  test("round trip: long/double/string/boolean/date/timestamp + nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("d", DateType), StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, 1.5, "plain", true, Date.valueOf("2024-02-29"),
        Timestamp.valueOf("2024-02-29 12:34:56.789")),
      Row(2L, -0.25, "a & <b> \"q\" pre ", false, Date.valueOf("1999-01-01"),
        Timestamp.valueOf("1969-12-31 23:59:59.5")), // pre-epoch serial
      Row(3L, 1.0E7, "", null, null, null),
      Row(null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val p = tmp("t.xlsx")
    ExcelIo.write(df, p)
    val back = ExcelIo.read(spark, p)
    assert(back.schema == schema, back.schema.treeString)
    // the all-null row writes as a cell-less row and read drops it:
    // the reference feeds sheet rows through TextParser with
    // skip_blank_lines=True (io/parsers.py:487), which drops fully
    // blank lines the same way
    assertFrameEqual(back, df.filter(col("id").isNotNull))
  }

  test("inference: all-integral numerics are long, any fraction double, " +
      "mixed kinds string") {
    val df = Seq((1L, 10.0, "t"), (2L, 2.5, "u")).toDF("i", "f", "s")
    val p = tmp("i.xlsx")
    ExcelIo.write(df, p)
    val back = ExcelIo.read(spark, p)
    assert(back.schema.fields.map(_.dataType).toSeq ==
      Seq(LongType, DoubleType, StringType), back.schema.treeString)
  }

  test("directory of workbooks reads as one frame, one task per file") {
    val d = Files.createTempDirectory("excel-many").toFile
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val df2 = Seq((3L, "c")).toDF("k", "v")
    ExcelIo.write(df1, new java.io.File(d, "p1.xlsx").getPath)
    ExcelIo.write(df2, new java.io.File(d, "p2.xlsx").getPath)
    val back = ExcelIo.read(spark, d.getPath)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("directory rejects a sibling workbook whose header mismatches") {
    val d = Files.createTempDirectory("excel-mismatch").toFile
    ExcelIo.write(Seq((1L, "a")).toDF("k", "v"),
      new java.io.File(d, "p1.xlsx").getPath)
    ExcelIo.write(Seq((2L, "b")).toDF("k", "OTHER"),
      new java.io.File(d, "p2.xlsx").getPath)
    val e = intercept[Exception](ExcelIo.read(spark, d.getPath).collect())
    assert(e.getMessage.contains("p2.xlsx") &&
      e.getMessage.contains("OTHER"), e.getMessage)
  }

  test("external producer: shared strings, rich-text runs, sparse cells, " +
      "explicit refs") {
    // minimal foreign workbook our writer never produces: a shared-
    // strings table (one entry in rich-text runs), row 2 skipping col B
    val p = tmp("ext.xlsx")
    val z = new ZipOutputStream(new FileOutputStream(p))
    def part(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>name</t></si><si><t>qty</t></si>
        |<si><r><t>rich</t></r><r><t> text</t></r></si></sst>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>plain</t></is></c><c r="B3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val back = ExcelIo.read(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("name", "qty"))
    assert(back.schema.fields(1).dataType == LongType)
    val got = back.collect().map(r => (r.getString(0), r.get(1))).toSet
    assert(got == Set(("rich text", null), ("plain", 7L)), got.toString)
  }

  test("leading cell-less row is skipped, not promoted to an empty header") {
    val p = tmp("blankrow.xlsx")
    val z = new ZipOutputStream(new FileOutputStream(p))
    def part(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>name</t></is></c><c r="B2" t="inlineStr"><is><t>qty</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>x</t></is></c><c r="B3"><v>5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val back = ExcelIo.read(spark, p)
    assert(back.schema.fieldNames.toSeq == Seq("name", "qty"))
    assert(back.schema.fields(1).dataType == LongType)
    assert(back.collect().map(r => (r.getString(0), r.get(1))).toSet ==
      Set(("x", 5L)))
  }

  test("sheet selection: workbook.xml order + rels resolution win over " +
      "part file names; name lookup; out-of-range is loud") {
    // sheet order declared alpha, beta — but alpha LIVES IN sheet2.xml
    // (real producers reorder sheets without renaming parts)
    val p = tmp("multi.xlsx")
    val z = new ZipOutputStream(new FileOutputStream(p))
    def part(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="alpha" sheetId="1" r:id="rId2"/>
        |<sheet name="beta" sheetId="2" r:id="rId1"/></sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    def sheet(k: Long, v: String) =
      s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c><c r="B1" t="inlineStr"><is><t>v</t></is></c></row>
         |<row r="2"><c r="A2"><v>$k</v></c><c r="B2" t="inlineStr"><is><t>$v</t></is></c></row>
         |</sheetData></worksheet>""".stripMargin
    part("xl/worksheets/sheet1.xml", sheet(2L, "b")) // beta
    part("xl/worksheets/sheet2.xml", sheet(1L, "a")) // alpha
    z.close()

    def one(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(one(ExcelIo.read(spark, p)) == Seq((1L, "a"))) // index 0 = alpha
    assert(one(ExcelIo.read(spark, p, sheetIndex = 1)) == Seq((2L, "b")))
    assert(one(ExcelIo.read(spark, p, sheetName = "beta")) == Seq((2L, "b")))
    val e1 = intercept[IllegalArgumentException](
      ExcelIo.read(spark, p, sheetName = "gamma"))
    assert(e1.getMessage.contains("no sheet named"), e1.getMessage)
    val e2 = intercept[Exception](ExcelIo.read(spark, p, sheetIndex = 2))
    assert(e2.getMessage.contains("out of range"), e2.getMessage)
  }

  test("multi-sheet write: each frame lands on its named sheet, " +
      "readable by name or index; bad sheet names are loud") {
    val p = tmp("book.xlsx")
    val sales = Seq((1L, 10.5), (2L, 20.0)).toDF("k", "amt")
    val refs = Seq(("a", 1L)).toDF("code", "k")
    ExcelIo.writeSheets(Seq("sales" -> sales, "refs 2024" -> refs), p)
    assert(ExcelIo.read(spark, p).schema.fieldNames.toSeq == Seq("k", "amt"))
    val r = ExcelIo.read(spark, p, sheetName = "refs 2024")
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a", 1L)))
    assertFrameEqual(ExcelIo.read(spark, p, sheetIndex = 0), sales)
    val e = intercept[IllegalArgumentException](
      ExcelIo.writeSheets(Seq("bad[name]" -> sales), tmp("x.xlsx")))
    assert(e.getMessage.contains("sheet name"), e.getMessage)
  }

  test("oversized workbook and non-xlsx input fail loudly") {
    val p = tmp("bad.xlsx")
    Files.write(java.nio.file.Paths.get(p), "not a zip".getBytes)
    val e = intercept[Exception](ExcelIo.read(spark, p))
    assert(e.getMessage != null)
  }
}
