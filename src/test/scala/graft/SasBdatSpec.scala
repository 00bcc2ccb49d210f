package graft

import org.apache.spark.sql.functions._
import graft.sources.SasBdatIo

/** sas7bdat reader vs REAL SAS-written files: the goldens under
  * src/test/resources/sas7bdat/ are cell dumps of the reference's own
  * sas7bdat fixtures produced by the reader of record (the reference's
  * parser), so every cell of every fixture is an interop assertion
  * against genuine SAS output — not a self-roundtrip.
  *   cars:         pure numerics incl. 3- and 4-byte truncated doubles
  *   datetime:     DATE/DATETIME/MINGUO serials, ms precision, and the
  *                 1677/2262 rows that probe epoch extremes
  *   productsales: strings + numerics + a DATE column at 1440 rows
  *   test1:        100 mixed columns with missing doubles AND strings
  */
class SasBdatSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/pandas/tests/io/sas/data"

  private def haveFixtures = new java.io.File(fixtureDir).isDirectory

  test("sas7bdat: cell-exact vs goldens from real SAS files, " +
      "page-range split-parallel") {
    assume(haveFixtures)
    for (name <- Seq("cars", "datetime", "productsales", "test1")) {
      // splitBytes below one page forces multiple page-range tasks
      val df = SasBdatIo.read(spark, s"$fixtureDir/$name.sas7bdat",
        splitBytes = 8192)
      val golden = spark.read.schema(df.schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(getClass.getResource(s"/sas7bdat/$name.csv").toString)
      assert(df.count() == golden.count(), s"$name row count")
      val diff = df.exceptAll(golden).count() + golden.exceptAll(df).count()
      assert(diff == 0, s"$name: $diff differing rows")
    }
  }

  test("sas7bdat: directory read decodes each file with ITS OWN " +
      "metadata and unions rows") {
    assume(haveFixtures)
    val dir = java.nio.file.Files.createTempDirectory("sasdir")
    for (n <- Seq("a", "b")) java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$fixtureDir/cars.sas7bdat"),
      dir.resolve(s"$n.sas7bdat"))
    val df = SasBdatIo.read(spark, dir.toString, splitBytes = 8192)
    assert(df.count() == 2 * 392)
    // the union is two exact copies of the single-file read
    val one = SasBdatIo.read(spark, s"$fixtureDir/cars.sas7bdat")
    assert(df.exceptAll(one.unionAll(one)).count() == 0)
  }

  test("sas7bdat: metadata — names, widths, types, formats, labels") {
    assume(haveFixtures)
    val m = SasBdatIo.parseMeta(() => {
      val p = new org.apache.hadoop.fs.Path(s"$fixtureDir/cars.sas7bdat")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    })
    assert(m.datasetName == "CARS")
    assert(m.rowCount == 392 && m.rowLength == 23)
    assert(m.columns.map(_.name) == Seq("MPG", "CYL", "ENG", "WGT"))
    assert(m.columns.map(_.width) == Seq(8, 3, 8, 4))
    assert(m.columns.forall(!_.isString))
    assert(m.columns.head.label == "miles per gallon")
  }

  test("sas7bdat: compressed files are rejected loudly, not misread") {
    assume(haveFixtures)
    for (name <- Seq("test2", "test3")) { // SASYZCRL / SASYZCR2
      val e = intercept[Exception] {
        SasBdatIo.read(spark, s"$fixtureDir/$name.sas7bdat").count()
      }
      assert(e.getMessage.contains("compress"),
        s"$name: wrong error: ${e.getMessage}")
    }
  }

  test("sas7bdat: non-sas input fails on magic, not downstream") {
    val p = java.nio.file.Files.createTempFile("notsas", ".sas7bdat")
    java.nio.file.Files.write(p, Array.fill[Byte](4096)(7))
    val e = intercept[Exception] {
      SasBdatIo.read(spark, p.toString).count()
    }
    assert(e.getMessage.contains("magic"))
  }
}
