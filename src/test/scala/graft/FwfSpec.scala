package graft

import graft.sources.FwfReader
import java.nio.file.Files

/** read_fwf: explicit colspecs, per-file header skip, and pandas-style
  * colspec inference from blank columns. */
class FwfSpec extends SparkSpec {

  private def writeFwf(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-fwf", ".txt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("explicit colspecs with types and header skip") {
    val path = writeFwf(Seq(
      "id   name      qty",
      "1    alpha     10 ",
      "22   beta r    7  ",
      "333  gamma     123"))
    val df = FwfReader.read(spark, path, Seq(
      ("id", 0, 5, "int"), ("name", 5, 15, "string"), ("qty", 15, 18, "int")),
      skipHeader = true)
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1, "alpha", 10), (22, "beta r", 7), (333, "gamma", 123)))
  }

  test("inferColspecs finds blank-separated columns") {
    val path = writeFwf(Seq(
      "1    alpha     10",
      "22   beta      7 ",
      "333  gamma     12"))
    val specs = FwfReader.inferColspecs(spark, path)
    assert(specs == Seq((0, 3), (5, 10), (15, 17)))
  }
}
