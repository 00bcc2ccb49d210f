package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** read_fwf (reference: pandas/io/parsers.py:721, FixedWidthReader
  * :3340): fixed-width text → columns, as a plain projection over
  * `spark.read.text` — each column is a codegen'd substring+trim+cast,
  * the scan stays a parallel line reader, and column pruning drops
  * unreferenced substrings like any other projection.
  */
object FwfReader {

  /** Read with explicit colspecs: (name, startInclusive0Based,
    * endExclusive, sparkType). */
  def read(spark: SparkSession, path: String,
      colspecs: Seq[(String, Int, Int, String)],
      skipHeader: Boolean = false): DataFrame = {
    // csv with an unused separator = a parallel line reader with
    // correct PER-FILE header skipping (text() cannot drop headers
    // without a shuffle or per-partition index games).
    val lines = spark.read
      .option("header", skipHeader.toString)
      .option("sep", "\u0001").option("quote", "\u0000")
      .csv(path)
    val line = col(lines.columns.head)
    lines.select(colspecs.map { case (name, lo, hi, tpe) =>
      trim(substring(line, lo + 1, hi - lo)).cast(tpe).as(name)
    }: _*)
  }

  /** Infer colspecs pandas-style from a driver-side sample: column
    * boundaries are maximal runs of positions that are blank in EVERY
    * sampled line (reference FixedWidthReader.detect_colspecs
    * io/parsers.py:3388). Sampling is a `limit(n)` — never a full scan.
    */
  def inferColspecs(spark: SparkSession, path: String, sample: Int = 100)
      : Seq[(Int, Int)] = {
    val lines = spark.read.text(path).limit(sample)
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    require(lines.nonEmpty, s"no lines to infer fwf layout from: $path")
    val width = lines.map(_.length).max
    val blank = Array.tabulate(width) { i =>
      lines.forall(l => i >= l.length || l.charAt(i) == ' ')
    }
    val specs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < width) {
      if (!blank(i)) {
        val start = i
        while (i < width && !blank(i)) i += 1
        specs += ((start, i))
      } else i += 1
    }
    specs.toSeq
  }
}
