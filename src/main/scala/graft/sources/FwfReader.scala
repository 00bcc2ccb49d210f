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
      // blank field = missing (pandas reads it as NaN); the explicit
      // null keeps ANSI casts from rejecting '' for numeric types
      val cell = trim(substring(line, lo + 1, hi - lo))
      when(cell === "", lit(null)).otherwise(cell).cast(tpe).as(name)
    }: _*)
  }

  /** Fixed-width writer. The reference has no to_fwf — this exists so
    * read_fwf faces the differential oracle through a real file (the
    * excel/stata/html round-trip pattern). Each column renders with the
    * engine's canonical string cast, right-padded to its measured max
    * width plus one separator blank; the measurement is a single-row
    * bounded aggregate pre-pass (the StataIo width pattern), and the
    * write itself is a pure projection through `spark.write.text` —
    * fully parallel, one output file per task. Returns the colspecs
    * `read` needs to restore the original schema.
    *
    * Nulls render as all-blank fields; `read`'s trim+cast turns a blank
    * field back into null for every non-string type. Limits (documented,
    * not silently corrupting): string cells must not carry leading or
    * trailing blanks — the fixed-width format itself cannot represent
    * them — and a blank string cell reads back as null.
    */
  def write(df: DataFrame, path: String): Seq[(String, Int, Int, String)] = {
    val fields = df.schema.fields.toSeq
    val text = df.select(fields.map(f =>
      coalesce(col(f.name).cast("string"), lit("")).as(f.name)): _*)
    val measured = text
      .select(fields.map(f => max(length(col(f.name))).as(f.name)): _*)
      .head()
    val widths = fields.indices.map { i =>
      (if (measured.isNullAt(i)) 1 else math.max(1, measured.getInt(i))) + 1
    }
    text.select(concat(fields.zip(widths).map { case (f, w) =>
        rpad(col(f.name), w, " ")
      }: _*).as("line"))
      .write.mode("overwrite").text(path)
    val starts = widths.scanLeft(0)(_ + _)
    fields.zipWithIndex.map { case (f, i) =>
      (f.name, starts(i), starts(i + 1), f.dataType.catalogString)
    }
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
