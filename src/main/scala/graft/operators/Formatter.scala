package graft.operators

import org.apache.spark.sql.DataFrame

/** to_string / repr rendering (reference: pandas/io/formats/format.py,
  * generic.py:2691) — a driver-side utility over a collected HEAD, the
  * only sane contract at scale (pandas itself truncates display).
  */
object Formatter {

  /** pandas-style fixed-width table of the first `n` rows: right-aligned
    * numeric columns, left-aligned strings, `null` shown as NaN-style
    * empty marker, a trailing ellipsis row when truncated. */
  def toStringTable(df: DataFrame, n: Int = 20): String = {
    val numeric = df.schema.fields.map(f =>
      f.dataType.typeName match {
        case "byte" | "short" | "integer" | "long" | "float" | "double" | "decimal" => true
        case t => t.startsWith("decimal")
      })
    val head = df.limit(n + 1).collect()
    val truncated = head.length > n
    val rows = head.take(n).map(_.toSeq.map {
      case null => "NaN"
      case v => v.toString
    })
    val headers = df.columns.toSeq
    val widths = headers.indices.map { i =>
      (headers(i).length +: rows.map(_(i).length)).max
    }
    def fmt(cells: Seq[String]): String =
      cells.zipWithIndex.map { case (c, i) =>
        if (numeric(i)) c.reverse.padTo(widths(i), ' ').reverse
        else c.padTo(widths(i), ' ')
      }.mkString("  ").stripTrailing()
    val body = (fmt(headers) +: rows.map(r => fmt(r))).mkString("\n")
    if (truncated) body + "\n..." else body
  }
}
