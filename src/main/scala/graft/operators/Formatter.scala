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

  private def headRows(df: DataFrame, n: Int): (Seq[Seq[String]], Boolean) = {
    val head = df.limit(n + 1).collect()
    (head.take(n).toSeq.map(_.toSeq.map {
      case null => "NaN"
      case v => v.toString
    }), head.length > n)
  }

  /** to_html (reference io/formats/format.py to_html): head-`n` rows as a
    * minimal escaped HTML table — same driver-side truncation contract. */
  def toHtmlTable(df: DataFrame, n: Int = 20): String = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val (rows, truncated) = headRows(df, n)
    val thead = df.columns.map(c => s"<th>${esc(c)}</th>").mkString
    val tbody = rows.map(r =>
      "<tr>" + r.map(c => s"<td>${esc(c)}</td>").mkString + "</tr>")
    val ell = if (truncated) Seq(s"<tr><td colspan=${df.columns.length}>...</td></tr>")
      else Nil
    (Seq("<table>", s"<thead><tr>$thead</tr></thead>", "<tbody>") ++
      tbody ++ ell ++ Seq("</tbody>", "</table>")).mkString("\n")
  }

  /** to_latex (reference io/formats/format.py to_latex): tabular body
    * with escaped cells. */
  def toLatexTable(df: DataFrame, n: Int = 20): String = {
    // quoteReplacement: the replacement string is itself interpreted by
    // Matcher.appendReplacement, so a bare "\\$" is an illegal group ref
    // and any cell containing '$' would crash the render. Backslash is
    // escaped first (to \textbackslash) so it can't double-escape.
    def esc(s: String): String = {
      val noBs = s.replace("\\", "\\textbackslash{}")
      "([&%$#_{}])".r.replaceAllIn(noBs,
        m => java.util.regex.Matcher.quoteReplacement("\\" + m.group(1)))
    }
    val (rows, truncated) = headRows(df, n)
    val colspec = df.schema.fields.map(_ => "l").mkString
    val lines = Seq(s"\\begin{tabular}{$colspec}", "\\toprule",
      df.columns.map(esc).mkString(" & ") + " \\\\", "\\midrule") ++
      rows.map(r => r.map(esc).mkString(" & ") + " \\\\") ++
      (if (truncated) Seq("... \\\\") else Nil) ++
      Seq("\\bottomrule", "\\end{tabular}")
    lines.mkString("\n")
  }
}
