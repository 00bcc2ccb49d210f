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

  // ---- driver-side conversions (reference frame.py to_dict:1119,
  // from_records:1354, itertuples:887). pandas materializes the whole
  // frame for these; here to_dict keeps the bounded-head contract of
  // the other driver-side renders (`n` rows, raise to taste), while
  // itertuples STREAMS partitions through the driver — the only
  // collect-shaped iteration that stays sane on a large frame. ----

  /** to_dict(orient='records'): head-n rows as column→value maps. */
  def toDictRecords(df: DataFrame, n: Int = 1000): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.limit(n).collect().toSeq.map(r =>
      cols.iterator.zip(r.toSeq.iterator).toMap)
  }

  /** to_dict(orient='list'): column → head-n value sequence. */
  def toDictList(df: DataFrame, n: Int = 1000): Map[String, Seq[Any]] = {
    val rows = df.limit(n).collect()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> rows.toSeq.map(_.get(i))
    }.toMap
  }

  /** to_dict(orient='dict'): column → (RangeIndex position → value) —
    * the pandas default orient, with the default integer index. */
  def toDictColumnMajor(df: DataFrame, n: Int = 1000)
      : Map[String, Map[Long, Any]] = {
    val rows = df.limit(n).collect()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> rows.toSeq.zipWithIndex.map { case (r, pos) =>
        pos.toLong -> r.get(i)
      }.toMap
    }.toMap
  }

  /** to_dict(orient='split'): (columns, head-n data rows). */
  def toDictSplit(df: DataFrame, n: Int = 1000)
      : (Seq[String], Seq[Seq[Any]]) =
    (df.columns.toSeq, df.limit(n).collect().toSeq.map(_.toSeq))

  /** itertuples: a driver-side iterator of row value tuples, streamed
    * one partition at a time via toLocalIterator — never a full
    * collect. */
  def itertuples(df: DataFrame): Iterator[Seq[Any]] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.map(_.toSeq)
  }

  /** from_records: driver-side records → DataFrame. Column order is
    * first-seen across records; per-column type comes from the first
    * non-null value across the common scalar/temporal/decimal types
    * (mixed numeric widths in one column are the caller's error, as in
    * pandas' object-dtype trap). Missing keys become nulls. Values of a
    * type with no Spark mapping, or inconsistent with the column's
    * inferred type, fail HERE with a named column/position — not as a
    * ClassCastException deep inside execution. */
  def fromRecords(spark: org.apache.spark.sql.SparkSession,
      records: Seq[Map[String, Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cols = records.foldLeft(Vector.empty[String]) { (acc, m) =>
      acc ++ m.keys.filterNot(acc.contains)
    }
    def typeOf(v: Any): Option[DataType] = v match {
      case _: Int => Some(IntegerType)
      case _: Long => Some(LongType)
      case _: Double => Some(DoubleType)
      case _: Float => Some(FloatType)
      case _: Short => Some(ShortType)
      case _: Byte => Some(ByteType)
      case _: Boolean => Some(BooleanType)
      case _: String => Some(StringType)
      case _: java.math.BigDecimal => Some(DecimalType(38, 18))
      case _: BigDecimal => Some(DecimalType(38, 18))
      case _: Array[Byte] => Some(BinaryType)
      case _: java.sql.Timestamp => Some(TimestampType)
      case _: java.time.Instant => Some(TimestampType)
      case _: java.time.LocalDateTime => Some(TimestampNTZType)
      case _: java.sql.Date => Some(DateType)
      case _: java.time.LocalDate => Some(DateType)
      case _ => None
    }
    val schema = StructType(cols.map { c =>
      val first = records.iterator.map(_.getOrElse(c, null))
        .find(_ != null)
      val dt = first match {
        case None => StringType
        case Some(v) => typeOf(v).getOrElse(throw new IllegalArgumentException(
          s"from_records: column '$c' has unsupported value type " +
            s"${v.getClass.getName} (value: $v)"))
      }
      StructField(c, dt, nullable = true)
    })
    // validate every cell against the inferred column type up front:
    // a clear construction-time error names the record and column
    records.zipWithIndex.foreach { case (m, i) =>
      schema.fields.foreach { f =>
        m.getOrElse(f.name, null) match {
          case null => ()
          case v =>
            val vt = typeOf(v).getOrElse(throw new IllegalArgumentException(
              s"from_records: record $i column '${f.name}' has unsupported " +
                s"value type ${v.getClass.getName} (value: $v)"))
            if (vt != f.dataType) throw new IllegalArgumentException(
              s"from_records: record $i column '${f.name}' is $vt but the " +
                s"column inferred ${f.dataType} from the first non-null " +
                "value — mixed types in one column (the pandas object-" +
                "dtype trap); cast your records to one type")
        }
      }
    }
    val rows = records.map(m => Row.fromSeq(cols.map(c => m.getOrElse(c, null))))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
