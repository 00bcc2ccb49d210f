package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two str-accessor stragglers (reference pandas/core/strings.py:
  * :2737 wrap, :2806 normalize).
  */
object StrOps {

  /** str.wrap(width): greedy word wrap — lines hold whole words up to
    * `width` chars, words longer than width get their own line unbroken
    * (textwrap with break_long_words=False). A fold over the word array
    * (aggregate HOF, codegen'd) with the accumulated text itself as
    * state: the current line is the substring after the last newline.
    * NOTE (engine-wide HOF rule): pass a MATERIALIZED array column —
    * lambdas re-evaluate captured subtrees per element.
    */
  def wrap(words: Column, width: Int): Column = {
    val rest = slice(words, lit(2), greatest(size(words) - 1, lit(0)))
    aggregate(rest, element_at(words, 1), (acc, w) => {
      val lastLine = element_at(split(acc, "\n"), -1)
      when(length(lastLine) + length(w) + 1 <= width, concat(acc, lit(" "), w))
        .otherwise(concat(acc, lit("\n"), w))
    })
  }

  /** str.normalize(form): Unicode normalization via java.text.Normalizer.
    * No Spark built-in exists; this is the one deliberate UDF in the
    * string surface (a JVM-local call, no Python round-trip — still a
    * per-row scalar inside the scan stage).
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val u = udf((s: String) =>
      if (s == null) null else java.text.Normalizer.normalize(s, f))
    u(c)
  }
}
