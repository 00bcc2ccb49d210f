package graft

import graft.llm.TextStatsOps
import org.apache.spark.sql.functions._

/** stripHtml / sentences edge cases the registry gate's planted pages
  * don't isolate individually. */
class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextStatsOps.stripHtml(col("t"))).head().getString(0)

  test("stripHtml: blocks, prose angle brackets, entity order, case") {
    // script content with embedded < and quotes vanishes wholesale
    assert(strip("""a<script>if (1 < 2) s = "x";</script>b""") == "a b")
    // style too, case-insensitive tag names
    assert(strip("a<STYLE>p{}</STYLE>b<BR>c") == "a b\nc")
    // prose '<' is not a tag opener (tags start with letter or /)
    assert(strip("x < y and x <3 z") == "x < y and x <3 z")
    // unclosed tag still strips; attributes with '>' edge not claimed
    assert(strip("<p class=big>hi") == "hi")
    // &amp; decodes LAST: double-encoded stays single-encoded
    assert(strip("&amp;lt; &lt; &amp;") == "&lt; < &")
    // block closers become newlines, tags become spaces, runs collapse,
    // spaces hugging newlines absorbed, ends stripped
    assert(strip("<div>one</div><div>two</div>") == "one\ntwo")
    assert(strip("<p>a</p>\n<p>b</p>") == "a\n\nb") // source \n preserved
  }

  test("sentences: terminal runs, abbreviation-blind, no-split cases") {
    def sent(s: String): Seq[String] =
      Seq(Tuple1(s)).toDF("t")
        .select(TextStatsOps.sentences(col("t"))).head().getSeq[String](0)
    assert(sent("Dr. Smith went. Done!") == Seq("Dr", "Smith went", "Done"))
    assert(sent("Hi!!Twice") == Seq("Hi!!Twice")) // needs space or end
    assert(sent("One?? Two!? End.") == Seq("One", "Two", "End"))
    assert(sent("no terminal punct") == Seq("no terminal punct"))
    assert(sent("") == Seq())
    assert(sent("  Lead. trail  ") == Seq("Lead", "trail"))
  }
}
