package graft

import graft.llm.UrlOps
import org.apache.spark.sql.functions._

/** UrlOps blocklist contracts beyond the differential gate: suffix
  * (not substring) matching, the join tier's equivalence with the
  * literal tier, and list normalization. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://example.com/a"),
    (2L, "https://cdn.example.com/b"),
    (3L, "https://badexample.com/c"),      // substring trap
    (4L, "https://example.com.evil.net/d"), // prefix trap
    (5L, "http://EXAMPLE.COM/upper"),
    (6L, "nonsense"),
    (7L, "https://deep.a.b.example.com/e"),
    (8L, "https://other.org/f")
  ).toDF("id", "url")

  test("blockedDomain: dot-suffix semantics, case-folded, unparseable " +
    "is not blocked") {
    val got = urls.select(col("id"),
      UrlOps.blockedDomain(col("url"), Seq(".Example.COM")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true, 6L -> false, 7L -> true, 8L -> false))
  }

  test("filterBlockedDomains (join tier) keeps exactly the literal " +
    "tier's survivors") {
    val bl = Seq("example.com", "other.org").toDF("domain")
    val joined = UrlOps.filterBlockedDomains(urls, "id", "url", bl)
      .select("id").collect().map(_.getLong(0)).toSet
    val literal = urls.filter(!UrlOps.blockedDomain(col("url"),
        Seq("example.com", "other.org")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(joined === literal)
    assert(joined === Set(3L, 4L, 6L))
  }

  test("blockedDomain rejects an effectively empty list") {
    val e = intercept[IllegalArgumentException] {
      UrlOps.blockedDomain(col("url"), Seq("  ", "."))
    }
    assert(e.getMessage.contains("empty"))
  }
}
