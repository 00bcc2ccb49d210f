package graft

import graft.functions.LevenshteinWithin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Banded early-exit edit-distance predicate: equal to the builtin's
  * dist <= k on random strings for every k, band edge cases, and the
  * engine-side expression path (codegen static call). */
class LevenshteinWithinSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("matches the builtin on random string pairs for k in 0..4") {
    val gen = for {
      a <- Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      nb <- Gen.chooseNum(0, 10)
      b <- Gen.listOfN(nb, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    } yield (a, b)
    val pairs = (0 until 300).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(3000L + i)))
    def ref(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    pairs.foreach { case (a, b) =>
      val d = ref(a, b)
      for (k <- 0 to 4)
        assert(LevenshteinWithin.within(u(a), u(b), k) === (d <= k),
          s"('$a','$b') d=$d k=$k")
    }
  }

  test("band edges: length gap, empty strings, k=0 exact equality") {
    assert(!LevenshteinWithin.within(u("abc"), u("abcdef"), 2)) // gap 3
    assert(LevenshteinWithin.within(u(""), u("ab"), 2))
    assert(!LevenshteinWithin.within(u(""), u("abc"), 2))
    assert(LevenshteinWithin.within(u("same"), u("same"), 0))
    assert(!LevenshteinWithin.within(u("same"), u("samx"), 0))
    assert(!LevenshteinWithin.within(u("a"), u("b"), -1))
  }

  test("expression path agrees with the builtin inside a plan") {
    LevenshteinWithin.register(spark)
    val df = Seq(("parquet", "parqeut"), ("kitten", "sitting"),
      ("abc", "abc"), ("abc", "xyz")).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        expr("levenshtein_within(a, b, 2)").as("w"),
        (levenshtein(col("a"), col("b")) <= 2).as("ref"))
      .collect()
    got.foreach(r => assert(r.getBoolean(2) === r.getBoolean(3),
      s"${r.getString(0)}/${r.getString(1)}"))
  }
}
