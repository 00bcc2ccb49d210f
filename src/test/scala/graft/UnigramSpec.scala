package graft

import graft.llm.TextStatsOps
import org.apache.spark.sql.functions._

/** Viterbi unigram segmentation: hand-computed optima, tie-breaks,
  * the maxTokenLen reachability bound, and fallback arms. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // micro log-probs (negative; higher = likelier)
  private val vocab = Map(
    "the" -> -1000000L, "theory" -> -1500000L, "ory" -> -1200000L,
    "matic" -> -1100000L, "cat" -> -900000L, "s" -> -800000L,
    "ab" -> -2000000L, "a" -> -1000000L, "b" -> -1000000L,
    "abcdefghij" -> -100000L)
  private val Unk = -10000000L

  private def count(w: String): Int =
    Seq(w).toDF("w")
      .select(TextStatsOps.unigramTokenCount(col("w"), vocab, Unk).as("n"))
      .collect()(0).getInt(0)

  test("whole-word beats decomposition when likelier") {
    // theory: -1.5e6 (1 tok) vs the+ory: -2.2e6 (2 tok)
    assert(count("theory") === 1)
  }

  test("composition beats char fallback") {
    // thematic: the+matic = -2.1e6 (2) vs the+5 chars = -51e6; chars -80e6
    assert(count("thematic") === 2)
    // cats: cat+s = -1.7e6
    assert(count("cats") === 2)
    // theorys: theory+s = -2.3e6 vs the+ory+s = -3.0e6
    assert(count("theorys") === 2)
  }

  test("OOV words fall back to one token per char") {
    assert(count("dog") === 3)
  }

  test("equal-score tie resolves to fewer tokens") {
    // ab: whole = -2e6 (1 tok) vs a+b = -2e6 (2 toks)
    assert(count("ab") === 1)
  }

  test("vocab entries beyond maxTokenLen are unreachable") {
    // "abcdefghij" scores -0.1e6 as a whole token, but with the
    // default bound 8 the 10-char window is never formed: the DP must
    // stitch from "ab"/"a"/"b" + unk chars instead
    assert(count("abcdefghij") > 1)
    val wide = Seq("abcdefghij").toDF("w")
      .select(TextStatsOps.unigramTokenCount(col("w"), vocab, Unk,
        maxTokenLen = 10).as("n")).collect()(0).getInt(0)
    assert(wide === 1)
  }

  test("doc-level count sums words; null and empty count 0") {
    val df = Seq(("theory cats dog", 1L), (null.asInstanceOf[String], 2L),
      ("", 3L)).toDF("t", "id")
    val got = df.select(col("id"),
      TextStatsOps.unigramTokenCountDoc(col("t"), vocab, Unk).as("n"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got(1L) === 6L) // 1 + 2 + 3
    assert(got(2L) === 0L) // null text counts 0, never NULL
    assert(got(3L) === 0L)
  }

  test("unigramViterbiPieces: path length equals unigramTokenCount and " +
    "pieces concatenate back to the word") {
    val ws = Seq("theory", "thematic", "cats", "dog", "ab", "theorys",
      "abcdefghij", "zq")
    val got = ws.toDF("w").select(col("w"),
      TextStatsOps.unigramTokenCount(col("w"), vocab, Unk).as("n"),
      TextStatsOps.unigramViterbiPieces(col("w"), vocab, Unk).as("p"))
      .collect()
    got.foreach { r =>
      val w = r.getString(0); val n = r.getInt(1)
      val p = r.getSeq[String](2)
      assert(p.length === n, s"$w: path ${p.mkString("+")} vs count $n")
      assert(p.mkString === w, s"$w: pieces don't reassemble: $p")
    }
    // hand-check one path: thematic = the + matic
    val th = got.find(_.getString(0) == "thematic").get.getSeq[String](2)
    assert(th === Seq("the", "matic"))
  }

  test("trainUnigramLm: hand corpus — frequent multi-char pieces win, " +
    "chars always survive, deterministic, and encoding improves") {
    // "abab" dominates: the trainer must keep a multi-char piece
    // covering it; rare "xy" pieces must lose the prune
    val docs = (Seq.fill(20)("abab abab") ++ Seq.fill(3)("xy") ++
      Seq.fill(5)("cdcd")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val v1 = TextStatsOps.trainUnigramLm(docs, "text", vocabSize = 8,
      rounds = 2, maxTokenLen = 4, minCount = 2)
    val v2 = TextStatsOps.trainUnigramLm(docs, "text", vocabSize = 8,
      rounds = 2, maxTokenLen = 4, minCount = 2)
    assert(v1 === v2, "training must be deterministic")
    // every seen char (meeting minCount) survives
    Seq("a", "b", "c", "d", "x", "y").foreach(c =>
      assert(v1.contains(c), s"char $c pruned: ${v1.keys}"))
    // the dominant word trains to ONE piece
    assert(v1.contains("abab"), s"abab missing: ${v1.keys}")
    val n = Seq("abab").toDF("w").select(
      TextStatsOps.unigramTokenCount(col("w"), v1, -30000000L, 4).as("n"))
      .collect()(0).getInt(0)
    assert(n === 1, s"abab should encode as 1 token, got $n")
    // micro-log scores are negative and likelier pieces score higher
    assert(v1("abab") > v1("x"), s"${v1("abab")} vs ${v1("x")}")
    assert(v1.values.forall(_ < 0))
  }

  test("space-free 10k-char document encodes in linear time " +
    "(backpointer Viterbi fence)") {
    // a CJK-style crawl document survives \s+-splitting as ONE word;
    // the r15 path-copying DP was O(n²·mtl) time and O(n²) memory on
    // it — the backpointer kernel must stay well under 2 s (measured
    // ~10 ms) and reassemble the text exactly
    val cjkVocab = Map("日本" -> -1000000L, "日本語" -> -1200000L,
      "語学" -> -900000L, "学生" -> -800000L, "日" -> -2000000L,
      "本" -> -2000000L, "語" -> -2000000L, "学" -> -2000000L,
      "生" -> -2000000L)
    val vm = new java.util.HashMap[String, java.lang.Long]()
    cjkVocab.foreach { case (k, v) =>
      vm.put(k, java.lang.Long.valueOf(v)) }
    val alphabet = "日本語学生猫犬"
    var st = 7L
    val doc = new String((0 until 10000).map { _ =>
      st = st * 6364136223846793005L + 1442695040888963407L
      alphabet((((st >>> 40) % 7 + 7) % 7).toInt)
    }.toArray)
    val t0 = System.nanoTime()
    val pieces = graft.llm.TextStatsOps.viterbiSegment(doc, vm,
      -10000000L, 8)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(pieces.mkString === doc, "pieces must reassemble the doc")
    assert(pieces.length > 3000 && pieces.length < 10000)
    assert(ms < 2000.0, s"10k-char space-free Viterbi took $ms ms")
  }

  test("trainUnigramLm guards: bad hyperparameters and empty corpus " +
    "fail loudly") {
    val docs = Seq((1L, "ab")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      TextStatsOps.trainUnigramLm(docs, "text", vocabSize = 1)
    }
    intercept[IllegalArgumentException] {
      TextStatsOps.trainUnigramLm(docs, "text", vocabSize = 4, rounds = 0)
    }
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    intercept[IllegalArgumentException] {
      TextStatsOps.trainUnigramLm(empty, "text", vocabSize = 4)
    }
  }

  test("maxTrainRows slice: partitioning/order-invariant, a property " +
    "of the row multiset; >= corpus size equals unsliced; bpe twin") {
    val texts = Seq("banana", "ananas", "bandana", "cabana", "banda",
      "nana", "anaban", "dana")
    val rows = (0 until 40).map(i => texts(i % 8))
    def train(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      TextStatsOps.trainUnigramLm(df, "text", vocabSize = 10,
        rounds = 2, maxTokenLen = 3, minCount = 1, maxTrainRows = 24)
    val base = train(rows.toDF("text"))
    // same multiset, different partitioning and ingestion order
    assert(train(rows.toDF("text").repartition(7)) === base)
    assert(train(rows.reverse.toDF("text").repartition(3)) === base)
    // the slice genuinely excludes rows: training on all 40 differs
    // (3 of 8 words are outside the 24-row slice)
    val full = TextStatsOps.trainUnigramLm(rows.toDF("text"), "text",
      vocabSize = 10, rounds = 2, maxTokenLen = 3, minCount = 1)
    assert(full !== base)
    // a bound >= the corpus is exactly the unsliced training
    assert(TextStatsOps.trainUnigramLm(rows.toDF("text"), "text",
      vocabSize = 10, rounds = 2, maxTokenLen = 3, minCount = 1,
      maxTrainRows = 1000) === full)
    // BPE twin: same invariance contract on the merge trainer
    def trainBpe(df: org.apache.spark.sql.DataFrame) =
      TextStatsOps.bpeTrainMerges(df, "text", numMerges = 4,
        maxTrainRows = 24)
    val bpeBase = trainBpe(rows.toDF("text"))
    assert(trainBpe(rows.reverse.toDF("text").repartition(5)) === bpeBase)
    assert(TextStatsOps.bpeTrainMerges(rows.toDF("text"), "text",
      numMerges = 4, maxTrainRows = 1000) ===
      TextStatsOps.bpeTrainMerges(rows.toDF("text"), "text",
        numMerges = 4))
  }
}
