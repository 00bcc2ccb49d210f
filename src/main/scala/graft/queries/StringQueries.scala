package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** String accessor surface (SURVEY §2.9 strings; reference:
  * pandas/core/strings.py:1783 StringMethods — contains :2516, replace
  * :2527, split :2388, pad :2538, slice :2636, extract :2761, len/case
  * :1737-1775, cat :2046). All codegen'd Spark built-ins — no UDFs.
  * Null propagation matches pandas' na=NaN default.
  */
object StringQueries extends QueryModule {

  private val T = Tables

  def defs: Seq[QueryDef] = Seq(

    // str.normalize('NFC'): the fixture text is ASCII, so a decomposed
    // accent (e + U+0301) is planted deterministically and both engines
    // must compose it — java.text.Normalizer vs DuckDB nfc_normalize.
    QueryDef("str_normalize",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        graft.functions.StrOps.normalizeUnicode(
          concat(col("text"), lit(" caf"), lit("é")), "NFC").as("norm")),
      Some("""SELECT doc_id,
             |  nfc_normalize(text || ' caf' || 'e' || chr(769)) AS norm
             |FROM documents""".stripMargin)),

    // str.wrap(40): greedy word wrap as an aggregate-HOF fold; identical
    // fold in DuckDB via list_reduce. Words are materialized as a column
    // before the lambda (HOF re-evaluation rule).
    QueryDef("str_wrap",
      (s, d) => T.documents(s, d)
        .withColumn("__w", split(col("text"), " "))
        .select(col("doc_id"),
          graft.functions.StrOps.wrap(col("__w"), 40).as("wrapped")),
      Some("""SELECT doc_id,
             |  list_reduce(string_split(text, ' '), (acc, w) ->
             |    CASE WHEN length(string_split(acc, chr(10))[-1]) + length(w) + 1 <= 40
             |         THEN acc || ' ' || w
             |         ELSE acc || chr(10) || w END) AS wrapped
             |FROM documents""".stripMargin)),

    QueryDef("str_basic",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        length(col("text")).as("len"),
        upper(col("source")).as("up"),
        lower(col("lang")).as("lo"),
        reverse(col("source")).as("rev"),
        repeat(col("lang"), 3).as("rep")),
      Some("""SELECT doc_id, length(text) AS len, upper(source) AS up,
             |  lower(lang) AS lo, reverse(source) AS rev, repeat(lang, 3) AS rep
             |FROM documents""".stripMargin)),

    QueryDef("str_substr_pad",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        substring(col("text"), 5, 12).as("sub"),
        lpad(col("source"), 8, "*").as("lp"),
        rpad(col("source"), 8, "*").as("rp"),
        trim(lpad(col("source"), 8, " ")).as("trimmed")),
      Some("""SELECT doc_id, substr(text, 5, 12) AS sub, lpad(source, 8, '*') AS lp,
             |  rpad(source, 8, '*') AS rp, trim(lpad(source, 8, ' ')) AS trimmed
             |FROM documents""".stripMargin)),

    QueryDef("str_split_tokens",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct")),
      Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct
             |FROM documents""".stripMargin)),

    // explode → global word frequencies: the scalable text-stats shape
    // (shuffle on word, map-side combine).
    QueryDef("str_wordcount",
      (s, d) => T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt")),
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word""".stripMargin)),

    QueryDef("str_regexp_extract",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        regexp_extract(col("text"), "qu[a-z]+", 0).as("m")),
      Some("SELECT doc_id, regexp_extract(text, 'qu[a-z]+') AS m FROM documents")),

    QueryDef("str_regexp_replace",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        regexp_replace(col("text"), "data|table", "X").as("redacted")),
      Some("""SELECT doc_id, regexp_replace(text, 'data|table', 'X', 'g') AS redacted
             |FROM documents""".stripMargin)),

    QueryDef("str_predicates",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        col("text").contains("spark").as("has_spark"),
        col("source").startsWith("src1").as("src1x"),
        col("source").endsWith("5").as("ends5"),
        col("text").rlike("^[a-z ]+$").as("all_lower")),
      Some("""SELECT doc_id, contains(text, 'spark') AS has_spark,
             |  starts_with(source, 'src1') AS src1x,
             |  ends_with(source, '5') AS ends5,
             |  regexp_matches(text, '^[a-z ]+$') AS all_lower
             |FROM documents""".stripMargin)),

    QueryDef("str_concat_ws",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        concat_ws("|", col("lang"), col("source"),
          col("n_chars").cast("string")).as("joined")),
      Some("""SELECT doc_id, lang || '|' || source || '|' || CAST(n_chars AS VARCHAR) AS joined
             |FROM documents""".stripMargin)),

    QueryDef("str_instr",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        instr(col("text"), "data").as("pos")),
      Some("SELECT doc_id, strpos(text, 'data') AS pos FROM documents")),

    QueryDef("str_levenshtein_pairs",
      (s, d) => {
        val a = T.documents(s, d).filter(col("doc_id") < 30)
          .select(col("doc_id").as("id_a"), col("source").as("src_a"))
        val b = T.documents(s, d).filter(col("doc_id") < 30)
          .select(col("doc_id").as("id_b"), col("source").as("src_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("src_a"), col("src_b")).as("dist"))
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  levenshtein(a.source, b.source) AS dist
             |FROM documents a, documents b
             |WHERE a.doc_id < 30 AND b.doc_id < 30 AND a.doc_id < b.doc_id""".stripMargin)),

    // str.count(pattern): non-overlapping regexp match count.
    QueryDef("str_regexp_count",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        regexp_count(col("text"), lit("[aeiou]")).as("vowels"),
        regexp_count(col("text"), lit("the")).as("thes")),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[aeiou]')) AS vowels,
             |  len(regexp_extract_all(text, 'the')) AS thes
             |FROM documents""".stripMargin)),

    // Series.explode with positions (posexplode): index-preserving
    // list expansion — the Generator shape with ordinality.
    QueryDef("series_explode_pos",
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |SELECT doc_id, i - 1 AS pos, w[i] AS word
             |FROM t, UNNEST(generate_series(1, len(w))) AS s(i)""".stripMargin)),

    // str.count(pat) + str.findall(pat) head (reference strings.py:2450
    // count, :2610 findall) — regexp_count / regexp_extract_all.
    QueryDef("str_count_findall",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        regexp_count(col("text"), lit("ta[a-z]+")).as("n_ta"),
        // try_element_at: ANSI element_at throws on the empty-match array
        try_element_at(regexp_extract_all(col("text"), lit("ta[a-z]+"), lit(0)),
          lit(1)).as("first_ta")),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, 'ta[a-z]+')) AS n_ta,
             |  regexp_extract_all(text, 'ta[a-z]+')[1] AS first_ta
             |FROM documents""".stripMargin)),

    // explode with keep-empty (pandas explode leaves a NaN row for an
    // empty list — Spark explode_outer): arrays are emptied
    // deterministically for short docs so the outer branch is exercised.
    QueryDef("explode_outer_empty",
      (s, d) => {
        val arr = when(col("n_chars") < 60, array().cast("array<string>"))
          .otherwise(split(col("text"), " "))
        T.documents(s, d).select(col("doc_id"), explode_outer(arr).as("word"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CASE WHEN n_chars < 60 THEN [] ELSE string_split(text, ' ') END AS w
             |  FROM documents)
             |SELECT doc_id,
             |  unnest(CASE WHEN len(w) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE w END) AS word
             |FROM t""".stripMargin)),

    // str.encode/decode round-trip + split().get(n) + array join
    // (reference strings.py:2651 encode/decode, :2506 get, :2511 join).
    QueryDef("str_encode_get_join",
      (s, d) => {
        val words = split(col("text"), " ")
        T.documents(s, d).select(col("doc_id"),
          length(encode(col("source"), "utf-8")).as("enc_len"),
          decode(encode(col("source"), "utf-8"), "utf-8").as("roundtrip"),
          element_at(words, 2).as("second_word"),
          array_join(slice(words, 1, 3), "-").as("first3"))
      },
      Some("""SELECT doc_id, octet_length(encode(source)) AS enc_len,
             |  decode(encode(source)) AS roundtrip,
             |  string_split(text, ' ')[2] AS second_word,
             |  array_to_string(string_split(text, ' ')[1:3], '-') AS first3
             |FROM documents""".stripMargin)),

    // str.repeat / reversed slicing / str.translate
    // (reference strings.py:698 str_repeat, :2106 str_translate).
    QueryDef("str_misc",
      (s, d) => T.documents(s, d).select(col("doc_id"),
        repeat(col("source"), 2).as("rep2"),
        reverse(col("source")).as("rev"),
        translate(col("source"), "aeiou", "AEIOU").as("tr")),
      Some("""SELECT doc_id, repeat(source, 2) AS rep2, reverse(source) AS rev,
             |  translate(source, 'aeiou', 'AEIOU') AS tr
             |FROM documents""".stripMargin)),

    // JSON scalar extraction over events.props (reference json_normalize
    // analog at the scalar level).
    QueryDef("json_extract_props",
      (s, d) => T.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events""".stripMargin))
  )
}
