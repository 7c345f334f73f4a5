package graft

import org.apache.spark.sql.functions._

import graft.ops.Profiling
import graft.text.{Decontaminate, Retrieval}

/** Decontamination, BM25 retrieval, and column profiling. */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("decontaminate flags only docs sharing a full w-shingle with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains benchmark 3-shingle "beta gamma delta"
      (1L, "x beta gamma delta y"),
      // shares tokens but never w consecutive ones
      (2L, "beta x gamma y delta"),
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val hits = Decontaminate.overlap(corpus, bench, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L))
    assert(hits(1L) == 1L) // exactly one shared shingle
  }

  test("decontaminate short-doc path: sub-w docs compare as whole texts") {
    val bench = Seq((100L, "tiny doc")).toDF("doc_id", "text")
    val corpus = Seq((1L, "tiny doc"), (2L, "tiny other")).toDF("doc_id", "text")
    val hits = Decontaminate.overlap(corpus, bench, "doc_id", "text", w = 13)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L))
  }

  test("decontaminate: blank docs never match blank benchmark entries") {
    val bench = Seq((100L, ""), (101L, "real benchmark text")).toDF("doc_id", "text")
    val corpus = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(Decontaminate.overlap(corpus, bench, "doc_id", "text", w = 3).isEmpty)
  }

  test("bm25 ranks term-bearing docs and weights rare terms above common ones") {
    // 'rare' appears in 1 of 4 docs, 'common' in 3 of 4.
    val docs = Seq(
      (1L, "rare word word word"),
      (2L, "common word word word"),
      (3L, "common word word word"),
      (4L, "common word word word")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // every doc matches >= 1 term
    // Same tf (1) and same dl, so the rare-term doc must outscore.
    assert(out(1L) > out(2L))
    assert(out(2L) == out(3L) && out(3L) == out(4L))
  }

  test("bm25 drops docs matching no term and counts matched terms") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "cherry date")).toDF("doc_id", "text")
    val rows = Retrieval.bm25(docs, "doc_id", "text", Seq("apple", "banana"))
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    assert(rows.head.getLong(2) == 2L) // n_matched
  }

  test("profile reports nulls, distincts, and native-typed min/max per column") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(10L), None),
      (None, Some("a")),
      (Some(3L), Some("a"))).toDF("num", "str")
    val p = Profiling.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = p("num")
    assert(num.getLong(1) == 4L && num.getLong(2) == 1L) // n_rows, n_nulls
    assert(num.getDouble(3) == 0.25)
    assert(num.getLong(4) == 2L) // distinct ignores null
    // Numeric min/max then cast — NOT lexicographic ("10" < "3" as strings).
    assert(num.getString(5) == "3" && num.getString(6) == "10")
    val str = p("str")
    assert(str.getLong(2) == 1L && str.getLong(4) == 2L)
    assert(str.getString(5) == "a" && str.getString(6) == "b")
  }
}
