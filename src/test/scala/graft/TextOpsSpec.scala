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

  test("decontaminate hashed-gram path finds the same documents") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x beta gamma delta y"),
      (2L, "beta x gamma y delta")).toDF("doc_id", "text")
    val str = Decontaminate.overlap(corpus, bench, "doc_id", "text", w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashed = Decontaminate.overlap(corpus, bench, "doc_id", "text", w = 3,
      hashGrams = true).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hashed == str)
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

  test("encoding signals: mojibake counted, controls counted and stripped, " +
      "ascii fraction exact") {
    import graft.text.Scrub
    // Row 2 is 'double-encoded': \u00C3\u00A1 (a acute read as Latin-1)
    // plus \u00E2 — 20 chars, 3 non-ascii. Row 3 carries two C0 controls;
    // the tab must survive both the count and the strip.
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "double\u00C3\u00A1encoded\u00E2here"),
      (3L, "binary\u0001spill\u0002\ttab kept"),
      (4L, "")).toDF("id", "t")
    val out = df.select(col("id"),
        Scrub.countMojibake(col("t")).as("moji"),
        Scrub.countControl(col("t")).as("ctrl"),
        Scrub.asciiFraction(col("t")).as("frac"),
        Scrub.stripControl(col("t")).as("clean"))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("moji")).toSeq == Seq(0L, 2L, 0L, 0L))
    assert(out.map(_.getAs[Long]("ctrl")).toSeq == Seq(0L, 0L, 2L, 0L))
    assert(out(0).getAs[Double]("frac") == 1.0)
    assert(out(1).getAs[Double]("frac") == 1.0 - 3.0 / 20.0)
    assert(out(3).getAs[Double]("frac") == 1.0) // empty text pins to 1.0
    assert(out(2).getAs[String]("clean") == "binaryspill\ttab kept")
  }

  test("rrfFuse: exact integer contributions, absences contribute zero") {
    // kw list: docs 1,2,3 at ranks 1,2,3; vec list: docs 3,4 at ranks 1,2.
    val kw = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq("kw" -> kw, "vec" -> vec), "doc_id")
    assert(out.columns.toSeq ==
      Seq("doc_id", "rank_kw", "rank_vec", "rrf_score"))
    val m = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rrf_score")).toMap
    val S = 1000000000L
    // Doc 3 is in both lists (rank 3 + rank 1) and must outrank doc 1
    // (kw rank 1 only) — the fusion property that motivates RRF.
    assert(m == Map(
      1L -> S / 61, 2L -> S / 62, 3L -> (S / 63 + S / 61), 4L -> S / 62))
    assert(m(3L) > m(1L))
  }

  test("tokenLinkPairs links dirty records to canonicals, blocked and unit-aware") {
    import graft.dedup.NearDup
    val canon = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "b1"),
      (2L, "one two three four five six", "b1"),
      (3L, "alpha beta gamma delta epsilon zeta", "b2")) // same text, other block
      .toDF("id", "text", "blk")
    val dirty = Seq(
      (101L, "beta gamma delta epsilon zeta", "b1"), // doc 1 minus first token
      (102L, "unrelated words entirely here now", "b1"))
      .toDF("id", "text", "blk")
    val links = NearDup.tokenLinkPairs(dirty, canon, "id", "text", "blk",
        minJaccard = 0.5, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // matches its canonical in ITS block only; blocking excludes doc 3
    assert(links == Set((101L, 1L)))
  }

  test("preTokenCount: contractions, digit/punct runs, whitespace runs") {
    import graft.text.TextAnalysis
    val cases = Seq(
      ("it's fine", 3L),        // it | 's | ␣fine
      ("hello world 123", 3L),  // hello | ␣world | ␣123
      ("a--b", 3L),             // a | -- | b
      ("x  y", 3L),             // x | ␣␣ | ␣y
      ("Price: $5.99!", 7L),    // Price | : | ␣$ | 5 | . | 99 | !
      ("", 0L))
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.preTokenCount(col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("waterFillAllocation: caps cascade, shortfall re-floods, sums to budget") {
    import graft.ops.Sampling
    // avail a=100, b=100, c=10; weights a=b=1, c=8; budget = 3/5 · 210
    // = 126. Round 1: c demands 8·126 div 10 = 100 ≥ 10 → capped.
    // Round 2: used 10, remw 2 → a,b demand (126−10) div 2 = 58 each.
    // Total allocation 58+58+10 = 126 = the budget exactly.
    val ps = Seq(("a", 100L), ("b", 100L), ("c", 10L)).toDF("src", "avail")
    val out = Sampling.waterFillAllocation(ps, "src", "avail",
        Map("c" -> 8L), defaultWeight = 1L, budgetNum = 3L, budgetDen = 5L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("capped"), r.getAs[Long]("alloc"))).toMap
    assert(out == Map("a" -> (0L, 58L), "b" -> (0L, 58L), "c" -> (1L, 10L)))
    // Degenerate: budget 0 → nothing allocated, nothing capped... except
    // zero-avail sources which cap vacuously (demand 0 >= avail 0).
    val zero = Sampling.waterFillAllocation(ps, "src", "avail",
        Map.empty, defaultWeight = 1L, budgetNum = 0L, budgetDen = 1L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(zero == Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
  }

  test("tokenBudgetSample: inclusive budget adherence, prefix growth, " +
      "deterministic re-run winners") {
    import graft.ops.Sampling
    // 40 docs in key "a" (7 tokens each), 10 in "b" (11 each)
    val docs = ((1L to 40L).map(i => (i, "a", 7L)) ++
      (101L to 110L).map(i => (i, "b", 11L)))
      .toDF("id", "key", "n_tok")
    def run(allocA: Long, allocB: Long) = Sampling.tokenBudgetSample(
      docs, "key", "id", "n_tok",
      Seq(("a", allocA), ("b", allocB)).toDF("key", "alloc"), "alloc",
      salt = "tb")
    val out = run(100L, 25L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toList
    // inclusive budget: a keeps floor(100/7) = 14 docs (cum 98 <= 100),
    // b keeps floor(25/11) = 2 (cum 22 <= 25) — never overshoots
    val byKey = out.groupBy(_._1)
    assert(byKey("a").size == 14 && byKey("a").map(_._3).max == 98L)
    assert(byKey("b").size == 2 && byKey("b").map(_._3).max == 22L)
    // deterministic: a re-run picks IDENTICAL winners
    val rerun = run(100L, 25L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toList
    assert(out.toSet == rerun.toSet)
    // prefix property: doubling the allocs only ADDS winners
    val bigger = run(200L, 50L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)).toSet.subsetOf(bigger))
    assert(bigger.count(_._1 == "a") == 28 && bigger.count(_._1 == "b") == 4)
  }

  test("tokenBudgetSample: banded two-phase decomposition equals the " +
      "global window on a dominant key; no full-key single-task sort") {
    import graft.ops.Sampling
    // one dominant key (90% of docs) — the 100 TB web-crawl shape
    val docs = ((1L to 900L).map(i => (i, "web", (i % 13) + 1)) ++
      (1001L to 1100L).map(i => (i, "code", (i % 7) + 1)))
      .toDF("id", "key", "n_tok")
    val alloc = Seq(("web", 2500L), ("code", 150L)).toDF("key", "alloc")
    def run(bands: Int) = Sampling.tokenBudgetSample(
        docs, "key", "id", "n_tok", alloc, "alloc", salt = "tb2", bands)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    // bands = 1 degenerates to the plain global running sum; every
    // band count must produce IDENTICAL winners AND cum_tokens
    val global = run(1)
    assert(run(4) == global && run(64) == global && run(4096) == global)
    // plan shape: the corpus-sized window partitions by (key, band) —
    // never by key alone — so the largest sort task is one band of one
    // key; the key-only window runs over the band-partials DIMENSION
    // frame (an Aggregate child), not the corpus
    val plan = Sampling.tokenBudgetSample(docs, "key", "id", "n_tok",
        alloc, "alloc", salt = "tb2", bands = 64)
      .queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.map(_.partitionSpec.length).sorted == Seq(1, 2))
    val keyOnly = wins.find(_.partitionSpec.length == 1).get
    assert(keyOnly.find {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
        case _ => false
      }.isDefined,
      "the key-only window must run over the aggregated partials frame")
  }

  test("mixSample hits the target composition and caps scarce domains at rate 1") {
    import graft.ops.Sampling
    // 1000 "web" docs, 50 "code" docs; target: half the corpus, 60% code.
    val docs = ((0 until 1000).map(i => (i.toLong, "web")) ++
      (1000 until 1050).map(i => (i.toLong, "code"))).toDF("id", "dom")
    val out = Sampling.mixSample(docs, col("id"), "dom",
      Map("code" -> (3L, 5L)), default = (2L, 5L),
      totalNum = 1L, totalDen = 2L, salt = "t")
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // code target = 315 > 50 available → rate caps at 1, ALL kept
    assert(byDom("code") == 50L)
    // web target = 2/5 * 525 = 210 of 1000 → rate 0.21; hash-uniform ±
    assert(byDom("web") > 150L && byDom("web") < 270L)
    // deterministic: same inputs, same sample
    val again = Sampling.mixSample(docs.repartition(13), col("id"), "dom",
      Map("code" -> (3L, 5L)), default = (2L, 5L),
      totalNum = 1L, totalDen = 2L, salt = "t")
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("packIntoWindows: contiguous shard-local offsets, windows chunk by capacity") {
    import graft.ops.Packing
    val docs = (0 until 40).map(i => (i.toLong, ("tok " * (i % 7 + 1)).trim))
      .toDF("doc_id", "text")
    val out = Packing.packIntoWindows(docs, "doc_id", "text",
      capacity = 10, shards = 3, salt = "p").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2) // by doc_id within shard
      // offsets are the running sum of preceding token counts
      val expectedOffsets = ordered.map(_._3).scanLeft(0L)(_ + _).init
      assert(ordered.map(_._4).toSeq == expectedOffsets.toSeq)
      assert(ordered.forall { case (_, _, _, off, win) => win == off / 10 })
    }
    assert(out.map(_._1).distinct.sorted.toSeq.forall(s => s >= 0 && s < 3))
  }

  test("duplicatedSpans: partial copies flagged by overlap fraction, unique text clean") {
    import graft.text.Spans
    val docs = Seq(
      // 1 and 2 share the 3-gram span "beta gamma delta" inside different text
      (1L, "alpha beta gamma delta unique1 tail1 one"),
      (2L, "other beta gamma delta unique2 tail2 two"),
      // word-scrambled: same tokens as 1, no shared 3-gram
      (3L, "delta beta alpha gamma tail1 one unique1"),
      (4L, "completely fresh words nobody else uses")).toDF("doc_id", "text")
    val out = Spans.duplicatedSpans(docs, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 7 tokens -> 5 3-gram positions; exactly one shared position each
    assert(out(1L) == ((5L, 1L, 0.2)))
    assert(out(2L) == ((5L, 1L, 0.2)))
    assert(out(3L)._2 == 0L && out(4L)._2 == 0L)
  }

  test("duplicatedSpans: full copies profile dup_frac 1.0; intra-doc repeats count once") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "exact copy of this sentence body"),
      (2L, "exact copy of this sentence body"),
      // repeats its own 3-gram; no other doc shares it -> NOT duplicated
      (3L, "self same span self same span")).toDF("doc_id", "text")
    val out = Spans.duplicatedSpans(docs, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
    assert(out(3L) == 0.0) // df counts DOCUMENTS, not occurrences
  }

  test("tokenRarity: every-doc tokens score rarity 0, distinct-heavy docs score higher") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "common common common"),      // 'common' in all 3 docs
      (2L, "common rare1 rare2"),
      (3L, "common rare3 rare4 rare5")).toDF("doc_id", "text")
    val out = Spans.tokenRarity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 3 occurrences of df=3 token -> commonness (3*3)/(3*3) = 1
    assert(out(1L) == ((3L, 9L, 0.0)))
    // doc 2: df_sum = 3 + 1 + 1 = 5; rarity = 1 - 5/9
    assert(out(2L)._2 == 5L && math.abs(out(2L)._3 - (1.0 - 5.0 / 9)) < 1e-15)
    // doc 3 carries more hapaxes -> rarer than doc 2
    assert(out(3L)._3 > out(2L)._3)
  }

  test("duplicatedSpanRuns: contiguous copies beat scattered ones at equal dup mass") {
    import graft.text.Spans
    val docs = Seq(
      // 1 and 2 share the verbatim 4-token span "p q r s": two
      // CONSECUTIVE dup 3-gram positions -> one run of 2, span 4 tokens
      (1L, "u1 p q r s u2 u3"),
      (2L, "v1 v2 p q r s v3"),
      // 3 repeats the shared gram "p q r" at both ends: SAME dup-gram
      // count as doc 1 (2) but two runs of 1 -> extent tells them apart
      (3L, "p q r z1 z2 p q r"),
      (4L, "completely fresh words nobody else uses here")
    ).toDF("doc_id", "text")
    val out = Spans.duplicatedSpanRuns(docs, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((5L, 1L, 2L, 4L)))
    assert(out(2L) == ((5L, 1L, 2L, 4L)))
    assert(out(3L) == ((6L, 2L, 1L, 3L)))
    assert(out(4L) == ((5L, 0L, 0L, 0L))) // no dup grams -> zero extent
  }

  test("duplicatedSpanRuns: full copies are one doc-length run") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "exact copy of this sentence body"),
      (2L, "exact copy of this sentence body")).toDF("doc_id", "text")
    val out = Spans.duplicatedSpanRuns(docs, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 6 tokens -> 4 gram positions, all dup, one run; span = whole doc
    assert(out(1L) == ((4L, 1L, 4L, 6L)))
    assert(out(2L) == out(1L))
  }

  test("removeDuplicatedSpans: verbatim quote cut from every doc, scattered dup mass kept") {
    import graft.text.Spans
    val docs = Seq(
      // ~38% of doc 1 is a verbatim 5-token quote shared with doc 2
      // (3 consecutive dup 3-grams >= minRunGrams 3 -> removed); it ALSO
      // shares the single gram "common phrase here" with doc 3 (run of
      // 1 < 3 -> scattered dup mass, kept)
      (1L, "a1 a2 the quick brown fox jumps a3 a4 common phrase here a5"),
      (2L, "b1 the quick brown fox jumps b2 b3 b4"),
      (3L, "c1 c2 common phrase here c3 c4 c5"),
      (4L, "completely fresh words nobody else uses here4")
    ).toDF("doc_id", "text")
    val out = Spans.removeDuplicatedSpans(docs, "doc_id", "text",
        w = 3, minDf = 2, minRunGrams = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the quote is removed from BOTH documents containing it
    assert(out(1L) == ((13L, 5L, "a1 a2 a3 a4 common phrase here a5")))
    assert(out(2L) == ((9L, 5L, "b1 b2 b3 b4")))
    // scattered dup (one isolated dup gram) survives untouched
    assert(out(3L) == ((8L, 0L, "c1 c2 common phrase here c3 c4 c5")))
    assert(out(4L)._2 == 0L)
    // at minRunGrams = 1 the scattered gram IS removed (w tokens' worth)
    val strict = Spans.removeDuplicatedSpans(docs, "doc_id", "text",
        w = 3, minDf = 2, minRunGrams = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict(3L) == 3L && strict(1L) == 8L)
  }

  test("removeDuplicatedSpans: exact short-doc copies empty out; rewrite is idempotent on clean docs") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "exact copy of this sentence body"),
      (2L, "exact copy of this sentence body"),
      (3L, "unrelated healthy document text stays whole")).toDF("doc_id", "text")
    val out = Spans.removeDuplicatedSpans(docs, "doc_id", "text",
        w = 3, minDf = 2, minRunGrams = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((6L, 6L, "")))  // whole-doc duplicate -> all cut
    assert(out(2L) == ((6L, 6L, "")))
    assert(out(3L) == ((6L, 0L, "unrelated healthy document text stays whole")))
  }

  test("BPE: training recovers known merges in order; encode replays them; exhaustion stops early") {
    import graft.text.Bpe
    val docs = Seq(
      (1L, "a b a b a b c d"),
      (2L, "a b c d e"),
      (3L, "x y")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 4)
    // hand-derived: (a,b)x4; then a 3-way freq-2 tie broken pair-asc
    // ("a b"<"c") -> (ab,ab); then (ab,c); then (abc,d)
    assert(merges == Seq(
      (1L, "a", "b", 4L),
      (2L, "a b", "a b", 2L),
      (3L, "a b", "c", 2L),
      (4L, "a b c", "d", 2L)))
    val enc = Bpe.encode(docs, "doc_id", "text", merges.map(m => (m._2, m._3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2).map(_._3).toSeq }
    // greedy left-to-right: "a b a b a b" under (ab,ab) -> [abab, ab]
    assert(enc(1L) == Seq("a b a b", "a b c d"))
    assert(enc(2L) == Seq("a b c d", "e"))
    assert(enc(3L) == Seq("x", "y")) // untouched by any merge
    // single-token corpus has no pairs: the loop stops, honestly short
    val lone = Seq((1L, "z")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(lone, "doc_id", "text", nMerges = 4).isEmpty)
  }

  test("char-level BPE: hand-derived subword merges recovered in order " +
      "(incl. end-of-word marker absorption); encode reaches whole-word " +
      "symbols") {
    import graft.text.Bpe
    val docs = Seq(
      (1L, "aaab aaab"),
      (2L, "aaab")).toDF("doc_id", "text")
    // char seed: [a,a,a,b,_] per word; merged symbols are space-joined
    // char runs. Hand-derived rounds:
    //  1. (a,a) freq 6 (two adjacent pairs per word x 3 words)
    //  2. three-way freq-3 tie (a,b)/("a a",a)/(b,_) -> "a" < "a a" < "b"
    //  3. tie ("a a","a b")/("a b",_): "a a" < "a b"
    //  4. ("a a a b", _) — the whole word "aaab_" as one subword
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 4,
      seed = Bpe.charSymbols)
    assert(merges == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "b", 3L),
      (3L, "a a", "a b", 3L),
      (4L, "a a a b", "_", 3L)))
    val enc = Bpe.encode(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)), seed = Bpe.charSymbols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.sortBy(_._2).map(_._3.replace(" ", "")).toSeq }
    // every word collapses to the single learned subword "aaab_"
    assert(enc(2L) == Seq("aaab_"))
    assert(enc(1L) == Seq("aaab_", "aaab_"))
  }

  test("kneserNeyScore: hand-derived bits — modeled bigram pays " +
      "blog-quantized pkn, unseen bigram pays the 20-bit ceiling") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // ref bigrams: (a,b) c12=3, (b,a) c12=2; for (a,b): c1(a)=3,
    // n1f(a)=1, n1b(b)=1, n1tot=2 -> pkn = 9/12 + (3/12)(1/2) = 0.875
    // pm = 875000 -> blog(875001) = 20 -> cost 1 bit
    val docs = Seq((10L, "a b"), (20L, "z q")).toDF("doc_id", "text")
    val out = graft.text.LangModel
      .kneserNeyScore(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == ((1L, 1L, 1000000L)))
    assert(out(20L) == ((1L, 20L, 20000000L)))
  }

  test("byteFallbackSymbols: hand-derived escapes, and a full decode " +
      "round-trip back to the normalized text — emoji (astral plane), " +
      "Cyrillic, CJK, literal '_' and literal '<0xNN>' all survive") {
    import graft.text.Bpe
    import org.apache.spark.unsafe.types.UTF8String

    // hand-derived: café -> c,a,f,<0xC3>,<0xA9>,_ (é = UTF-8 C3 A9)
    val cafe = Seq((1L, "Le café")).toDF("doc_id", "text")
      .select(Bpe.byteFallbackSymbols(col("text")).as("s"))
      .head().getSeq[String](0)
    assert(cafe == Seq("l", "e", "_", "c", "a", "f", "<0xC3>", "<0xA9>", "_"))

    // decoder: split the stream on the word marker, parse byte escapes
    def decode(syms: Seq[String]): String = {
      val stream = syms.map(_.replace(" ", "")).mkString
      stream.split("_", -1).dropRight(1).map { w =>
        val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var i = 0
        while (i < w.length) {
          if (w.startsWith("<0x", i)) {
            bytes += Integer.parseInt(w.substring(i + 3, i + 5), 16).toByte
            i += 6
          } else { bytes += w.charAt(i).toByte; i += 1 }
        }
        new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
      }.mkString(" ")
    }
    val fixtures = Seq(
      "good 😀😀 stuff",   // astral emoji pair
      "Это тест дедупликации",
      "这是一个测试 mixed with ascii",
      "under_score and <0x41> literals",
      "Le café déjà PRÊT")
    val docs = fixtures.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // run through TRAINED merges too: merges only join adjacent symbols,
    // so the decode must survive any merge table
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 6,
      seed = Bpe.byteFallbackSymbols)
    val enc = Bpe.encode(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)), seed = Bpe.byteFallbackSymbols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.sortBy(_._2).map(_._3).toSeq }
    fixtures.zipWithIndex.foreach { case (t, i) =>
      val norm = graft.functions.NormalizeText
        .normalize(UTF8String.fromString(t)).toString
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(decode(enc(i.toLong)) == norm,
        s"round-trip failed for: $t")
    }
  }

  test("byteFallbackPreTokenSymbols: GPT-2-subset units (contractions, " +
      "leading spaces, digit/punct runs) and an EXACT decode back to " +
      "the normalized text — no single-space rejoin convention") {
    import graft.text.Bpe
    import org.apache.spark.unsafe.types.UTF8String

    // hand-derived units for "it's 42!" after normalize (lowercase):
    // [it]['s][ 42]... wait: pre-token units are "it", "'s", " 42", "!"
    // -> symbols: i,t,_ then <0x27>,s,_ then <0x20>,4,2,_ then <0x21>,_
    val hand = Seq((1L, "It's 42!")).toDF("doc_id", "text")
      .select(Bpe.byteFallbackPreTokenSymbols(col("text")).as("s"))
      .head().getSeq[String](0)
    assert(hand == Seq("i", "t", "_", "<0x27>", "s", "_",
      "<0x20>", "4", "2", "_", "<0x21>", "_"))

    // decoder: units concatenate with NO joiner — the tiling property
    def decode(syms: Seq[String]): String = {
      val stream = syms.map(_.replace(" ", "")).mkString
      stream.split("_", -1).dropRight(1).map { w =>
        val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var i = 0
        while (i < w.length) {
          if (w.startsWith("<0x", i)) {
            bytes += Integer.parseInt(w.substring(i + 3, i + 5), 16).toByte
            i += 6
          } else { bytes += w.charAt(i).toByte; i += 1 }
        }
        new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
      }.mkString("")
    }
    val fixtures = Seq(
      "good 😀😀 stuff",
      "Это тест дедупликации",
      "don't   stack\tmulti-space runs", // ws runs survive exactly
      "这是一个测试 mixed with ascii 42 times!",
      "under_score and <0x41> literals",
      "Le café déjà PRÊT")
    val docs = fixtures.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 6,
      seed = Bpe.byteFallbackPreTokenSymbols)
    val enc = Bpe.encode(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)),
        seed = Bpe.byteFallbackPreTokenSymbols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.sortBy(_._2).map(_._3).toSeq }
    fixtures.zipWithIndex.foreach { case (t, i) =>
      val norm = graft.functions.NormalizeText
        .normalize(UTF8String.fromString(t)).toString
      assert(decode(enc(i.toLong)) == norm,
        s"exact round-trip failed for: $t")
    }
  }

  test("BPE at realistic vocabulary: 512 pre-token byte-fallback " +
      "merges train without lineage blowup and round-trip byte-exact") {
    import graft.text.Bpe
    // synthetic corpus with enough pair diversity to sustain ~512
    // merges: 120 docs of 30 words drawn from an 80-word vocabulary by
    // coprime strides, plus digit runs and punctuation variety
    val vocab = (for {
      a <- Seq("data", "spark", "merge", "token", "byte", "pair",
        "count", "shard", "query", "plan", "scan", "join", "sort",
        "hash", "agg", "read", "write", "sink", "state", "epoch")
      b <- Seq("", "s", "ed", "ing")
    } yield a + b).toVector
    val docs = (0 until 120).map { i =>
      val words = (0 until 30).map(j => vocab(((i * 7) + (j * 11)) % vocab.length))
      (i.toLong, words.mkString(" ") + s" run-${i % 13}, ok #$i!")
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 512,
      seed = Bpe.byteFallbackPreTokenSymbols)
    assert(merges.length >= 448,
      s"corpus exhausted at ${merges.length} merges — widen the fixture")
    // the round-trip gate at the larger vocabulary (the q413 contract):
    // encoded symbols concatenate back to the escaped seed exactly
    val enc = Bpe.encode(docs, "doc_id", "text",
      merges.map(m => (m._2, m._3)),
      seed = Bpe.byteFallbackPreTokenSymbols)
    val rebuilt = enc.groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("symbol")))),
        e => e.getField("symbol")), "").as("__enc"))
    val mismatches = docs.select(col("doc_id"), array_join(
        Bpe.byteFallbackPreTokenSymbols(col("text")), "").as("__seed"))
      .join(rebuilt, Seq("doc_id"), "left")
      .filter(regexp_replace(coalesce(col("__enc"), lit("")), " ", "")
        =!= col("__seed"))
      .count()
    assert(mismatches == 0L)
    info(f"${merges.length} merges trained in ${(System.nanoTime() - t0) / 1e9}%.1fs")
  }

  test("QualityModel: planted high/low-quality docs order correctly; empty docs score 0") {
    import graft.text.QualityModel
    val (d, salt) = (64, "qmtest")
    val planted = Map("good" -> 5L, "great" -> 5L, "spam" -> -7L, "junk" -> -7L)
    // the test is only meaningful if the planted words occupy distinct
    // buckets (deterministic hash, so this can't flake once green)
    assert(planted.keySet.map(QualityModel.bucketOf(_, d, salt)).size == 4)
    val w = QualityModel.weightsFrom(d, salt, planted, default = 0L)
    assert(w.sum == planted.values.sum) // contributions land exactly once
    val docs = Seq(
      (1L, "good text with great words and good ideas"),
      (2L, "plain words with no planted tokens at all"),
      (3L, "spam junk spam junk spam"),
      (4L, "")).toDF("doc_id", "text")
    val out = QualityModel.score(docs, "doc_id", "text", w, d, salt)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // raw: doc1 = 2*good + 1*great (+ collisions of unlisted words: only
    // exact if none land in planted buckets — assert ordering, not value)
    assert(out(1L)._3 > out(2L)._3 && out(2L)._3 > out(3L)._3)
    assert(out(1L)._2 >= 15.0 - 7.0 && out(3L)._2 <= -21.0 + 5.0)
    assert(out(4L) == ((0L, 0.0, 0.0)))
    // integer-exactness: raw is a whole number (counts x integer weights)
    assert(out.values.forall(v => v._2 == math.rint(v._2)))
  }

  test("Urls.canonical/host: case, default ports, tracking params, fragments, schemeless") {
    import graft.text.Urls
    val cases = Seq(
      // scheme+host lowered, :443 stripped on https, path case KEPT,
      // utm_* + ref stripped with order preserved, fragment dropped
      ("HTTPS://WWW.Ex.COM:443/A/B?utm_source=x&id=9&ref=z&keep=1#frag",
        "https://www.ex.com/A/B?id=9&keep=1", "www.ex.com"),
      // :80 stripped on http; empty path -> '/'
      ("HTTP://ex.com:80?x=1", "http://ex.com/?x=1", "ex.com"),
      // non-default port survives canonical but not the host key
      ("https://Ex.com:8080/p", "https://ex.com:8080/p", "ex.com"),
      // :443 is NOT http's default -> kept
      ("http://ex.com:443/p", "http://ex.com:443/p", "ex.com"),
      // every param stripped -> no '?'
      ("https://ex.com/p?utm_a=1&utm_b=2&fbclid=3", "https://ex.com/p", "ex.com"),
      // no query, no fragment, bare host
      ("https://ex.com", "https://ex.com/", "ex.com"))
    val df = cases.map(_._1).toDF("u")
      .select(Urls.canonical(col("u")).as("c"), Urls.host(col("u")).as("h"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == cases.map(c => (c._2, c._3)))
    // schemeless input is not a URL: both NULL
    val bad = Seq("notaurl", "www.ex.com/path", "").toDF("u")
      .select(Urls.canonical(col("u")).as("c"), Urls.host(col("u")).as("h"))
      .collect()
    assert(bad.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("Urls.extractLinks: document order, quote-bounded, composes with host()") {
    import graft.text.Urls
    val html = """<a href="https://A.com/1">x</a> text href= noise
      |<img href="HTTP://b.COM:80/p?x=1"><a href="">empty skipped</a>""".stripMargin
    val out = Seq(html).toDF("t")
      .select(explode(Urls.extractLinks(col("t"))).as("link"))
      .select(col("link"), Urls.host(col("link")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // href="" does not match ([^"]+ needs one char); bare href= is noise
    assert(out.toSeq == Seq(
      ("https://A.com/1", "a.com"),
      ("HTTP://b.COM:80/p?x=1", "b.com")))
  }

  test("native TokenCount equals the regex-split formulation on edge and random inputs") {
    import graft.text.TextAnalysis
    val edge = Seq("", "   ", "a", " a ", "a b", "A--B!!c", "ümlaut straße",
      "Kelvin sign", "123 45x6 --7", "a" * 1000, "x\ny\tz",
      "ONE two THREE's 4th")
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 .,;!\t\näöKK"
    val fuzz = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (edge ++ fuzz).toDF("text")
      .withColumn("hof", size(TextAnalysis.tokens(col("text"))))
      .withColumn("native", TextAnalysis.tokenCount(col("text")))
    assert(df.filter(col("hof") =!= col("native")).count() == 0)
    // SQL registration resolves to the same codegen'd expression
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("tc_in")
    val viaSql = spark.sql(
      "SELECT count(*) FROM tc_in WHERE token_count(text) <> hof")
      .collect().head.getLong(0)
    assert(viaSql == 0)
    // interpreted eval path agrees with codegen
    assert(graft.functions.TokenCount.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("A--b c1")) == 3)
  }

  test("collocations: window finds non-adjacent pairs, hapax pairs floored") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "strong black tea"),
      (2L, "strong green tea"),
      (3L, "x")). // single token: no pairs, no crash
      toDF("doc_id", "text")
    val out = Spans.collocations(docs, "doc_id", "text",
      window = 3, minCount = 2L, topN = 20).collect()
    // every adjacent pair occurs once (floored); only the distance-2
    // (strong, tea) pair reaches c_ab = 2 — invisible to q92's bigrams
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6))
      == ((1L, "strong", "tea", 2L, 2L, 2L, 0.5)))
  }

  test("tfidfKeywords: rare-but-frequent-in-doc tokens outrank ubiquitous ones") {
    import graft.text.Retrieval
    val docs = Seq(
      (1L, "spark spark spark the the common"),
      (2L, "the common words here"),
      (3L, "the common other text")).toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: 'spark' tf=3 df=1 -> score 9; 'the' tf=2 df=3 -> 2; 'common' 1
    assert(out((1L, 1L)) == (("spark", 3L, 1L, 9.0)))
    assert(out((1L, 2L)) == (("the", 2L, 3L, 2.0)))
    // doc 2: hapaxes 'here'/'words' score 3, ties break on token asc
    assert(out((2L, 1L))._1 == "here" && out((2L, 2L))._1 == "words")
    assert(out.keySet.map(_._1) == Set(1L, 2L, 3L))
  }

  test("languageMix: half-and-half docs profile as mixed, monolingual docs as pure") {
    import graft.text.Segments
    val en16 = Seq.fill(8)("the cat").mkString(" ")   // 16 tokens, en
    val es16 = Seq.fill(8)("el gato").mkString(" ")   // 16 tokens, es
    val docs = Seq(
      (1L, s"$en16 $es16"),             // 2 segments: en + es
      (2L, "the quick brown fox is in the yard"), // 1 segment, en
      (3L, "zzz qqq www rrr")            // no stopwords -> und
    ).toDF("doc_id", "text")
    val out = Segments.languageMix(docs, "doc_id", "text", segTokens = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toMap
    // count tie (1 en, 1 es) breaks lexicographically -> en
    assert(out(1L) == ((2L, 2L, "en", 0.5)))
    assert(out(2L) == ((1L, 1L, "en", 1.0)))
    assert(out(3L) == ((1L, 1L, "und", 1.0)))
  }

  test("encodeTokens: ranks from the trained vocabulary, OOV to 0, positions preserved") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "aa aa bb zz")).toDF("doc_id", "text")
    // freqs: aa=4, bb=2, cc=1, zz=1 -> top-2 vocab: aa=1, bb=2
    val out = Spans.encodeTokens(docs, "doc_id", "text", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) == 1L && out((1L, 1L)) == 2L)
    assert(out((1L, 2L)) == 1L && out((1L, 3L)) == 0L) // cc OOV
    assert(out((2L, 3L)) == 0L)                         // zz OOV
    assert(out.size == 8)
  }

  test("splitLeakage: flags exactly the fingerprint groups spanning train and eval") {
    import graft.text.Corpus
    import graft.ops.Sampling
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    // 40 docs: ids 0..19 share text A (whitespace variants), 20..29 share
    // text B, 30..39 all distinct
    val docs = ((0L until 20L).map(i => (i, if (i % 2 == 0) "shared text alpha" else " SHARED  text Alpha "))
      ++ (20L until 30L).map(i => (i, "shared text beta"))
      ++ (30L until 40L).map(i => (i, s"unique text number $i"))).toDF("doc_id", "text")
    val out = Corpus.splitLeakage(docs, "doc_id", "text", "s1", splits)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent expectation: assign splits directly, group by fingerprint
    val assigned = Sampling.assignSplit(
        docs.withColumn("__fp", graft.text.TextAnalysis.fingerprint(col("text"))),
        col("doc_id"), "s1", splits)
      .select("__fp", "split", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = assigned.groupBy(_._1).collect {
      case (fp, rows) if rows.exists(_._2 == "train") && rows.exists(_._2 != "train") =>
        fp -> ((rows.count(_._2 == "train").toLong,
          rows.count(_._2 != "train").toLong,
          rows.filter(_._2 == "train").map(_._3).min,
          rows.filter(_._2 != "train").map(_._3).min))
    }.toMap
    assert(expected.nonEmpty) // 20 copies can't all land in one side
    assert(out == expected)
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass over " +
      "3-gram units") {
    import spark.implicits._
    import graft.text.Corpus
    // group counts over 3-grams: "a b a"×3, "b a b"×2, "a b c"×1
    //   → N=6, V=3, f1=1, f2=1: chao1 = 3 + 1·0/(2·2) = 3, p0 = 1/6
    val docs = Seq(("g", "a b a b c"), ("g", "a b a b a")).toDF("src", "text")
    val out = Corpus.vocabRichness(docs, "src", "text",
      unit = t => graft.dedup.NearDup.shingles(
        graft.text.TextAnalysis.tokens(t), 3)).head()
    assert(out.getAs[Long]("n_tokens") == 6L)
    assert(out.getAs[Long]("vocab") == 3L)
    assert(out.getAs[Long]("f1") == 1L && out.getAs[Long]("f2") == 1L)
    assert(out.getAs[Double]("chao1") == 3.0)
    assert(out.getAs[Double]("unseen_mass") == 1.0 / 6.0)
    // all-singletons group: chao1 = V + V(V−1)/2, p0 = 1
    val single = Seq(("h", "a b c d e")).toDF("src", "text")
    val o2 = Corpus.vocabRichness(single, "src", "text",
      unit = t => graft.dedup.NearDup.shingles(
        graft.text.TextAnalysis.tokens(t), 3)).head()
    assert(o2.getAs[Long]("f1") == 3L && o2.getAs[Double]("chao1") == 6.0)
    assert(o2.getAs[Double]("unseen_mass") == 1.0)
  }

  test("tokenAccounting: shares sum to 1 and reflect token mass, not doc count") {
    import graft.text.Corpus
    val docs = Seq(
      (1L, "web", "one two three four five six"),   // 6 tokens
      (2L, "web", "seven eight"),                   // 2 tokens
      (3L, "code", "x y"),                          // 2 tokens
      (4L, "code", "")                              // 0 tokens
    ).toDF("doc_id", "source", "text")
    val out = Corpus.tokenAccounting(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("web") == ((2L, 8L, 0.5, 0.8)))
    assert(out("code") == ((2L, 2L, 0.5, 0.2)))
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-15)
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-15)
  }

  test("bigramCoherence: scrambled word order scores below natural order") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "cat the sat"), // same unigrams as 1 -> q74-invisible
      (4L, "solo")         // no bigrams -> drops out
    ).toDF("doc_id", "text")
    val out = Spans.bigramCoherence(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(4L))
    // cf: 'the cat'=2, every other pair 1; total corpus bigrams = 6
    assert(out(1L) == ((2L, 3L, 3.0 / 12)))
    assert(out(2L) == ((2L, 3L, 3.0 / 12)))
    assert(out(3L) == ((2L, 2L, 2.0 / 12)))
    assert(out(3L)._3 < out(1L)._3)
  }

  test("plan shapes: bm25 never shuffles the corpus; packing shuffles once by shard") {
    val docs = (0 until 200).map(i => (i.toLong, s"tok$i word $i")).toDF("doc_id", "text")
    val bm25Plan = Retrieval.bm25(docs, "doc_id", "text", Seq("word"))
      .queryExecution.executedPlan.toString
    // Only the one-row global-stats aggregation may exchange (single
    // partition) + its broadcast back; no hash-partitioned corpus shuffle.
    assert(!bm25Plan.contains("hashpartitioning"), bm25Plan)
    assert(bm25Plan.contains("BroadcastExchange") ||
      bm25Plan.contains("BroadcastNestedLoopJoin"), bm25Plan)
    val packPlan = graft.ops.Packing
      .packIntoWindows(docs, "doc_id", "text", 64, 4, "p")
      .queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(packPlan).size == 1, packPlan)
  }

  test("mixSample resolves the domain-count join as a broadcast at runtime") {
    import graft.ops.Sampling
    val docs = (0 until 500).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "dom")
    val out = Sampling.mixSample(docs, col("id"), "dom",
      Map("d0" -> (1L, 2L)), default = (1L, 4L),
      totalNum = 1L, totalDen = 2L, salt = "x")
    out.collect() // materialize so AQE finalizes the plan
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastExchange"), finalPlan)
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

  test("chunkWithStride: full coverage, fixed overlap, single ragged tail") {
    import graft.text.Segments
    // 10 tokens, size 4, stride 2 → starts 0,2,4,6 (8 would start past a
    // window that already reached the end at 6+4=10).
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val chunks = Segments.chunkWithStride(docs, "doc_id", "text", 4, 2)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(2)).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(chunks.map(_.getLong(3)).forall(_ == 4L)) // all full here
    assert(chunks.head.getString(4) == "t0 t1 t2 t3")
    assert(chunks.last.getString(4) == "t6 t7 t8 t9")
    // 5 tokens, size 4, stride 2 → starts 0,2; tail is short (3 tokens).
    val ragged = Segments.chunkWithStride(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text", 4, 2)
      .orderBy("chunk_idx").collect()
    assert(ragged.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 4L), (2L, 3L)))
    assert(ragged.last.getString(4) == "c d e")
    // Shorter than one window → exactly one chunk.
    val short = Segments.chunkWithStride(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 4, 2).collect()
    assert(short.length == 1 && short.head.getString(4) == "a b")
  }

  test("chunkWithStride: stride > size gap-samples every stride offset") {
    import graft.text.Segments
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val chunks = Segments.chunkWithStride(docs, "doc_id", "text", 2, 3)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L))
    assert(chunks.map(_.getString(4)).toSeq == Seq("a b", "d e", "g h"))
  }

  test("lineFilterDocs: short and stopword-free lines drop, order preserved") {
    import graft.text.Segments
    // per=3: lines = [the cat sat] [on the mat] [xx yy zz] [qq]
    //   line 3 has no stopword, line 4 is short → keep 1 and 2.
    val docs = Seq(
      (1L, "the cat sat on the mat xx yy zz qq"),
      (2L, "zz yy xx")). // one line, no stopword → everything filtered
      toDF("doc_id", "text")
    val out = Segments.lineFilterDocs(docs, "doc_id", "text",
        per = 3, minTokens = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, 2L, "the cat sat on the mat")))
    assert(out(2L) == ((1L, 0L, ""))) // doc survives, empty — caller drops
  }

  test("boilerplateLines: per-source threshold, singletons never reported") {
    import graft.text.Segments
    // Source A (3 docs): header [hdr a] opens every doc → df 3/3; line
    // [x y] in 2/3 → df 0.67 ≥ 0.5 but also reported; [p q] once — never.
    // Source B (2 docs): its own [hdr b] in both; A's header absent.
    val docs = Seq(
      (1L, "hdr a x y", "A"),
      (2L, "hdr a x y", "A"),
      (3L, "hdr a p q", "A"),
      (4L, "hdr b m n", "B"),
      (5L, "hdr b o o", "B")).toDF("doc_id", "text", "source")
    val out = Segments.boilerplateLines(docs, "doc_id", "text", "source",
        per = 2, minFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("line_df"), r.getAs[Double]("doc_frac"))).toMap
    assert(out.keySet == Set(("A", "hdr a"), ("A", "x y"), ("B", "hdr b")))
    assert(out(("A", "hdr a")) == (3L, 1.0))
    assert(out(("A", "x y")) == (2L, 2.0 / 3.0))
    assert(out(("B", "hdr b")) == (2L, 1.0))
  }

  test("lineDedupDocs: first occurrence wins corpus-wide, reassembly ordered") {
    import graft.text.Segments
    // per=2 lines: doc 1 = [a b][c d], doc 2 = [c d][e f], doc 3 = [a b].
    // First-wins order (doc_id, idx): doc 2 loses [c d], doc 3 loses [a b].
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = Segments.lineDedupDocs(docs, "doc_id", "text", per = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "e f")))
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("OOV-rate composition: occurrences outside the top-N vocabulary count per source") {
    import graft.text.Spans
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "s1", "a a a b"), (2L, "s1", "a a b b"), (3L, "s2", "a a a a"))
      .toDF("doc_id", "source", "text")
    val vocab = Spans.vocabulary(docs, "doc_id", "text", topN = 1)
      .select(col("token"), lit(1L).as("__in"))
    val out = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // top-1 vocab = "a" (9 a's vs 3 b's); s1 has all 3 b occurrences
    assert(out("s1") == ((8L, 3L)))
    assert(out("s2") == ((4L, 0L)))
  }

  test("noveltyProfile: originals stay novel, later copies pay, direction follows doc_id") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "a b c d e f"),   // 4 trigrams, all first here → novelty 1
      (2L, "a b c d e f"),   // exact copy → novelty 0
      (3L, "a b c d x y z")) // 2 of 5 trigrams copied from doc 1
      .toDF("doc_id", "text")
    val out = Spans.noveltyProfile(docs, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((4L, 4L, 1000000L)))
    assert(out(2L) == ((4L, 0L, 0L)))
    assert(out(3L) == ((5L, 3L, 600000L)))
  }

  test("percentileGate: per-group adaptive cut keeps the top (1-p) mass, constant groups keep all") {
    import graft.ops.Quantiles
    val rows = (1L to 8L).map(v => ("A", v, v * 10)) ++
      (101L to 104L).map(v => ("B", v, 70L)) // constant metric group
    val df = rows.toDF("source", "doc_id", "m")
    val out = Quantiles.percentileGate(df, "source", col("m"), 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // A: p25 = rank ceil(0.25*8)=2 → cut 20 → doc 1 drops, 2..8 keep
    assert(!out.contains(("A", 1L)))
    assert((2L to 8L).forall(d => out.contains(("A", d))))
    // B: every value equals the cut → all keep (>= semantics)
    assert((101L to 104L).forall(d => out.contains(("B", d))))
  }

  test("replicateExact: group totals hit targets exactly across up/identity/down regimes") {
    import graft.ops.Sampling
    val docs = (1L to 10L).map(i => (i, "up")) ++
      (11L to 20L).map(i => (i, "same")) ++
      (21L to 30L).map(i => (i, "down"))
    val df = docs.toDF("doc_id", "src")
    val targets = Seq(("up", 25L), ("same", 10L), ("down", 4L))
      .toDF("src", "alloc")
    val out = Sampling.replicateExact(df, "src", "doc_id", targets, "rx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2)
    // exact totals: 25 = 2 copies x 10 docs + 5 extras; 10 identity; 4 kept
    assert(bySrc("up").length == 25 && bySrc("same").length == 10 &&
      bySrc("down").length == 4)
    // even spread: every "up" doc has 2 or 3 copies, never 1 or 4
    val upCopies = bySrc("up").groupBy(_._1).map(_._2.length).toSet
    assert(upCopies == Set(2, 3))
    // downsample keeps 4 DISTINCT docs, one copy each
    assert(bySrc("down").map(_._1).distinct.length == 4)
    assert(bySrc("down").forall(_._3 == 1L))
    // deterministic: a second run picks the same rows
    val again = Sampling.replicateExact(df, "src", "doc_id", targets, "rx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(x => (x._2, x._1, x._3)).toSeq ==
      again.sortBy(x => (x._2, x._1, x._3)).toSeq)
  }

  test("temperatureAllocation: alpha=1/2 flattens the mixture toward small sources") {
    import graft.ops.Sampling
    // 10000 vs 100 docs: raw share 99% vs 1%; sqrt share 100:10 → ~91%/9%.
    val per = Seq(("big", 10000L), ("small", 100L)).toDF("src", "n_docs")
    val out = Sampling.temperatureAllocation(per, "src", "n_docs",
        budgetNum = 1L, budgetDen = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nb, wb, ab, cb) = out("big")
    val (ns, ws, as_, cs) = out("small")
    assert(wb == 100L && ws == 10L)               // integer sqrt weights
    assert(ab + as_ <= 5050L)                     // never exceeds budget
    // small source's allocated share (~9%) far above its raw share (~1%)
    assert(as_ * 100L > (ab + as_) * 5L)
    assert(cb <= nb && cs <= ns)                  // capped alloc is feasible
    // alpha=1 (identity weights) degenerates to proportional sampling
    val prop = Sampling.temperatureAllocation(per, "src", "n_docs",
        budgetNum = 1L, budgetDen = 2L, weightOf = c => c)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prop("big") == 5000L && prop("small") == 50L)
  }

  test("Dsir.importanceWeights: target-like docs score above off-distribution docs") {
    import graft.text.Dsir
    // target vocabulary: clean prose words; raw adds junk vocabulary
    val target = (1L to 30L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val junk = (31L to 60L).map(i =>
      (i, "zxq7 qqwz kline9 vbnm0 asdf8 poiu7 zzzz9 xxxy2 wwww3 qqqq4"))
      .toDF("doc_id", "text")
    val raw = target.union(junk)
    val score = Seq(
      (100L, "the quick brown fox near the river"),       // target-like
      (101L, "zxq7 qqwz vbnm0 asdf8 zzzz9 xxxy2"))        // junk-like
      .toDF("doc_id", "text")
    val out = Dsir.importanceWeights(score, "doc_id", "text", target, raw)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(100L)._1 > out(101L)._1)
    assert(out(100L)._2 && !out(101L)._2) // keep verdict tracks the sign
    // zero-token docs drop (no evidence), like LangModel.score
    val empty = Dsir.importanceWeights(
      Seq((1L, "...")).toDF("doc_id", "text"), "doc_id", "text", target, raw)
    assert(empty.count() == 0)
  }

  test("lineDedupWithinDoc: repeats drop inside a doc, cross-doc repeats survive") {
    import graft.text.Segments
    // per=2: doc 1 = [a b][c d][a b][a b] → keeps [a b][c d]; doc 2
    // repeats doc 1's lines but has none of its own repeated → keeps all
    // (the contract difference vs corpus-wide lineDedupDocs); doc 3
    // tokenizes to nothing and survives empty.
    val docs = Seq(
      (1L, "a b c d a b a b"),
      (2L, "a b c d"),
      (3L, "...")).toDF("doc_id", "text")
    val out = Segments.lineDedupWithinDoc(docs, "doc_id", "text", per = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 2L, "a b c d")))
    assert(out(3L) == ((0L, 0L, "")))
    // zero-shuffle contract: the plan must contain no Exchange
    val plan = Segments.lineDedupWithinDoc(docs, "doc_id", "text", per = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lineDedupDocs: intra-document duplicate lines also collapse to the first") {
    import graft.text.Segments
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = Segments.lineDedupDocs(docs, "doc_id", "text", per = 2).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 1L)
    assert(out.head.getString(3) == "a b")
  }

  test("lineDedupDocs: zero-token documents survive with (0, 0, empty)") {
    import graft.text.Segments
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "!!! ...")).toDF("doc_id", "text")
    val out = Segments.lineDedupDocs(docs, "doc_id", "text", per = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // docs 2 and 3 tokenize to nothing: present, empty, and NOT deduped
    // against each other (no phantom shared empty line)
    assert(out(1L) == ((1L, 1L, "a b")))
    assert(out(2L) == ((0L, 0L, "")))
    assert(out(3L) == ((0L, 0L, "")))
  }

  test("newlineSegments trims and drops blank lines") {
    import graft.text.Segments
    val df = Seq("  first line \n\n second \n\t\nthird").toDF("text")
      .select(Segments.newlineSegments(col("text")).as("lines"))
    assert(df.collect().head.getSeq[String](0) ==
      Seq("first line", "second", "third"))
  }

  test("topBigrams: adjacent pairs only, intra-doc repeats counted, rank-1 is the merge") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "a b a b c"),   // pairs: "a b","b a","a b","b c"
      (2L, "a b"),          // "a b"
      (3L, "z")).           // sub-2-token doc contributes nothing
      toDF("doc_id", "text")
    val top = Spans.topBigrams(docs, "doc_id", "text", topN = 3).collect()
    assert(top.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a b", 3L), (2L, "b a", 1L), (3L, "b c", 1L)))
  }

  test("stripMarkup: tags out, entities decoded safely, whitespace collapsed") {
    import graft.text.Scrub
    val cases = Seq(
      ("<p class=\"x\">hello <b>world</b></p>", "hello world"),
      // &amp; decodes LAST: &amp;lt; must yield a literal "&lt;", not "<"
      ("a &amp;lt; b &amp; c &lt;d&gt;", "a &lt; b & c <d>"),
      // tags become spaces (never joins adjacent words), then collapse
      ("<script>alert('x')</script>keep", "alert('x') keep"),
      ("  spaced\t\tout  ", "spaced out"),
      ("no markup at all", "no markup at all"))
    val df = cases.map(_._1).toDF("text")
      .select(Scrub.stripMarkup(col("text")).as("clean"))
    assert(df.collect().map(_.getString(0)).toSeq == cases.map(_._2))
  }

  test("vocabulary: frequency-ordered with token tie-break and exact df") {
    import graft.text.Spans
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry banana"),
      (3L, "cherry apple")).toDF("doc_id", "text")
    val top = Spans.vocabulary(docs, "doc_id", "text", topN = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // apple: freq 4 df 3; banana/cherry: freq 2 df 2 → 'banana' wins the tie
    assert(top(0).getString(1) == "apple" &&
      top(0).getLong(2) == 4L && top(0).getLong(3) == 3L)
    assert(top(1).getString(1) == "banana" && top(1).getLong(2) == 2L)
    // top-k is TakeOrderedAndProject — not a single-partition global sort
    val plan = Spans.vocabulary(docs, "doc_id", "text", topN = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("deflateLen: repetition compresses, entropy doesn't; Java and SQL " +
      "routes agree") {
    import graft.functions.DeflateLen
    import org.apache.spark.unsafe.types.UTF8String
    val rep = "the cat sat on the mat " * 40
    // Deterministic letter salad of the same length (LCG, fixed seed):
    // in-vocab alphabet, no repeated structure — barely compressible.
    val junk = Iterator.iterate(123456789L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .map(x => ('a' + ((x >>> 33) % 26)).toChar).take(rep.length).mkString
    val prose = ("we hold these truths to be self evident that all men " +
      "are created equal and endowed with certain unalienable rights " +
      "among these are life liberty and the pursuit of happiness ") * 5
    val df = Seq(("rep", rep), ("junk", junk), ("prose", prose))
      .toDF("kind", "text")
      .withColumn("dl", DeflateLen.deflateLen(col("text")))
      .withColumn("ratio",
        octet_length(col("text")).cast("double") / col("dl"))
    val m = df.collect()
      .map(r => r.getString(0) -> ((r.getInt(2), r.getDouble(3)))).toMap
    // The separation the quality filter relies on: template ≫ prose ≫ junk
    assert(m("rep")._2 > 4.0, m.toString)
    assert(m("prose")._2 > m("junk")._2, m.toString)
    // Letter salad still Huffman-compresses ~1.6× (26 symbols in 8-bit
    // bytes); the filter's signal is the gap to prose, not absolute 1.0.
    assert(m("junk")._2 < 2.0, m.toString)
    // Codegen path (DataFrame) agrees with the interpreted Java kernel
    for ((k, s) <- Seq("rep" -> rep, "junk" -> junk, "prose" -> prose))
      assert(m(k)._1 == DeflateLen.len(UTF8String.fromString(s)), k)
    // Empty input still emits a positive block; NULL propagates
    assert(DeflateLen.len(UTF8String.fromString("")) > 0)
    val nulls = Seq(Option.empty[String]).toDF("text")
      .select(DeflateLen.deflateLen(col("text"))).collect()
    assert(nulls.head.isNullAt(0))
    // SQL registration resolves to the same expression
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("dl_in")
    assert(spark.sql(
      "SELECT count(*) FROM dl_in WHERE deflate_len(text) <> dl")
      .collect().head.getLong(0) == 0L)
  }

  test("lmScore: hand-derived integer bits, pruning, and unseen fallback") {
    import graft.text.LangModel
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran"))
      .toDF("doc_id", "text")
    // refb: (the,cat)=2 (kept), (cat,sat)=1, (cat,ran)=1 (pruned);
    // uni: the=2, cat=2 (unpruned); V = |{cat, sat, ran}| = 3
    val (bi, uni, voc) = LangModel.train(ref, "text", minCount = 2L)
    val docs = Seq(
      (10L, "the cat sat"), // seen + pruned-as-unseen bigram
      (11L, "dog dog"),     // fully out-of-vocab context (c1 = 0)
      (12L, "solo"),        // < 2 tokens: no bigram evidence, drops out
      (13L, "")).toDF("doc_id", "text")
    val out = LangModel.score(docs, "doc_id", "text", bi, uni, voc)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // d10: (the,cat) blog(2+3)−blog(2+1)=3−2=1; (cat,sat) pruned →
    //      blog(2+3)−blog(0+1)=3−1=2 → total 3 of 2 bigrams
    assert(out(10L) == ((2L, 3L, 1500000L)))
    // d11: (dog,dog): blog(0+3)−blog(0+1)=2−1=1
    assert(out(11L) == ((1L, 1L, 1000000L)))
    assert(!out.contains(12L) && !out.contains(13L))
    spark.catalog.clearCache()
  }

  test("lmScore ranks fluent in-distribution text below scrambled text") {
    import graft.text.LangModel
    val sent = "we hold these truths to be self evident that all men are created equal"
    val ref = (1L to 20L).map(i => (i, sent)).toDF("doc_id", "text")
    val (bi, uni, voc) = LangModel.train(ref, "text", minCount = 2L)
    val docs = Seq(
      (100L, sent), // every bigram seen 20×
      // same tokens, scrambled: contexts are in-vocab (c1 = 20) but the
      // adjacent pairs are unseen — the word-order signal
      (101L, "truths we created be these men all hold to equal that evident are self"))
      .toDF("doc_id", "text")
    val m = LangModel.score(docs, "doc_id", "text", bi, uni, voc)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(100L) < m(101L), m.toString)
    spark.catalog.clearCache()
  }

  test("rboCurve: identical lists read 1-p^d exactly, disjoint read 0, partial overlap matches hand fold") {
    import graft.text.Retrieval
    val a = (1L to 5L).map(i => (i, i)).toDF("doc_id", "rank")
    // identical rankings, p = 1/2: X_d = d so RBO@d = 1 - 2^-d, up to
    // the femto quantization of each term
    val same = Retrieval.rboCurve(a, a, "doc_id", "rank", depth = 5, p = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    (1 to 5).foreach(d =>
      assert(math.abs(same(d.toLong) - (1.0 - math.pow(0.5, d))) < 1e-12))
    // disjoint rankings: zero overlap at every depth, exactly
    val b = (1L to 5L).map(i => (i + 100, i)).toDF("doc_id", "rank")
    val none = Retrieval.rboCurve(a, b, "doc_id", "rank", 5, 0.5)
      .collect().map(_.getDouble(3))
    assert(none.forall(_ == 0.0))
    // partial overlap: docs 1 (mr 1) and 2 (mr 3) -> X = [1, 1, 2]
    val c = Seq((1L, 1L), (9L, 2L), (2L, 3L)).toDF("doc_id", "rank")
    val part = Retrieval.rboCurve(a, c, "doc_id", "rank", 3, 0.5)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(part.map(_._1).toSeq == Seq(1L, 1L, 2L))
    val expect = 0.5 * 1 / 1 + (0.25 * 1 / 2 + 0.125 * 2.0 / 3.0)
    assert(math.abs(part.last._2 - expect) < 1e-12)
  }

  test("extractAnchors + anchorProfile: href/anchor pairs zip in order, per-host top-k ranks by count then token") {
    import graft.text.Urls
    val html = Seq(
      (1L, """<a href="https://A.com/x">best spark guide</a> text <a href="http://b.com/y">spark tips</a>"""),
      (2L, """<a href="https://a.com/z">spark guide</a><a href="https://a.com/w" class="c">guide</a>"""),
      (3L, "no links here")).toDF("id", "html")
    val pairs = html
      .select(explode(Urls.extractAnchors($"html")).as("pr"))
      .select(Urls.host($"pr.href").as("h"), $"pr.anchor".as("a"))
    val got = pairs.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(got.toSeq == Seq(("a.com", "best spark guide"), ("a.com", "guide"),
      ("a.com", "spark guide"), ("b.com", "spark tips")))
    val prof = Urls.anchorProfile(pairs, "h", "a", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // a.com tokens: guide x3, spark x2, best x1 -> top2 = guide, spark
    assert(prof.filter(_._1 == "a.com").sortBy(_._4).toSeq ==
      Seq(("a.com", "guide", 3L, 1L), ("a.com", "spark", 2L, 2L)))
    // b.com: spark and tips tie at 1 -> token asc breaks the tie
    assert(prof.filter(_._1 == "b.com").sortBy(_._4).toSeq ==
      Seq(("b.com", "spark", 1L, 1L), ("b.com", "tips", 1L, 2L)))
  }

  test("Cdc: chunks reassemble exactly, boundaries survive prefix edits, dup profile pins copies") {
    import graft.text.Cdc
    val rnd = new scala.util.Random(13)
    val body = Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, body),
      (2L, "PREFIX-EDIT: " + body), // shifted copy
      (3L, body),                   // verbatim copy of 1
      (4L, "short"),                // below the window: one whole chunk
      (5L, "")).toDF("doc_id", "text")
    val ch = Cdc.chunks(docs, "doc_id", "text")
    // chunks reassemble to the exact original text, in start order
    val re = ch.orderBy($"doc_id", $"start")
      .groupBy($"doc_id").agg(concat_ws("", collect_list($"chunk")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re(1L) == body && re(2L) == "PREFIX-EDIT: " + body && re(4L) == "short")
    assert(!re.contains(5L)) // empty text: nothing to chunk
    // shift resilience: the prefix-edited copy shares all but its first
    // chunk with the original — fixed-size chunking would share none
    val c1 = ch.filter($"doc_id" === 1L).collect().map(_.getString(3)).toSet
    val c2 = ch.filter($"doc_id" === 2L).orderBy($"start")
      .collect().map(_.getString(3))
    assert(c2.length >= 3, s"want multiple chunks, got ${c2.length}")
    assert(c2.tail.forall(c1.contains), "all post-edit chunks re-align")
    assert(!c1.contains(c2.head)) // the edited head chunk differs
    // dup profile: verbatim copies fully duplicated; unique short doc 0
    val prof = Cdc.chunkDedupProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(5))).toMap
    assert(prof(1L)._2 == 1.0 && prof(3L)._2 == 1.0)
    assert(prof(2L)._2 > 0.8) // shifted copy: everything after the head
    assert(prof(4L) == ((1L, 0.0)))
  }

  test("NaiveBayes: held-out docs recover planted classes, mixed doc goes to majority vocab, empty drops") {
    import graft.text.NaiveBayes
    val train = (
      (1 to 10).map(i => ("sport", s"goal match team score win game$i")) ++
      (1 to 10).map(i => ("tech", s"code server deploy bug compile build$i")))
      .toDF("label", "text")
    val docs = Seq(
      (1L, "team score goal win"),           // pure sport vocab
      (2L, "server bug deploy compile"),     // pure tech vocab
      (3L, "goal match team server"),        // 3:1 sport majority
      (4L, "")).toDF("doc_id", "text")       // no evidence: drops
    val out = NaiveBayes.trainAndClassify(train, "label", "text",
        docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "sport" && out(2L) == "tech" && out(3L) == "sport")
    assert(!out.contains(4L))
    // deterministic across partitionings (integer costs, total tie-break)
    val again = NaiveBayes.trainAndClassify(train.repartition(7), "label",
        "text", docs.repartition(5), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("ngramDiversity: cross-doc mode collapse lowers distinct ratio and concentrates top-k mass") {
    import graft.text.Spans
    // organic: every doc distinct phrasing, no gram shared across docs.
    // collapsed: docs NEVER repeat within themselves (per-doc repetition
    // is blind to this) but all reuse the same template phrasing.
    val organic = Seq(
      "alpha beta gamma delta epsilon zeta",
      "one two three four five six",
      "red green blue cyan magenta yellow",
      "north south east west up down")
    val collapsed = Seq.tabulate(4)(i =>
      s"as a large language model i cannot help with item$i")
    val docs = (organic.map(("organic", _)) ++ collapsed.map(("collapsed", _)))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val r = Spans.ngramDiversity(docs, "source", "text", w = 3, topK = 5)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(4), x.getDouble(5))).toMap
    val (orgN, orgD, orgRatio, orgShare) = r("organic")
    val (colN, colD, colRatio, colShare) = r("collapsed")
    // organic: 4 docs x 4 trigram positions, all distinct
    assert(orgN == 16L && orgD == 16L && orgRatio == 1.0)
    // collapsed: 4 docs x 8 positions; 7 template trigrams shared by all
    // 4 docs + 1 per-doc tail gram -> 11 distinct of 32
    assert(colN == 32L && colD == 11L)
    assert(colRatio < orgRatio)
    // top-5 grams each occur 4x -> 20/32 of the mass (tie-break at the
    // cut is between equal counts, so the mass is tie-invariant)
    assert(colShare == 20.0 / 32.0 && colShare > orgShare)
    // two-phase bounded rank == brute-force top-k mass
    val brute = docs.filter($"source" === "collapsed")
      .select(explode(graft.dedup.NearDup.shingles(
        graft.text.TextAnalysis.tokens($"text"), 3)).as("g"))
      .groupBy("g").count().orderBy($"count".desc, $"g")
      .limit(5).agg(sum("count")).collect().head.getLong(0)
    val topkGrams = Spans.ngramDiversity(docs, "source", "text", w = 3, topK = 5)
      .filter($"source" === "collapsed").collect().head.getLong(3)
    assert(topkGrams == brute)
  }

  test("charEntropy: constant text reads 0, uniform 16-char text reads " +
      "exactly 64 quantized bits, empty docs drop") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "aaaaaaaa"),                    // 1 distinct → h_q = 0
      (2L, "abcdefghijklmnop"),            // 16 distinct × 1 → 16·5 − 16·1
      (3L, "")                             // no chars → no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((8L, 1L, 0L, 0.0)))
    assert(out(2L) == ((16L, 16L, 64L, 4.0)))
    assert(!out.contains(3L))
  }

  test("zipfSlope: hand-built 32/8/2/1 frequencies fit slope -2.5 " +
      "exactly; single-rank group has no fit") {
    import graft.text.Spans
    // x = blog(rank 1..4) = 1,2,2,3; y = blog(32,8,2,1) = 6,4,2,1
    // slope = (4·21 − 8·13) / (4·18 − 64) = −20/8 = −2.5
    val text = (Seq.fill(32)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(2)("cc") ++ Seq("dd")).mkString(" ")
    val docs = Seq(("zipf", text), ("single", "solo solo")).toDF("source", "text")
    val out = Spans.zipfSlope(docs, "source", "text", topR = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
      .toMap
    assert(out("zipf") == ((4L, Some(-2.5))))
    assert(out("single") == ((1L, None))) // degenerate: no x variance
  }

  test("readability: hand counts for words/sentences/syllables, " +
      "wordless doc gets NULL grade and sentence floor 1") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat. it ran fast!"),
      (2L, "?!.")                          // no words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // 6 words, 2 sentence runs, 6 vowel groups (e,a,a,i,a,a)
    assert(out(1L) ==
      ((6L, 2L, 6L, Some(0.39 * (6.0 / 2) + 11.8 * (6.0 / 6) - 15.59))))
    assert(out(2L) == ((0L, 1L, 0L, None)))
  }

  test("kwicSnippets: mid-doc window, clamped edges, first occurrence " +
      "wins, non-matching docs drop") {
    import graft.text.Retrieval
    val docs = Seq(
      (1L, "a b c TARGET d e f"),        // centered window
      (2L, "TARGET x y z w"),            // left-clamped
      (3L, "p q target TARGET target r") // first (case-folded) match at 3
      , (4L, "nothing here")).toDF("doc_id", "text")
    val out = Retrieval.kwicSnippets(docs, "doc_id", "text", "target", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out(1L) == ((4L, "b c target d e")))
    assert(out(2L) == ((1L, "target x y")))
    assert(out(3L) == ((3L, "p q target target target")))
    assert(!out.contains(4L))
  }

  test("nextTokenAccuracy: modal successor hits count weighted, " +
      "deterministic tie-break") {
    import graft.text.LangModel
    // "a b" x2, "a c" x1 → contexts: a (modal b, 2/3 correct);
    // b→a, c→a chains add always-correct bigrams
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = LangModel.nextTokenAccuracy(docs, "text").collect().head
    // bigrams: ab, ba, ab, ba, ac → ab×2 ac×1 ba×2
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L) // ab×2 + ba×2 correct; ac misses
    assert(r.getDouble(3) == 4.0 / 5)
  }

  test("datasheet: volumes, modal language with tie-break, cross-source " +
      "dup counted against the later id only") {
    import graft.text.Corpus
    val docs = Seq(
      (1L, "alpha beta", "en", "s1"),
      (2L, "gamma delta", "fr", "s1"),
      (3L, "ALPHA   beta", "en", "s2"),   // normalized dup of doc 1
      (4L, "unique text here", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.datasheet(docs, "source", "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5),
          r.getLong(6)))).toMap
    // s1: 2 docs, 4 tokens, langs {en, fr} tie → en, no dups (doc 1 is
    // the FIRST of its fingerprint)
    assert(out("s1") == ((2L, 4L, 2L, "en", 0L)))
    // s2: doc 3 duplicates doc 1 → 1 dup; modal lang tie en/de → de
    assert(out("s2") == ((2L, 5L, 2L, "de", 1L)))
  }

  test("vocabOverlap: planted half-overlap pair exact, disjoint pair " +
      "produces no row") {
    import graft.text.Corpus
    val docs = Seq(
      ("s1", "alpha beta gamma delta"),
      ("s2", "gamma delta epsilon zeta"),
      ("s3", "omega psi")).toDF("source", "text")
    val out = Corpus.vocabOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("s1", "s2")) == ((2L, 4L, 4L, 2.0 / 6.0)))
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("sourceDivergence: identical distributions read exactly 0, " +
      "disjoint vocabularies read maximal, order preserved") {
    import graft.text.Corpus
    val docs = Seq(
      ("a", "one two three one two three"),
      ("b", "one two three one two three"),   // identical dist to a
      ("c", "four five six four five six"),   // disjoint from a
      ("d", "one two three four five six")    // half-way
    ).toDF("source", "text")
    val out = Corpus.sourceDivergence(docs, "source", "text", buckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("a", "b")) == 0L)              // p = q ⇒ blog(2p) = blog(p+q)
    assert(out(("a", "c")) > 0L)
    assert(out(("a", "d")) > 0L)
    assert(out(("a", "c")) > out(("a", "d")))  // disjoint beats half-way
  }

  test("truncateMiddleOut: over-budget docs keep head+tail around the " +
      "marker, in-budget docs pass through verbatim") {
    import graft.text.Segments
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),   // 10 > 6 → truncate
      (2L, "a b c d e f"),                      // exactly 6 → untouched
      (3L, "short one")
    ).toDF("doc_id", "text")
    val out = Segments.truncateMiddleOut(docs, "doc_id", "text",
      maxTokens = 6, headTokens = 3, tailTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getString(5)))).toMap
    assert(out(1L) == ((10L, 5L, 5L, true, "t1 t2 t3 ... t9 t10")))
    assert(out(2L) == ((6L, 6L, 0L, false, "a b c d e f")))
    assert(out(3L) == ((2L, 2L, 0L, false, "short one")))
  }

  test("sharedLinePairs: verbatim shared lines attribute the pair, " +
      "vocabulary overlap alone does not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val line1 = "a b c d"
    val line2 = "e f g h"
    val docs = Seq(
      (1L, s"$line1 $line2"),
      (2L, s"$line1 $line2"),          // shares both lines with 1
      (3L, "d c b a h g f e"))         // same vocabulary, no line
      .toDF("doc_id", "text")
    val out = graft.text.Segments.sharedLinePairs(docs, "doc_id",
        "text", per = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map((1L, 2L) -> 2L))
  }

  test("heapsCurve: first-occurrence identity gives exact prefix " +
      "vocab sizes, new_tokens telescope") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d e"))
      .toDF("doc_id", "text")
    val out = graft.text.Corpus.heapsCurve(docs, "doc_id", "text",
        Seq(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 2L)))  // {a, b}
    assert(out(2L) == ((3L, 1L)))  // +c
    assert(out(3L) == ((5L, 2L)))  // +d, e
  }

  test("sourceAblation: leave-one-out means are pure arithmetic from " +
      "group sums, contribution signs correct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(("g1", 10L), ("g1", 10L), ("g2", 40L))
      .toDF("source", "m")
    val out = graft.text.Corpus.sourceAblation(docs, "source", col("m"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("loo_mean"),
          r.getAs[Double]("contribution")))).toMap
    assert(out("g1") == ((40.0, -20.0))) // without g1, mean jumps to 40
    assert(out("g2") == ((10.0, 10.0)))  // g2 pulls the mean up by 10
  }

  test("rocchioExpansion: feedback-doc tokens ranked by tf*N/df, " +
      "query terms excluded, token tie-break") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "spark data x y"), (2L, "spark x z"),
      (3L, "q q q")).toDF("doc_id", "text")
    val out = graft.text.Retrieval.rocchioExpansion(docs, "doc_id",
        "text", Seq("spark"), nFeedback = 3, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq("data", "x", "y", "z")) // all 3.0
    assert(out.forall(_._4 == 3.0))
    assert(out.find(_._1 == "x").get._2 == 2L) // tf_fb counts both docs
  }

  test("bestPassage: densest hit window wins, earliest on ties, " +
      "passage clips at document end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "a spark b c d e f g h i j spark data k"),
      (2L, "nothing relevant here")).toDF("doc_id", "text")
    val out = graft.text.Retrieval.bestPassage(docs, "doc_id", "text",
        Seq("spark", "data", "join"), window = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((12L, 2L, "spark data k"))) // clipped window
    assert(!out.contains(2L)) // no hits → absent
  }

  test("tokenShareShift: micro-share deltas exact, one-sided tokens " +
      "coalesce to zero share, tie-break by token") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = Seq("x x x y").toDF("text")
    val b = Seq("x y y z").toDF("text")
    val out = graft.text.Corpus.tokenShareShift(a, b, "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(out("x") == ((3L, 1L, 500000L)))   // 750000 − 250000
    assert(out("y") == ((1L, 2L, -250000L)))  // 250000 − 500000
    assert(out("z") == ((0L, 1L, -250000L)))  // absent in a
  }

  test("pathRollup: prefixes per depth, hosts case-folded and merged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val urls = Seq("https://A.com/x/y/z?q=1", "https://a.com/x/w",
      "not a url").toDF("url")
    val out = graft.text.Urls.pathRollup(urls, "url")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2)) -> r.getLong(3)).toMap
    assert(out(("a.com", 1L, "/x")) == 2L)
    assert(out(("a.com", 2L, "/x/y")) == 1L)
    assert(out(("a.com", 3L, "/x/y/z")) == 1L)
    assert(out(("a.com", 2L, "/x/w")) == 1L)
    assert(out.size == 4) // schemeless row excluded
  }

  test("removeBoilerplate: template line dropped from EVERY doc " +
      "(no first-occurrence survivor), payloads kept") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar uniq1 payload", "s"),
      (2L, "nav bar uniq2 payload", "s"),
      (3L, "nav bar uniq3 payload", "s"))
      .toDF("doc_id", "text", "source")
    val out = graft.text.Segments.removeBoilerplate(docs, "doc_id", "text",
        "source", per = 2, minFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "uniq1 payload"))) // first doc too
    assert(out(2L) == ((2L, 1L, "uniq2 payload")))
    assert(out(3L) == ((2L, 1L, "uniq3 payload")))
  }

  test("normalizeText: NFC composition, fullwidth fold, ideographic " +
      "space, simple lowercase (incl. dotted capital I), ASCII identity") {
    import spark.implicits._
    import graft.functions.NormalizeText
    val rows = Seq(
      "café",            // NFD -> composed lowercase café
      "Café",             // NFC title case
      "ＣａｆＥ", // fullwidth CAFE
      "a　b",              // ideographic space folds to ASCII space
      "İstanbul",         // dotted capital I: SIMPLE mapping -> i
      "Plain ASCII 42!")
      .toDF("text")
    val out = rows.select(NormalizeText.normalizeText(col("text")))
      .as[String].collect()
    assert(out(0) == "café")
    assert(out(1) == "café")
    assert(out(2) == "cafe")
    assert(out(3) == "a b")
    assert(out(4) == "istanbul") // Java full-mapping lower would give i̇
    assert(out(5) == "plain ascii 42!")
    // null-safety + SQL registration route
    graft.functions.GraftFunctions.register(spark)
    val viaSql = Seq(Some("CAFÉ"), None).toDF("text")
      .selectExpr("normalize_text(text) AS n").as[Option[String]].collect()
    assert(viaSql(0).contains("café") && viaSql(1).isEmpty)
  }

  test("unicodePlanted fixtures: byte-distinct in every pair but " +
      "normalize to one string (guards against source-file NFC " +
      "normalization silently weakening q307)") {
    import spark.implicits._
    import graft.functions.NormalizeText
    val planted = graft.queries.TextDedup.unicodePlanted
    assert(planted.map(_._2).distinct.size == planted.size,
      "fixture texts must stay byte-distinct")
    val normed = planted.toDF("doc_id", "text")
      .select(NormalizeText.normalizeText(col("text")))
      .as[String].collect().toSeq
    // first four collapse (modulo whitespace runs), the control stays out
    val fp = normed.map(_.replaceAll("\\s+", " ").trim)
    assert(fp.take(4).distinct.size == 1, s"variants must collapse: $fp")
    assert(fp(4) != fp(0))
    // and the NFD fixtures are REALLY decomposed in the source file
    assert(planted(1)._2.contains("́"),
      "NFD fixture lost its combining mark — source file was normalized")
  }

  test("languageFilterSegments keeps English segments in order, drops " +
      "the Spanish ones, and passes token-free docs through as (0,0,'')") {
    import spark.implicits._
    val en1 = "the cat is in the hat and the dog is on the log it is fun"
    val es = "el perro y la casa de los gatos en un rio que es de la luz"
    val en2 = "a bird in the hand is worth two of the bush and the rest now"
    // 16 tokens per segment; doc 1 = en/es/en, doc 2 = all-Spanish, 3 = empty
    val docs = Seq(
      (1L, s"$en1 $es $en2"),
      (2L, es),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.text.Segments
      .languageFilterSegments(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 3L && out(1L)._2 == 2L)
    assert(out(1L)._3 == s"$en1 $en2")
    assert(out(2L) == ((1L, 0L, "")))
    assert(out(3L) == ((0L, 0L, "")))
  }

  test("suffixArray: hand-derived banana ranks, brute-force parity on " +
      "mixed docs, empty docs drop, short docs converge early") {
    import spark.implicits._
    // banana suffixes sorted: a, ana, anana, banana, na, nana
    val b = graft.text.SuffixArray.perDocRanks(
        Seq((1L, "banana")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(b == Map(1L -> 4L, 2L -> 3L, 3L -> 6L, 4L -> 2L, 5L -> 5L,
      6L -> 1L))

    val docs = Seq((1L, "mississippi"), (2L, "abracadabra"),
      (3L, "a"), (4L, ""), (5L, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val out = graft.text.SuffixArray
      .perDocRanks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val expect = Seq((1L, "mississippi"), (2L, "abracadabra"),
      (3L, "a"), (5L, "the cat sat on the mat")).flatMap { case (id, t) =>
      val ranked = (1 to t.length).sortBy(p => t.substring(p - 1))
        .zipWithIndex.map { case (p, i) => (id, p.toLong) -> (i + 1L) }
      ranked
    }.toMap
    assert(out == expect)
    assert(!out.keySet.exists(_._1 == 4L)) // empty doc absent
  }

  test("longestRepeat: hand-derived repeats (overlapping allowed), " +
      "repeat-free docs read zero, single-char docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banana"),   // "ana" at 2 (overlapping occurrences 2 and 4)
      (2L, "abcd"),     // no repeat
      (3L, "aaaa"),     // "aaa" at 1
      (4L, "abab"),     // "ab" at 1
      (5L, "x"),        // single suffix → absent
      (6L, "the cat and the dog")) // "the " at 1
      .toDF("doc_id", "text")
    val out = graft.text.SuffixArray
      .longestRepeat(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "ana")))
    assert(out(2L) == ((0L, 0L, "")))
    assert(out(3L) == ((3L, 1L, "aaa")))
    assert(out(4L) == ((2L, 1L, "ab")))
    assert(out(6L) == ((4L, 1L, "the ")))
    assert(!out.contains(5L))
  }

  test("ppmiNeighbors: shared-context words are mutual neighbors with " +
      "symmetric sims, context-only words get none, hand-derived q") {
    import spark.implicits._
    // "a b" and "c b": a and c share context b (ppmi_q 1 each) →
    // sim(a,c) = 1 both ways; b's contexts {a, c} are exclusive to it
    val docs = Seq((1L, "a b"), (2L, "c b")).toDF("doc_id", "text")
    val out = graft.text.WordSim
      .ppmiNeighbors(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(("a", "c") -> ((1L, 1L)), ("c", "a") -> ((1L, 1L))))

    // richer corpus: mutual-neighbor symmetry of the dot product
    val d2 = Seq((1L, "the dog barks loud"), (2L, "the cat barks loud"),
      (3L, "the dog barks loud"), (4L, "the cat barks loud"))
      .toDF("doc_id", "text")
    val sims = graft.text.WordSim.ppmiNeighbors(d2, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    sims.foreach { case ((w1, w2), s) =>
      assert(sims.get((w2, w1)).forall(_ == s)) }
    assert(sims.contains(("dog", "cat")) && sims.contains(("cat", "dog")))
  }

  test("textTiling: hand-derived gap overlaps and depths, the topic " +
      "shift is the boundary, flat gaps are not") {
    import spark.implicits._
    // blocks of 4: [a a a a][a a a a][b b b b][b b b b]
    // overlaps: gap1=4, gap2=0, gap3=4 → depths 0, 8, 0
    // L(gap2) = 16 − 48 ≤ 0 → boundary; L(gap1) = 16, 256 > 128 → not
    val docs = Seq(
      (1L, ("a " * 8 + "b " * 8).trim)).toDF("doc_id", "text")
    val out = graft.text.Tiling
      .textTiling(docs, "doc_id", "text", blockTokens = 4)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((4L, 0L, false)))
    assert(out(2L) == ((0L, 8L, true)))
    assert(out(3L) == ((4L, 0L, false)))
  }

  test("globalRanks: hand-derived strict ranks across docs, " +
      "byte-identical suffixes from different docs share a rank") {
    import spark.implicits._
    // suffix sort: a, ab, aba, abab, b, ba, bab, xy, xy, y, y
    val docs = Seq((1L, "abab"), (2L, "aba"), (3L, "xy"), (4L, "xy"))
      .toDF("doc_id", "text")
    val out = graft.text.SuffixArray
      .globalRanks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (2L, 3L) -> 1L, (1L, 3L) -> 2L, (2L, 1L) -> 3L, (1L, 1L) -> 4L,
      (1L, 4L) -> 5L, (2L, 2L) -> 6L, (1L, 2L) -> 7L,
      (3L, 1L) -> 8L, (4L, 1L) -> 8L, (3L, 2L) -> 10L, (4L, 2L) -> 10L))
  }

  test("crossDocRepeats: hand-derived adjacent cross-doc LCPs, " +
      "top-1 is the true longest shared substring") {
    import spark.implicits._
    val docs = Seq((1L, "abab"), (2L, "aba")).toDF("doc_id", "text")
    val rows = graft.text.SuffixArray
      .crossDocRepeats(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(rows.head == ((3L, 2L, 1L, 1L, 1L, "aba")))
    assert(rows.toSet == Set(
      (3L, 2L, 1L, 1L, 1L, "aba"),
      (2L, 1L, 3L, 2L, 1L, "ab"),
      (2L, 2L, 2L, 1L, 2L, "ba"),
      (1L, 1L, 4L, 2L, 2L, "b"),
      (1L, 2L, 3L, 1L, 3L, "a")))
  }

  test("dupNgramCoverage: merged positional intervals, disjoint islands, " +
      "and the short-doc edge — all hand-derived at n=2") {
    import graft.text.Gopher
    // doc 1: "a b a b a c" -> stream chars a:0 b:2 a:4 b:6 a:8 c:10,
    //   n_chars=11; dup 2-grams "a b"(x2) "b a"(x2) cover
    //   [0,3)+[2,5)+[4,7)+[6,9) -> one island [0,9) -> covered 9;
    //   gate at n=2: 100*9 <= 18*11 is FALSE.
    // doc 2: "a b c a b d a b" -> "ab" x3 at [0,3),[6,9),[12,15):
    //   three DISJOINT islands -> covered 9 of n_chars 15; gate FALSE
    //   (900 <= 270 is false).
    // doc 3: "x y z" -> no dup grams -> covered 0, pass TRUE.
    // doc 4: "q" -> shorter than n -> no grams at all -> covered 0.
    val docs = Seq((1L, "a b a b a c"), (2L, "a b c a b d a b"),
      (3L, "x y z"), (4L, "q")).toDF("doc_id", "text")
    val out = Gopher.dupNgramCoverage(docs, "doc_id", "text", ns = Seq(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out == Set(
      (1L, 2L, 11L, 9L, 9000000L / 11L, false),
      (2L, 2L, 15L, 9L, 9000000L / 15L, false),
      (3L, 2L, 5L, 0L, 0L, true),
      (4L, 2L, 1L, 0L, 0L, true)))
  }

  test("blocklist phraseHits: token-boundary multi-length matching " +
      "counts every occurrence; zero-hit docs pass through") {
    import graft.text.Blocklist
    // doc 1 tokens: the table scan merge runs a table scan merge
    //   ("Table-Scan" normalizes to two tokens) — "table scan merge"
    //   hits at i=1 and i=6, "scan merge" at i=2 and i=7 -> 4 hits of
    //   2 distinct phrases. doc 2 hits nothing. "scanmerge" (no
    //   boundary) must NOT match "scan merge".
    val docs = Seq((1L, "the table scan merge runs a Table-Scan merge"),
      (2L, "nothing to see here scanmerge")).toDF("doc_id", "text")
    val out = Blocklist.phraseHits(docs, "doc_id", "text",
        Seq("table scan merge", "scan merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out == Set((1L, 4L, 2L, true), (2L, 0L, 0L, false)))
  }

  test("scriptMix: per-script letter mass, fixed-order dominance ties, " +
      "5% presence cross-multiplication — hand-derived") {
    import graft.text.Scripts
    val docs = Seq(
      (1L, "Привет world"), // cyr 6 > lat 5, both >= 5% -> mixed
      (2L, "hello 123"),    // latin only; digits are not letters
      (3L, "123 !!!"),      // letterless -> dominant NULL
      (4L, "abcабв"),       // 3-3 tie -> latin wins by fixed order
      (5L, "日本語カナ")      // han 3 / kana 2 -> mixed
    ).toDF("doc_id", "text")
    val out = Scripts.scriptMix(docs, "doc_id", "text")
      .select("doc_id", "letters", "dominant", "n_scripts", "mixed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getString(2),
          r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((11L, "cyrillic", 2L, true)))
    assert(out(2L) == ((5L, "latin", 1L, false)))
    assert(out(3L) == ((0L, null, 0L, false)))
    assert(out(4L) == ((6L, "latin", 2L, true)))
    assert(out(5L) == ((5L, "han", 2L, true)))
  }

  test("char-trigram NB langid: held-out docs classify by script; " +
      "the word-token path cannot see them at all") {
    import graft.text.NaiveBayes
    import graft.dedup.NearDup
    val train = Seq(("ru", "привет мир"), ("zh", "你好 世界"),
      ("en", "hello world")).toDF("lang", "text")
    val eval = Seq((1L, "мир мир"), (2L, "你好 你好"),
      (3L, "world hello")).toDF("doc_id", "text")
    val preds = NaiveBayes.trainAndClassify(train, "lang", "text",
        eval, "doc_id", units = t => NearDup.charShingles(t, 3))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "ru", 2L -> "zh", 3L -> "en"))
  }

  test("char_entropy_stats (native #10): value parity with the " +
      "relational oracle form and the SQL route, Unicode included") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "a"),                         // single char: h_q = 1*1 - 1*1 = 0
      (2L, "aaaa"),                      // one symbol: n*blog(4) - 4*blog(4) != 0? 4*3-4*3=0
      (3L, "abab"),                      // 4*3 - (2*2 + 2*2) = 4
      (4L, "Привет, мир! 你好 🙂🙂"),      // BMP + astral, astral counts once per cp
      (5L, "the quick brown fox jumps over the lazy dog 0123456789"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_chars_counted", "n_distinct_chars", "h_q")
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val native = norm(TextAnalysis.charEntropy(docs, "doc_id", "text"))
    val rel = norm(TextAnalysis.charEntropyRelational(docs, "doc_id", "text"))
    assert(native == rel)
    assert(native(3L) == ((4L, 2L, 4L)))
    assert(native(2L)._3 == 0L)
    // SQL-registered route computes the same array
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("ce_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, char_entropy_stats(text) AS s FROM ce_docs""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql(3L) == Seq(4L, 2L, 4L))
    assert(native.forall { case (id, (n, d, h)) =>
      viaSql(id) == Seq(n, d, h) })
  }

  test("scriptRuns: compaction kills word-boundary false alternation; " +
      "switches count script crossings — hand-derived") {
    import graft.text.Scripts
    val docs = Seq(
      (1L, "Привет world"),  // cyr+latin -> 2 runs, 1 switch, 11 letters
      (2L, "abcабвabc"),     // latin,cyr,latin -> 3 runs, 2 switches
      (3L, "hello world"),   // ONE latin run after compaction: 0 switches
      (4L, "123 !!!")        // letterless: all zeros
    ).toDF("doc_id", "text")
    val out = Scripts.scriptRuns(docs, "doc_id", "text")
      .select("doc_id", "letters", "total_runs", "switches",
        "switch_density_micro")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((11L, 2L, 1L, 1000000L / 11L)))
    assert(out(2L) == ((9L, 3L, 2L, 2000000L / 9L)))
    assert(out(3L) == ((10L, 1L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L, 0L)))
  }

  test("crossSourceExactMatrix: fingerprint identity folds whitespace, " +
      "pair masses count within and across sources — hand-derived") {
    import graft.dedup.NearDup
    // fp(x): a x2 (one via whitespace fold), b x1; fp(y): b x1, c x1
    val docs = Seq((1L, "a", "x"), (2L, "a", " x"), (3L, "b", "x"),
      (4L, "b", "y"), (5L, "c", "y")).toDF("doc_id", "src", "text")
    val out = NearDup.crossSourceExactMatrix(docs, "doc_id", "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("a", "a") -> ((1L, 1L)),   // C(2,2) = 1 within a
      ("a", "b") -> ((1L, 2L)),   // 2x1 across
      ("b", "c") -> ((1L, 1L))))  // the y group
  }

  test("labelNoiseAudit: cross-fold NB flags the planted flipped label and clears the rest") {
    import graft.text.NaiveBayes
    import spark.implicits._
    // two well-separated vocabularies; doc 7 is a CAT document labeled dog
    val docs = Seq(
      (1L, "alpha beta alpha gamma alpha beta", "cat"),
      (2L, "beta alpha alpha beta gamma alpha", "cat"),
      (3L, "alpha gamma beta alpha alpha", "cat"),
      (4L, "delta epsilon zeta delta epsilon", "dog"),
      (5L, "epsilon delta delta zeta epsilon", "dog"),
      (6L, "zeta delta epsilon epsilon delta", "dog"),
      (7L, "alpha beta alpha alpha gamma beta", "dog"))
      .toDF("doc_id", "text", "label")
    val out = NaiveBayes.labelNoiseAudit(docs, "doc_id", "label", "text",
        folds = 2, salt = "lns")
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getBoolean(6))).toMap
    assert(out.size == 7)
    assert(out(7L)._1 == "dog" && out(7L)._2 == "cat" && !out(7L)._3,
      s"flipped doc must be flagged: ${out(7L)}")
    for (i <- 1L to 6L) assert(out(i)._3, s"doc $i should agree: ${out(i)}")
    // fold column is the salted hash bucket: deterministic across runs
    val again = NaiveBayes.labelNoiseAudit(docs.repartition(5), "doc_id",
        "label", "text", folds = 2, salt = "lns")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folds = NaiveBayes.labelNoiseAudit(docs, "doc_id", "label",
        "text", folds = 2, salt = "lns")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == folds)
  }

  test("TextRank.topSegments: overlapping segments rank, isolated and " +
      "single-segment docs drop, graphs never cross documents") {
    import spark.implicits._
    import graft.text.TextRank
    val segA = Seq.fill(4)("alpha beta gamma delta").mkString(" ") // 16 toks
    val segC = (1 to 16).map(i => s"only$i").mkString(" ")
    // doc 1: segments [A, A, C] — s0↔s1 share 4 distinct tokens (edge),
    // s2 is disjoint (no edge, not emitted).
    // doc 2: ONE segment with doc 1's exact vocabulary — if segment
    // graphs leaked across documents it would edge to doc 1's s0/s1
    // and surface; it must be absent.
    val out = TextRank.topSegments(
        Seq((1L, s"$segA $segA $segC"), (2L, segA))
          .toDF("doc_id", "text"),
        "doc_id", "text", per = 16, minOverlap = 3L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 0L), (1L, 1L)))
    // the two-node graph is symmetric: equal integer ranks, sid tie
    val Seq(first, second) = out.sortBy(_._4).toSeq
    assert(first._3 == second._3 && first._2 == 0L && second._2 == 1L)
    // segment text round-trips the slice
    val seg = TextRank.topSegments(
        Seq((9L, s"$segA $segA")).toDF("doc_id", "text"),
        "doc_id", "text", per = 16, minOverlap = 3L, k = 1)
      .collect().head.getString(2)
    assert(seg == segA)
  }
}
