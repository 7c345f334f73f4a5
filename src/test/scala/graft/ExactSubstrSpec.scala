package graft

import org.apache.spark.sql.functions._

/** Gates for [[graft.text.ExactSubstr]] and the threshold form of
  * [[graft.text.SuffixArray]] cross-doc repeats.
  *
  * The load-bearing test is the equivalence-lemma gate: the operator's
  * L-gram covered set must equal the suffix-array matchLen covered set
  * (∪ [q, q+matchLen(q)) over matchLen(q) ≥ L), computed here by brute
  * force over every cross-doc suffix pair.
  */
class ExactSubstrSpec extends SparkSuite {

  /** Brute-force exact covered set (0-based char indices): for every
    * position, the max common prefix with any suffix of ANOTHER doc;
    * cover [p, p+matchLen) when matchLen >= L. */
  private def bruteCover(docs: Map[Long, String], minLen: Int)
      : Map[Long, Set[Int]] =
    docs.map { case (id, t) =>
      val others = docs.collect { case (o, s) if o != id => s }.toSeq
      val cov = collection.mutable.Set[Int]()
      for (p <- 0 until t.length) {
        var m = 0
        for (o <- others; q <- 0 until o.length) {
          var l = 0
          while (p + l < t.length && q + l < o.length &&
            t(p + l) == o(q + l)) l += 1
          m = math.max(m, l)
        }
        if (m >= minLen) (p until p + m).foreach(cov += _)
      }
      id -> cov.toSet
    }

  test("removeCrossDocRepeats: L-gram covered set == brute-force " +
      "matchLen covered set (the equivalence lemma), within-doc-only " +
      "repeats untouched, every doc present") {
    import spark.implicits._
    val L = 6
    val fixture = Map(
      // 1 and 2 share "hello darkness my old" (21 chars); 3 is clean
      1L -> "say hello darkness my old friend here",
      2L -> "oh hello darkness my old pal",
      // within-doc repeat only ("abcdefabcdef...") — cross-doc must NOT fire
      3L -> "abcdefabcdefabcdef",
      // 4 and 5 share two disjoint runs; 5 also overlaps 1 ("darkness ")
      4L -> "first shared run xx second shared run",
      5L -> "first shared run yy second shared run darkness here too",
      6L -> "tiny", // shorter than L
      7L -> "")
    val expect = bruteCover(fixture, L)
    val out = graft.text.ExactSubstr
      .removeCrossDocRepeats(fixture.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == fixture.keySet)
    fixture.foreach { case (id, t) =>
      val cov = expect(id)
      val kept = t.indices.filterNot(cov).map(t.charAt).mkString
      assert(out(id) == ((t.length.toLong, cov.size.toLong, kept)),
        s"doc $id: got ${out(id)}, want (${t.length}, ${cov.size}, $kept)")
    }
    assert(out(3L)._2 == 0L)              // within-doc repeat kept
    assert(out(1L)._2 > 0L && out(4L)._2 > 0L)
  }

  test("removeLaterCopies: brute-force directional matchLen gate — " +
      "first copy keeps every span, later copies lose it, asymmetric " +
      "by doc order") {
    import spark.implicits._
    val L = 6
    val fixture = Map(
      1L -> "say hello darkness my old friend here",
      2L -> "oh hello darkness my old pal",       // later copy: excised
      3L -> "hello darkness again appears here",  // later copy of prefix
      4L -> "abcdefabcdefabcdef",                 // within-doc only: kept
      5L -> "")
    // directional brute force: matchLen vs suffixes of EARLIER docs only
    def cover(id: Long, t: String): Set[Int] = {
      val earlier = fixture.collect { case (o, s) if o < id => s }.toSeq
      val cov = collection.mutable.Set[Int]()
      for (p <- 0 until t.length) {
        var m = 0
        for (o <- earlier; q <- 0 until o.length) {
          var l = 0
          while (p + l < t.length && q + l < o.length &&
            t(p + l) == o(q + l)) l += 1
          m = math.max(m, l)
        }
        if (m >= L) (p until p + m).foreach(cov += _)
      }
      cov.toSet
    }
    val out = graft.text.ExactSubstr
      .removeLaterCopies(fixture.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    fixture.foreach { case (id, t) =>
      val cov = cover(id, t)
      val kept = t.indices.filterNot(cov).map(t.charAt).mkString
      assert(out(id) == ((t.length.toLong, cov.size.toLong, kept)),
        s"doc $id")
    }
    assert(out(1L)._2 == 0L)   // earliest copy untouched
    assert(out(2L)._2 > 0L && out(3L)._2 > 0L)
    assert(out(4L)._2 == 0L)   // within-doc repeats out of scope
  }

  test("bwt: hand-derived banana transform (sentinel at the full-text " +
      "suffix), run count, repetitive doc collapses to fewer runs") {
    import spark.implicits._
    // banana suffixes sorted: a, ana, anana, banana, na, nana
    // preceding chars:         n,  n,   b,     $,     a,  a  -> "nnb$aa"
    val docs = Seq((1L, "banana"), (2L, "abababab"), (3L, "axbycz"))
      .toDF("doc_id", "text")
    val out = graft.text.SuffixArray.bwt(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == ((6L, "nnb$aa", 4L)))
    // abababab: sorted suffixes ab, abab, ababab, abababab, b, bab,
    // babab, bababab -> preceding b,b,b,$,a,a,a,a = "bbb$aaaa", 3 runs
    assert(out(2L) == ((8L, "bbb$aaaa", 3L)))
    // the repetitive doc runs/char (3/8) < the distinct-char doc's
    assert(out(3L)._3.toDouble / out(3L)._1 >
      out(2L)._3.toDouble / out(2L)._1)
  }

  test("crossDocRepeatsAtLeast: hand-derived threshold pairs on " +
      "abab/aba (lcp >= 2 keeps exactly the 3 qualifying pairs)") {
    import spark.implicits._
    val docs = Seq((1L, "abab"), (2L, "aba")).toDF("doc_id", "text")
    val rows = graft.text.SuffixArray
      .crossDocRepeatsAtLeast(docs, "doc_id", "text", minLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // from the crossDocRepeats hand derivation: lcp 3, 2, 2 qualify;
    // lcp 1 pairs do not
    assert(rows == Set(
      (3L, 2L, 1L, 1L, 1L),
      (2L, 1L, 3L, 2L, 1L),
      (2L, 2L, 2L, 1L, 2L)))
  }

  test("wgramRecall: hand-derived span arithmetic — 20 shared 4-char " +
      "tokens give exact=101/doc (span + both flanking spaces), " +
      "approx=99/doc (token chars only), precision exactly 1") {
    import spark.implicits._
    // flanks are per-doc letters with NO shared prefix or suffix chars
    // across docs, so the exact covered run is precisely the shared
    // token span plus its two flanking spaces: 20·4 + 19 + 2 = 101
    def mk(pre: String, suf: String) =
      (Seq.fill(5)(pre) ++ (1 to 20).map(i => f"sh$i%02d") ++
        Seq.fill(5)(suf)).mkString(" ")
    val docs = Seq((1L, mk("uuu", "vvv")), (2L, mk("www", "zzz")))
      .toDF("doc_id", "text")
    val r = graft.text.ExactSubstr
      .wgramRecall(docs, "doc_id", "text", minLenChars = 40,
        w = 7, minDf = 2, minRunGrams = 5)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((202L, 198L, 198L)))
    assert(r.getLong(3) == 980198L)   // floor(198e6 / 202)
    assert(r.getLong(4) == 1000000L)  // approx ⊆ exact here
  }
}
