package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

class UnigramSpec extends SparkSuite {

  private def doc(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("trainPieces: hand-derived substring frequencies and bit-length costs") {
    // words: aa, ab. substrings: a×3, b×1, aa×1, ab×1. T = 6, blog(6)=3.
    val out = Unigram.trainPieces(doc("aa ab"), "doc_id", "text", topN = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "a" -> ((3L, 2L)),   // 3 − blog(3)=2 + 1
      "b" -> ((1L, 3L)),   // 3 − blog(1)=1 + 1
      "aa" -> ((1L, 3L)),
      "ab" -> ((1L, 3L))))
  }

  test("viterbi: longer piece wins when cheaper, tie breaks to shortest last piece") {
    // ab+ab = 4 beats a+b+a+b = 12 and ab+a+b = 8
    val longWins = Seq("a" -> 3L, "b" -> 3L, "ab" -> 2L)
    val s1 = Unigram.segment(doc("abab"), "doc_id", "text", longWins)
      .collect().head
    assert(s1.getLong(2) == 4L && s1.getString(3) == "ab ab")
    // tie: a+b = 2 == ab = 2 → smallest last-piece length → "a b"
    val tied = Seq("a" -> 1L, "b" -> 1L, "ab" -> 2L)
    val s2 = Unigram.segment(doc("ab"), "doc_id", "text", tied)
      .collect().head
    assert(s2.getLong(2) == 2L && s2.getString(3) == "a b")
  }

  test("out-of-alphabet chars price at INF instead of failing") {
    // the DP even optimizes the failure: one unknown 2-char piece (INF)
    // beats known 'a' + unknown 'z' (1 + INF)
    val cost = Unigram.viterbiCost(doc("az"),
        "doc_id", "text", Seq("a" -> 1L))
      .collect().head.getLong(2)
    assert(cost == Unigram.INF)
  }

  test("corpus invariants: concat(pieces) = word, piece costs sum to " +
      "viterbi cost, pieceCounts mass = total pieces used") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge join runs the batch join fast"),
      (2L, "merge sort beats hash join on sorted runs"),
      (3L, "the the the merge merge")).toDF("doc_id", "text")
    val pieces = Unigram.collectPieces(
      Unigram.trainPieces(docs, "doc_id", "text", topN = 8))
    val costOf = pieces.toMap
    val segs = Unigram.segment(docs, "doc_id", "text", pieces).collect()
    segs.foreach { r =>
      val (word, cost, ps) = (r.getString(0), r.getLong(2), r.getString(3))
      assert(ps.replace(" ", "") == word, s"pieces must respell $word")
      assert(ps.split(" ").map(costOf).sum == cost,
        s"piece costs must sum to the DP cost for $word")
    }
    val counts = Unigram.pieceCounts(docs, "doc_id", "text", pieces)
      .agg(sum(col("n_uses"))).collect().head.getLong(0)
    val expected = segs.map(r =>
      r.getLong(1) * r.getString(3).split(" ").length).sum
    assert(counts == expected)
  }

  test("encodeDocs respells every token occurrence in document order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge join runs the merge"),
      (2L, "join the merge")).toDF("doc_id", "text")
    val pieces = Unigram.collectPieces(
      Unigram.trainPieces(docs, "doc_id", "text", topN = 8))
    val enc = Unigram.encodeDocs(docs, "doc_id", "text", pieces)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val respelled = enc.groupBy(t => (t._1, t._2)).map { case (k, ps) =>
      k -> ps.sortBy(_._3).map(_._4).mkString
    }
    val expected = Seq(
      1L -> "the merge join runs the merge", 2L -> "join the merge")
      .flatMap { case (id, t) =>
        t.split(" ").zipWithIndex.map { case (w, i) => (id, i.toLong) -> w }
      }.toMap
    assert(respelled == expected)
  }

  test("EM refit prunes dead multi-char pieces and keeps the alphabet") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge join runs the batch join fast"),
      (2L, "merge sort beats hash join on sorted runs"),
      (3L, "the the the merge merge")).toDF("doc_id", "text")
    val p0df = Unigram.trainPieces(docs, "doc_id", "text", topN = 8)
    val p0 = Unigram.collectPieces(p0df)
    val counts = Unigram.pieceCounts(docs, "doc_id", "text", p0)
    val p1df = Unigram.refitPieces(p0df, counts)
    val p1 = Unigram.collectPieces(p1df)
    // refit vocabulary ⊆ trained; every single-char piece survives
    val (s0, s1) = (p0.map(_._1).toSet, p1.map(_._1).toSet)
    assert(s1.subsetOf(s0))
    assert(s0.filter(_.length == 1).subsetOf(s1))
    // multi-char pieces survive IFF the Viterbi pass used them
    val used = counts.select("piece").as[String].collect().toSet
    assert(s1.filter(_.length >= 2) == (s0.filter(_.length >= 2) & used))
    // NOTE deliberately NOT asserted: Σ n·cost monotonicity. True EM
    // guarantees it for exact -log p; the bit-length quantization is
    // order-preserving per piece but not additive-exact, so tiny-mass
    // fixtures can regress (this one does, 317 → 336) while the sf0.01
    // corpus improves (538332 → 515670, q319). Both engines replay the
    // same arithmetic either way — that is what q319 gates.
  }

  test("wordpiece trainVocab: position-aware frequencies split the " +
      "initial and continuation namespaces") {
    // words: aa, ab → initial: a×2, aa, ab; continuation: ##a, ##b
    val out = graft.text.WordPiece.trainVocab(doc("aa ab"),
        "doc_id", "text", topN = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "##a" -> 1L, "##b" -> 1L,
      "aa" -> 1L, "ab" -> 1L))
  }

  test("wordpiece segment: greedy longest match commits (no backtrack), " +
      "continuation pieces carry ##, unmatched words collapse to [UNK]") {
    // "abc": greedy takes ab (longest initial), then needs ##c.
    val v1 = Seq("ab", "a", "##b", "##c")
    val s1 = graft.text.WordPiece.segment(doc("abc"), "doc_id", "text", v1)
      .collect().head
    assert(s1.getLong(2) == 2L && s1.getString(3) == "ab ##c")
    // Greedy vs optimal: vocab {abc-prefix "ab", but no ##c}: greedy
    // commits to "ab", hits a dead end at c → [UNK]; Viterbi would
    // have found a ##b ##c. THE WordPiece-vs-unigram difference.
    val v2 = Seq("ab", "a", "##b")
    val s2 = graft.text.WordPiece.segment(doc("abc"), "doc_id", "text", v2)
      .collect().head
    assert(s2.getLong(2) == 1L && s2.getString(3) == "[UNK]")
    // longest-first at interior positions too: ##bc beats ##b.
    val v3 = Seq("a", "##bc", "##b", "##c")
    val s3 = graft.text.WordPiece.segment(doc("abc"), "doc_id", "text", v3)
      .collect().head
    assert(s3.getString(3) == "a ##bc")
  }

  test("wordpiece corpus invariants: stripped pieces reassemble the " +
      "word, corpus-trained vocab never yields [UNK], piece count " +
      "bounded by word length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge join runs the batch join fast"),
      (2L, "merge sort beats hash join on sorted runs"),
      (3L, "unable unhappy unjoin")).toDF("doc_id", "text")
    val vocab = graft.text.WordPiece.collectVocab(
      graft.text.WordPiece.trainVocab(docs, "doc_id", "text", topN = 8))
    val segs = graft.text.WordPiece.segment(docs, "doc_id", "text", vocab)
      .collect()
    segs.foreach { r =>
      val (word, np, ps) = (r.getString(0), r.getLong(2), r.getString(3))
      assert(ps != "[UNK]", s"corpus word $word hit [UNK]")
      assert(ps.split(" ").map(_.stripPrefix("##")).mkString == word)
      assert(np == ps.split(" ").length && np <= word.length)
      // every piece after the first carries the continuation marker
      ps.split(" ").zipWithIndex.foreach { case (p, i) =>
        assert((i == 0) == !p.startsWith("##"), s"$word → $ps")
      }
    }
  }
}
