package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.text.TextAnalysis

class NearDupSpec extends SparkSuite {

  test("lshPlanner: hand-checked S-curve points — P(1 band) = J^k, " +
      "P(k bands of 1) = 1-(1-J)^k, more rows = stricter curve") {
    val out = NearDup.lshPlanner(spark, sigK = 4, jPcts = Seq(50, 90))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)) ->
        r.getDouble(4)).toMap
    // b=1, r=4: P = J^4
    assert(math.abs(out((1, 4, 50)) - math.pow(0.5, 4)) < 1e-12)
    assert(math.abs(out((1, 4, 90)) - math.pow(0.9, 4)) < 1e-12)
    // b=4, r=1: P = 1-(1-J)^4
    assert(math.abs(out((4, 1, 50)) - (1 - math.pow(0.5, 4))) < 1e-12)
    // b=2, r=2: P = 1-(1-J^2)^2
    assert(math.abs(out((2, 2, 90)) -
      (1 - math.pow(1 - 0.81, 2))) < 1e-12)
    // more rows per band -> stricter curve at the same J
    assert(out((4, 1, 50)) > out((2, 2, 50)))
    assert(out((2, 2, 50)) > out((1, 4, 50)))
  }

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "s"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "s"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat again and again", "s"), // near dup of 1
      (4L, "completely different content about spark query engines here now", "s"),
      (5L, "unrelated words nothing shared with others whatsoever truly", "s"))
      .toDF("doc_id", "text", "source")
  }

  test("minhash: identical docs have identical signatures; LSH finds the pair") {
    val sig = NearDup.minhashSignatures(docs, "doc_id", "text")
    val s = sig.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(s(0) == s(1))          // exact dup → equal signature
    assert(s(0) != s(3))          // different doc → different signature
    val cands = NearDup.lshCandidatePairs(sig, "doc_id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((4L, 5L)))
  }

  test("simhash: hamming 0 for dup, small for near-dup, large for unrelated") {
    val sigs = NearDup.simhash(docs, "doc_id", "text")
    val m = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
    val pairs = NearDup.simhashPairs(sigs, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash banding guarantees the advertised radius (pigeonhole)") {
    import spark.implicits._
    // adversarial placement: one differing bit at the START of each of the
    // first 10 bands — the layout that defeated round 2's fixed 4x15
    // banding (guaranteed radius 3, advertised 16). With bands = 11 the
    // 11th band is untouched and the pair MUST be found.
    val offsets = NearDup.bandLayout(11).map(_._1).take(10)
    val sigA = 0L
    val sigB = offsets.foldLeft(0L)((s, off) => s | (1L << off))
    assert(java.lang.Long.bitCount(sigA ^ sigB) == 10)
    val sigs = Seq((1L, sigA), (2L, sigB)).toDF("doc_id", "simhash")
    val found = NearDup.simhashPairs(sigs, "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 2L)))
    // same pair under 4 coarse bands (no guarantee at radius 10): the 10
    // differing bits hit every 15-bit band, so blocking finds nothing —
    // the round-2 under-reporting this contract fix closes.
    val missed = NearDup.simhashPairs(sigs, "doc_id", maxHamming = 10, bands = 4)
    assert(missed.isEmpty)
  }

  test("connectedComponents: chains, cliques and isolated pairs resolve to min-label clusters") {
    import spark.implicits._
    // chain 5-2-7-9 (transitive closure across rounds), clique 10-11-12,
    // isolated pair 20-21; node 9 only reaches 5 via two hops
    val edges = Seq(
      (5L, 2L), (2L, 7L), (7L, 9L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("d1", "d2")
    val cc = NearDup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(cc.view.mapValues(_._1).toMap == Map(
      2L -> 2L, 5L -> 2L, 7L -> 2L, 9L -> 2L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    // exactly one representative per cluster
    assert(cc.collect { case (n, (c, true)) => (n, c) }.toSet ==
      Set((2L, 2L), (10L, 10L), (20L, 20L)))
  }

  test("cluster table: write-once round-trips, composed consumers match the inline forms") {
    import spark.implicits._
    val pairs = Seq(
      (5L, 2L, 0.9), (2L, 7L, 0.8),      // chain -> cluster 2 (3 docs)
      (10L, 11L, 1.0)                    // pair  -> cluster 10 (2 docs)
    ).toDF("d1", "d2", "est_jaccard")
    val dir = java.nio.file.Files.createTempDirectory("clustertable").toString
    NearDup.writeClusterTable(pairs, dir)
    // clusters read back = the inline CC of the same pairs
    val fromTable = NearDup.readClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toSet
    val inline = NearDup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toSet
    assert(fromTable == inline && fromTable.nonEmpty)
    // composed report over the table = the known totals
    val rep = NearDup.dedupReport(NearDup.readClusters(spark, dir)).collect().head
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3))
      == ((5L, 2L, 3L, 3L))) // 5 docs, 2 clusters, 3 removed, max size 3
    // composed flow matrix over the read-back pairs
    val srcs = Seq((5L, "a"), (2L, "a"), (7L, "b"), (10L, "b"), (11L, "b"))
      .toDF("doc_id", "source")
    val flow = NearDup.dupFlowMatrix(
        NearDup.readClusterPairs(spark, dir), srcs, "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(flow == Map(("a", "a") -> 1L, ("a", "b") -> 1L, ("b", "b") -> 1L))
  }

  test("bandLayout partitions all 60 bits into near-equal contiguous spans") {
    for (bands <- Seq(1, 4, 9, 11, 17, 60)) {
      val layout = NearDup.bandLayout(bands)
      assert(layout.length == bands)
      assert(layout.map(_._2).sum == 60)
      assert(layout.head._1 == 0)
      layout.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o1 + w1 == o2)
        case _ =>
      }
      assert(layout.map(_._2).max - layout.map(_._2).min <= 1)
    }
  }

  test("token jaccard: dup pair = 1.0, blocked pairs only") {
    val out = NearDup.tokenJaccardPairs(docs, "doc_id", "text", "source", 0.5)
    val m = out.collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(m((1L, 2L)) == 1.0)
    assert(m.contains((1L, 3L)) && m((1L, 3L)) < 1.0)
    assert(!m.contains((4L, 5L)))
  }

  test("charShingles + char minhash: space-free near-dups found where " +
      "word tokens see nothing") {
    import spark.implicits._
    // CJK-style: no spaces, so tokens() = [] for all three — word-level
    // minhash is blind here. Doc 12 is an exact dup of 11; 13 unrelated.
    val docs = Seq(
      (11L, "大数据处理引擎测试文档内容"),
      (12L, "大数据处理引擎测试文档内容"),
      (13L, "完全不同的另一个主题文本例"))
      .toDF("doc_id", "text")
    assert(docs.select(TextAnalysis.tokens(col("text")).as("t"))
      .collect().forall(_.getSeq[String](0).isEmpty))
    // shingle count: length 13, w=5 → 9 grams; short text falls back
    val sh = docs.select(size(NearDup.charShingles(col("text"), 5)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(sh == Seq(9, 9, 9))
    assert(Seq(("ab", 1)).toDF("t", "x")
      .select(NearDup.charShingles(col("t"), 5).as("s"))
      .collect().head.getSeq[String](0) == Seq("ab"))
    val sig = NearDup.minhashSignaturesChar(docs, "doc_id", "text")
    val pairs = NearDup.lshCandidatePairs(sig, "doc_id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((11L, 12L)))
    assert(!pairs.contains((11L, 13L)) && !pairs.contains((12L, 13L)))
  }

  test("containment: snippet-in-page found asymmetrically where jaccard misses") {
    import spark.implicits._
    // 6 is a strict token-subset of 7 (a quote inside a much longer page);
    // 8 shares nothing. Jaccard(6,7) = 4/16 — invisible at any dedup
    // threshold — but c1 = 4/4 = 1.0.
    val corpus = Seq(
      (6L, "alpha beta gamma delta", "s"),
      (7L, "alpha beta gamma delta twelve more unique tokens " +
        "one two three four five six seven eight", "s"),
      (8L, "entirely disjoint vocabulary in this third document here", "s"))
      .toDF("doc_id", "text", "source")
    val out = NearDup.tokenContainmentPairs(corpus, "doc_id", "text", "source", 0.9)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        (r.getAs[Double]("c1"), r.getAs[Double]("c2"))).toMap
    assert(out.keySet == Set((6L, 7L)))
    assert(out((6L, 7L))._1 == 1.0 && out((6L, 7L))._2 == 0.25)
    val jac = NearDup.tokenJaccardPairs(corpus, "doc_id", "text", "source", 0.5)
    assert(jac.collect().isEmpty) // the same pair is below any jaccard gate
    spark.catalog.clearCache()
  }

  test("Hash64.hash60 matches DuckDB's CAST('0x' || substr(md5(s),1,15) AS BIGINT)") {
    import spark.implicits._
    val v = Seq("abc").toDF("s")
      .select(graft.functions.Hash64.hash60(col("s"))).head.getLong(0)
    assert(v == 648541476951500027L) // verified against DuckDB
  }

  test("native Hash60 expression is bit-identical to the md5/conv SQL chain") {
    import spark.implicits._
    val strs = (0 until 500).map(i => s"doc $i ${"x" * (i % 37)} é${i * 31}") :+ ""
    val rows = strs.toDF("s").select(
      graft.functions.Hash60.hash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("chain"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // interpreted eval path agrees too
    val e = graft.functions.Hash60(
      org.apache.spark.sql.catalyst.expressions.Literal.create("abc",
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == 648541476951500027L)
  }

  test("token jaccard df-cut drops ubiquitous tokens from pair generation") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y common", "s"),
      (2L, "x y common", "s"),
      (3L, "common aaa", "s"),
      (4L, "common bbb", "s")).toDF("doc_id", "text", "source")
    def pairs(frac: Double) =
      NearDup.tokenJaccardPairs(d, "doc_id", "text", "source", 0.3, frac)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncut: "common" (df=4) links 3-4 at jaccard 1/3
    assert(pairs(1.0) == Set((1L, 2L), (3L, 4L)))
    // df-cut at 50%: "common" removed; only the real dup pair remains
    assert(pairs(0.5) == Set((1L, 2L)))
  }

  test("shingles: w-gram count and short-doc fallback") {
    import spark.implicits._
    val t = Seq("a b c d", "a b").toDF("text")
      .select(NearDup.shingles(TextAnalysis.tokens(col("text"))).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(t(0) == Seq("a b c", "b c d"))
    assert(t(1) == Seq("a b")) // shorter than w → whole doc as one shingle
  }

  test("minhash LSH recall vs exact shingle-Jaccard ground truth on the sf0.01 corpus") {
    // The minhash analogue of SimilaritySpec's ANN recall measurement:
    // 4x4 banding's candidate probability at true similarity s is
    // 1-(1-s^4)^4 — ~0.999 at the s≈0.94 of a one-token-dropped copy.
    // 50 such near-dups are injected (first token removed, shifted ids)
    // so the ground truth isn't one lucky pair; truth = exact 3-shingle
    // Jaccard >= 0.7 (the same unit the signatures sketch).
    val base = graft.Tables(spark, "/root/testdata/sf0.01").documents
    val dirty = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s*", "").as("text"),
        col("lang"), col("source"), col("n_chars"))
    val docs = base.unionByName(dirty)
    val exact = graft.dedup.NearDup.ngramJaccardPairs(
        docs, "doc_id", "text", "source", minJaccard = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 50) // at least the injected pairs
    val sigs = graft.dedup.NearDup.minhashSignatures(docs, "doc_id", "text")
    val cands = graft.dedup.NearDup.lshCandidatePairs(sigs, "doc_id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cands.contains).toDouble / exact.size
    info(f"minhash-LSH recall@jaccard>=0.7: $recall%.3f " +
      f"(${exact.size} true pairs, ${cands.size} candidates)")
    assert(recall >= 0.9, f"recall $recall%.3f below floor")
  }

  test("clusterRepresentatives: best score wins, ties to lower id, singletons keep") {
    import spark.implicits._
    // Edges: {1,2,3} one cluster; {7,8} another; 9 untouched (no edges →
    // not in the cluster frame at all, as in q37).
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val clusters = NearDup.connectedComponents(edges)
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), // 2 and 3 tie on score → 2 wins
      (7L, 4L), (8L, 6L)).toDF("doc_id", "score")
    val reps = NearDup.clusterRepresentatives(clusters, docs, "doc_id", "score")
      .collect().map(r => r.getLong(1) -> ((r.getLong(0), r.getBoolean(3)))).toMap
    assert(reps(2L)._2 && !reps(1L)._2 && !reps(3L)._2)
    assert(reps(8L)._2 && !reps(7L)._2) // 8 outscores min-id 7
    assert(reps.keySet == Set(1L, 2L, 3L, 7L, 8L))
    // The min-id `keep` and the scored `rep` genuinely disagree here.
    val keepIds = clusters.filter(col("keep")).select("node")
      .collect().map(_.getLong(0)).toSet
    assert(keepIds == Set(1L, 7L))
  }

  test("nearDupIncrement: history hits, greedy intra-batch drops, decisions track sigAgreement") {
    import spark.implicits._
    val hist = NearDup.minhashSignatures(Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different content about spark query engines here now"))
      .toDF("doc_id", "text"), "doc_id", "text")
    val incr = Seq(
      // exact token dup of history 100 -> agreement 1.0, dropped
      (1L, "The QUICK brown fox jumps over the lazy dog again and again"),
      // near-dup of history 100 (one token changed)
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      // fresh
      (3L, "unrelated words nothing shared with others whatsoever truly"),
      // intra-batch exact dup of 3 -> higher id drops greedily
      (4L, "unrelated WORDS nothing shared with others whatsoever truly"))
      .toDF("doc_id", "text")
    val sigs = NearDup.minhashSignatures(incr, "doc_id", "text")
    val minAgree = 0.7
    val dropped = NearDup.nearDupIncrement(sigs, hist, "doc_id",
        minAgree = minAgree)
      .collect().map(_.getLong(0)).toSet
    assert(dropped.contains(1L)) // identical tokens -> agreement 1.0
    assert(dropped.contains(4L) && !dropped.contains(3L)) // lowest id wins
    // doc 2's verdict must equal the agreement measurement itself —
    // banding may or may not surface a 1-token-change candidate at
    // (4 bands x 4 rows); if it does, the drop tracks sigAgreement
    val agree2 = sigs.filter(col("doc_id") === 2L).as("a")
      .crossJoin(hist.filter(col("doc_id") === 100L).as("b"))
      .select(NearDup.sigAgreement(col("a.sig"), col("b.sig")).as("ag"))
      .collect().head.getDouble(0)
    if (dropped.contains(2L)) assert(agree2 >= minAgree)
    // sanity: the estimator separates near-dup from unrelated
    val agree3 = sigs.filter(col("doc_id") === 3L).as("a")
      .crossJoin(hist.filter(col("doc_id") === 100L).as("b"))
      .select(NearDup.sigAgreement(col("a.sig"), col("b.sig")).as("ag"))
      .collect().head.getDouble(0)
    assert(agree2 > agree3)
  }

  test("prefixFilterJaccardPairs: exactly the qualifying pairs, verified against brute force") {
    import spark.implicits._
    // 40 docs over a tiny vocabulary → dense overlap structure, including
    // pairs sharing ONLY ubiquitous tokens (the case a df-cut drops and
    // the prefix filter must keep when they qualify).
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0 until 40).map { i =>
      val toks = (0 until 4 + i % 5).map(j => vocab((i * 3 + j * (1 + i % 3)) % vocab.size)).distinct
      (i.toLong, toks.mkString(" "))
    }
    val out = NearDup.prefixFilterJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 3, den = 5,
        w = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth with the same integer accept test
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
    val truth = (for {
      (i, a) <- sets; (j, b) <- sets if i < j
      inter = (a & b).size
      if 5 * inter >= 3 * (a.size + b.size - inter)
    } yield (i, j)).toSet
    assert(truth.nonEmpty) // the fixture actually exercises the join
    assert(out == truth)   // complete AND precise
  }

  test("prefixFilterJaccardPairs: shingle mode finds order-preserving near-dups, not reorderings") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // 1-token edit
      (3L, "today dog lazy the over jumps fox brown quick the"),   // same tokens reordered
      (4L, "entirely different content with no overlap at all here"))
      .toDF("doc_id", "text")
    val pairs = NearDup.prefixFilterJaccardPairs(d, "doc_id", "text",
        num = 3, den = 5, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // reordering shares tokens but few shingles
  }

  test("clusterSplit: cluster members share one split; singletons keep per-doc assignment") {
    import spark.implicits._
    // two disjoint clusters {1,2,3} and {10,11} plus 200 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val ids = Seq(1L, 2L, 3L, 10L, 11L) ++ (100L until 300L)
    val docs = ids.toDF("doc_id")
    val fracs = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    val out = NearDup.clusterSplit(docs, pairs, "doc_id", "cs_test", fracs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == ids.size) // every doc assigned exactly once
    // cluster members: same cluster key (the min id) and the SAME split
    assert(Set(1L, 2L, 3L).map(out(_)._1) == Set(1L))
    assert(Set(1L, 2L, 3L).map(out(_)._2).size == 1)
    assert(Set(10L, 11L).map(out(_)._1) == Set(10L))
    assert(Set(10L, 11L).map(out(_)._2).size == 1)
    // singletons key by their own id and match the plain per-doc split
    val plain = graft.ops.Sampling.assignSplit(
        (100L until 300L).toDF("doc_id"), col("doc_id"), "cs_test", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (100L until 300L).foreach { id =>
      assert(out(id)._1 == id && out(id)._2 == plain(id))
    }
    // the hash split actually uses all three labels on 200 singletons
    assert(plain.values.toSet == Set("train", "validation", "test"))
  }

  test("sortedNeighborhoodPairs: neighbors link, pair count is O(n·window), bucket-split match is the documented miss") {
    import spark.implicits._
    val key = concat_ws(" ", slice(sort_array(array_distinct(
      TextAnalysis.tokens(col("text")))), 1, 3))
    val recs = (Seq(
      (1L, "alpha beta gamma delta common stuff"),
      (2L, "alpha beta gamma delta common stuff extra"), // near-dup of 1
      // true match whose dirt changes the FIRST sorted token: lands in
      // another bucket — the single-pass miss multi-pass would recover
      (50L, "apple zebra yankee xray"),
      (51L, "zebra yankee xray"),
      (99L, "")) ++
      (100L to 140L).map(i => (i.toLong, s"unique$i wholly distinct row$i")))
      .toDF("doc_id", "text")
    val out = NearDup.sortedNeighborhoodPairs(recs, "doc_id", "text", key,
        window = 10, minJaccardNum = 7, minJaccardDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L))) // same key prefix -> adjacent -> linked
    assert(!out.exists(p => Set(p._1, p._2) == Set(50L, 51L))) // bucket split
    assert(!out.exists(p => p._1 == 99L || p._2 == 99L)) // empty: no verdict
    // candidate bound holds even though many records share buckets
    assert(out.length <= recs.count().toInt * 9)
    val again = NearDup.sortedNeighborhoodPairs(recs.repartition(7), "doc_id",
        "text", key, 10, 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("sortedNeighborhoodEditPairs: transposed-letter dirt links by edit distance where token Jaccard rejects") {
    import spark.implicits._
    val key = concat_ws(" ", slice(sort_array(array_distinct(
      TextAnalysis.tokens(col("text")))), 1, 3))
    // two transposed words: token Jaccard 4/8 = 0.5 (< 0.7, rejected),
    // edit distance 4; the sorted first-3 tokens are untouched so both
    // land in the same neighborhood
    val recs = Seq(
      (1L, "the quick brown fox zebra zulu"),
      (2L, "the quick brown fox zbera zluu"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    val jac = NearDup.sortedNeighborhoodPairs(recs, "doc_id", "text", key,
        window = 10, minJaccardNum = 7, minJaccardDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!jac.contains((1L, 2L)))
    val ed = NearDup.sortedNeighborhoodEditPairs(recs, "doc_id",
        col("text"), key, window = 10, maxDist = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(ed.get((1L, 2L)) == Some(4L))
    assert(!ed.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    spark.catalog.clearCache()
  }

  test("bbitMinhashPairs: identical docs read 16/16 bits and 1.0 on " +
      "both estimators; the 1-bit estimate tracks the full one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = NearDup.bbitMinhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    spark.catalog.clearCache()
    val (full, bits, onebit) = out((1L, 2L))
    assert(full == 1.0 && bits == 16L && onebit == 1.0)
    assert(!out.contains((1L, 3L))) // never a candidate
  }

  test("char minhash unicodeNormalize: NFD/fullwidth renderings get " +
      "IDENTICAL signatures; the raw mode sees them as different docs") {
    import spark.implicits._
    val nfc = "café touché résumé notes for dedup"
    val nfd = "café touché résumé notes for dedup"
    val docs = Seq((1L, nfc), (2L, nfd)).toDF("doc_id", "text")
    def sigs(norm: Boolean) =
      NearDup.minhashSignaturesChar(docs, "doc_id", "text",
          unicodeNormalize = norm)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val raw = sigs(false)
    val canon = sigs(true)
    assert(raw(1L) != raw(2L), "raw mode must expose the gap")
    assert(canon(1L) == canon(2L), "normalized shingles must collide")
  }
}
