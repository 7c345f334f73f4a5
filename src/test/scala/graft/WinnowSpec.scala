package graft

import org.apache.spark.sql.functions._

import graft.text.Winnow

class WinnowSpec extends SparkSuite {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-derived winnowing on a tiny doc: window minima, rightmost ties") {
    // k=1 grams (tokens hash individually), w=2: windows are adjacent
    // pairs, each selecting its smaller hash (later position on ties).
    val d = df(Seq((1L, "aa bb aa cc")))
    val fps = Winnow.fingerprints(d, "doc_id", "text", k = 1, w = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // hashes: h(aa)=h0, h(bb)=h1, h(aa)=h0, h(cc)=h2 at pos 0..3
    val h = Seq("aa", "bb", "aa", "cc").map { t =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15),
        16)
    }
    def rightmostMin(ps: Seq[Int]): (Long, Long) = {
      val mh = ps.map(h).min
      (ps.filter(p => h(p) == mh).max.toLong, mh)
    }
    val expect = Seq(Seq(0, 1), Seq(1, 2), Seq(2, 3)).map(rightmostMin).toSet
    assert(fps == expect)
  }

  test("density: selected fraction tracks 2/(w+1) on a hash-random doc") {
    val words = (0 until 2000).map(i => s"w${(i * 2654435761L) % 100000}")
    val d = df(Seq((1L, words.mkString(" "))))
    val w = 4
    val n = Winnow.fingerprints(d, "doc_id", "text", k = 3, w = w).count()
    val grams = words.length - 3 + 1
    val density = n.toDouble / grams
    val ideal = 2.0 / (w + 1)
    assert(density > ideal * 0.7 && density < ideal * 1.3,
      s"density $density vs ideal $ideal")
  }

  test("guarantee: any shared run of >= k+w-1 tokens yields a shared fingerprint") {
    val k = 5; val w = 4
    // 40 random-ish tokens; a shared run of exactly k+w-1 = 8 tokens is
    // planted at DIFFERENT offsets inside two otherwise-disjoint docs.
    val run = (0 until (k + w - 1)).map(i => s"shared$i")
    val a = (0 until 17).map(i => s"alpha$i") ++ run ++
      (0 until 15).map(i => s"beta$i")
    val b = (0 until 4).map(i => s"gamma$i") ++ run ++
      (0 until 28).map(i => s"delta$i")
    val fps = Winnow.fingerprints(
        df(Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))),
        "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty, "winnowing guarantee violated")
    // and matchPairs surfaces the pair
    val pairs = Winnow.matchPairs(
        df(Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))),
        "doc_id", "text", k, w, dfCap = 50L, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("matchSpans localizes the shared run inside both documents") {
    val k = 5; val w = 4
    val run = (0 until (k + w - 1)).map(i => s"shared$i")
    // run occupies token positions 17..24 in doc 1, 4..11 in doc 2
    val a = (0 until 17).map(i => s"alpha$i") ++ run ++
      (0 until 15).map(i => s"beta$i")
    val b = (0 until 4).map(i => s"gamma$i") ++ run ++
      (0 until 28).map(i => s"delta$i")
    val spans = Winnow.matchSpans(
        df(Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))),
        "doc_id", "text", k, w, dfCap = 50L, minShared = 1L)
      .collect()
    assert(spans.length == 1)
    val r = spans.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    // shared grams live inside the run: starts in [17, 20], ends ≤ 25
    assert(r.getLong(3) >= 17L && r.getLong(4) <= 25L &&
      r.getLong(4) > r.getLong(3))
    assert(r.getLong(5) >= 4L && r.getLong(6) <= 12L)
  }

  test("disjoint docs share nothing; short and empty docs still fingerprint") {
    val d = df(Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "eleven twelve thirteen fourteen fifteen sixteen seventeen"),
      (3L, "tiny"),
      (4L, "")))
    val fps = Winnow.fingerprints(d, "doc_id", "text", k = 5, w = 4)
    val byDoc = fps.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(byDoc.getOrElse(_, 0L) >= 1L))
    val pairs = Winnow.matchPairs(d, "doc_id", "text", 5, 4, 50L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)))
  }
}
