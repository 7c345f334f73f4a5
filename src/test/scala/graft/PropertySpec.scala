package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalacheck.Prop.propBoolean

import graft.ops.{Anomaly, Causal, Windows}
import graft.text.TextAnalysis

/** Property-based invariants (SURVEY §5.2) over generated inputs — raw
  * scalacheck driven from ScalaTest (no scalatestplus bridge in the
  * offline cache). Each case evaluates on a small local DataFrame. */
class PropertySpec extends SparkSuite {

  private def holds(p: Prop): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("property: fingerprint dedup is idempotent and collapses to distinct texts") {
    import spark.implicits._
    val gen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 999L), Gen.oneOf("aa", "bb", "cc", "dd", "ee")))
    holds(Prop.forAll(gen) { docs =>
      docs.nonEmpty ==> {
        val df = docs.toDF("id", "text").withColumn("fp", md5(col("text")))
        val once = df.dropDuplicates("fp").select("fp").as[String].collect().sorted.toSeq
        val twice = df.dropDuplicates("fp").dropDuplicates("fp")
          .select("fp").as[String].collect().sorted.toSeq
        once == twice && once.size == docs.map(_._2).distinct.size
      }
    })
  }

  test("property: moving frame holds at most 5 rows and matches a sequential re-computation") {
    import spark.implicits._
    val gen = Gen.listOfN(18,
      Gen.zip(Gen.oneOf("p1", "p2", "p3"), Gen.choose(-500L, 500L)))
    holds(Prop.forAll(gen) { evs =>
      evs.nonEmpty ==> {
        val rows = evs.zipWithIndex.map { case ((k, c), i) => (k, i.toLong, c) }
        val df = rows.toDF("k", "ord", "c")
        val out = Windows.movingFrame(df, col("k"), Seq(col("ord")), Seq("c"))
          .select("k", "ord", "seq", "frame_n", "mov_sum_c").collect()
        // sequential oracle: per key in ord order, sum of the last <=5 values
        val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
          val sorted = g.sortBy(_._2)
          sorted.zipWithIndex.map { case ((k, ord, _), i) =>
            val frame = sorted.slice(math.max(0, i - 4), i + 1)
            (k, ord) -> (i + 1L, frame.size.toLong, frame.map(_._3).sum)
          }
        }
        out.forall { r =>
          val (seq, fn, ms) = expected((r.getString(0), r.getLong(1)))
          r.getLong(2) == seq && r.getLong(3) == fn && fn <= 5 &&
            r.getLong(4) == ms
        }
      }
    })
  }

  test("property: severity is monotone in kills, damage and |z|") {
    import spark.implicits._
    val rank = Map("LOW" -> 0, "MEDIUM" -> 1, "HIGH" -> 2)
    val gen = Gen.listOfN(25, Gen.zip(
      Gen.choose(0L, 30L), Gen.choose(0.0, 5000.0), Gen.choose(-5.0, 5.0)))
    holds(Prop.forAll(gen) { ts =>
      ts.nonEmpty ==> {
        val df = ts.toDF("kills", "damage", "z")
        def sev(k: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
            z: org.apache.spark.sql.Column) = Anomaly.severity(k, d, Seq(z))
        val out = df.select(
          sev(col("kills"), col("damage"), col("z")).as("s0"),
          sev(col("kills") + 5, col("damage"), col("z")).as("sk"),
          sev(col("kills"), col("damage") + 1000, col("z")).as("sd"),
          sev(col("kills"), col("damage"), abs(col("z")) + 1).as("sz")).collect()
        out.forall { r =>
          val s0 = rank(r.getString(0))
          rank(r.getString(1)) >= s0 &&
            rank(r.getString(2)) >= s0 &&
            rank(r.getString(3)) >= s0
        }
      }
    })
  }

  test("property: two-phase top-k with k >= group size reproduces the full ranking") {
    import spark.implicits._
    val scored = (0 until 300).map { i =>
      ((i % 3).toLong, i.toLong, math.sin(i * 2.7) * 100)
    }.toDF("qid", "id", "cosine")
    val full = graft.similarity.TopK.perGroup(scored, Seq("qid"), "id", "cosine", 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // reference: rank via sorted sequence per group
    val expected = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).zipWithIndex
          .map { case ((_, id, _), i) => (q, id, (i + 1).toLong) }
      }.toSet
    assert(full == expected)
  }

  test("property: connected components are a fixpoint (re-running on its output is stable)") {
    import spark.implicits._
    val edges = (0 until 120).map(i => ((i * 13 % 40).toLong, (i * 7 % 40).toLong))
      .filter { case (a, b) => a != b }.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("d1", "d2")
    val cc1 = graft.dedup.NearDup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every node must point to a label inside its own component (the label
    // is itself a node with the same label — canonical representative)
    cc1.foreach { case (_, lab) => assert(cc1(lab) == lab) }
    // rerun on (node, cluster) edges: same partition of the node set
    val cc2 = graft.dedup.NearDup.connectedComponents(
      cc1.toSeq.toDF("d1", "d2").filter(col("d1") =!= col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc1.foreach { case (n, lab) =>
      if (n != lab) assert(cc2(n) == cc1(n)) // same representative
    }
  }

  test("property: exact quantiles at p=1 equal the max; estimates bound the discrete rank") {
    import spark.implicits._
    val df = (1 to 777).map(i => ("g", (i * 37 % 1000).toLong)).toDF("g", "v")
    val q = graft.ops.Quantiles.exact(df, Seq(col("g")), col("v"), Seq(1.0)).head
    val mx = df.agg(max("v")).head.getLong(0)
    assert(q.getAs[Long]("p100") == mx)
  }

  test("property: pageRank conserves no more than the initial mass") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.filter(e => e._1 != e._2))
    holds(Prop.forAll(gen) { es =>
      es.nonEmpty ==> {
        val pr = graft.ops.PageRank.pageRank(
          es.toDF("s", "d"), "s", "d", iters = 2)
          .select("r").as[Long].collect()
        val n = es.flatMap(e => Seq(e._1, e._2)).distinct.size
        // teleport + damped inflow can only lose mass (dangling drop,
        // floor rounding), never create it
        pr.forall(_ > 0L) && pr.sum <= n * 1000000000L
      }
    })
  }

  test("property: raising a mix target keeps every previously sampled row") {
    import spark.implicits._
    import graft.ops.Sampling
    val docs = (0 until 400).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dom")
    def ids(num: Long) = Sampling.mixSample(docs, col("id"), "dom",
        Map("d0" -> (num, 10L)), default = (1L, 10L),
        totalNum = 1L, totalDen = 1L, salt = "a")
      .select("id").as[Long].collect().toSet
    val small = ids(2L); val big = ids(5L)
    assert(small.subsetOf(big)) // hash-threshold sampling is additive
  }

  test("property: packing windows tile each shard's token stream exactly") {
    import spark.implicits._
    val gen = Gen.listOfN(25, Gen.choose(1, 9))
    holds(Prop.forAll(gen) { lens =>
      lens.nonEmpty ==> {
        val docs = lens.zipWithIndex
          .map { case (l, i) => (i.toLong, ("w " * l).trim) }.toDF("doc_id", "text")
        val out = graft.ops.Packing
          .packIntoWindows(docs, "doc_id", "text", 7, 2, "s")
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        out.groupBy(_._1).forall { case (_, rows) =>
          val sorted = rows.sortBy(_._3)
          // offsets start at 0 and are gap-free: each next = prev + len
          sorted.zip(sorted.scanLeft(0L)(_ + _._2)).forall {
            case ((_, _, off), expected) => off == expected
          }
        }
      }
    })
  }

  test("property: funnel stage counts never increase") {
    import spark.implicits._
    val types = Seq("a", "b", "c")
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1L, 6L), Gen.oneOf(types),
      Gen.choose(0L, 100000L)))
    holds(Prop.forAll(gen) { evs =>
      evs.nonEmpty ==> {
        val df = evs.map { case (u, t, ms) => (u, t, new java.sql.Timestamp(ms)) }
          .toDF("u", "t", "ts")
        val counts = graft.ops.Journey.funnel(df, "u", "t", "ts", types)
          .orderBy("stage_idx").select("n_users").as[Long].collect().toSeq
        counts.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true }
      }
    })
  }

  test("property: tokens are lowercase alnum and stable under re-tokenization") {
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.asciiPrintableStr)
    holds(Prop.forAll(gen) { strs =>
      strs.nonEmpty ==> {
        val toks = strs.toDF("text")
          .select(TextAnalysis.tokens(col("text")).as("t"))
          .collect().map(_.getSeq[String](0).toList).toList
        val wellFormed = toks.forall(_.forall(t => t.nonEmpty && t.matches("[a-z0-9]+")))
        val again = toks.map(_.mkString(" ")).toDF("text")
          .select(TextAnalysis.tokens(col("text")).as("t"))
          .collect().map(_.getSeq[String](0).toList).toList
        wellFormed && again == toks
      }
    })
  }

  test("property: stride<=size chunks cover every token; stride=size tiles exactly") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val gen = Gen.zip(Gen.listOfN(1, Gen.choose(1, 40)).map(_.head),
      Gen.choose(1, 6), Gen.choose(1, 6))
    holds(Prop.forAll(gen) { case (n, size, stride) =>
      val toks = (0 until n).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.text.Segments
        .chunkWithStride(df, "doc_id", "text", size, stride)
        .orderBy("chunk_idx").collect()
        .map(_.getString(4).split(" ").toSeq).toSeq
      val covered = chunks.flatten.toSet == toks.toSet
      val tilesExactly = stride != size ||
        chunks.flatten == toks // disjoint tiling reconstructs the doc
      (stride <= size) ==> (covered && tilesExactly)
    })
  }

  test("property: line dedup is idempotent and never keeps a line twice") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.zip(Gen.choose(1L, 99L),
      Gen.listOfN(4, Gen.oneOf("aa", "bb")).map(_.mkString(" "))))
    holds(Prop.forAll(gen) { docs =>
      docs.map(_._1).distinct.size == docs.size ==> {
        val df = docs.toDF("doc_id", "text")
        val once = graft.text.Segments.lineDedupDocs(df, "doc_id", "text", 2)
        val keptDocs = once.select(col("doc_id"), col("kept_text").as("text"))
        val twice = graft.text.Segments
          .lineDedupDocs(keptDocs, "doc_id", "text", 2)
        // re-running on the deduped corpus drops nothing further
        twice.collect().forall(r => r.getLong(1) == r.getLong(2)) && {
          // and no surviving line appears twice anywhere
          val lines = keptDocs.collect().map(_.getString(1))
            .flatMap(_.split(" ").grouped(2).map(_.mkString(" ")).toSeq)
            .filter(_.nonEmpty)
          lines.distinct.size == lines.size
        }
      }
    })
  }

  test("property: applyChanges is idempotent for replayed change sets") {
    import spark.implicits._
    import graft.ops.Merge
    val gen = Gen.zip(
      Gen.listOfN(10, Gen.zip(Gen.choose(1L, 15L), Gen.choose(0L, 99L))),
      Gen.listOfN(6, Gen.zip(Gen.choose(1L, 20L), Gen.choose(0L, 99L),
        Gen.oneOf("upsert", "delete"))))
    holds(Prop.forAll(gen) { case (tgt0, ch0) =>
      val tgt = tgt0.distinctBy(_._1)
      val ch = ch0.distinctBy(_._1)
      (tgt.nonEmpty && ch.nonEmpty) ==> {
        val target = tgt.toDF("id", "v")
        val changes = ch.toDF("id", "v", "op")
        def snap(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        val once = Merge.applyChanges(target, changes, Seq("id"))
        val twice = Merge.applyChanges(once, changes, Seq("id"))
        snap(once) == snap(twice)
      }
    })
  }

  test("property: binByCuts is monotone in the value") {
    import spark.implicits._
    import graft.ops.Quantiles
    val gen = Gen.listOfN(40, Gen.choose(0L, 50L))
    holds(Prop.forAll(gen) { vs =>
      vs.nonEmpty ==> {
        val df = vs.toDF("v")
        val cuts = Quantiles.histogramCuts(df, col("v"),
          Seq((1, 4), (2, 4), (3, 4)))
        val binned = Quantiles.binByCuts(df, col("v"), cuts)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        binned.sliding(2).forall {
          case Array((v1, b1), (v2, b2)) => v1 > v2 || b1 <= b2
          case _ => true
        }
      }
    })
  }

  private val tokenGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
  private val textGen = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  test("property: span runs bound n_grams; duplicating the corpus maxes every extent") {
    import spark.implicits._
    import graft.text.Spans
    val gen = Gen.listOfN(6, textGen)
    holds(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val base = Spans.duplicatedSpanRuns(docs, "doc_id", "text", w = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      spark.catalog.clearCache()
      val bounds = base.values.forall { case (ng, nr, mx) =>
        mx <= ng && nr <= ng && ((mx > 0) == (nr > 0))
      }
      // an exact copy of every doc makes every gram df >= 2: one run
      // spanning the whole doc
      val doubled = docs.unionAll(
        docs.select((col("doc_id") + 100).as("doc_id"), col("text")))
      val full = Spans.duplicatedSpanRuns(doubled, "doc_id", "text", w = 3)
        .collect().forall(r => r.getLong(3) == r.getLong(1))
      spark.catalog.clearCache()
      bounds && full
    })
  }

  test("property: robustOutliers equals a sequential median/MAD recomputation") {
    import spark.implicits._
    val gen = Gen.listOfN(12,
      Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0L, 40L)))
    holds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.zipWithIndex
          .map { case ((g, v), i) => (i.toLong, g, v) }
          .toDF("id", "g", "cents")
        val out = Anomaly.robustOutliers(df, Seq("g"), "cents", k = 3L)
          .collect().map(r => r.getAs[Long]("id") ->
            (r.getAs[Long]("med"), r.getAs[Long]("mad"),
              r.getAs[Boolean]("is_outlier"))).toMap
        // discrete median: element at rank ceil(n/2) of the sorted group
        def med(vs: Seq[Long]) = vs.sorted.apply(((vs.size + 1) / 2) - 1)
        rows.zipWithIndex.forall { case ((g, v), i) =>
          val grp = rows.filter(_._1 == g).map(_._2)
          val m = med(grp)
          val mad = med(grp.map(x => math.abs(x - m)))
          out(i.toLong) == ((m, mad, math.abs(v - m) > 3 * mad))
        }
      }
    })
  }

  test("property: collocations match a brute-force window count") {
    import spark.implicits._
    import graft.text.Spans
    val gen = Gen.listOfN(4, textGen)
    holds(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Spans.collocations(docs, "doc_id", "text",
          window = 3, minCount = 2L, topN = 1000)
        .collect().map(r => (r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val toks = texts.map(_.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val pairs = toks.flatMap(ts =>
        (1 until 3).flatMap(j => ts.dropRight(j).zip(ts.drop(j))))
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
        .filter(_._2 >= 2L)
      out == pairs.map { case ((a, b), c) => (a, b) -> ((c, uni(a), uni(b))) }
    })
  }

  test("property: semanticDedup keeps exactly one representative per cluster") {
    import spark.implicits._
    import graft.similarity.Similarity
    val gen = Gen.listOfN(8, Gen.zip(
      Gen.choose(1, 4).map(_.toDouble), Gen.oneOf(0, 1)))
    holds(Prop.forAll(gen) { vs =>
      // axis-aligned scaled vectors: clean clusters along each axis
      val pts = vs.zipWithIndex.map { case ((s, axis), i) =>
        (i.toLong, if (axis == 0) Seq(s, 0.001 * s) else Seq(0.001 * s, s))
      }.toDF("id", "ev")
      val cents = Seq((0L, Seq(1.0, 0.0): Seq[Double]),
        (1L, Seq(0.0, 1.0): Seq[Double]))
      val out = Similarity.semanticDedup(pts, cents, minCosine = 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      spark.catalog.clearCache()
      val perCluster = out.groupBy(_._2)
      out.length == vs.length &&
        perCluster.forall { case (cid, members) =>
          members.count(_._3) == 1 &&                 // one keeper
          members.filter(_._3).head._1 == cid &&      // it is the min id
          members.forall(_._1 >= cid)
        }
    })
  }

  test("property: prefix-filter join equals brute-force token Jaccard on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx")
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(0, 6), Gen.listOfN(6, word)))
    holds(Prop.forAll(gen) { raw =>
      val docs = raw.zipWithIndex.map { case ((_, ws), i) =>
        (i.toLong, ws.mkString(" ")) }
      docs.nonEmpty ==> {
        val out = graft.dedup.NearDup.prefixFilterJaccardPairs(
            docs.toDF("doc_id", "text"), "doc_id", "text",
            num = 1, den = 2, w = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
        val truth = (for {
          (i, a) <- sets; (j, b) <- sets if i < j
          inter = (a & b).size
          if 2 * inter >= 1 * (a.size + b.size - inter)
        } yield (i, j)).toSet
        out == truth
      }
    })
  }

  test("property: replicateExact group totals always equal the targets") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.choose(1, 12),  // docs in group
      Gen.choose(0, 30))  // target alloc (0 = drop everything)
    holds(Prop.forAll(Gen.listOfN(3, gen)) { groups =>
      groups.nonEmpty ==> {
        val docs = groups.zipWithIndex.flatMap { case ((n, _), g) =>
          (1 to n).map(i => ((g * 100 + i).toLong, s"g$g")) }
        val targets = groups.zipWithIndex.map { case ((_, a), g) =>
          (s"g$g", a.toLong) }
        val out = graft.ops.Sampling.replicateExact(
            docs.toDF("doc_id", "src"), "src", "doc_id",
            targets.toDF("src", "alloc"), "prop")
          .collect().map(r => r.getString(1))
        val got = out.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
        targets.forall { case (s, a) => got.getOrElse(s, 0L) == a }
      }
    })
  }

  test("property: apportion seats sum EXACTLY to the budget for any " +
      "positive weights") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1L, 1000L)).map(_.take(12)),
      Gen.choose(1L, 10000L))
    holds(Prop.forAll(gen) { case (ws, seats) =>
      val df = ws.zipWithIndex.map { case (w, i) => (s"g$i", w) }
        .toDF("g", "w")
      val total = graft.ops.Sampling.apportion(df, "g", "w", seats)
        .agg(sum("seats")).head().getLong(0)
      total == seats
    })
  }

  test("property: topKWithOther per-group totals always reconcile " +
      "with the raw table") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0, 8))).map(_.take(40))
    holds(Prop.forAll(gen) { rows =>
      val df = rows.map { case (g, d) => (g, s"d$d") }.toDF("g", "d")
      val out = graft.ops.Ranking.topKWithOther(df, "g", "d", k = 2)
        .groupBy("g").agg(sum("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      out == truth
    })
  }

  test("property: availability ratio is within (0, 1] and covered " +
      "never exceeds span") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 500L),
      Gen.choose(1L, 100L))).map(_.take(25))
    holds(Prop.forAll(gen) { iv =>
      val df = iv.map { case (s, d) => ("k", s, s + d) }
        .toDF("k", "s", "e")
      val r = graft.ops.RangeJoin.availability(df, Seq("k"), "s", "e")
        .head()
      val covered = r.getAs[Long]("covered")
      val span = r.getAs[Long]("span")
      covered <= span && covered > 0
    })
  }

  test("property: kmvDistinct is exact below k and within 3x above " +
      "it, on any value multiset") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 2000L)).map(_.take(300))
    holds(Prop.forAll(gen) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val truth = vs.distinct.size.toDouble
      val est = graft.ops.Sketches.kmvDistinct(df, "g", col("v"), k = 64)
        .head().getDouble(3)
      if (truth < 64) est == truth
      else est > truth / 3 && est < truth * 3
    })
  }

  test("property: jump-consistent buckets are always in range and " +
      "only ever move to the newest bucket as n grows") {
    val gen = Gen.zip(Gen.listOfN(50, Gen.choose(0L, Long.MaxValue >> 4)),
      Gen.choose(2, 40))
    holds(Prop.forAll(gen) { case (keys, n) =>
      keys.forall { k =>
        val b = graft.functions.JumpHash.hash(k, n)
        val b2 = graft.functions.JumpHash.hash(k, n + 1)
        b >= 0 && b < n && (b2 == b || b2 == n)
      }
    })
  }

  test("property: interval ops agree — merged-island coverage equals " +
      "the sweep-line time-above-zero, peak equals max depth") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 200L),
      Gen.choose(1L, 50L))).map(_.take(15))
    holds(Prop.forAll(gen) { iv =>
      val df = iv.map { case (s, d) => ("k", s, s + d) }
        .toDF("k", "s", "e")
      val cov = graft.ops.RangeJoin.availability(df, Seq("k"), "s", "e")
        .head().getAs[Long]("covered")
      // sequential sweep reference
      val deltas = (iv.map { case (s, _) => (s, 1) } ++
        iv.map { case (s, d) => (s + d, -1) }).sortBy(t => (t._1, t._2))
      var depth = 0; var covered = 0L; var maxDepth = 0
      deltas.sliding(2).foreach {
        case Seq((t1, d1), (t2, _)) =>
          depth += d1; maxDepth = math.max(maxDepth, depth)
          if (depth > 0) covered += t2 - t1
        case _ => ()
      }
      val peak = graft.ops.Windows.peakConcurrency(df, "k", "s", "e")
        .head().getLong(2)
      cov == covered && peak == maxDepth.toLong
    })
  }

  test("property: mixDecomposition terms reconstruct the overall " +
      "delta within quantization slack") {
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.zip(Gen.oneOf("s1", "s2", "s3"),
      Gen.oneOf(true, false), Gen.oneOf(0L, 1L)))
    holds(Prop.forAll(gen) { rows =>
      val byPeriod = rows.groupBy(_._2)
      (byPeriod.contains(true) && byPeriod.contains(false)) ==> {
        val df = rows.toDF("seg", "b", "y")
        val out = graft.ops.Causal.mixDecomposition(df, "seg",
            col("b"), col("y") === 1L).collect()
        val segsDefined = out.forall(r => !r.isNullAt(5) && !r.isNullAt(6))
        segsDefined ==> {
          val sumTerms = out.map(r => r.getLong(5) + r.getLong(6)).sum
          def rate(p: Boolean) = {
            val xs = rows.filter(_._2 == p)
            xs.map(_._3).sum.toDouble / xs.size
          }
          val delta = ((rate(true) - rate(false)) * 1e6).round
          math.abs(sumTerms - delta) <= 2L * out.length + 2
        }
      }
    })
  }

  test("property: normalizeText is idempotent, an identity on " +
      "lowercase ASCII, and insensitive to NFC/NFD form") {
    import spark.implicits._
    import graft.functions.NormalizeText
    val frag = Gen.oneOf("café", "café", "CAFÉ",
      "ａｂ", "plain", "x9", "　", " ")
    val gen = Gen.listOfN(6, frag).map(_.mkString)
    holds(Prop.forAll(gen) { s =>
      val out = Seq(Tuple1(s)).toDF("t")
        .select(NormalizeText.normalizeText(col("t")).as("n"),
          NormalizeText.normalizeText(
            NormalizeText.normalizeText(col("t"))).as("nn"))
        .head()
      val (n, nn) = (out.getString(0), out.getString(1))
      val nfc = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC)
      val nfd = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFD)
      val viaNfd = Seq(Tuple1(nfd)).toDF("t")
        .select(NormalizeText.normalizeText(col("t"))).as[String].head()
      n == nn && viaNfd == n &&
        (!s.forall(c => c < 0x80 && !c.isUpper) || n == s) &&
        (nfc == s || n == Seq(Tuple1(nfc)).toDF("t")
          .select(NormalizeText.normalizeText(col("t"))).as[String].head())
    })
  }

  test("property: exactRatio agrees with exact for binary-exact p and " +
      "selects the true ceil-rank element") {
    import spark.implicits._
    import graft.ops.Quantiles
    val gen = Gen.zip(Gen.choose(1, 40),
      Gen.listOfN(3, Gen.choose(-1000L, 1000L)))
    holds(Prop.forAll(gen) { case (n, seedVals) =>
      val vals = (0 until n).map(i =>
        seedVals(i % seedVals.size) + i * 7L)
      val df = vals.map(("g", _)).toDF("g", "v")
      val ra = Quantiles.exactRatio(df, Seq(col("g")), col("v")
        , Seq((1, 2), (9, 10), (1, 1))).head()
      val sorted = vals.sorted
      def rank(num: Int, den: Int) = (num * n + den - 1) / den
      ra.getAs[Long]("p50") == sorted(rank(1, 2) - 1) &&
        ra.getAs[Long]("p90") == sorted(rank(9, 10) - 1) &&
        ra.getAs[Long]("p100") == sorted.last &&
        // p = 1/2 is binary-exact: float path must agree everywhere
        Quantiles.exact(df, Seq(col("g")), col("v"), Seq(0.5))
          .head().getAs[Long]("p50") == ra.getAs[Long]("p50")
    })
  }

  test("property: mergePartitioned disk round-trip equals the " +
      "relational applyChanges on the same inputs") {
    import spark.implicits._
    import graft.ops.Merge
    import graft.sources.Partitioned
    val gen = Gen.zip(
      Gen.listOfN(12, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 99L))),
      Gen.listOfN(6, Gen.zip(Gen.choose(0L, 25L), Gen.choose(100L, 199L),
        Gen.oneOf("upsert", "delete"))))
    holds(Prop.forAll(gen) { case (baseRows, chRows) =>
      val base = baseRows.distinctBy(_._1)
      val ch = chRows.distinctBy(_._1)
      (base.nonEmpty && ch.nonEmpty) ==> {
        val dir = java.nio.file.Files
          .createTempDirectory("prop-merge").toString
        val baseDf = base.map { case (k, v) => (k, k % 3, v) }
          .toDF("k", "pb", "v")
        baseDf.repartition(col("pb")).write.mode("overwrite")
          .partitionBy("pb").parquet(dir)
        val chDf = ch.map { case (k, v, op) => (k, k % 3, v, op) }
          .toDF("k", "pb", "v", "op")
        Partitioned.mergePartitioned(spark, dir, chDf,
          Seq("k"), "pb", col("k") % 3)
        val disk = spark.read.parquet(dir)
          .select(col("k"), col("pb").cast("long"), col("v"))
          .as[(Long, Long, Long)].collect().toSet
        val rel = Merge.applyChanges(baseDf, chDf, Seq("k"))
          .as[(Long, Long, Long)].collect().toSet
        disk == rel
      }
    })
  }

  test("property: unigram Viterbi cost equals the brute-force optimum " +
      "over every segmentation") {
    import spark.implicits._
    import graft.text.Unigram
    val multiCands = (for {
      l <- 2 to 3
      s <- List.fill(l)(Seq("a", "b")).flatten.combinations(l)
      p <- s.permutations
    } yield p.mkString).toSeq.distinct
    val gen = Gen.zip(
      Gen.listOfN(6, Gen.choose(1, 6)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))),
      Gen.mapOf(Gen.zip(Gen.oneOf(multiCands), Gen.choose(1L, 9L))),
      Gen.choose(1L, 9L), Gen.choose(1L, 9L))
    def brute(word: String, costOf: Map[String, Long]): Long =
      if (word.isEmpty) 0L
      else (1 to math.min(6, word.length)).map(j =>
        costOf.getOrElse(word.take(j), Unigram.INF) +
          brute(word.drop(j), costOf)).min
    holds(Prop.forAll(gen) { case (words, multis, ca, cb) =>
      words.nonEmpty ==> {
        val vocab = multis ++ Map("a" -> ca, "b" -> cb)
        val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val out = Unigram
          .viterbiCost(docs, "doc_id", "text", vocab.toSeq.sortBy(_._1))
          .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
        words.distinct.forall(w => out(w) == brute(w, vocab))
      }
    })
  }

  test("property: winnowing guarantee — a shared k+w-1 token run at " +
      "random offsets always yields a shared fingerprint") {
    import spark.implicits._
    import graft.text.Winnow
    val (k, w) = (5, 4)
    val gen = Gen.zip(Gen.choose(0, 25), Gen.choose(0, 25),
      Gen.choose(0, 25), Gen.choose(0, 25), Gen.choose(0L, 9999L))
    holds(Prop.forAll(gen) { case (pa, sa, pb, sb, salt) =>
      val run = (0 until (k + w - 1)).map(i => s"run${salt}x$i")
      val a = (0 until pa).map(i => s"pa$i") ++ run ++
        (0 until sa).map(i => s"sa$i")
      val b = (0 until pb).map(i => s"pb$i") ++ run ++
        (0 until sb).map(i => s"sb$i")
      val fps = Winnow.fingerprints(
          Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
            .toDF("doc_id", "text"), "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
      val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
      (h1 & h2).nonEmpty
    })
  }

  test("property: per-doc suffix ranks are the sorting permutation; " +
      "global strict ranks equal 1 + count of smaller suffixes") {
    import spark.implicits._
    // 2-letter alphabet forces heavy repetition — the tie-resolution path
    val gen = Gen.listOfN(3, Gen.listOfN(12, Gen.oneOf('a', 'b'))
      .map(_.mkString))
    holds(Prop.forAll(gen) { texts =>
      texts.forall(_.nonEmpty) ==> {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val per = graft.text.SuffixArray
          .perDocRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        val perOk = docs.forall { case (id, t) =>
          (1 to t.length).sortBy(p => t.substring(p - 1))
            .zipWithIndex.forall { case (p, i) =>
              per((id, p.toLong)) == i + 1L }
        }
        val glob = graft.text.SuffixArray
          .globalRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        val all = docs.flatMap { case (id, t) =>
          (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1))) }
        val globOk = all.forall { case (id, p, suf) =>
          glob((id, p)) == 1L + all.count(_._3 < suf) }
        perOk && globOk
      }
    })
  }

  test("property: boruvka equals brute-force Kruskal under the " +
      "(w, a, b) total order on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(10, Gen.zip(Gen.choose(1L, 6L),
      Gen.choose(1L, 6L), Gen.choose(1L, 5L)))
    holds(Prop.forAll(edgeGen) { raw =>
      val es = raw.filter(e => e._1 != e._2)
      es.nonEmpty ==> {
        val out = graft.ops.Mst
          .boruvka(es.toDF("src", "dst", "w"), "src", "dst", "w")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        // brute Kruskal with union-find over the same canonical edges
        val canon = es.map { case (u, v, w) =>
          (math.min(u, v), math.max(u, v), w) }
          .groupBy(e => (e._1, e._2))
          .map { case ((a, b), g) => (g.map(_._3).min, a, b) }
          .toSeq.sorted
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        val kruskal = canon.flatMap { case (w, a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra == rb) None
          else { parent(math.max(ra, rb)) = math.min(ra, rb)
                 Some((a, b, w)) }
        }.toSet
        out == kruskal
      }
    })
  }

  test("property: isotonic fit is monotone and preserves the weighted " +
      "mean") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 999999L),
      Gen.oneOf(0L, 1L)))
    holds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val out = graft.ops.Eval
          .isotonicCalibration(rows.toDF("p", "y"), col("p"), col("y"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
          .sortBy(_._1)
        val monotone = out.sliding(2).forall {
          case Array((_, _, f1), (_, _, f2)) => f1 <= f2 + 1e-12
          case _ => true
        }
        // PAVA preserves the weighted mean: Σ n·fitted = Σ n·rate = Σ y
        val fitMass = out.map { case (_, n, f) => n * f }.sum
        val posMass = rows.count(_._2 == 1L).toDouble
        monotone && math.abs(fitMass - posMass) < 1e-6
      }
    })
  }
}
