package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diversity-driven subset selection over embeddings — the coreset
  * step of data-pruning pipelines (k-center-greedy in active learning /
  * DEITA-style diversity filters): pick points that COVER the embedding
  * space instead of the near-duplicates a similarity-ranked top-k
  * returns.
  */
object Select {

  /** Greedy k-center (farthest-point) selection under cosine
    * similarity: seed with the smallest id, then k−1 times add the
    * point whose maximum similarity to the already-selected set is
    * LOWEST (= farthest point). The classic 2-approximation of the
    * k-center cover, and deterministic here: similarity folds are the
    * fixed left-associated sequence (the q25 contract) and the argmin
    * tie-breaks by id, so the whole iterative selection hash-matches
    * the unrolled DuckDB replay.
    *
    * Scale shape: k passes over the corpus, each ONE broadcast of a
    * single-row pick + a map-side-combinable `min_by` argmin (the
    * stat-broadcast idiom — no collect, no global sort). Each
    * generation's running max-similarity frame is persisted before
    * being referenced by both the argmin and the next update (the q27
    * caching contract: caller clears the cache between invocations;
    * Verify/Bench already do).
    *
    * @param k total selected points including the seed, ≥ 2
    * @return (round, id, maxsim_at_pick) — round 1 is the seed
    *         (maxsim NULL), round r the r-th pick with its max
    *         similarity to the first r−1 at selection time
    */
  def kCenterGreedy(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 2)
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val mn = base.agg(min(col("id")).as("__sid"))
    val seed = base.join(broadcast(mn), col("id") === col("__sid"))
      .select(col("id").as("cid"), col("v").as("cv"))
    var picks = seed.select(lit(1L).as("round"), col("cid").as("id"),
      lit(null).cast("double").as("maxsim_at_pick"))
    var state = base.crossJoin(broadcast(seed))
      .select(col("id"), col("v"),
        Similarity.cosine(col("v"), col("cv")).as("ms"))
      .persist()
    (2 to k).foreach { r =>
      val pick = state
        .agg(min_by(struct(col("id"), col("v"), col("ms")),
          struct(col("ms"), col("id"))).as("p"))
        .select(col("p.id").as("cid"), col("p.v").as("cv"),
          col("p.ms").as("pms"))
      picks = picks.unionAll(pick.select(lit(r.toLong).as("round"),
        col("cid").as("id"), col("pms").as("maxsim_at_pick")))
      state = state.crossJoin(broadcast(pick))
        .select(col("id"), col("v"),
          greatest(col("ms"),
            Similarity.cosine(col("v"), col("cv"))).as("ms"))
        .persist()
    }
    picks
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * re-ranking: from each query's candidate set, greedily pick the
    * item maximizing `λ·relevance − (1−λ)·max-sim-to-already-picked` —
    * the standard diversity re-rank between ANN retrieval (q25/q26) and
    * the result page, killing the near-duplicate top-k
    * [[kCenterGreedy]] kills corpus-wide, but PER QUERY and
    * relevance-weighted.
    *
    * λ is integer micros (`lambdaMicro`/1e6); scores are
    * `λµ·rel − (1e6−λµ)·ms` in fixed IEEE sequences (integer literals
    * render exactly in the oracle), argmax ties break by id. Round 1
    * picks pure relevance (no diversity term yet; score NULL).
    *
    * Scale shape: candidate sets are per-query and small (the ANN
    * top-n), so every round is ONE keyed window over |queries|·n rows —
    * no broadcast, no global state. The candidate frame is persisted
    * (referenced every round — the q27 caching contract).
    *
    * @param cands (qidCol, idCol, vecCol, relCol) — one row per
    *              (query, candidate)
    * @return (qidCol, round, id, rel, mmr_score) — k rows per query
    */
  def mmrRerank(cands: DataFrame, qidCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int,
      lambdaMicro: Long = 500000L): DataFrame = {
    require(k >= 2 && lambdaMicro >= 0 && lambdaMicro <= 1000000L)
    val base = cands.select(col(qidCol), col(idCol).as("id"),
      col(vecCol).as("v"), col(relCol).as("rel")).persist()
    val wRel = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("rel").desc, col("id"))
    val s1 = base.withColumn("__rn", row_number().over(wRel))
      .filter(col("__rn") === 1).drop("__rn")
    var picks = s1.select(col(qidCol), lit(1L).as("round"), col("id"),
      col("rel"), lit(null).cast("double").as("mmr_score"))
    var state = base.join(
        s1.select(col(qidCol), col("id").as("__sid"), col("v").as("__sv")),
        qidCol)
      .filter(col("id") =!= col("__sid"))
      .select(col(qidCol), col("id"), col("v"), col("rel"),
        Similarity.cosine(col("v"), col("__sv")).as("ms"))
      .persist()
    val score = lit(lambdaMicro.toDouble) * col("rel") -
      lit((1000000L - lambdaMicro).toDouble) * col("ms")
    (2 to k).foreach { r =>
      val wScore = org.apache.spark.sql.expressions.Window
        .partitionBy(col(qidCol)).orderBy(score.desc, col("id"))
      val sr = state.withColumn("__rn", row_number().over(wScore))
        .filter(col("__rn") === 1).drop("__rn")
      picks = picks.unionAll(sr.select(col(qidCol), lit(r.toLong).as("round"),
        col("id"), col("rel"), score.as("mmr_score")))
      state = state.join(
          sr.select(col(qidCol), col("id").as("__sid"), col("v").as("__sv")),
          qidCol)
        .filter(col("id") =!= col("__sid"))
        .select(col(qidCol), col("id"), col("v"), col("rel"),
          greatest(col("ms"),
            Similarity.cosine(col("v"), col("__sv"))).as("ms"))
        .persist()
    }
    picks
  }

  /** DuckDB oracle for [[mmrRerank]], unrolled: `innerSql` yields
    * (`qidName`, id, v: DOUBLE[], rel). */
  def mmrOracleSql(innerSql: String, qidName: String, k: Int,
      lambdaMicro: Long = 500000L): String = {
    require(k >= 2)
    val lam = lambdaMicro.toDouble.toString
    val oneMinus = (1000000L - lambdaMicro).toDouble.toString
    def scoreExpr = s"CAST($lam AS DOUBLE) * rel - CAST($oneMinus AS DOUBLE) * ms"
    val rounds = (2 to k).map { r =>
      val prev = s"t${r - 1}"
      s"""s$r AS (
         |  SELECT $qidName, id, v, rel, ms, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY $qidName
         |      ORDER BY score DESC, id) AS rn
         |    FROM (SELECT *, $scoreExpr AS score FROM $prev)
         |  ) WHERE rn = 1
         |), t$r AS (
         |  SELECT $prev.$qidName, $prev.id, $prev.v, $prev.rel,
         |         greatest($prev.ms, ${cosSql(s"$prev.v", s"s$r.v")}) AS ms
         |  FROM $prev JOIN s$r ON $prev.$qidName = s$r.$qidName
         |    AND $prev.id <> s$r.id
         |)""".stripMargin
    }.mkString(", ")
    val out = (2 to k).map { r =>
      s"SELECT $qidName, CAST($r AS BIGINT) AS round, id, rel, score AS mmr_score FROM s$r"
    }.mkString("\n|UNION ALL ")
    s"""WITH cand AS ($innerSql),
       |s1 AS (
       |  SELECT $qidName, id, v, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $qidName
       |      ORDER BY rel DESC, id) AS rn
       |    FROM cand
       |  ) WHERE rn = 1
       |), t1 AS (
       |  SELECT cand.$qidName, cand.id, cand.v, cand.rel,
       |         ${cosSql("cand.v", "s1.v")} AS ms
       |  FROM cand JOIN s1 ON cand.$qidName = s1.$qidName
       |    AND cand.id <> s1.id
       |), $rounds
       |SELECT $qidName, CAST(1 AS BIGINT) AS round, id, rel,
       |       CAST(NULL AS DOUBLE) AS mmr_score FROM s1
       |UNION ALL $out""".stripMargin
  }

  /** The q25 portable cosine: left-fold `list_reduce` sums matching
    * Spark's `aggregate(0.0, +)` bit-for-bit. */
  def cosSql(x: String, y: String): String =
    s"""list_reduce(list_transform(list_zip($x, $y), p -> p[1] * p[2]), (a, v) -> a + v)
       | / sqrt(list_reduce(list_transform($x, e -> e * e), (a, v) -> a + v))
       | / sqrt(list_reduce(list_transform($y, e -> e * e), (a, v) -> a + v))""".stripMargin

  /** DuckDB oracle for [[kCenterGreedy]], unrolled: `innerSql` yields
    * (id, v: DOUBLE[]). */
  def kCenterOracleSql(innerSql: String, k: Int): String = {
    require(k >= 2)
    val rounds = (2 to k).map { r =>
      val prev = s"d${r - 1}"
      s"""p$r AS (
         |  SELECT id, v, ms FROM $prev ORDER BY ms, id LIMIT 1
         |), d$r AS (
         |  SELECT $prev.id, $prev.v,
         |         greatest($prev.ms, ${cosSql(s"$prev.v", s"p$r.v")}) AS ms
         |  FROM $prev CROSS JOIN p$r
         |)""".stripMargin
    }.mkString(", ")
    val out = (2 to k).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, id, ms AS maxsim_at_pick FROM p$r"
    }.mkString("\n|UNION ALL ")
    s"""WITH b AS ($innerSql),
       |s1 AS (SELECT id, v FROM b WHERE id = (SELECT min(id) FROM b)),
       |d1 AS (
       |  SELECT b.id, b.v, ${cosSql("b.v", "s1.v")} AS ms
       |  FROM b CROSS JOIN s1
       |), $rounds
       |SELECT CAST(1 AS BIGINT) AS round, id,
       |       CAST(NULL AS DOUBLE) AS maxsim_at_pick FROM s1
       |UNION ALL $out""".stripMargin
  }
}
