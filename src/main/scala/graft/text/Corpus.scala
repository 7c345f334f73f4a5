package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64
import graft.ops.Sampling

/** End-to-end training-corpus builder — the composition a data pipeline
  * actually ships, as ONE declarative plan:
  *
  *   stratified sample → exact dedup (keep lowest id per normalized
  *   fingerprint) → quality floor → train/val/test split
  *
  * Plan shape: the sample predicate is a pure hash expression (sits on the
  * scan, survives pushdown), dedup is a single keyed `min_by` aggregation
  * (one shuffle — the only one in the whole pipeline), quality is scalar,
  * and the split is another pure expression. Every step is deterministic
  * and engine-portable, so the entire pipeline output is one
  * rows+schema+hash oracle row (q50) — rerunning it on 100 TB tomorrow
  * selects the same documents into the same splits.
  */
object Corpus {

  /** @return (id, strata, n_tokens, quality, split) for the surviving rows */
  def build(docs: DataFrame, idCol: String, textCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double, minQuality: Double,
      salt: String,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val sampled = Sampling.stratifiedSample(docs, col(idCol), col(strataCol),
      rates, defaultRate, s"$salt-smp")
    val deduped = sampled
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min_by(
        struct(col(idCol), col(textCol), col(strataCol)), col(idCol)).as("r"))
      .select(col("r.*"))
    val toks = TextAnalysis.tokens(col(textCol))
    val stopRatio = TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn)
      .cast("double") / greatest(size(toks), lit(1))
    val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
    val punct = TextAnalysis.punctRatio(col(textCol))
    val scored = deduped
      .withColumn("n_tokens", size(toks))
      .withColumn("quality",
        lenScore * lit(0.6) + (lit(1.0) - stopRatio) * lit(0.3) +
          (lit(1.0) - punct) * lit(0.1))
      .filter(col("quality") >= minQuality)
    Sampling.assignSplit(scored, col(idCol), s"$salt-spl", splits)
      .select(col(idCol), col(strataCol), col("n_tokens"),
        col("quality"), col("split"))
  }

  /** Incremental ingestion: drop new documents whose normalized
    * fingerprint already exists in the corpus — the daily-batch path
    * (dedup new data against history WITHOUT re-reading history's text:
    * `existingFps` is the persisted fingerprint column, one slim row per
    * historical doc). A keyed left_anti shuffle on the fingerprint; also
    * drops intra-batch dups, keeping the lowest id. */
  def incremental(newDocs: DataFrame, idCol: String, textCol: String,
      existingFps: DataFrame): DataFrame = {
    val fps = existingFps.toDF("__fp")
    newDocs
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(fps, Seq("__fp"), "left_anti")
      .groupBy(col("__fp"))
      .agg(min_by(struct(newDocs.columns.map(col): _*), col(idCol)).as("r"))
      .select(col("r.*"))
  }

  /** Train/eval split-leakage audit — the contamination check a split
    * assignment needs AFTER the fact: normalized-fingerprint groups that
    * span the train split and any eval split. A dedup pass before
    * splitting prevents exact leakage, but pipelines that split first
    * (or merge corpora post-split) re-introduce it; q55's
    * decontamination catches n-gram overlap with EXTERNAL benchmarks,
    * this catches the corpus leaking into its OWN eval splits.
    *
    * One fingerprint projection (scan-side md5) + one keyed aggregation
    * with conditional counts — the same single-shuffle shape as exact
    * dedup, so it runs at corpus scale as a routine audit.
    *
    * @param splits as [[graft.ops.Sampling.assignSplit]]; every
    *               non-"train" label counts as eval
    * @return (fp, n_train, n_eval, train_id, eval_id) — one row per
    *         LEAKED fingerprint (present on both sides); the id pair is
    *         the lowest-id example from each side for triage */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      salt: String, splits: Seq[(String, Double)]): DataFrame = {
    val assigned = Sampling.assignSplit(
      docs.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      col(idCol), salt, splits)
    val isTrain = col("split") === "train"
    assigned.groupBy(col("__fp").as("fp"))
      .agg(sum(when(isTrain, 1L).otherwise(0L)).as("n_train"),
        sum(when(isTrain, 0L).otherwise(1L)).as("n_eval"),
        min(when(isTrain, col(idCol))).as("train_id"),
        min(when(!isTrain, col(idCol))).as("eval_id"))
      .filter(col("n_train") > 0 && col("n_eval") > 0)
  }

  /** Token accounting — the mixture dashboard every corpus pipeline
    * keeps: documents, token mass, and corpus share per group (source /
    * language / split). This is the input to choosing q66's mixing rates
    * and the evidence that applied rates landed where intended.
    *
    * Token counts come from a scan-side `size(tokens)` — the corpus is
    * NEVER exploded (10¹¹ token rows for a 10⁸-doc corpus would dwarf
    * the corpus itself); one map-side-combined aggregation is the only
    * shuffle, and the share denominators come from an unpartitioned
    * window over the ALREADY-AGGREGATED frame (one row per group — the
    * dense-rollup trick, group cardinality not corpus size).
    *
    * @return (byCol, n_docs, n_tokens, doc_share, token_share),
    *         shares exact to one final division */
  def tokenAccounting(docs: DataFrame, byCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy() // group-cardinality rows by then
    docs
      .select(col(byCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
      .withColumn("doc_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(all).cast("double"))
      .withColumn("token_share",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(all).cast("double"))
  }

  /** Vocabulary RICHNESS per group: Chao1's unseen-species estimate and
    * Good-Turing's unseen probability mass, both read off the frequency
    * spectrum's first two cells — the "how much vocabulary have we NOT
    * crawled yet" planning numbers the q290 Heaps curve extrapolates
    * toward but never states:
    *   chao1       = V + f1·(f1−1) / (2·(f2+1))   (bias-corrected form,
    *                 defined even when no doubletons exist)
    *   unseen_mass = f1 / N                        (Good-Turing p₀)
    * with V = distinct types, f1/f2 = types seen exactly once/twice,
    * N = total tokens. A source whose chao1 ≫ V (singleton-heavy) is
    * under-sampled — crawl more before weighting it; unseen_mass is the
    * probability the NEXT token is a new type.
    *
    * Cross-engine: V, f1, f2, N are exact integers; both derived
    * doubles divide the same two integers (chao1's numerator/denominator
    * cross-multiplied into one division each).
    *
    * Scale shape: one (group, unit) count aggregation, one group
    * aggregation over the spectrum — the q92 plan, nothing new at 100 TB.
    *
    * `unit` defaults to word tokens; pass a shingle expression for
    * n-gram richness — the harness corpus's 31-word vocabulary has no
    * singleton tail at word level, while its 3-gram space does, and
    * n-gram unseen mass is the dedup-planning form of the question
    * ("how many n-grams would a bigger crawl add?").
    *
    * @return (groupCol, n_tokens, vocab, f1, f2, chao1, unseen_mass) */
  def vocabRichness(docs: DataFrame, groupCol: String, textCol: String,
      unit: Column => Column = TextAnalysis.tokens): DataFrame =
    docs
      .select(col(groupCol),
        explode(unit(col(textCol))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__k"))
      .groupBy(col(groupCol))
      .agg(sum(col("__k")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__k") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__k") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1",
        col("vocab").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            (lit(2L) * (col("f2") + 1)).cast("double"))
      .withColumn("unseen_mass",
        col("f1").cast("double") / col("n_tokens").cast("double"))

  /** DuckDB oracle for [[vocabRichness]]; `unitSql` is a list
    * expression over the table's columns (token or shingle list). */
  def vocabRichnessOracleSql(table: String, groupCol: String,
      unitSql: String): String =
    s"""WITH tk AS (
       |  SELECT $groupCol, unnest($unitSql) AS tok FROM $table
       |), kc AS (
       |  SELECT $groupCol, tok, count(*) AS k FROM tk GROUP BY 1, 2
       |), g AS (
       |  SELECT $groupCol,
       |         CAST(sum(k) AS BIGINT) AS n_tokens,
       |         CAST(count(*) AS BIGINT) AS vocab,
       |         CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |         CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
       |  FROM kc GROUP BY 1
       |)
       |SELECT $groupCol, n_tokens, vocab, f1, f2,
       |       CAST(vocab AS DOUBLE)
       |         + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
       |           AS chao1,
       |       CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unseen_mass
       |FROM g""".stripMargin

  /** Pairwise VOCABULARY Jaccard between groups (sources): how much of
    * each pair's distinct-token sets overlap — the redundancy map a
    * mixture planner reads before weighting sources (two crawls of the
    * same sites earn one budget, not two).
    *
    * Scale shape: one distinct-token aggregation, then a token-keyed
    * self-join whose per-token fan-out is bounded by |groups| (≤ m²
    * pair rows per token, m = number of groups carrying it — never a
    * corpus×corpus join); group vocabulary sizes join back broadcast
    * (|groups| rows). Pairs sharing zero tokens produce no row.
    *
    * @return (group_a, group_b, inter, n_a, n_b, jaccard), group_a <
    *         group_b lexicographically
    */
  def vocabOverlap(docs: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val toks = docs
      .select(col(groupCol).as("g"),
        explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .distinct()
    val sizes = toks.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val pairs = toks.as("a")
      .join(toks.as("b"),
        col("a.t") === col("b.t") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("group_a"), col("b.g").as("group_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.select(col("g").as("group_a"), col("n").as("n_a"))),
        Seq("group_a"))
      .join(broadcast(sizes.select(col("g").as("group_b"), col("n").as("n_b"))),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("inter"), col("n_a"),
        col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** DuckDB oracle for [[vocabOverlap]]; `toksSql` mirrors
    * [[TextAnalysis.tokens]]. */
  def vocabOverlapOracleSql(table: String, groupCol: String,
      toksSql: String): String =
    s"""WITH tok AS (
       |  SELECT DISTINCT $groupCol AS g, unnest($toksSql) AS t FROM $table
       |), sz AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
       |), pr AS (
       |  SELECT a.g AS group_a, b.g AS group_b,
       |         CAST(count(*) AS BIGINT) AS inter
       |  FROM tok a JOIN tok b ON a.t = b.t AND a.g < b.g
       |  GROUP BY 1, 2
       |)
       |SELECT group_a, group_b, inter, sa.n AS n_a, sb.n AS n_b,
       |       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE)
       |         AS jaccard
       |FROM pr
       |JOIN sz sa ON sa.g = group_a
       |JOIN sz sb ON sb.g = group_b""".stripMargin

  /** Pairwise Jensen-Shannon divergence between group unigram
    * DISTRIBUTIONS over hashed token buckets — the distributional
    * complement of [[vocabOverlap]] (two sources can share vocabulary
    * yet use it at wildly different rates). The mixture-design /
    * domain-shift dashboard number.
    *
    * Everything is exact integers: per-group bucket probabilities
    * quantize to micro units (`k·1e6 div n` — integer div), and each
    * bucket's JS contribution uses the bit-length log
    * (blog(2p) − blog(p+q) for the P side, symmetrically for Q —
    * p = 0 or q = 0 contribute only from the live side, exactly the
    * limit of the true formula). `js_q` is the summed quantized mass
    * (÷2e6 ≈ bits); scaled to `js_bits` in one IEEE step.
    *
    * Scale shape: the bucket space is FIXED (`buckets`, default 4096),
    * so the per-group distribution frame is |groups|·buckets rows
    * regardless of corpus size; the pair join is on the bucket key with
    * |groups| fan-out per bucket. Token mass aggregates map-side before
    * any of this.
    *
    * @return (group_a, group_b, js_q, js_bits)
    */
  def sourceDivergence(docs: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    val blog = (x: Column) => length(bin(x)).cast("long")
    val sparse = docs
      .select(col(groupCol).as("g"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(col("g"), (Hash64.hash60(col("__t")) % buckets).as("bkt"))
      .groupBy(col("g"), col("bkt")).agg(count(lit(1)).as("k"))
      .withColumn("n", sum("k").over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .withColumn("p", expr("(k * 1000000) div n"))
      .select(col("g"), col("bkt"), col("p"))
    // densify over the FIXED bucket space (|groups|·buckets rows — a
    // constant of the config, not the corpus) so absent buckets carry
    // p = 0 and the pair join needs no anti-legs
    val dense = sparse.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(0L),
        lit(buckets.toLong - 1))).as("bkt"))
      .join(sparse, Seq("g", "bkt"), "left")
      .select(col("g"), col("bkt"), coalesce(col("p"), lit(0L)).as("p"))
    val terms = dense.as("a")
      .join(dense.as("b"), Seq("bkt"))
      .filter(col("a.g") < col("b.g"))
      .select(col("a.g").as("ga"), col("b.g").as("gb"),
        col("a.p").as("p"), col("b.p").as("q"))
      .withColumn("m", col("p") + col("q"))
      .withColumn("c",
        when(col("p") > 0, col("p") * (blog(col("p") * 2) - blog(col("m"))))
          .otherwise(lit(0L)) +
        when(col("q") > 0, col("q") * (blog(col("q") * 2) - blog(col("m"))))
          .otherwise(lit(0L)))
    terms.groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(sum(col("c")).as("js_q"))
      .withColumn("js_bits", col("js_q").cast("double") / lit(2000000.0))
  }

  /** Per-source corpus DATASHEET: the one-row-per-source summary a
    * dataset card publishes — volume (docs/tokens/chars), language
    * profile (distinct + modal language), and exact-duplication rate
    * (docs whose normalized fingerprint already appeared under a lower
    * id, [[graft.text.TextAnalysis.fingerprint]] first-wins — the q23
    * convention). Three aggregations joined on the source key
    * (|sources| rows); the fingerprint leg is the only shuffle that
    * sees the corpus twice (window + regroup), both keyed.
    *
    * @return (source, n_docs, n_tokens, n_chars, n_langs, top_lang,
    *         n_dup_docs, dup_frac)
    */
  def datasheet(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vol = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
    val langW = Window.partitionBy(col(sourceCol))
      .orderBy(col("__k").desc, col(langCol))
    val langs = docs.groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("__k"))
      .withColumn("__rn", row_number().over(langW))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_langs"),
        max(when(col("__rn") === 1, col(langCol))).as("top_lang"))
    val dups = docs
      .select(col(sourceCol), col(idCol),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .withColumn("__first", min(col(idCol)).over(
        Window.partitionBy(col("__fp"))))
      .groupBy(col(sourceCol))
      .agg(sum(when(col(idCol) =!= col("__first"), 1L).otherwise(0L))
        .as("n_dup_docs"))
    vol.join(langs, Seq(sourceCol)).join(dups, Seq(sourceCol))
      .withColumn("dup_frac",
        col("n_dup_docs").cast("double") / col("n_docs"))
  }

  /** DuckDB oracle for [[datasheet]]. */
  def datasheetOracleSql(table: String, sourceCol: String, idCol: String,
      textCol: String, langCol: String): String =
    s"""WITH vol AS (
       |  SELECT $sourceCol, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(len(list_filter(string_split_regex(lower($textCol),
       |           '[^a-z0-9]+'), x -> x <> ''))) AS BIGINT) AS n_tokens,
       |         CAST(sum(length($textCol)) AS BIGINT) AS n_chars
       |  FROM $table GROUP BY 1
       |), lc AS (
       |  SELECT $sourceCol, $langCol, count(*) AS k,
       |         row_number() OVER (PARTITION BY $sourceCol
       |           ORDER BY count(*) DESC, $langCol) AS rn
       |  FROM $table GROUP BY $sourceCol, $langCol
       |), langs AS (
       |  SELECT $sourceCol, CAST(count(*) AS BIGINT) AS n_langs,
       |         max(CASE WHEN rn = 1 THEN $langCol END) AS top_lang
       |  FROM lc GROUP BY 1
       |), fp AS (
       |  SELECT $sourceCol, $idCol,
       |         min($idCol) OVER (PARTITION BY
       |           md5(trim(regexp_replace(lower($textCol), '\\s+', ' ', 'g'))))
       |           AS first_id
       |  FROM $table
       |), dups AS (
       |  SELECT $sourceCol,
       |         CAST(sum(CASE WHEN $idCol <> first_id THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_dup_docs
       |  FROM fp GROUP BY 1
       |)
       |SELECT $sourceCol, n_docs, n_tokens, n_chars, n_langs, top_lang,
       |       n_dup_docs,
       |       CAST(n_dup_docs AS DOUBLE) / n_docs AS dup_frac
       |FROM vol
       |JOIN langs USING ($sourceCol)
       |JOIN dups USING ($sourceCol)""".stripMargin

  /** DuckDB oracle for [[sourceDivergence]]. */
  def sourceDivergenceOracleSql(table: String, groupCol: String,
      toksSql: String, buckets: Int = 4096): String =
    s"""WITH tok AS (
       |  SELECT $groupCol AS g, ${Hash64.duckSql("t")} % $buckets AS bkt
       |  FROM (SELECT $groupCol, unnest($toksSql) AS t FROM $table)
       |), cnt AS (
       |  SELECT g, bkt, CAST(count(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2
       |), prob AS (
       |  SELECT g, bkt,
       |         CAST(k * 1000000 // CAST(sum(k) OVER (PARTITION BY g)
       |           AS BIGINT) AS BIGINT) AS p
       |  FROM cnt
       |), dense AS (
       |  SELECT gs.g, bs.bkt, coalesce(prob.p, 0) AS p
       |  FROM (SELECT DISTINCT g FROM prob) gs
       |  CROSS JOIN (SELECT unnest(range(0, $buckets)) AS bkt) bs
       |  LEFT JOIN prob ON prob.g = gs.g AND prob.bkt = bs.bkt
       |), t AS (
       |  SELECT a.g AS group_a, b.g AS group_b,
       |         (CASE WHEN a.p > 0 THEN a.p * (length(bin(a.p * 2))
       |            - length(bin(a.p + b.p))) ELSE 0 END
       |          + CASE WHEN b.p > 0 THEN b.p * (length(bin(b.p * 2))
       |            - length(bin(a.p + b.p))) ELSE 0 END) AS c
       |  FROM dense a JOIN dense b ON a.bkt = b.bkt AND a.g < b.g
       |)
       |SELECT group_a, group_b, CAST(sum(c) AS BIGINT) AS js_q,
       |       CAST(sum(c) AS DOUBLE) / 2000000.0 AS js_bits
       |FROM t GROUP BY 1, 2""".stripMargin

  /** HEAPS' vocabulary-growth curve: distinct vocabulary as a function
    * of corpus prefix size — "is the vocabulary saturating or will
    * every new million docs keep minting tokens", the question that
    * sizes q78's vocab and the tokenizer budget. ONE pass via the
    * first-occurrence identity: vocab(k) = #tokens whose FIRST doc id
    * falls within the first k docs — a token-keyed min aggregation and
    * a cumulative over the checkpoint histogram; the naive per-prefix
    * recount would scan the corpus once per checkpoint.
    *
    * Doc "order" is ascending id (the deterministic stand-in for
    * arrival order). Checkpoints are id-RANK thresholds: the k-th
    * smallest distinct id, exact via the id histogram. The id-rank
    * window here is the simple global form — swap in
    * [[graft.ops.Ranking.globalOrdinals]]' sharded ranks when the doc
    * id directory itself outgrows one task.
    *
    * @param checkpoints prefix sizes in docs, ascending
    * @return per checkpoint: (prefix_docs, vocab_size, new_tokens) —
    *         checkpoints beyond the corpus report the full vocab
    */
  def heapsCurve(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted)
    val firstDoc = docs
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(min(col("__id")).as("__fd"))
    // rank of each doc id (dense by construction of distinct ids)
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("__id"))
    val idRank = docs.select(col(idCol).as("__id")).distinct()
      .withColumn("__rank", row_number().over(wRank).cast("long"))
    val ranked = firstDoc.join(idRank, col("__fd") === col("__id"))
    val legs = checkpoints.map { k =>
      ranked.filter(col("__rank") <= k)
        .agg(lit(k).as("prefix_docs"),
          count(lit(1)).as("vocab_size"))
    }
    val curve = legs.reduce(_ unionAll _)
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("prefix_docs"))
    curve.withColumn("new_tokens",
      col("vocab_size") -
        coalesce(lag(col("vocab_size"), 1).over(wCum), lit(0L)))
  }

  /** DuckDB oracle for [[heapsCurve]]: `tokSql` yields (id, toks). */
  def heapsCurveOracleSql(tokSql: String, checkpoints: Seq[Long])
      : String = {
    val legs = checkpoints.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS prefix_docs,
         |       CAST(count(*) AS BIGINT) AS vocab_size
         |FROM ranked WHERE rk <= $k""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH t AS ($tokSql),
       |fd AS (
       |  SELECT tok, min(id) AS f
       |  FROM (SELECT id, unnest(toks) AS tok FROM t) GROUP BY 1
       |), ir AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY id) AS BIGINT)
       |    AS rk
       |  FROM (SELECT DISTINCT id FROM t)
       |), ranked AS (
       |  SELECT fd.tok, ir.rk FROM fd JOIN ir ON fd.f = ir.id
       |), curve AS (
       |$legs
       |)
       |SELECT prefix_docs, vocab_size,
       |       vocab_size - CAST(coalesce(lag(vocab_size)
       |         OVER (ORDER BY prefix_docs), 0) AS BIGINT) AS new_tokens
       |FROM curve""".stripMargin
  }

  /** Source ABLATION: for each source, what the corpus-level metric
    * becomes WITHOUT it — the leave-one-group-out data-valuation cut
    * ("which source is dragging mean quality down") computed from ONE
    * aggregation pass: per-group (Σ, n) plus totals makes every
    * leave-one-out mean pure arithmetic, no per-source rescans.
    *
    * @param metric exact integer per-doc metric
    * @return per group: (grpCol, n, mean_grp, loo_mean, overall_mean,
    *         contribution) — contribution = overall − loo (positive =
    *         the source pulls the mean up); loo NULL for a group
    *         holding the whole corpus
    */
  def sourceAblation(docs: DataFrame, grpCol: String,
      metric: Column): DataFrame = {
    val g = docs.select(col(grpCol), metric.as("__m"))
      .filter(col("__m").isNotNull)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col("__m")).as("__s"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    // totals named apart from the group columns in more than case:
    // Spark's default resolver is case-INSENSITIVE, so a `__S` total
    // would silently REPLACE the per-group `__s`
    g.withColumn("__totN", sum(col("n")).over(wAll))
      .withColumn("__totS", sum(col("__s")).over(wAll))
      .withColumn("mean_grp", col("__s").cast("double") / col("n"))
      .withColumn("loo_mean",
        when(col("__totN") > col("n"),
          (col("__totS") - col("__s")).cast("double") /
            (col("__totN") - col("n"))))
      .withColumn("overall_mean",
        col("__totS").cast("double") / col("__totN"))
      .withColumn("contribution", col("overall_mean") - col("loo_mean"))
      .select(col(grpCol), col("n"), col("mean_grp"), col("loo_mean"),
        col("overall_mean"), col("contribution"))
  }

  /** DuckDB oracle for [[sourceAblation]]: `innerSql` yields
    * (`grpName`, m). */
  def sourceAblationOracleSql(innerSql: String, grpName: String): String =
    s"""WITH g AS (
       |  SELECT $grpName, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(m) AS BIGINT) AS s
       |  FROM ($innerSql) WHERE m IS NOT NULL GROUP BY 1
       |), t AS (
       |  SELECT *, CAST(sum(n) OVER () AS BIGINT) AS nn,
       |         CAST(sum(s) OVER () AS BIGINT) AS ss
       |  FROM g
       |)
       |SELECT $grpName, n, CAST(s AS DOUBLE) / n AS mean_grp,
       |       CASE WHEN nn > n THEN
       |         CAST(ss - s AS DOUBLE) / (nn - n) END AS loo_mean,
       |       CAST(ss AS DOUBLE) / nn AS overall_mean,
       |       CAST(ss AS DOUBLE) / nn -
       |         (CASE WHEN nn > n THEN
       |            CAST(ss - s AS DOUBLE) / (nn - n) END) AS contribution
       |FROM t""".stripMargin

  /** Token share-shift report: WHICH tokens moved between two corpus
    * slices (snapshot versions, before/after a filter, source A vs B)
    * and by how much — the per-token attribution [[sourceDivergence]]'s
    * one-number JS verdict points at but can't name. Shares in integer
    * micros (`k·1e6 div total`), shift = share_a − share_b exactly;
    * top movers by |shift| via the fused global top-k.
    *
    * @return top `topK`: (token, n_a, n_b, share_a_micro,
    *         share_b_micro, shift_micro) ordered by |shift| desc
    */
  def tokenShareShift(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    val sa = {
      val c = a.select(explode(TextAnalysis.tokens(col(textCol)))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_a"))
        .withColumn("__tot", sum(col("n_a")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      c.withColumn("share_a_micro", expr("(n_a * 1000000) div __tot"))
        .drop("__tot")
    }
    val sb = {
      val c = b.select(explode(TextAnalysis.tokens(col(textCol)))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_b"))
        .withColumn("__tot", sum(col("n_b")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      c.withColumn("share_b_micro", expr("(n_b * 1000000) div __tot"))
        .drop("__tot")
    }
    sa.join(sb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("share_a_micro"), lit(0L)).as("share_a_micro"),
        coalesce(col("share_b_micro"), lit(0L)).as("share_b_micro"))
      .withColumn("shift_micro",
        col("share_a_micro") - col("share_b_micro"))
      .orderBy(abs(col("shift_micro")).desc, col("token"))
      .limit(topK)
  }

  /** DuckDB oracle for [[tokenShareShift]]: `aSql`/`bSql` yield one
    * `toks` list column. */
  def tokenShareShiftOracleSql(aSql: String, bSql: String,
      topK: Int = 20): String = {
    def side(src: String, nName: String, sName: String) =
      s"""SELECT token, CAST(count(*) AS BIGINT) AS $nName,
         |       CAST(count(*) * 1000000 //
         |         (sum(count(*)) OVER ()) AS BIGINT) AS $sName
         |FROM (SELECT unnest(toks) AS token FROM ($src))
         |GROUP BY 1""".stripMargin
    s"""WITH sa AS (${side(aSql, "n_a", "share_a_micro")}),
       |sb AS (${side(bSql, "n_b", "share_b_micro")})
       |SELECT coalesce(sa.token, sb.token) AS token,
       |       coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       |       coalesce(share_a_micro, 0) AS share_a_micro,
       |       coalesce(share_b_micro, 0) AS share_b_micro,
       |       coalesce(share_a_micro, 0) - coalesce(share_b_micro, 0)
       |         AS shift_micro
       |FROM sa FULL OUTER JOIN sb ON sa.token = sb.token
       |ORDER BY abs(coalesce(share_a_micro, 0)
       |  - coalesce(share_b_micro, 0)) DESC, token
       |LIMIT $topK""".stripMargin
  }
}
