package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Sequence packing: lay documents out into fixed-capacity token windows
  * (the concatenate-and-chunk layout of GPT-style pretraining — each
  * document gets a start offset in its shard's token stream, and the
  * window id is `start div capacity`).
  *
  * Determinism: documents are sharded by the portable hash and laid out
  * in key order within each shard, so every document's (shard, offset,
  * window) is a pure function of the corpus content — reproducible
  * across runs, partitionings and engines (q67's oracle recomputes it).
  *
  * Scale shape: ONE window (running sum keyed by shard, ordered by key).
  * Shards bound the sort: each task sorts corpus/shards documents, and
  * `shards` scales freely with the cluster because shard assignment is a
  * per-row hash — the knob that keeps the biggest sort partition at a
  * size one executor can hold.
  */
object Packing {

  /** @return (idCol, shard, n_tokens, start_off, window)
    *
    * `idCol` must be unique per row — the layout is defined by the total
    * order (shard, id). The frame is ROWS, not the RANGE default: under
    * RANGE, duplicate ids would be frame PEERS sharing one cumulative
    * sum, silently overlapping their windows. */
  def packIntoWindows(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, shards: Int, salt: String): DataFrame = {
    require(capacity > 0 && shards > 0)
    val key: Column = col(idCol)
    val w = Window.partitionBy(col("shard")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(key,
        Sampling.hashBucket(key, salt, shards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("window", expr(s"start_off div $capacity"))
  }

  /** Packed-attention MASK ACCOUNTING over [[packIntoWindows]]' layout —
    * the training-efficiency/contamination readout a packed batch
    * needs: concatenate-and-chunk feeds the attention kernel windows
    * containing FRAGMENTS of several documents, and without a document
    * mask every cross-fragment pair leaks attention across unrelated
    * docs. Per (shard, window):
    *
    *  - `n_frags`, `n_tokens` (= capacity except each shard's last
    *    window);
    *  - `causal_pairs` = T(T+1)/2 — what the kernel computes unmasked;
    *  - `masked_pairs` = Σ_frag L(L+1)/2 — what a document mask keeps;
    *  - `cross_frac_micro` = ⌊10⁶·(causal−masked)/causal⌋ — the leaked
    *    (or, with masking, wasted-FLOPs) share.
    *
    * A document spans ⌈len/C⌉+1 windows at most; the fragment explode
    * is that bounded `sequence`, everything else is the one shard-keyed
    * window [[packIntoWindows]] already pays — no new corpus shuffle
    * (the (shard, window) aggregation lands on the same partitioning).
    * Pure integer; pair sums need T ≤ capacity and L ≤ capacity so
    * T² < 2⁶³ trivially.
    *
    * @return (shard, window, n_frags, n_tokens, causal_pairs,
    *         masked_pairs, cross_frac_micro); token-free docs carry no
    *         fragment */
  def packedMaskAccounting(docs: DataFrame, idCol: String,
      textCol: String, capacity: Int, shards: Int,
      salt: String): DataFrame = {
    val packed = packIntoWindows(docs, idCol, textCol, capacity, shards,
      salt).filter(col("n_tokens") > 0L)
    val frags = packed
      .select(col("shard"), col("start_off"), col("n_tokens"),
        explode(sequence(col("window"),
          expr(s"(start_off + n_tokens - 1) div $capacity"))).as("window"))
      .select(col("shard"), col("window"),
        (least(col("start_off") + col("n_tokens"),
          (col("window") + 1) * capacity) -
          greatest(col("start_off"), col("window") * capacity))
          .as("frag_len"))
    frags.groupBy(col("shard"), col("window"))
      .agg(count(lit(1)).as("n_frags"),
        sum(col("frag_len")).as("n_tokens"),
        // `div`, not `/`: Column / on longs widens to DOUBLE
        sum(expr("frag_len * (frag_len + 1) div 2")).as("masked_pairs"))
      .withColumn("causal_pairs",
        expr("n_tokens * (n_tokens + 1) div 2"))
      .withColumn("cross_frac_micro",
        expr("(causal_pairs - masked_pairs) * 1000000 div causal_pairs"))
      .select(col("shard"), col("window"), col("n_frags"),
        col("n_tokens"), col("causal_pairs"), col("masked_pairs"),
        col("cross_frac_micro"))
  }

  /** DuckDB oracle for [[packedMaskAccounting]] — identical layout,
    * fragments, and integer pair sums. */
  def packedMaskAccountingOracleSql(table: String, idName: String,
      toksSql: String, capacity: Int, shards: Int,
      salt: String): String = {
    val shard = Sampling.hashBucketSql(idName, salt, shards)
    s"""WITH p AS (
       |  SELECT $idName, $shard AS shard,
       |         CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM (SELECT $idName, $toksSql AS toks FROM $table)
       |), o AS (
       |  SELECT $idName, shard, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (
       |           PARTITION BY shard ORDER BY $idName
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS start_off
       |  FROM p
       |), f AS (
       |  SELECT shard, CAST(w AS BIGINT) AS "window",
       |         least(start_off + n_tokens, (w + 1) * $capacity)
       |           - greatest(start_off, w * $capacity) AS frag_len
       |  FROM (
       |    SELECT *, unnest(range(start_off // $capacity,
       |      (start_off + n_tokens - 1) // $capacity + 1)) AS w
       |    FROM o WHERE n_tokens > 0)
       |)
       |SELECT shard, "window",
       |       CAST(count(*) AS BIGINT) AS n_frags,
       |       CAST(sum(frag_len) AS BIGINT) AS n_tokens,
       |       CAST(sum(frag_len) * (sum(frag_len) + 1) // 2 AS BIGINT)
       |         AS causal_pairs,
       |       CAST(sum(frag_len * (frag_len + 1) // 2) AS BIGINT)
       |         AS masked_pairs,
       |       CAST((sum(frag_len) * (sum(frag_len) + 1) // 2
       |             - sum(frag_len * (frag_len + 1) // 2)) * 1000000
       |            // (sum(frag_len) * (sum(frag_len) + 1) // 2)
       |         AS BIGINT) AS cross_frac_micro
       |FROM f GROUP BY 1, 2""".stripMargin
  }

  /** GPT-style pretraining block layout: every document's token stream,
    * in `idCol` order, concatenated into ONE virtual stream with an
    * end-of-document marker after each doc (empty docs contribute just
    * the marker), then cut into fixed blocks of `blockTokens` — blocks
    * CROSS document boundaries, which is what distinguishes this from
    * [[packIntoWindows]] (per-shard windows that reset) and the per-doc
    * chunkers: the layout a causal-LM pretraining batch actually reads,
    * and it is a pure deterministic function of (idCol order, B).
    *
    * Scale shape: the global token ordinal comes from PER-DOC counts —
    * one doc-level aggregation, shard offsets over `idCol div
    * shardSpan` ranges (monotone in id, so shard order = id order; the
    * q188 globalOrdinals device: broadcast prefix offsets, never a
    * corpus-wide single-partition window), then one scan-side
    * posexplode projection. The corpus shuffles once (the doc-level
    * count), tokens never shuffle at all.
    *
    * @return (idCol, token, block_id, pos_in_block) — one row per
    *         token occurrence incl. the markers; the last block may be
    *         ragged */
  def pretrainBlocks(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int, eod: String = "<eod>",
      shardSpan: Long = 1024L): DataFrame = {
    require(blockTokens >= 1 && shardSpan >= 1)
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val counts = toks.select(col(idCol),
      (size(col("__toks")) + 1).cast("long").as("__n"),
      expr(s"CAST($idCol AS LONG) div $shardSpan").as("__shard"))
    val offs = counts.groupBy(col("__shard"))
      .agg(sum(col("__n")).as("__sn"))
      .withColumn("__soff",
        coalesce(sum(col("__sn")).over(Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__soff"))
    val within = Window.partitionBy(col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val docOff = counts.join(broadcast(offs), "__shard")
      .withColumn("__doff",
        col("__soff") + coalesce(sum(col("__n")).over(within), lit(0L)))
      .select(col(idCol), col("__doff"))
    toks
      .select(col(idCol),
        posexplode(concat(col("__toks"), array(lit(eod))))
          .as(Seq("__p", "token")))
      .join(docOff, idCol)
      .select(col(idCol), col("token"),
        expr(s"(__doff + __p) div $blockTokens").as("block_id"),
        pmod(col("__doff") + col("__p"), lit(blockTokens.toLong))
          .as("pos_in_block"))
  }

  /** T5-style span-corruption layout (Raffel et al. denoising): mask
    * aligned `spanLen`-token spans chosen by a REPRODUCIBLE keyed hash
    * (span g of doc d masked ⟺ hash60(salt:d:g) mod maskOneIn = 0 —
    * deterministic across runs, partitionings, and engines; the q330
    * walk-step device), emit the (input, target) pair: input keeps the
    * survivors with each masked span collapsed to one `<extra_id_N>`
    * sentinel, target lists each sentinel followed by the span it hid,
    * sentinels numbered in document order. (T5's trailing final
    * sentinel is omitted — documented deviation, constant per pair.)
    *
    * One posexplode projection + per-doc windows (position order) +
    * two ordered reassembly folds — single doc-keyed shuffle.
    *
    * @return (idCol, n_tokens, n_masked, input_text, target_text) */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, maskOneIn: Int = 5,
      salt: String = "t5"): DataFrame = {
    require(spanLen >= 1 && maskOneIn >= 2)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val tok = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("p", "tok")))
      .withColumn("g", expr(s"p div $spanLen"))
      .withColumn("m",
        pmod(graft.functions.Hash64.hash60(concat_ws(":",
          lit(salt), col(idCol), col("g"))), lit(maskOneIn.toLong)) === 0)
      .withColumn("gf", col("p") === col("g") * spanLen)
      .withColumn("sidx",
        sum(when(col("m") && col("gf"), 1L).otherwise(0L))
          .over(byDoc.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - 1)
    val sent = concat(lit("<extra_id_"), col("sidx"), lit(">"))
    tok
      .withColumn("__in",
        when(!col("m"), col("tok"))
          .when(col("m") && col("gf"), sent))
      .withColumn("__tg",
        when(col("m") && col("gf"), concat(sent, lit(" "), col("tok")))
          .when(col("m"), col("tok")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        array_join(transform(array_sort(collect_list(
          struct(col("p"), coalesce(col("__in"), lit("")).as("v")))),
          e => e.getField("v")), " ").as("__inj"),
        array_join(transform(array_sort(collect_list(
          struct(col("p"), coalesce(col("__tg"), lit("")).as("v")))),
          e => e.getField("v")), " ").as("__tgj"))
      .select(col(idCol), col("n_tokens"), col("n_masked"),
        regexp_replace(trim(col("__inj")), " +", " ").as("input_text"),
        regexp_replace(trim(col("__tgj")), " +", " ").as("target_text"))
  }

  /** DuckDB oracle for [[spanCorrupt]] — identical hash choice,
    * windows, and reassembly. `tokSql` yields (doc_id, toks). */
  def spanCorruptOracleSql(tokSql: String, spanLen: Int = 3,
      maskOneIn: Int = 5, salt: String = "t5"): String = {
    val h = graft.functions.Hash64.duckSql(
      s"'$salt' || ':' || CAST(doc_id AS VARCHAR) || ':' || CAST(g AS VARCHAR)")
    s"""WITH t AS ($tokSql), e AS (
       |  SELECT doc_id, i - 1 AS p, toks[i] AS tok,
       |         (i - 1) // $spanLen AS g
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS i
       |        FROM t WHERE len(toks) > 0)
       |), f AS (
       |  SELECT doc_id, p, tok, g, $h % $maskOneIn = 0 AS m,
       |         p = g * $spanLen AS gf
       |  FROM e
       |), sx AS (
       |  SELECT *, sum(CASE WHEN m AND gf THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY p
       |                 ROWS UNBOUNDED PRECEDING) - 1 AS sidx
       |  FROM f
       |), pieces AS (
       |  SELECT doc_id, p, m,
       |         CASE WHEN NOT m THEN tok
       |              WHEN m AND gf THEN '<extra_id_' || sidx || '>'
       |         END AS inp,
       |         CASE WHEN m AND gf
       |                THEN '<extra_id_' || sidx || '>' || ' ' || tok
       |              WHEN m THEN tok
       |         END AS tg
       |  FROM sx
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_masked,
       |       regexp_replace(trim(coalesce(
       |         string_agg(coalesce(inp, ''), ' ' ORDER BY p), '')),
       |         ' +', ' ', 'g') AS input_text,
       |       regexp_replace(trim(coalesce(
       |         string_agg(coalesce(tg, ''), ' ' ORDER BY p), '')),
       |         ' +', ' ', 'g') AS target_text
       |FROM pieces GROUP BY doc_id""".stripMargin
  }

  /** DuckDB oracle for [[pretrainBlocks]]: the definitional cumulative
    * offset over doc order. `tokSql` yields (doc_id, toks). */
  def pretrainBlocksOracleSql(tokSql: String, blockTokens: Int,
      eod: String = "<eod>"): String =
    s"""WITH t AS ($tokSql), o AS (
       |  SELECT doc_id,
       |         coalesce(sum(len(toks) + 1) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS doff
       |  FROM t
       |), e AS (
       |  SELECT doc_id, unnest(generate_series(1, len(toks) + 1)) AS i,
       |         toks
       |  FROM t
       |), g AS (
       |  SELECT e.doc_id,
       |         CASE WHEN i <= len(toks) THEN toks[i] ELSE '$eod' END
       |           AS token,
       |         o.doff + i - 1 AS gg
       |  FROM e JOIN o USING (doc_id)
       |)
       |SELECT doc_id, token, CAST(gg // $blockTokens AS BIGINT)
       |         AS block_id,
       |       CAST(gg % $blockTokens AS BIGINT) AS pos_in_block
       |FROM g""".stripMargin

  /** Length-bucketed BATCHING — the padding-minimizing layout for
    * inference / finetuning, where documents must stay whole (unlike
    * [[packIntoWindows]]'s concat-and-chunk, which splits them): docs
    * group into power-of-2 length buckets (`bucket` = bit-length of the
    * token count, the integer log₂ both engines share), and each batch
    * of `batchSize` same-bucket docs pads only to ITS OWN max — a short
    * doc never pays for the corpus' longest. Batches form in
    * (len desc, id) order within a bucket shard, so near-equal lengths
    * batch together and the per-batch max hugs the members.
    *
    * Scale shape: like [[packIntoWindows]], the window partitions by
    * (bucket, hash shard) — never by bucket alone, which at corpus scale
    * would serialize ~60 mega-partitions on ~60 tasks; `shards` is the
    * knob that bounds the biggest sort a task holds. The padding cost of
    * sharding is marginal (each shard still batches sorted lengths).
    *
    * @return one row per batch: (bucket, shard, batch, n_docs,
    *         batch_tokens, batch_max, padding) */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int, shards: Int, salt: String): DataFrame = {
    require(batchSize > 0 && shards > 0)
    val key: Column = col(idCol)
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tokens").desc, key)
    docs.select(key,
        Sampling.hashBucket(key, salt, shards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("bucket", length(bin(col("n_tokens"))).cast("long"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(__rn - 1L) div $batchSize"))
      .groupBy(col("bucket"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        max(col("n_tokens")).as("batch_max"))
      .withColumn("padding",
        col("n_docs") * col("batch_max") - col("batch_tokens"))
  }
}
