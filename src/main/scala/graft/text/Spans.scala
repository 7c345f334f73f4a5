package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.functions.Hash64

/** Substring-level duplication profiling — the signal behind
  * "remove duplicated spans from the training set" (the w-gram
  * containment idea of q55's decontamination turned inward on the corpus
  * itself): a document whose w-gram shingles mostly also appear in other
  * documents is boilerplate/template/copy even when no WHOLE-document
  * near-dup pair fires. Complements [[NearDup]]: document-level dedup
  * (minhash clusters) drops copies; the span profile finds the
  * partially-copied tail those pipelines keep.
  *
  * Plan shape (shared by both operators here): explode units → ONE
  * map-side-combined aggregation to distinct (unit, doc) with an
  * occurrence count → per-unit document frequency as an unbounded-frame
  * `count(*)` window over the unit key (no join back to the corpus, no
  * second scan, nothing persisted) → per-doc aggregation. Three keyed
  * shuffles, single linear lineage. The window partition for a unit is
  * one row per document containing it — bounded by corpus document
  * count in theory, but w-gram shingles (w ≥ ~7) are long enough that
  * real partitions are tiny; token-level rarity (w = 1) caps at
  * vocabulary promiscuity, the same bound the BM25 df aggregation
  * already lives with.
  */
object Spans {

  /** (idCol, h, k, df) for each distinct (unit, doc): k = occurrences of
    * the unit in the doc, df = number of documents containing the unit. */
  private def unitDf(docs: DataFrame, idCol: String,
      units: DataFrame => DataFrame): DataFrame = {
    val perDocUnit = units(docs)
      .groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
    perDocUnit.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))))
  }

  /** Per-document duplicated-span profile: the fraction of a document's
    * w-gram positions whose shingle occurs in ≥ `minDf` documents.
    * Shingles are hashed ([[Hash64.hash60]] — portable, so the DuckDB
    * oracle computes identical buckets) to keep the shuffled key 8 bytes
    * instead of a ~7·w-char string; a 2⁻⁶⁰ collision marks one gram
    * duplicated, identically in both engines.
    *
    * Documents shorter than w tokens profile their whole text as one
    * shingle ([[NearDup.shingles]] semantics) — exact short-doc copies
    * still count; empty-text documents collapse to the empty shingle and
    * flag each other, which is the right verdict for a dedup signal.
    *
    * @return (idCol, n_grams, n_dup_grams, dup_frac) */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 13, minDf: Int = 2,
      hash: Column => Column = Hash64.hash60): DataFrame =
    unitDf(docs, idCol, d => d
        .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
        .select(col(idCol), explode(NearDup.shingles(col("__toks"), w)).as("g"))
        .select(col(idCol), hash(col("g")).as("h")))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_grams"),
        sum(when(col("df") >= minDf, col("k")).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))

  /** Corpus NOVELTY profile: the fraction of a document's w-gram
    * positions whose shingle first appears in THIS document, taking
    * `idCol` order as ingestion order. [[duplicatedSpans]] is
    * symmetric — both copies of a duplicated gram score "duplicated";
    * this is the directional version a growing corpus wants: the first
    * copy stays novel, every later copy pays. Late documents assembled
    * from earlier text (template farms, syndication, scraper loops)
    * score near 0 even when each individual source gram is rare enough
    * to dodge `minDf` thresholds.
    *
    * Same three-keyed-shuffle lineage as [[duplicatedSpans]] with the
    * df window swapped for a `min(idCol)` window; `novelty_micro` is
    * the [[graft.ops.Exact]] floor-micro rule (integer counts, one
    * correctly-rounded division).
    *
    * @return (idCol, n_grams, n_novel, novelty_micro) */
  def noveltyProfile(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 7, hash: Column => Column = Hash64.hash60): DataFrame = {
    val perDocUnit = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(NearDup.shingles(col("__toks"), w)).as("g"))
      .select(col(idCol), hash(col("g")).as("h"))
      .groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
    perDocUnit
      .withColumn("first_doc",
        min(col(idCol)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("h"))))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_grams"),
        sum(when(col("first_doc") === col(idCol), col("k")).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro",
        floor(col("n_novel").cast("double") * 1000000.0 /
          col("n_grams").cast("double")).cast("long"))
  }

  /** Duplicated-span EXTENT — [[duplicatedSpans]] reports how MUCH of a
    * document is duplicated; this reports how CONTIGUOUS it is: the
    * longest run of consecutive w-gram positions whose shingle occurs in
    * ≥ `minDf` documents. A run of r duplicated grams is a copied
    * substring of r + w − 1 tokens (each gram extends the span by one
    * token), so `max_run_tokens` approximates the longest duplicated
    * substring — the signal exact-substring dedup (suffix-array
    * pipelines) removes, computed with shuffle-friendly fixed-width
    * grams instead of a suffix array. A doc with dup_frac 0.3 spread as
    * noise and one with a verbatim 30% quote score the same in q73;
    * only this tells them apart.
    *
    * Plan: posexplode grams → hash (8-byte shuffle keys, oracle computes
    * identical buckets) → document frequency over distinct (gram, doc)
    * exactly as [[duplicatedSpans]] (window partitions bounded by df) →
    * join the per-position rows back on (gram, doc) — positions make the
    * join-back unavoidable; its key is the composite (h, doc), so
    * partitions stay hash-balanced even for boilerplate grams. The gram
    * frame persists across the two self-join arms (q24's shape and
    * caching contract — see the inline note). Then
    * gaps-and-islands per document: run ids by cumulative break-sum over
    * a (doc, pos) ROWS window (partition = one document's grams, the
    * same bound tokenization already imposes), ONE (doc, run, dup)
    * aggregation, ONE per-doc fold — no second corpus scan.
    *
    * @return (idCol, n_grams, n_runs, max_run_grams, max_run_tokens);
    *         docs with no duplicated gram report 0/0/0. Docs shorter
    *         than w tokens profile as one whole-text shingle
    *         ([[NearDup.shingles]] semantics), so their reported span
    *         (w tokens) overstates the true length — an upper bound,
    *         consistent in both engines. */
  def duplicatedSpanRuns(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 13, minDf: Int = 2,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // CACHING CONTRACT (the q24/q27 one): the gram frame feeds both
    // self-join arms; persist so tokenize→shingle→hash runs once, not
    // twice — measured 5.4 s → 1.9 s at sf0.1. clearCache between
    // invocations in long-lived sessions, as Bench/Verify do.
    val grams = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(NearDup.shingles(col("__toks"), w)))
      .select(col(idCol), col("pos"), hash(col("col")).as("h"))
      .persist()
    val dfs = grams.groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .select(col("h"), col(idCol), col("df"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(dfs, Seq("h", idCol))
      .withColumn("dup", col("df") >= minDf)
      .withColumn("brk",
        when(lag(col("dup"), 1).over(byDoc).isNull
          .or(lag(col("dup"), 1).over(byDoc) =!= col("dup")), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("grp"), col("dup"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col(idCol))
      .agg(sum(col("len")).as("n_grams"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_runs"),
        coalesce(max(when(col("dup"), col("len"))), lit(0L))
          .as("max_run_grams"))
      .withColumn("max_run_tokens",
        when(col("max_run_grams") > 0, col("max_run_grams") + lit(w.toLong - 1))
          .otherwise(0L))
  }

  /** Exact-substring dedup REMOVAL — the transform [[duplicatedSpanRuns]]
    * only *reports*: rewrite each document dropping every duplicated-span
    * run of at least `minRunGrams` consecutive duplicated w-gram
    * positions (a run of r grams covers r + w − 1 tokens), the
    * fixed-width-gram realization of suffix-array exact-substring dedup
    * (Lee et al. 2022's "deduplicate-text-datasets" transform — theirs
    * keys on ≥ 50-token verbatim spans; here `minRunGrams` plays that
    * role as minRunGrams + w − 1 tokens). Scattered duplicated grams in
    * runs SHORTER than `minRunGrams` are kept — boilerplate phrases are
    * not plagiarism; only contiguous verbatim mass is cut. The span is
    * removed from EVERY document containing it (the paper's ExactSubstr
    * semantics — a canonical copy, if wanted, is a dedup-cluster-rep
    * concern, [[NearDup]], not a span concern).
    *
    * Output text is reassembled from the SURVIVING tokens in original
    * order, space-joined — normalized-token text (lowercased, punctuation
    * stripped), the [[Segments.lineDedupDocs]] `kept_text` contract.
    * Whole-short-doc shingles ([[NearDup.shingles]] semantics, docs with
    * < w tokens) mean an exact short-doc copy removes ALL its tokens —
    * the right verdict for a verbatim duplicate.
    *
    * Plan: [[duplicatedSpanRuns]]'s island machinery (3 keyed shuffles,
    * persist shared across the two gram-frame arms) folded to per-doc
    * removal INTERVALS (bounded by run count, not tokens), then ONE
    * id-keyed join back to the token arrays and a per-row rewrite: each
    * token index checks the doc's interval list (`exists` over
    * run-count-bounded arrays — per-row, codegen'd, no further shuffle).
    *
    * @return (idCol, n_tokens, n_removed, kept_text); every input doc
    *         appears, untouched docs report n_removed = 0 */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 13, minDf: Int = 2, minRunGrams: Int = 1,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minRunGrams >= 1, s"minRunGrams must be >= 1, got $minRunGrams")
    val toks = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    // same caching contract as duplicatedSpanRuns: the gram frame feeds
    // the df aggregation and the position join-back
    val grams = toks
      .select(col(idCol), posexplode(NearDup.shingles(col("__toks"), w)))
      .select(col(idCol), col("pos"), hash(col("col")).as("h"))
      .persist()
    val dfs = grams.groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .select(col("h"), col(idCol), col("df"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val intervals = grams.join(dfs, Seq("h", idCol))
      .withColumn("dup", col("df") >= minDf)
      .withColumn("brk",
        when(lag(col("dup"), 1).over(byDoc).isNull
          .or(lag(col("dup"), 1).over(byDoc) =!= col("dup")), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("grp"), col("dup"))
      .agg(min(col("pos")).cast("long").as("s0"), count(lit(1)).as("len"))
      .filter(col("dup") && col("len") >= minRunGrams)
      // run [s0, s0+len) of grams covers tokens [s0, s0+len+w-2], 0-based
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s0").as("s"),
        (col("s0") + col("len") + lit(w.toLong - 2)).as("e"))).as("__iv"))
    val keptIdx = filter(
      when(size(col("__toks")) > 0,
        sequence(lit(0L), (size(col("__toks")) - 1).cast("long")))
        .otherwise(array().cast("array<long>")),
      i => !exists(col("__iv"),
        iv => i >= iv.getField("s") && i <= iv.getField("e")))
    toks.join(intervals, Seq(idCol), "left")
      .select(col(idCol), col("__toks"),
        coalesce(col("__iv"),
          array().cast("array<struct<s:long,e:long>>")).as("__iv"))
      .withColumn("__kept", keptIdx)
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        array_join(transform(col("__kept"),
          i => element_at(col("__toks"), (i + 1).cast("int"))), " ")
          .as("kept_text"))
  }

  /** Exact corpus vocabulary: the top `topN` tokens by total occurrence
    * count (deterministic tie-break: token ascending), with document
    * frequency — the exact companion to the CMS heavy-hitter sketch
    * ([[graft.ops.Sketches]]): sketch when the vocabulary doesn't fit,
    * this when you need the exact counts (tokenizer/vocab construction,
    * stopword induction, frequency-table exports).
    *
    * Plan: explode → map-side-combined (token, doc) pre-aggregation →
    * per-token aggregation → `orderBy(...).limit(topN)`, which Spark
    * plans as TakeOrderedAndProject — per-partition top-N then a driver
    * merge of N·partitions rows, NOT a single-partition global sort (the
    * round-2 top-k lesson; vocabulary cardinality at 100 TB is easily
    * 10⁸). The rank column is a row_number over the already-limited N
    * rows — a one-partition window over topN rows by construction.
    *
    * @param tokenizer pluggable unit extractor ([[TextAnalysis.tokens]]
    *        default — ASCII outputs byte-identical;
    *        [[TextAnalysis.unicodeTokens]] extends the vocabulary to
    *        the scripts the ASCII contract tokenizes to empty)
    * @return (rank, token, freq, df) */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topN: Int,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val perDoc = docs
      .select(col(idCol),
        explode(tokenizer(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("k"))
    val vocab = perDoc.groupBy(col("token"))
      .agg(sum(col("k")).as("freq"), count(lit(1)).as("df"))
    vocab.orderBy(col("freq").desc, col("token")).limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("token"))).cast("long"))
      .select(col("rank"), col("token"), col("freq"), col("df"))
  }

  /** Tokenizer application — corpus text to training-ready id streams:
    * every token becomes its [[vocabulary]] rank (1-based), out-of-vocab
    * tokens become 0 (the unk id). The step between "vocabulary trained"
    * (q78) and "sequences packed" (q67), in the long form (doc, pos, id)
    * the gate can hash (re-assemble with q83's sorted-struct collect
    * when an array column is wanted).
    *
    * Plan: the corpus side is ONE posexplode projection — never
    * shuffled; the vocab side is topN rows by construction, so the
    * left join broadcasts (AQE; topN beyond broadcast size would be a
    * sign topN is wrong, not the plan). OOV-rate monitoring falls out
    * as `avg(token_id = 0)` downstream.
    *
    * @return (idCol, pos, token_id) — one row per token occurrence */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      topN: Int,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val vocab = vocabulary(docs, idCol, textCol, topN, tokenizer)
      .select(col("token"), col("rank"))
    docs
      .select(col(idCol),
        posexplode(tokenizer(col(textCol))).as(Seq("pos", "token")))
      .join(vocab, Seq("token"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("rank"), lit(0L)).as("token_id"))
  }

  /** Corpus bigram counts, top-N by frequency — the inner loop of BPE
    * tokenizer training (count adjacent pairs, merge the argmax, repeat)
    * and the raw material of bigram language models. Pair construction
    * is a per-row `zip_with` over two shifted slices of the
    * ALREADY-MATERIALIZED token array (the round-4 shingle lesson:
    * lambdas must touch attributes, not expression subtrees), so the
    * corpus-sized stage is zero-shuffle; then one map-side-combined
    * count and a TakeOrdered top-N — [[vocabulary]]'s plan over pairs.
    * Rank ties break on the pair string, so "the merge to apply next"
    * (rank 1) is deterministic cross-engine.
    *
    * @return (rank, pair, freq) */
  def topBigrams(docs: DataFrame, idCol: String, textCol: String,
      topN: Int,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val pairs = zip_with(
      slice(col("__toks"), lit(1), n - 1),
      slice(col("__toks"), lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    docs
      .select(tokenizer(col(textCol)).as("__toks"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair")).limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("freq"))
  }

  /** Collocation mining: the top `topN` ordered token pairs co-occurring
    * within `window` positions, ranked by the log-free PMI ratio
    * c_ab / (c_a · c_b) — p(ab)/(p(a)p(b)) with the corpus-constant
    * factors dropped (they rescale every pair identically, so the
    * RANKING is textbook PMI; the log is omitted for the bm25 bit-parity
    * reason). [[topBigrams]] generalized from adjacency to a window:
    * "san francisco" is a bigram, "strong ~ tea" needs the window.
    *
    * `minCount` cuts hapax pairs BEFORE the unigram joins (a pair seen
    * once has PMI noise-high by construction — the standard floor), so
    * the joined frame is the filtered pair vocabulary, not the corpus.
    *
    * Plan: pair construction is `window−1` shifted-slice zip_withs over
    * the materialized token array (zero corpus shuffle, the q92 shape);
    * one map-side-combined pair count + one token count; two keyed
    * vocabulary-sized joins; TakeOrdered top-N. The ratio divides in
    * doubles — c_a·c_b in long arithmetic would wrap at corpus scale.
    *
    * @return (rank, a, b, c_ab, c_a, c_b, score) */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 3, minCount: Long = 2L, topN: Int = 20,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val toks = docs.select(tokenizer(col(textCol)).as("__toks"))
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    // greatest(n−j, 0): docs shorter than the shift yield empty slices,
    // not a negative slice length (error on Spark, from-the-END
    // semantics in DuckDB — both engines get the explicit 0)
    val pairCols = (1 until window).map { j =>
      zip_with(
        slice(col("__toks"), lit(1), greatest(n - j, lit(0))),
        slice(col("__toks"), lit(1 + j), greatest(n - j, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))
    }
    val pairs = toks.filter(n >= 2)
      .select(explode(flatten(array(pairCols: _*))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = toks.select(explode(col("__toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    pairs
      .join(uni.select(col("t").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), "b")
      .withColumn("score",
        col("c_ab").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")))
      .orderBy(col("score").desc, col("a"), col("b")).limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("a"), col("b"))).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("c_ab"),
        col("c_a"), col("c_b"), col("score"))
  }

  /** Corpus-relative token rarity — a log-free unigram-LM quality proxy
    * (the role KenLM perplexity plays in public pipeline recipes, minus
    * the external model): commonness = Σ_occurrences df(token) /
    * (n_tokens · n_docs) ∈ (0, 1], rarity = 1 − commonness. Every-doc
    * tokens pull commonness toward 1 (rarity 0); hapax-heavy gibberish
    * scores rarity ≈ 1 — filter BOTH tails. Integer-exact until the one
    * final division (sums of bigints are order-independent, so the score
    * is bit-reproducible and oracle-able; a Σlog formulation would be
    * neither — the BM25 idf lesson).
    *
    * @param tokenizer pluggable unit extractor ([[TextAnalysis.tokens]]
    *        default; [[TextAnalysis.unicodeTokens]] for multilingual)
    * @return (idCol, n_tokens, df_sum, rarity); token-free docs drop out */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val nDocs = docs.select(count(lit(1)).as("__n_docs")) // 1 row
    unitDf(docs, idCol, d => d
        .select(col(idCol),
          explode(tokenizer(col(textCol))).as("h")))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k") * col("df")).as("df_sum"))
      .crossJoin(broadcast(nDocs))
      .withColumn("rarity",
        lit(1.0) - col("df_sum").cast("double") /
          (col("n_tokens") * col("__n_docs")).cast("double"))
      .drop("__n_docs")
  }

  /** Bigram coherence — the word-ORDER companion to [[tokenRarity]]'s
    * unigram score: the corpus-frequency-weighted mean of a document's
    * adjacent-pair occurrences, normalized by total corpus bigram mass
    * to (0, 1]. Scrambled or word-salad text keeps its unigram profile
    * (q74 can't see it) but its bigrams are corpus-rare → coherence ≈ 0;
    * natural prose built from common collocations scores high. This is
    * the role a bigram LM plays in public pipeline recipes, kept log-free
    * so it stays integer-exact: collection frequencies are bigint sums
    * (order-independent → bit-reproducible and oracle-able), one final
    * division. The Σ k·cf accumulator needs cf·doc_len < 2⁶³ — beyond
    * ~10⁹-occurrence collocations route it DECIMAL(38,0) as
    * [[graft.ops.Exact.corrFromSums]] does.
    *
    * Plan: the [[tokenRarity]] 3-shuffle no-join shape over pairs —
    * zero-shuffle pair construction ([[topBigrams]]'s shifted-slice
    * zip_with), distinct-(pair, doc) aggregation, collection frequency
    * as a sum window over the pair key, per-doc fold; the one-row total
    * comes from a scan-side `size(tokens)` pass (no explode) and
    * broadcasts.
    *
    * @param tokenizer pluggable unit extractor ([[TextAnalysis.tokens]]
    *        default; [[TextAnalysis.unicodeTokens]] for multilingual)
    * @return (idCol, n_bigrams, cf_sum, coherence); docs with < 2 tokens
    *         have no bigrams and drop out */
  def bigramCoherence(docs: DataFrame, idCol: String, textCol: String,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      tokenizer(col(textCol)).as("__toks"))
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val pairs = toks.filter(n >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__toks"), lit(1), n - 1),
        slice(col("__toks"), lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b))).as("h"))
    val total = toks
      .select(greatest(n.cast("long") - 1L, lit(0L)).as("__np"))
      .agg(sum(col("__np")).as("__total")) // 1 row
    pairs.groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
      .withColumn("cf", sum(col("k")).over(Window.partitionBy(col("h"))))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("cf")).as("cf_sum"))
      .crossJoin(broadcast(total))
      // denominator multiplies AFTER the double casts: n_bigrams·total
      // in long arithmetic wraps past 2⁶³ (a 10⁶-bigram doc in a 10¹³-
      // bigram corpus), and the oracle's HUGEINT would not — doubles
      // lose ulps instead of flipping sign, identically on both engines
      .withColumn("coherence",
        col("cf_sum").cast("double") /
          (col("n_bigrams").cast("double") * col("__total").cast("double")))
      .drop("__total")
  }

  /** Per-group n-gram DIVERSITY profile — the mode-collapse detector for
    * synthetic / model-generated text. Two complementary signals over a
    * group's pooled w-gram stream:
    *
    *  - `distinct_ratio` = distinct grams / gram positions (type–token
    *    ratio at gram granularity; Self-BLEU's cheap exact cousin):
    *    collapsed generators re-emit the same phrasings, so the ratio
    *    falls far below organic text's;
    *  - `topk_share` = mass of the group's `topK` most frequent grams:
    *    template-driven sources concentrate probability on a few grams
    *    even when the long tail keeps the distinct ratio up.
    *
    * Per-doc repetition (q54) can't see CROSS-document collapse — a
    * generator that never repeats within a doc but reuses phrasings
    * across docs profiles clean there and lights up here.
    *
    * Scale shape: grams are hashed to 8-byte keys; ONE (group, gram)
    * count aggregation feeds both signals. The top-k is found by
    * two-phase bounded rank — a window over (group, salt) partitions
    * keeps ≤ topK rows per salt, then a window over the ≤ 64·topK
    * survivors per group — never a corpus-wide sort within one group
    * partition (the per-key-cap lesson: a single mega-group would
    * otherwise serialize on one task). Ties break by gram hash, so the
    * k-th-place cut is total and engine-portable.
    *
    * @return (groupCol, n_grams, n_distinct_grams, topk_grams,
    *         distinct_ratio, topk_share) */
  def ngramDiversity(docs: DataFrame, groupCol: String, textCol: String,
      w: Int = 3, topK: Int = 10,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1)
    val counts = docs
      .select(col(groupCol).as("g"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("g"), explode(NearDup.shingles(col("__toks"), w)).as("u"))
      .select(col("g"), hash(col("u")).as("h"))
      .groupBy(col("g"), col("h")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("g"))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"))
    val partial = counts
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("g"), pmod(col("h"), lit(64)))
        .orderBy(col("c").desc, col("h"))))
      .filter(col("rn") <= topK)
    val top = partial
      .withColumn("rn2", row_number().over(Window
        .partitionBy(col("g")).orderBy(col("c").desc, col("h"))))
      .filter(col("rn2") <= topK)
      .groupBy(col("g")).agg(sum(col("c")).as("topk_grams"))
    totals.join(top, Seq("g"))
      .select(col("g").as(groupCol), col("n_grams"),
        col("n_distinct_grams"), col("topk_grams"),
        (col("n_distinct_grams").cast("double") /
          col("n_grams").cast("double")).as("distinct_ratio"),
        (col("topk_grams").cast("double") /
          col("n_grams").cast("double")).as("topk_share"))
  }

  /** Per-group Zipf decay slope: least-squares fit of bit-length
    * log-frequency against bit-length log-rank over the group's top
    * `topR` token ranks — the corpus-health scalar that separates
    * natural language (slope ≈ −1 in true logs) from template spam
    * (flat head, slope ≈ 0) and near-constant streams (cliff). Bit-length
    * quantization (blog(x) = ⌊log2 x⌋+1, the [[graft.text.LangModel]]
    * idiom) keeps x, y and all five regression sums exact integers; the
    * slope `(n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)` is one fixed IEEE
    * division. A quantized-log fit is coarser than a real lm() — but
    * engine-exact, and the ordering across sources (what the health
    * dashboard compares) is preserved.
    *
    * Ranks come from the q152 two-phase bounded rank (salted partials,
    * then ≤64·topR survivors rank globally per group) — never a corpus
    * sort inside one group. Ties break (freq desc, token asc), total and
    * portable.
    *
    * @return (groupCol, n_ranks, sum_x, sum_y, sum_xx, sum_xy, slope)
    */
  def zipfSlope(docs: DataFrame, groupCol: String, textCol: String,
      topR: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topR >= 2, s"need >= 2 ranks to fit, got $topR")
    val blog = (x: Column) => length(bin(x)).cast("long")
    val counts = docs
      .select(col(groupCol).as("g"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("c"))
    val partial = counts
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("g"), pmod(hash(col("token")), lit(64)))
        .orderBy(col("c").desc, col("token"))))
      .filter(col("rn") <= topR)
    val ranked = partial
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("g")).orderBy(col("c").desc, col("token")))
        .cast("long"))
      .filter(col("rank") <= topR)
      .select(col("g"), blog(col("rank")).as("x"), blog(col("c")).as("y"))
    ranked.groupBy(col("g"))
      .agg(count(lit(1)).as("n_ranks"),
        sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"))
      .withColumn("slope",
        when(col("n_ranks") * col("sum_xx") - col("sum_x") * col("sum_x") > 0,
          (col("n_ranks") * col("sum_xy") - col("sum_x") * col("sum_y"))
            .cast("double") /
          (col("n_ranks") * col("sum_xx") - col("sum_x") * col("sum_x"))
            .cast("double")))
      .select(col("g").as(groupCol), col("n_ranks"), col("sum_x"),
        col("sum_y"), col("sum_xx"), col("sum_xy"), col("slope"))
  }

  /** DuckDB oracle for [[zipfSlope]]: same ranks by a plain window (the
    * two-phase form is a Spark-side scale tactic; the winners are
    * identical). `toksSql` must mirror [[TextAnalysis.tokens]]. */
  def zipfSlopeOracleSql(table: String, groupCol: String, toksSql: String,
      topR: Int = 64): String =
    s"""WITH tok AS (
       |  SELECT $groupCol AS g, unnest($toksSql) AS token FROM $table
       |), c AS (
       |  SELECT g, token, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2
       |), r AS (
       |  SELECT g, c, CAST(row_number() OVER (PARTITION BY g
       |           ORDER BY c DESC, token) AS BIGINT) AS rank
       |  FROM c QUALIFY rank <= $topR
       |), xy AS (
       |  SELECT g, CAST(length(bin(rank)) AS BIGINT) AS x,
       |         CAST(length(bin(c)) AS BIGINT) AS y
       |  FROM r
       |), s AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_ranks,
       |         CAST(sum(x) AS BIGINT) AS sum_x,
       |         CAST(sum(y) AS BIGINT) AS sum_y,
       |         CAST(sum(x * x) AS BIGINT) AS sum_xx,
       |         CAST(sum(x * y) AS BIGINT) AS sum_xy
       |  FROM xy GROUP BY 1
       |)
       |SELECT g AS $groupCol, n_ranks, sum_x, sum_y, sum_xx, sum_xy,
       |       CASE WHEN n_ranks * sum_xx - sum_x * sum_x > 0 THEN
       |         CAST(n_ranks * sum_xy - sum_x * sum_y AS DOUBLE)
       |           / CAST(n_ranks * sum_xx - sum_x * sum_x AS DOUBLE)
       |       END AS slope
       |FROM s""".stripMargin
}
