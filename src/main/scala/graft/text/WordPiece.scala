package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer surface (Wu et al. 2016; the BERT tokenizer):
  * greedy LONGEST-MATCH-FIRST segmentation of each word against a
  * vocabulary that distinguishes word-initial pieces from continuation
  * pieces (the `##` prefix) — the third real tokenizer family next to
  * [[Bpe]] (merge-rank replay) and [[Unigram]] (global Viterbi).
  * Greedy-longest is neither: it commits to the longest in-vocabulary
  * prefix at each position and never reconsiders, which is exactly why
  * it is O(word) at encode time and why BERT shipped it. Reference
  * analogue: none — LLM-pipeline surface.
  *
  * Vocabulary: substring frequencies counted POSITION-AWARE over the
  * distinct-word table (an occurrence at word start counts the raw
  * piece, an interior occurrence counts `##piece`), every raw-length-1
  * piece force-included in both namespaces it occurs in (the
  * [[Bpe.charSymbols]] closed-alphabet role: a corpus-trained vocabulary
  * has no OOV path for corpus words), top-N raw-length-≥2 pieces by
  * (freq desc, piece asc). The `[UNK]` path still exists — a word with
  * a character the vocabulary has never seen collapses to `[UNK]`
  * whole (the BERT convention) — and is exercised by spec with an
  * explicit vocabulary.
  *
  * Scale contract: training = one explode-substrings aggregation priced
  * by distinct words × maxWordLen·maxPieceLen (vocabulary-scale, not
  * corpus-scale) + a two-phase top-N. Segmentation = a pure per-row
  * fold over the distinct-word table with the vocabulary as a LITERAL
  * presence map (the [[Bpe]] merge-table / [[Unigram]] piece-map
  * contract) — the one shuffle is the word-frequency aggregation; at
  * 100 TB one trains on a sample and encodes the full corpus through
  * the same distinct-word join [[Unigram.encodeDocs]] uses.
  *
  * Words longer than `maxWordLen` are excluded (documented cap — the
  * oracle unrolls one greedy step per character position).
  */
object WordPiece {

  /** Lookup key at (1-based) position `pos`, length `j`: raw at word
    * start, `##`-prefixed inside. */
  private def keyAt(w: Column, pos: Column, j: Column): Column =
    when(pos === 1, w.substr(pos, j))
      .otherwise(concat(lit("##"), w.substr(pos, j)))

  /** Train the WordPiece vocabulary: position-aware substring
    * frequencies over the distinct-word table; all raw-length-1 pieces
    * plus the `topN` most frequent raw-length-≥2 pieces.
    *
    * @return (piece, freq) — `piece` carries the `##` marker */
  def trainVocab(docs: DataFrame, idCol: String, textCol: String,
      topN: Int, maxPieceLen: Int = 6, maxWordLen: Int = 16): DataFrame = {
    require(topN >= 1 && maxPieceLen >= 2 && maxWordLen >= maxPieceLen)
    val freqs = Unigram.wordFreq(docs, idCol, textCol, maxWordLen)
      .select(col("n"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i + 1)),
          l => when(i === 1, col("word").substr(i, l))
            .otherwise(concat(lit("##"), col("word").substr(i, l)))))))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("freq"))
    val rawLen = length(col("piece")) -
      when(col("piece").startsWith("##"), 2).otherwise(0)
    val singles = freqs.filter(rawLen === 1)
    val multis = freqs.filter(rawLen >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(topN)
    singles.unionAll(multis)
  }

  /** [[trainVocab]] collected to the literal vocabulary the greedy
    * stage embeds — contract-bounded (≤ topN + 2·|alphabet| rows). */
  def collectVocab(vocab: DataFrame): Seq[String] =
    vocab.select(col("piece")).collect().map(_.getString(0)).toSeq.sorted

  /** Greedy longest-match fold over one word: iterate character
    * positions 1..len carrying (pos, pieces, unk); a step acts only
    * when it lands ON the current position (positions advance by the
    * matched length, so every active position is visited exactly once),
    * matching the longest `j ≤ maxPieceLen` whose keyed piece is in the
    * vocabulary. No match at an active position → the whole word is
    * `[UNK]` (the BERT convention). */
  private def greedyExpr(w: Column, vocabMap: Column,
      maxPieceLen: Int): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("pos"),
        array().cast("array<string>").as("ps"), lit(false).as("unk")),
      (acc, k) => {
        val pos = acc.getField("pos")
        val jstar = array_max(filter(
          array((1 to maxPieceLen).map { j =>
            when(pos + (j - 1) <= length(w) &&
              element_at(vocabMap, keyAt(w, pos, lit(j))).isNotNull,
              lit(j))
          }: _*), x => x.isNotNull))
        when(!acc.getField("unk") && k === pos,
          when(jstar.isNotNull,
            struct((pos + jstar).as("pos"),
              concat(acc.getField("ps"),
                array(keyAt(w, pos, jstar))).as("ps"),
              lit(false).as("unk")))
            .otherwise(struct(pos.as("pos"),
              acc.getField("ps").as("ps"), lit(true).as("unk"))))
          .otherwise(acc)
      })

  /** Greedy WordPiece segmentation of the corpus's distinct words
    * against a literal vocabulary.
    *
    * @param vocab [[collectVocab]] output (pieces with `##` markers)
    * @return (word, n, n_pieces, pieces) — `pieces` space-joined with
    *         continuation markers kept (`unable` → `un ##able`);
    *         unmatched words read (word, n, 1, "[UNK]") */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxPieceLen: Int = 6,
      maxWordLen: Int = 16): DataFrame = {
    require(vocab.nonEmpty)
    val vocabMap = map(vocab.flatMap(p => Seq(lit(p), lit(1))): _*)
    Unigram.wordFreq(docs, idCol, textCol, maxWordLen)
      .withColumn("__g",
        greedyExpr(col("word"), vocabMap, maxPieceLen))
      .select(col("word"), col("n"),
        when(col("__g").getField("unk"), lit(1L))
          .otherwise(size(col("__g").getField("ps")).cast("long"))
          .as("n_pieces"),
        when(col("__g").getField("unk"), lit("[UNK]"))
          .otherwise(array_join(col("__g").getField("ps"), " "))
          .as("pieces"))
  }

  // ---------------------------------------------------------------- SQL

  /** Shared DuckDB CTE chain ending in `wp_vocab(piece)` and
    * `wds(word, n)` — the [[trainVocab]] replay; `toksSql` is the
    * tokenizer fragment over `table`. */
  def vocabCtes(table: String, toksSql: String, topN: Int,
      maxPieceLen: Int, maxWordLen: Int): String =
    s"""wds AS MATERIALIZED (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest($toksSql) AS tok FROM $table)
       |  WHERE len(tok) <= $maxWordLen GROUP BY 1
       |), wsi AS (
       |  SELECT word, n, unnest(generate_series(1, len(word))) AS i FROM wds
       |), wsl AS (
       |  SELECT word, n, i,
       |         unnest(generate_series(1,
       |           least($maxPieceLen, len(word) - i + 1))) AS l
       |  FROM wsi
       |), wpf AS (
       |  SELECT CASE WHEN i = 1 THEN substr(word, i, l)
       |              ELSE '##' || substr(word, i, l) END AS piece,
       |         CAST(sum(n) AS BIGINT) AS freq
       |  FROM wsl GROUP BY 1
       |), wp_vocab AS MATERIALIZED (
       |  SELECT piece FROM wpf
       |  WHERE len(piece) - CASE WHEN piece LIKE '##%' THEN 2 ELSE 0 END = 1
       |  UNION ALL
       |  SELECT piece FROM (
       |    SELECT piece FROM wpf
       |    WHERE len(piece) - CASE WHEN piece LIKE '##%' THEN 2 ELSE 0 END >= 2
       |    ORDER BY freq DESC, piece LIMIT $topN)
       |)""".stripMargin

  /** The greedy fold unrolled one CTE pair per character position:
    * step s computes the longest vocabulary match at the current
    * position (a COALESCE over length-descending correlated lookups —
    * the [[Unigram]] dpCtes idiom), emits it as `ps$s`, advances, and
    * latches `unk` on an active-position miss. */
  private def greedyCtes(maxPieceLen: Int, maxWordLen: Int): String =
    (1 to maxWordLen).map { s =>
      val cands = (maxPieceLen to 1 by -1).map { j =>
        s"""CASE WHEN pos + ${j - 1} <= len(word) AND EXISTS (
           |             SELECT 1 FROM wp_vocab v WHERE v.piece =
           |               CASE WHEN pos = 1 THEN substr(word, pos, $j)
           |                    ELSE '##' || substr(word, pos, $j) END)
           |           THEN $j END""".stripMargin
      }.mkString(",\n           ")
      s"""ge$s AS (
         |  SELECT *,
         |         (pos <= len(word) AND NOT unk) AS act$s,
         |         coalesce(
         |           $cands) AS js$s
         |  FROM gd${s - 1}
         |), gd$s AS (
         |  SELECT * EXCLUDE (pos, unk, act$s, js$s),
         |         CASE WHEN act$s AND js$s IS NOT NULL THEN
         |           CASE WHEN pos = 1 THEN substr(word, pos, js$s)
         |                ELSE '##' || substr(word, pos, js$s) END
         |         END AS ps$s,
         |         CASE WHEN act$s AND js$s IS NOT NULL THEN pos + js$s
         |              ELSE pos END AS pos,
         |         (unk OR (act$s AND js$s IS NULL)) AS unk
         |  FROM ge$s
         |)""".stripMargin
    }.mkString(", ")

  /** DuckDB oracle for [[segment]] with the vocabulary replayed from
    * the same corpus. */
  def segmentOracleSql(table: String, toksSql: String, topN: Int,
      maxPieceLen: Int = 6, maxWordLen: Int = 16): String = {
    val pieceList = (1 to maxWordLen).map(s => s"ps$s").mkString(", ")
    s"""WITH ${vocabCtes(table, toksSql, topN, maxPieceLen, maxWordLen)},
       |gd0 AS (SELECT word, n, 1 AS pos, false AS unk FROM wds),
       |${greedyCtes(maxPieceLen, maxWordLen)}
       |SELECT word, n,
       |       CAST(CASE WHEN unk THEN 1
       |            ELSE len(list_filter([$pieceList], x -> x IS NOT NULL))
       |            END AS BIGINT) AS n_pieces,
       |       CASE WHEN unk THEN '[UNK]'
       |            ELSE array_to_string(
       |              list_filter([$pieceList], x -> x IS NOT NULL), ' ')
       |            END AS pieces
       |FROM gd$maxWordLen""".stripMargin
  }
}
