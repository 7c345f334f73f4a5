package graft

import org.apache.spark.sql.functions._

import graft.text.{Gopher, TextAnalysis}

/** Pins the [[TextAnalysis.unicodeTokens]] portability contract on the
  * multilingual fixture slice: exact token lists per script family
  * (hand-derived; the q388–q391 oracles re-prove them against DuckDB's
  * RE2 at both SFs), ASCII-only case folding, NFD-mark cohesion, and
  * the non-empty-profile gate the round-9 verdict names.
  */
class MultilingualSpec extends SparkSuite {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextAnalysis.unicodeTokens(col("text")).as("t"))
      .head().getSeq[String](0)

  test("unicodeTokens: accented Latin keeps accents, ASCII case folds") {
    assert(toks("Le café est déjà prêt — très naturellement, señor.") ==
      Seq("le", "café", "est", "déjà", "prêt", "très", "naturellement",
        "señor"))
    assert(toks("Die Straße zur größten Müllhalde wurde über Nacht geändert.") ==
      Seq("die", "straße", "zur", "größten", "müllhalde", "wurde",
        "über", "nacht", "geändert"))
  }

  test("unicodeTokens: non-ASCII capitals keep case (the ASCII-fold contract)") {
    assert(toks("Это пример русского текста для проверки дедупликации.") ==
      Seq("Это", "пример", "русского", "текста", "для", "проверки",
        "дедупликации"))
    assert(toks("Αυτό είναι ένα παράδειγμα ελληνικού κειμένου.") ==
      Seq("Αυτό", "είναι", "ένα", "παράδειγμα", "ελληνικού", "κειμένου"))
    // fully-uppercase accented Latin: ASCII letters fold, accented stay
    assert(toks("CAFÉ NOTES") == Seq("cafÉ", "notes"))
  }

  test("unicodeTokens: CJK comes out as letter-runs (documented contract)") {
    assert(toks("这是一个用于测试近似重复检测的较长中文示例文档内容，欢迎各位进行检查。") ==
      Seq("这是一个用于测试近似重复检测的较长中文示例文档内容", "欢迎各位进行检查"))
    assert(toks("mixed ascii and ユニコード text with 日本語 tokens") ==
      Seq("mixed", "ascii", "and", "ユニコード", "text", "with",
        "日本語", "tokens"))
  }

  test("unicodeTokens: NFD combining marks do not split a word") {
    // "cafe" + U+0301 (combining acute): \p{M} keeps the run whole
    val nfd = "cafe\u0301 au lait"
    assert(toks(nfd) == Seq("cafe\u0301", "au", "lait"))
  }

  test("unicodeTokens: digits are token chars; punctuation separates") {
    assert(toks("hello,  WORLD 42x!") == Seq("hello", "world", "42x"))
    assert(toks("") == Seq.empty)
    assert(toks("—…!?") == Seq.empty)
  }

  test("gopher unicode gate: every fixture doc profiles non-empty") {
    val fixture = graft.queries.TextDedup.multilingualPlanted
      .toDF("doc_id", "text")
    val prof = Gopher.ruleGates(fixture, "doc_id", "text",
        minTokens = 5L, tokenizer = TextAnalysis.unicodeTokens,
        punctRe = Gopher.unicodePunctRe)
      .select(col("doc_id"), col("n_tokens"), col("n_punct"),
        col("n_chars"))
      .collect()
    assert(prof.length == 8)
    assert(prof.forall(_.getLong(1) > 0), "every doc must tokenize")
    // the unicode punct class must NOT count non-ASCII letters:
    // each one-sentence doc has at most a few true punctuation chars
    prof.foreach { r =>
      assert(r.getLong(2) * 5 <= r.getLong(3),
        s"doc ${r.getLong(0)}: n_punct ${r.getLong(2)} vs n_chars ${r.getLong(3)}")
    }
  }

  test("native #11 unicode_token_stats == array form == SQL route, astral included") {
    import graft.functions.UnicodeTokenStats
    val cases = graft.queries.TextDedup.multilingualPlanted.map(_._2) ++ Seq(
      "", "   ", "—…!?", "hello world 42",
      "café au lait", // NFD combining mark joins its run
      "emoji 😀 splits letters", // astral non-letter separates
      "𝐀𝐁 math letters", // astral \p{L} (MATHEMATICAL A/B)
      "ｆｕｌｌｗｉｄｔｈ １２３")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val arrayForm = df.select(col("id"),
      size(TextAnalysis.unicodeTokens(col("text"))).cast("long").as("n"),
      aggregate(transform(TextAnalysis.unicodeTokens(col("text")),
        t => length(t).cast("long")), lit(0L), (a, x) => a + x).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = df.select(col("id"),
      UnicodeTokenStats.unicodeTokenStats(col("text")).as("st"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).head, r.getSeq[Long](1)(1))).toMap
    assert(native == arrayForm)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("uts_spec")
    val sqlRoute = spark.sql(
      "SELECT id, unicode_token_stats(text) AS st FROM uts_spec")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).head, r.getSeq[Long](1)(1))).toMap
    assert(sqlRoute == arrayForm)
    // spot hand-derivations: the math-letter astral pair is 1 token of
    // 2 code points + "math"/"letters"; fullwidth digits are \p{N}
    val astral = native(cases.indexOf("𝐀𝐁 math letters").toLong)
    assert(astral == (3L, 13L))
    assert(native(cases.indexOf("ｆｕｌｌｗｉｄｔｈ １２３").toLong) == (2L, 12L))
  }

  test("ascii tokens on the fixture stay boundary soup (contract unchanged)") {
    // the pre-existing ASCII contract is untouched: Cyrillic doc -> empty
    val t = Seq("Это пример русского текста").toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(t.isEmpty)
  }
}
