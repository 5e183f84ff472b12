package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint: known polynomial-hash values, stable") {
    // "ab" → ((0*31+97)*31+98) % 1e9+7 = 3105
    val got = Seq("ab", "ab", "ba", "").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).collect()
    assert(got(0).getLong(0) === 3105L)
    assert(got(0).getLong(0) === got(1).getLong(0))
    assert(got(2).getLong(0) !== got(0).getLong(0)) // order-sensitive
    assert(got(3).getLong(0) === 0L)
  }

  test("language ID picks marker-majority language, und fallback, zh by codepoint") {
    val got = Seq(
      "the cat and the dog is here",
      "el gato de la casa que ves",
      "le chat et les chiens",
      "der hund und die katze nicht",
      "你好世界",
      "zzz qqq www").toDF("text")
      .select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "es", "fr", "de", "zh", "und"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("Hello, world! 42 times.").toDF("text").select(
      TextAnalysis.wsTokenCount($"text"),
      TextAnalysis.bpeishTokenCount($"text")).collect().head
    assert(r.getInt(0) === 4)
    // Hello , world ! 42 times . → 7
    assert(r.getInt(1) === 7)
  }

  test("BpeishRe control-char law: ASCII whitespace incl. \\x0B is a " +
    "separator, never a token — the explicit class both regex " +
    "dialects read identically") {
    // U+000B vertical tab is whitespace to Java's \s but punctuation to
    // RE2's; BpeishRe spells the class out so BOTH engines exclude it.
    // Every ASCII whitespace char must separate (ab<ws>cd → 2 tokens),
    // and none may surface as a punctuation token.
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val texts = wsChars.map(c => s"ab${c}cd")
    val counts = texts.toDF("text")
      .select(TextAnalysis.bpeishTokenCount($"text")).collect()
      .map(_.getInt(0)).toSeq
    assert(counts === Seq.fill(wsChars.size)(2),
      "each ASCII whitespace char must split into exactly 2 letter runs")
    val toks = texts.toDF("text")
      .select(explode(regexp_extract_all($"text",
        lit(TextAnalysis.BpeishRe), lit(0))).as("t"))
      .collect().map(_.getString(0)).toSet
    assert(toks === Set("ab", "cd"), "no whitespace char may be a token")
    // non-ASCII whitespace (NBSP) stays a punct token in BOTH dialects —
    // unchanged from the \s law (Java \s is ASCII-only too)
    val nbsp = Seq("ab\u00A0cd").toDF("text")
      .select(TextAnalysis.bpeishTokenCount($"text")).collect().head.getInt(0)
    assert(nbsp === 3)
    // the SPLIT laws (ws token count, shingles) read the same explicit
    // class \u2014 round-10 adversarial parity: '\s+' splits diverged
    // cross-engine on \x0B for 7 ops until spelled out
    val splits = texts.toDF("text")
      .select(TextAnalysis.wsTokenCount($"text")).collect()
      .map(_.getInt(0)).toSeq
    assert(splits === Seq.fill(wsChars.size)(2),
      "ws split must treat each ASCII whitespace char as a separator")
    val sh = Seq("a b" + "\u000B" + "c d").toDF("text")
      .select(TextAnalysis.wordShingles($"text", 3)).collect()
      .head.getSeq[String](0).toSet
    assert(sh === Set("a b c", "b c d"),
      "shingling must split on vertical tab like any whitespace")
  }

  test("wordShingles: distinct k-grams, short-text fallback") {
    val r = Seq("a b c d", "x y").toDF("text")
      .select(TextAnalysis.wordShingles($"text", 3)).collect()
    assert(r(0).getSeq[String](0).toSet === Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0).toSeq === Seq("x y"))
  }

  test("asciiLower: folds exactly [A-Z], leaves every dialect-sensitive " +
    "codepoint alone (final sigma, dotted I, sharp s)") {
    val r = Seq("MIXED case 123",
        "ΙΣΟΣ ΟΔΟΣ",      // Java lower() would final-sigma the last Σ
        "İstanbul I",      // Java lower() expands İ to i + U+0307
        "STRASSE ẞ ß Ü")
      .toDF("text").select(TextAnalysis.asciiLower($"text"))
      .collect().map(_.getString(0))
    assert(r(0) === "mixed case 123")
    // non-ASCII untouched — the whole point: both engines agree on
    // translate, while lower() diverges (full vs simple casing)
    assert(r(1) === "ΙΣΟΣ ΟΔΟΣ")
    assert(r(2) === "İstanbul i")
    assert(r(3) === "strasse ẞ ß Ü")
    // code-point count is preserved (translate is 1:1; Java's full
    // lowercase of İ would add a combining dot)
    assert(r(2).codePointCount(0, r(2).length) === 10)
  }

  test("punctRatio and stopwordCount") {
    val r = Seq("the end.").toDF("text").select(
      TextAnalysis.punctRatio($"text"),
      TextAnalysis.stopwordCount($"text", TextAnalysis.EnglishStopwords))
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0 / 8) < 1e-12)
    assert(r.getInt(1) === 1)
  }
}
