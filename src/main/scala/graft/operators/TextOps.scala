package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis._

/** Text-analysis operators over the `documents` table (north-star
  * extensions, SURVEY §7.4): quality scoring, language ID, token
  * counting, fingerprinting. All per-row expression work — zero
  * shuffles except the caller's aggregation, so these scale linearly
  * with input bytes at 100 TB.
  */
object TextOps {

  /** Quality scoring: whitespace + BPE-ish token counts, punctuation
    * ratio, stopword hits, and a pass/fail gate — the standard cheap
    * pre-filter before expensive LLM-data processing. */
  val textQuality: Op = Op(
    "q_text_quality",
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpeish_tokens,
      |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
      |    / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
      |  len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\ba\b'))
      |    + len(regexp_extract_all(text, '\bof\b')) + len(regexp_extract_all(text, '\band\b'))
      |    + len(regexp_extract_all(text, '\bto\b')) + len(regexp_extract_all(text, '\bin\b'))
      |    + len(regexp_extract_all(text, '\bis\b')) AS stop_hits,
      |  (len(string_split_regex(trim(text), '\s+')) >= 5
      |    AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
      |        / CAST(greatest(length(text), 1) AS DOUBLE) < 0.2) AS quality_pass
      |FROM documents""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
    val nWs = wsTokenCount(col("text"))
    val pr = punctRatio(col("text"))
    d.select(col("doc_id"),
      nWs.as("n_ws_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish_tokens"),
      pr.as("punct_ratio"),
      stopwordCount(col("text"), EnglishStopwords).as("stop_hits"),
      (nWs >= 5 && pr < 0.2).as("quality_pass"))
  }

  /** Language ID via function-word markers + CJK codepoint class,
    * argmax with fixed tie order (en,es,fr,de), 'und' fallback. */
  val langIdOp: Op = Op(
    "q_lang_id", {
      def hits(ws: Seq[String]) = ws
        .map(w => s"len(regexp_extract_all(text, '\\b$w\\b'))").mkString(" + ")
      val scores = LangMarkers
        .map { case (l, ws) => s"${hits(ws)} AS s_$l" }.mkString(",\n      ")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |      $scores,
         |      len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh
         |  FROM documents
         |), g AS (SELECT *, greatest(s_en, s_es, s_fr, s_de) AS best FROM scored)
         |SELECT doc_id, lang,
         |  CASE WHEN s_zh > 0 THEN 'zh'
         |       WHEN s_en = best AND s_en > 0 THEN 'en'
         |       WHEN s_es = best AND s_es > 0 THEN 'es'
         |       WHEN s_fr = best AND s_fr > 0 THEN 'fr'
         |       WHEN s_de = best AND s_de > 0 THEN 'de'
         |       ELSE 'und' END AS lang_pred
         |FROM g""".stripMargin
    }) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), langId(col("text")).as("lang_pred"))
  }

  /** Deterministic rolling-hash fingerprint per document (integer-only
    * polynomial hash — bit-identical across engines). */
  val docFingerprint: Op = Op(
    "q_doc_fingerprint",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      |FROM documents""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
  }
}
