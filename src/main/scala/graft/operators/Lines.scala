package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-document LINE-level exact dedup — the C4 / RefinedWeb curation
 * rule: a line (trimmed, non-blank) that occurs in several documents is
 * kept only at its FIRST corpus occurrence and dropped everywhere else
 * (boilerplate — nav bars, cookie banners, license headers — repeats
 * verbatim across pages; dropping repeats at line granularity removes it
 * without killing the host documents the way doc-level dedup would).
 * Extension tier: the reference has no text curation (SURVEY.md §2).
 *
 * "First occurrence" is the minimum of the (docId, lineNo) pair, encoded
 * as one BIGINT `docId * 2^20 + lineNo` so the tie-break is a plain
 * integer `min` — a partial-aggregable (map-side combining) shuffle on the
 * line text, never a window. Survivors come back via a LEFT SEMI join on
 * the encoded position — (docId, lineNo) is unique, so no pair-dedup pass
 * is needed. Scale shape: explode → partial-agg min → semi join; every
 * stage shuffles on line/position keys, nothing touches the driver.
 * (At 100 TB the groupBy key would be a 128-bit line hash rather than the
 * line text to thin the shuffle; the text key keeps the operator exact,
 * which is what the oracle certifies.)
 */
object Lines {

  private val Shift = 1048576L // 2^20 — max lines per document

  /** One row per SURVIVING line: (idCol, line_no, line). `line_no` is the
    * 0-based position among the document's raw split lines (blank lines
    * keep their slots, so positions are stable under the blank filter). */
  def dedupLines(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "raw")))
      .select(col(idCol), col("line_no").cast("long").as("line_no"),
        // whitespace-trim with the explicit class (plain trim is
        // space-only in BOTH engines; \n can't occur post-split) —
        // spelled out because Java \s and RE2 \s disagree on U+000B
        regexp_replace(col("raw"),
          "^[ \t\u000B\f\r]+|[ \t\u000B\f\r]+$", "").as("line"))
      .filter(length(col("line")) > 0)
    val enc = col(idCol) * Shift + col("line_no")
    val first = lines
      .groupBy("line").agg(min(enc).as("enc"))
      .select(col("line"), col("enc"))
    lines.join(first,
        lines("line") === first("line") && enc === first("enc"), "left_semi")
  }
}
