package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-based redaction (PII scrubbing) — the curation stage that
  * masks sensitive spans (ids, emails, phone numbers) before a corpus
  * is released or trained on. The reference engine has no analog; this
  * is part of the training-data-pipeline surface (SURVEY.md §2.11).
  *
  * Patterns are applied IN ORDER, each to the output of the previous
  * one, so counts are well-defined under overlap (an email's digits are
  * counted as email, not as a number, iff the email pattern runs
  * first). Per-pattern match counts come from `regexp_extract_all`
  * BEFORE that pattern's replacement — same text, same engine-anchored
  * left-to-right non-overlapping match walk Java and RE2 share, so the
  * counts and the redacted text reproduce bit-identically on the
  * oracle. Patterns must stay inside the RE2-compatible subset (no
  * backreferences, no lookaround) for that portability contract.
  *
  * Scale: narrow per-row map, no shuffle, codegen'd end to end —
  * redaction cost is O(bytes scanned × patterns) and embarrassingly
  * parallel.
  */
object Scrub {

  /** A redaction rule: (name, regex, replacement). */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default curation ruleset: emails first (so their digits are not
    * double-counted), then standalone digit runs.
    */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    Rule("num", "[0-9]+", "<NUM>"))

  /** Redact `textCol` with `rules`, keeping `idCols` and emitting one
    * `n_<rule>` count per rule plus the final `redacted` text.
    */
  def redact(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    // fold the rules into (current text, counts so far); each count is
    // evaluated against the text AFTER all earlier rules ran
    val (finalText, counts) =
      rules.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((text, acc), Rule(name, pat, repl)) =>
          // regexp_count, not size(regexp_extract_all): same match walk,
          // but counts without materializing the match array
          val n = regexp_count(text, lit(pat)).cast("long").as(s"n_$name")
          (regexp_replace(text, pat, repl), acc :+ n)
      }
    df.select(idCols.map(col) ++ counts :+ finalText.as("redacted"): _*)
  }
}
