package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora (LLM-pipeline brief): emails,
  * IPv4 addresses, and long digit runs (phone / account / card
  * numbers) replaced with typed placeholder tags. Pure
  * `regexp_replace` chains — row-local, shuffle-free, whole-stage
  * codegen'd, linear at any corpus size like the rest of the text
  * family.
  *
  * Patterns are deliberately RE2-compatible (no lookarounds), so the
  * DuckDB oracle applies the byte-identical regexes; replacement ORDER
  * is part of the contract (emails first — they contain dots and
  * digits; then IPs; digit runs last so they can't eat IP octets or
  * email local parts).
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\d{6,}"

  /** Redacted text: `[EMAIL]` / `[IP]` / `[NUM]` tags in place. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      LongNumRe, "[NUM]")

  /** Per-document redaction with hit counts (counted on the RAW text,
    * before tags could shadow later patterns).
    */
  def apply(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    docs.select(
      col(idCol),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_email"),
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("n_ip"),
      size(regexp_extract_all(text, lit(LongNumRe), lit(0))).cast("long").as("n_num"),
      redact(text).as("redacted"))
  }
}
