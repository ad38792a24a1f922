package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing over a document corpus — the redaction pass every
  * LLM training-data pipeline runs before release (emails, IP
  * addresses, long card-shaped digit runs → typed placeholder
  * tokens), as pure codegen'd `regexp_replace`/`regexp_extract_all`
  * column expressions: one projection, no shuffle, no UDF — the scan
  * parallelism IS the operator's parallelism at any corpus size.
  *
  * Patterns are deliberately RE2-compatible (character classes,
  * bounded repeats, `\b`, non-capturing groups only — no
  * backreferences or lookaround), so the DuckDB oracle runs the SAME
  * pattern strings; replacement order is part of the contract
  * (sequential email → IP → id, counts taken on the intermediate
  * strings) because a leading digit run of an email local part is
  * also card-shaped — engines must agree on which rule consumes it.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** Card/account-shaped digit runs (13-16 digits, word-bounded). */
  val IdRe = "\\b\\d{13,16}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val IdToken = "<ID>"

  /** Per-document redaction: replaces each PII class with its token
    * and counts the matches it consumed. Returns (doc_id, n_emails,
    * n_ips, n_ids, redacted). */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val afterEmail = regexp_replace(t0, EmailRe, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, IpToken)
    val afterId = regexp_replace(afterIp, IdRe, IdToken)
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t0, lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(afterIp, lit(IdRe), lit(0)))
        .cast("long").as("n_ids"),
      afterId.as("redacted"))
  }
}
