package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: regex redaction of
  * emails, IPv4 addresses and phone-shaped numbers.
  *
  * Patterns deliberately stay inside the common subset of Java regex
  * (Spark's engine) and RE2 (the DuckDB oracle's): character classes,
  * bounded repetition and `\b` word boundaries — no lookaround, no
  * backreferences. That keeps every redaction reproducible across
  * engines, which matters when a cleaned corpus must be re-derivable
  * bit-for-bit from the raw one.
  *
  * All three are `regexp_replace` chains — codegen'd, scan-side, zero
  * shuffle at any scale. Order matters and is fixed: emails first
  * (their local part can contain digit runs an IP/phone pattern could
  * half-match), then IPs, then phones.
  */
object Pii {
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val phonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** Redact all three PII classes, left to right in one pass order:
    * email → `[EMAIL]`, IPv4 → `[IP]`, phone → `[PHONE]`.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern,
        "[IP]"),
      phonePattern,
      "[PHONE]")

  /** Per-class match counts (audit columns for a redaction report). */
  def countEmails(text: Column): Column = regexp_count(text, lit(emailPattern))
  def countIps(text: Column): Column = regexp_count(text, lit(ipv4Pattern))
  def countPhones(text: Column): Column = regexp_count(text, lit(phonePattern))
}
