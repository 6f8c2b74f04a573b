package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training-data pipeline: detect and redact
  * email addresses, IPv4 addresses, and international-format phone
  * numbers from a text column.
  *
  * Everything is built from codegen'd built-in expressions
  * (`regexp_count` / `regexp_replace`) — no UDFs — so at 100 TB the
  * cost is the scan plus whole-stage-codegen'd per-row regex work
  * with no shuffle at all: the operator is embarrassingly parallel
  * and pipelines into whatever consumes the cleaned text.
  *
  * Pattern notes: the regexes deliberately stay inside the common
  * subset of Java regex and RE2 (no backreferences, no lookaround),
  * so an external auditor can replay them in RE2-based engines
  * (DuckDB, Go) byte-for-byte — that is exactly what the q59 oracle
  * does. Redaction applies patterns in a fixed order (email, then
  * IPv4, then phone); replacement tokens contain no digits or `@`,
  * so later patterns cannot match inside earlier replacements and
  * the composition order is well-defined.
  */
object Pii {

  /** Practical email shape: local part, `@`, dotted domain with an
    * alphabetic TLD of length >= 2. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like
    * `1.2.3.4.5` still match only a 4-group prefix window and plain
    * decimals don't match at all. */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** International-format phone: `+CC` then two digit groups with
    * optional space/hyphen separators (e.g. `+47 555 12345`). */
  val PhonePattern = "\\+\\d{1,3}[ -]?\\d{3}[ -]?\\d{3,6}"

  val EmailToken = "<EMAIL>"
  val Ipv4Token = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redacted copy of `text`: every email, IPv4, and phone match is
    * replaced by its type token, in that fixed order. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, EmailToken)
    val noIp = regexp_replace(noEmail, Ipv4Pattern, Ipv4Token)
    regexp_replace(noIp, PhonePattern, PhoneToken)
  }

  /** Per-pattern match count over the ORIGINAL text (counts are taken
    * before any redaction, so they are independent of pattern order). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Scrub `textCol`: appends match counts (`n_emails`, `n_ips`,
    * `n_phones`, BIGINT) and the redacted text (`clean_text`). Null
    * text yields null counts and null clean text — the row survives
    * (malformed input must not kill a 100 TB scan); filter or
    * `coalesce` downstream.
    *
    * Overlap caveat: counts are computed over the ORIGINAL text while
    * redaction is sequential, so when patterns overlap they diverge —
    * `user@1.2.3.4.com` counts n_ips=1, but the email replacement
    * consumes the quad first and `clean_text` carries no `<IP>` token.
    * The counts answer "what PII does this text contain", not "which
    * tokens appear in clean_text"; do not reconcile one against the
    * other on overlapping inputs. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(graft.Names.quoted(textCol))
    df.withColumn("n_emails", emailCount(t).cast("bigint"))
      .withColumn("n_ips", ipv4Count(t).cast("bigint"))
      .withColumn("n_phones", phoneCount(t).cast("bigint"))
      .withColumn("clean_text", redact(t))
  }

  /** [[scrub]]'s counts-as-redaction twin: each pattern is counted on
    * the text AS THE REDACTION SEQUENCE SEES IT (emails on the
    * original, IPv4s after email redaction, phones after both), so
    * every count equals the number of replacements actually performed
    * at that stage — and therefore the number of that stage's tokens
    * in `clean_text` (tokens contain no digits or `@`, so no later
    * pattern matches inside an earlier replacement). On overlapping
    * input (`user@1.2.3.4.com`) this reports n_ips=0 where [[scrub]]
    * reports 1: use scrub for "what PII does this text contain",
    * scrubSequential when downstream must reconcile counts against
    * clean_text. Same 100 TB shape: codegen'd regex only, zero
    * shuffle, null rows survive. */
  def scrubSequential(df: DataFrame, textCol: String): DataFrame = {
    val t = col(graft.Names.quoted(textCol))
    val afterEmail = regexp_replace(t, EmailPattern, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, Ipv4Token)
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("bigint"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Pattern)).cast("bigint"))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhonePattern)).cast("bigint"))
      .withColumn("clean_text", regexp_replace(afterIp, PhonePattern, PhoneToken))
  }
}
