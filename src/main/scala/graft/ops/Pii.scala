package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PiiScrub

/** PII detection and masking over a text column — the scrub stage
  * every published web-scale corpus pipeline runs before training
  * (C4 strips lines by blocklist; Dolma and FineWeb mask emails /
  * phone numbers / IP addresses with sentinel tokens — this is that
  * operator).
  *
  * Scale shape: pure per-row projection, zero shuffles, zero UDFs.
  * The production path is the native single-pass
  * [[graft.functions.PiiScrub]] expression ([[scrub]]) — one decode,
  * one combined-alternation regex scan, one encode, detection counts
  * collected for free. The composed built-in forms below
  * ([[emailCount]]/[[mask]]/…) are kept as the REFERENCE semantics:
  * they define what the fused pass must compute (PiiSpec pins the
  * equivalence by fuzz), and they are what a deployment would use for
  * ad-hoc one-pattern jobs. Patterns deliberately stay in the regex
  * subset whose semantics agree across engines (character classes,
  * bounded and unbounded repetition — no backreferences, no
  * lookaround), so the DuckDB oracle (RE2) finds identical matches.
  *
  * Masking replaces longest-first (emails before IPs before phones):
  * the email pattern can contain dots and digits, so it must be
  * consumed before the narrower patterns inspect the remainder.
  */
object Pii {
  val EmailPattern: String = PiiScrub.EmailPattern
  val PhonePattern: String = PiiScrub.PhonePattern
  val Ipv4Pattern: String = PiiScrub.Ipv4Pattern

  /** Fused detect+mask: STRUCT<clean_text, n_emails, n_phones, n_ips>
    * in one native pass. Keep the struct behind an alias before
    * selecting fields (the pqEncode discipline) so CollapseProject
    * cannot duplicate the scan per consumed field. */
  def scrub(text: Column): Column = call_function("pii_scrub", text)

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Composed-built-in mask — the reference semantics [[scrub]] fuses. */
  def mask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
