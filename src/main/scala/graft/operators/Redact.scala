package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for text corpora: replace emails / phone numbers / SSN-like
  * patterns with typed placeholder tokens before training. Pure map-side
  * regexp work (codegen'd `regexp_replace`), no shuffle, linear scans.
  *
  * Patterns are written in the Java-regex ∩ RE2 common subset with NO
  * backslash escapes (`[.]` instead of `\.`, `[0-9]` instead of `\d`) so
  * the DuckDB oracle replays them byte-for-byte. Order matters: phone
  * before SSN, so a phone number is never partially consumed by the
  * shorter SSN shape.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** (pattern, replacement) in application order. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    PhonePattern -> "<PHONE>",
    SsnPattern -> "<SSN>")

  /** Text with every rule applied in order. Idempotent: placeholders don't
    * match any pattern. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Count of PII hits across all rules. Each rule counts on the text with
    * all PRIOR rules already applied — exactly the matches [[redact]]
    * replaces — so a span consumed by an earlier rule (e.g. a phone-shaped
    * string inside an email local part) is never double-counted. */
  def piiCount(text: Column): Column =
    Rules.foldLeft((text, lit(0))) { case ((t, acc), (pat, repl)) =>
      (regexp_replace(t, pat, repl),
        acc + size(regexp_extract_all(t, lit(pat), lit(0))))
    }._2.cast("long")
}
