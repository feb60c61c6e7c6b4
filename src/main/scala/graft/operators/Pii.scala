package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over document text — the compliance pass
  * every production corpus runs before training (emails, phone numbers,
  * IP addresses; the rule set is open for gazetteer-style extension).
  *
  * Scale shape: a pure per-row projection — detection is
  * `regexp_count`, redaction a fold of `regexp_replace`, both stock
  * codegen'd expressions, so the pass rides whatever scan produced the
  * rows with NO shuffle of its own and pushes down column pruning
  * (only the text column and the id survive the scan). Patterns stay in
  * the portable character-class/bounded-repetition subset so RE2-family
  * engines (the DuckDB oracle) and Java regex agree character-for-
  * character — no lookarounds, no backrefs.
  */
object Pii {

  /** One detection rule: a portable regex and its redaction token. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Shares [[graft.functions.TextFunctions.EmailRe]] so the compliance
    * pass and the corpus noise-scrub (x26) agree on what an email is. */
  val Email: Rule = Rule("email", graft.functions.TextFunctions.EmailRe, "[EMAIL]")
  /** Dotted-quad; deliberately loose (no 0-255 bound) — redaction policy
    * prefers false positives over leaked addresses. */
  val Ipv4: Rule = Rule("ipv4", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "[IP]")
  val Phone: Rule = Rule("phone", "\\d{3}-\\d{3}-\\d{4}", "[PHONE]")
  /** US social security shape (3-2-4 digit groups); disjoint from
    * [[Phone]]'s 3-3-4 by the middle group's width. */
  val Ssn: Rule = Rule("ssn", "\\d{3}-\\d{2}-\\d{4}", "[SSN]")
  /** Payment-card shape: 13–19 digits as 4-4-4-(1..7) groups with
    * optional single dash/space separators (covers the common 16-digit
    * grouping and bare digit runs, including bare 15-digit Amex), OR the
    * conventional Amex 4-6-5 separator grouping — a dashed/spaced Amex
    * has no 4-digit middle group, so the first alternative alone misses
    * it. The general alternative stays FIRST: both Java and RE2
    * alternation are leftmost-first, so bare runs keep matching at their
    * old (longest) span. Deliberately loose (no Luhn check — not
    * expressible portably, and the policy prefers false positives over
    * leaked numbers). */
  val CreditCard: Rule =
    Rule("cc", "\\d{4}([- ]?\\d{4}){2}[- ]?\\d{1,7}|\\d{4}[- ]?\\d{6}[- ]?\\d{5}", "[CC]")
  /** IBAN shape: 2-letter country, 2 check digits, 11–30 alnum body
    * (uppercase only, as IBANs are written). */
  val Iban: Rule = Rule("iban", "[A-Z]{2}\\d{2}[A-Z0-9]{11,30}", "[IBAN]")

  /** Order matters only where patterns could nest: email (the only rule
    * with an alnum context that could swallow a dotted quad's digits)
    * runs first; IBAN before card so an account body's digit run redacts
    * as part of its [IBAN], not as a card fragment; card before the
    * short digit shapes (a redacted [CC] token can no longer feed a
    * phone/SSN false positive). Counts are independent per rule over the
    * ORIGINAL text either way — order only shapes the redacted string. */
  val DefaultRules: Seq[Rule] = Seq(Email, Iban, CreditCard, Ssn, Phone, Ipv4)

  /** Per-rule occurrence count columns `n_<rule>` (long). */
  def scanCols(text: Column, rules: Seq[Rule] = DefaultRules): Seq[Column] =
    rules.map(r => regexp_count(text, lit(r.pattern)).cast("long").as(s"n_${r.name}"))

  /** The text with every rule's matches replaced by its token. */
  def redact(text: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Per-document PII report: id, per-rule counts, total, and the
    * redacted text — one projection, no shuffle. */
  def scan(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame =
    df.select((col(idCol) +: scanCols(col(textCol), rules) :+ col(textCol)): _*)
      .withColumn("n_pii", rules.map(r => col(s"n_${r.name}")).reduce(_ + _))
      .withColumn("redacted", redact(col(textCol), rules))
      .drop(textCol)
}
