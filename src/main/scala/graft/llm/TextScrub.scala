package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / deny-list scrubbing for training corpora: emails, long digit runs
  * (phone / account-number shapes) and configurable deny-list terms are
  * replaced by typed placeholders before text ships to a training set.
  *
  * Patterns deliberately stay inside the regex subset Java (Spark) and RE2
  * (DuckDB, for the differential oracle) interpret identically: character
  * classes, bounded repetition, alternation, and `\b` word boundaries — no
  * lookaround (RE2 has none). Replacement is sequential (email → number →
  * deny) in both engines, so counts and scrubbed text agree exactly.
  *
  * 100 TB design: pure per-row codegen'd `regexp_replace`/`regexp_count` —
  * no shuffle, no UDF; the deny-list compiles into ONE alternation pattern
  * rather than one pass per term.
  */
object TextScrub {

  /** Email-shaped spans. */
  val EmailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Long digit runs: 8+ digits possibly split by spaces/dashes — the
    * phone / account / card shapes corpus scrubbing cares about. */
  val NumberPattern: String = "[0-9][0-9 -]{6,}[0-9]"

  /** Example deny-list (project-specific in production). */
  val DefaultDenyList: Seq[String] = Seq("customer", "dup")

  /** Metacharacters escaped in deny-list terms. Only punctuation with
    * regex meaning is escaped (never letters/digits — `\d` would *create*
    * a metacharacter); backslash-punct is a literal in both Java regex and
    * RE2, so the escaped pattern stays oracle-portable. */
  private val Meta: Set[Char] = "\\.[]{}()*+-?^$|/".toSet

  private def escapeTerm(t: String): String =
    t.flatMap(c => if (Meta(c)) s"\\$c" else c.toString)

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** A term anchored with `\b` only on its word-char ends. `\b` asserts a
    * word/non-word transition, so `\bc\+\+\b` can NEVER match "use c++ "
    * (no transition between '+' and space) — a term starting or ending in
    * punctuation must drop that side's anchor or it is silently dead. */
  private def anchoredTerm(t: String): String = {
    val pre = if (isWordChar(t.head)) "\\b" else ""
    val post = if (isWordChar(t.last)) "\\b" else ""
    pre + escapeTerm(t) + post
  }

  /** One alternation pattern for the whole deny-list, word-bounded
    * per-term (anchors only on word-char ends — see [[anchoredTerm]]).
    * Terms are regex-escaped (they are literal words, not patterns). An
    * empty list yields `[^\s\S]` — a valid never-matching pattern in both
    * Java and RE2 — because the naive `\b()\b` matches at EVERY word
    * boundary and would stamp [TERM] throughout the document. */
  def denyPattern(terms: Seq[String]): String = {
    // blank entries (a deny file's empty line) would crash anchoredTerm's
    // head/last — and an empty alternation branch matches everywhere
    val ts = terms.filter(_.nonEmpty)
    if (ts.isEmpty) "[^\\s\\S]"
    else ts.map(anchoredTerm).mkString("(", "|", ")")
  }

  /** Scrubbed text: email → [EMAIL], digit runs → [NUM], deny terms →
    * [TERM], applied in that fixed order. */
  def scrub(text: Column,
      denyList: Seq[String] = DefaultDenyList): Column = {
    val t1 = regexp_replace(text, EmailPattern, "[EMAIL]")
    val t2 = regexp_replace(t1, NumberPattern, "[NUM]")
    if (denyList.isEmpty) t2
    else regexp_replace(t2, denyPattern(denyList), "[TERM]")
  }
}
