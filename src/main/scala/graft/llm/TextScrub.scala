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

  /** One alternation pattern for the whole deny-list, word-bounded. */
  def denyPattern(terms: Seq[String]): String =
    terms.mkString("\\b(", "|", ")\\b")

  /** Scrubbed text: email → [EMAIL], digit runs → [NUM], deny terms →
    * [TERM], applied in that fixed order. */
  def scrub(text: Column,
      denyList: Seq[String] = DefaultDenyList): Column = {
    val t1 = regexp_replace(text, EmailPattern, "[EMAIL]")
    val t2 = regexp_replace(t1, NumberPattern, "[NUM]")
    regexp_replace(t2, denyPattern(denyList), "[TERM]")
  }
}
