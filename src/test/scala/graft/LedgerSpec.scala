package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical gate for the SURVEY §2b exact-reference pairing ledger
  * (round 15 — r14 verdict #6): a deliberately-quadratic pair-join key
  * may only exist if it is ledger-entered WITH a production twin, and
  * every other pair-shaped key must carry measured sub-quadratic
  * evidence in SCALING.md. Until this spec, the ledger was a prose
  * contract the verdicts graded by hand; now a quadratic key landing
  * without its twin row (or a "pairs" key landing without a curve)
  * fails the build.
  *
  * The suspect net is name-based by design — `_near_`/`pairs`/`jaccard`/
  * `cluster`/`containment`/`overlap`/`semantic`/`mutual`/`ann` (the r17
  * widening, r16 verdict #5) are the vocabulary every pair-join key in
  * this repo uses — so a new pair key either inherits the vocabulary
  * (and meets the gate) or dodges it (and the §2b "no exact quadratic
  * exists outside this table" sentence makes that a reviewable lie, the
  * same way the ContractSpec unit-only list works).
  */
class LedgerSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")

  // tests run from the repo root (sbt's baseDirectory); fail loudly if not
  private lazy val survey = read("SURVEY.md")
  private lazy val scaling = read("SCALING.md")

  private lazy val ledgerSection: String = {
    val start = survey.indexOf("### 2b.")
    assert(start >= 0, "SURVEY.md lost its §2b ledger section")
    val end = survey.indexOf("\n## 3.", start)
    survey.substring(start, if (end >= 0) end else survey.length)
  }

  private val KeyRe = "`([a-z0-9_]+)`".r

  /** §2b table rows: (exact key, twin cell keys). Cells: 0=exact ref,
    * 1=x64 tail, 2=production twin, 3=twin tail, 4=relationship. */
  private lazy val ledgerRows: Seq[(String, Seq[String])] =
    ledgerSection.linesIterator
      .filter(l => l.startsWith("| `") && !l.contains("exact reference"))
      .toSeq.map { l =>
        val cells = l.stripPrefix("|").split("\\|").map(_.trim)
        val exact = KeyRe.findFirstMatchIn(cells(0)).get.group(1)
        val twins = KeyRe.findAllMatchIn(cells(2)).map(_.group(1)).toSeq
        (exact, twins)
      }

  /** Every backticked key anywhere in §2b — table or prose (the prose
    * covers compositional inheritors like knn_mutual_pairs). */
  private lazy val ledgerMentioned: Set[String] =
    KeyRe.findAllMatchIn(ledgerSection).map(_.group(1)).toSet

  /** Tail slope of a key's SCALING.md row — the 6th cell's first float
    * (query | x1 | x4 | x16 | x64 | tail slope | ...). */
  private def scalingTail(key: String): Option[Double] =
    scaling.linesIterator
      .find(_.startsWith("| `" + key + "`"))
      .flatMap { l =>
        val cells = l.stripPrefix("|").split("\\|").map(_.trim)
        if (cells.length < 6) None
        else "[0-9]+\\.?[0-9]*".r.findFirstIn(cells(5)).map(_.toDouble)
      }

  test("every §2b ledger row names registered keys, exact and twin") {
    assert(ledgerRows.nonEmpty, "no ledger table rows parsed from §2b")
    val known = SparkEntry.queries.keySet
    val ghosts = ledgerRows.flatMap { case (e, ts) => (e +: ts) }
      .filterNot(known)
    assert(ghosts.isEmpty, s"§2b names unregistered keys: $ghosts")
    val twinless = ledgerRows.filter(_._2.isEmpty).map(_._1)
    assert(twinless.isEmpty,
      s"ledger rows without a production twin: $twinless")
  }

  /** The suspect net, widened r17 (r16 verdict #5): beyond the original
    * `_near_`/`pairs`/`jaccard`/`cluster` vocabulary, pair-shaped keys
    * also arrive named by their similarity family —
    * `containment`/`overlap`/`semantic`/`mutual`/`ann` (the last as a
    * `_`-delimited token, not a substring: `channel`/`scanned` must not
    * trip it). */
  private val SuspectRe =
    ("_near_|pairs|jaccard|cluster|containment|overlap|semantic|mutual|" +
      "(^|_)ann($|_)").r

  private def isSuspect(k: String): Boolean =
    SuspectRe.findFirstIn(k).isDefined

  /** A suspect key is accounted iff ledger-entered (table or prose — the
    * managed-weakness path) or measured sub-quadratic: tail slope ≤ 1.1
    * in SCALING.md (1.0 = linear; the 0.1 headroom is this host's
    * measured noise, far under the 1.3+ signature the quadratic
    * references show). */
  private def isAccounted(k: String): Boolean =
    ledgerMentioned.contains(k) || scalingTail(k).exists(_ <= 1.1)

  test("every pair-join-suspect key is ledger-entered or " +
    "sub-quadratic-curved in SCALING.md") {
    val suspects = SparkEntry.queries.keySet.filter(isSuspect).toSeq.sorted
    assert(suspects.nonEmpty, "suspect net went empty — pattern rotted")
    val unaccounted = suspects.filterNot(isAccounted)
    assert(unaccounted.isEmpty,
      s"pair-join-suspect keys with neither a §2b ledger entry nor a " +
        s"sub-quadratic SCALING.md curve: $unaccounted " +
        s"(tails: ${unaccounted.map(k => k -> scalingTail(k))})")
  }

  test("the widened net catches a synthetic unregistered pair key") {
    // negative control (r16 verdict #5): a future key named by the
    // overlap vocabulary but absent from §2b and SCALING.md must be
    // classified suspect AND unaccounted — i.e. it would fail the gate
    for (ghost <- Seq("foo_overlap_pairs", "dedup_span_containment",
        "knn_mutual_reach", "emb_semantic_blocks", "probe_ann_buckets")) {
      assert(isSuspect(ghost), s"$ghost dodged the suspect net")
      assert(!isAccounted(ghost),
        s"$ghost is spuriously accounted — the gate would not fire")
    }
    // and the token-boundary guard: ann-as-substring must NOT trip
    for (clean <- Seq("scan_channel_meta", "plan_annotate", "banner_scan"))
      assert(!isSuspect(clean), s"$clean wrongly caught by the ann token")
  }
}
