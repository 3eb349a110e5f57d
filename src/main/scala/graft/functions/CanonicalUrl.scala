package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization in ONE fused per-row pass.
  *
  * Replaces the 8-chained-regexp formulation of dedup_url_canonical, which
  * benched ~2.3s at sf0.1 (~15µs/URL: eight full regex passes per row).
  * The kernel is a plain character scanner with EXACTLY the chain's
  * semantics, step for step (PropertySpec fuzzes scanner-vs-regex-chain
  * parity on adversarial URL shapes; the DuckDB oracle still runs the
  * regex chain — an independent implementation of the same spec):
  *
  *   1. cut at the first '#'            (regex `#.*$`; SINGLE-LINE input —
  *      the regex stops a cut at an embedded newline, the scanner does
  *      not; URLs are single-line by construction here and in the RFC)
  *   2. lowercase (Unicode, root locale — matches both engines' lower())
  *   3. leading "http://" → "https://"  (`^http://`)
  *   4. every "://www." → "://"         (`://www\.`, oracle: 'g' option —
  *      DuckDB regexp_replace is first-match by default where Spark's is
  *      global; every non-anchored oracle step must carry 'g')
  *   5. every ":443/" → "/"             (`:443/`, oracle: 'g')
  *   6. every "[?&]utm_…" param dropped through the next '&'/'#'
  *   7. the first '&' before any '?' promoted to '?'  (`^([^?&]*)&` —
  *      non-greedy by construction: a greedy `[^?]*` group would promote
  *      the LAST '&' of the run, the wrong repair)
  *   8. one trailing '/' dropped, then one trailing '?' dropped
  *
  * Steps compose on each other's output in order, exactly like the chain.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_url requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  /** Row kernel, shared by interpreted eval and codegen. */
  def computeRow(a: Any): Any =
    UTF8String.fromString(
      CanonicalUrl.canonicalize(a.asInstanceOf[UTF8String].toString))

  override protected def nullSafeEval(a: Any): Any = computeRow(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("canonicalUrl", this, classOf[CanonicalUrl].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.computeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object CanonicalUrl {

  /** Column entry point. */
  def canonical_url(url: Column): Column =
    GraftBridge.column(CanonicalUrl(GraftBridge.expression(url)))

  /** The scanner. Kept as composable steps (each tiny, allocation-light)
    * so every step can be checked against its regex in isolation. */
  def canonicalize(s0: String): String = {
    // 1. cut at first '#'
    val hash = s0.indexOf('#')
    val s1 = if (hash >= 0) s0.substring(0, hash) else s0
    // 2. Unicode lowercase (root locale — the same mapping lower() applies
    // in both engines for accented hosts; locale-specific exotica like the
    // Turkish dotted I are outside the URL spec this models)
    var s = s1.toLowerCase(java.util.Locale.ROOT)
    // 3. leading http:// → https://
    if (s.startsWith("http://")) s = "https://" + s.substring(7)
    // 4. every "://www." → "://" ; 5. every ":443/" → "/"
    // (String.replace IS literal non-overlapping left-to-right replace-all)
    s = s.replace("://www.", "://")
    s = s.replace(":443/", "/")
    // 6. drop every [?&]utm_ param (through the next '&' or '#', exclusive)
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c == '?' || c == '&') && s.startsWith("utm_", i + 1)) {
        i += 1 // past the delimiter
        while (i < s.length && s.charAt(i) != '&' && s.charAt(i) != '#') i += 1
      } else {
        out.append(c)
        i += 1
      }
    }
    s = out.toString
    // 7. promote the first '&' that precedes any '?' back to '?'
    val amp = s.indexOf('&')
    val q = s.indexOf('?')
    if (amp >= 0 && (q < 0 || amp < q))
      s = s.substring(0, amp) + "?" + s.substring(amp + 1)
    // 8. one trailing '/', then one trailing '?'
    if (s.endsWith("/")) s = s.substring(0, s.length - 1)
    if (s.endsWith("?")) s = s.substring(0, s.length - 1)
    s
  }
}
