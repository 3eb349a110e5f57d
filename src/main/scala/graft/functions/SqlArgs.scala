package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Argument validation for the SQL-registered surface of the native
  * functions. Builder lambdas handed to `injectFunction` see raw analyzer
  * expressions; without checks, a wrong arity silently drops arguments and
  * a non-literal where a literal is required dies inside `eval()` with an
  * unresolved-expression stack trace. These helpers fail at plan time with
  * the function's name and the actual problem instead.
  */
object SqlArgs {

  def arity(name: String, exprs: Seq[Expression], min: Int, max: Int): Unit =
    if (exprs.size < min || exprs.size > max) {
      val expected = if (min == max) s"$min" else s"$min to $max"
      throw new IllegalArgumentException(
        s"$name expects $expected argument(s), got ${exprs.size}")
    }

  /** A foldable (literal / constant-foldable) argument, evaluated now. */
  def foldable(name: String, exprs: Seq[Expression], pos: Int, what: String): Any = {
    val e = exprs(pos)
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name argument ${pos + 1} ($what) must be a literal, got: ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$name argument ${pos + 1} ($what) must not be null")
    v
  }

  def foldableInt(name: String, exprs: Seq[Expression], pos: Int, what: String): Int =
    foldable(name, exprs, pos, what) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$name argument ${pos + 1} ($what) must be an integer literal, " +
          s"got ${other.getClass.getSimpleName}")
    }
}
