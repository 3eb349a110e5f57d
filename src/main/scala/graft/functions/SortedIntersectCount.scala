package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED, de-duplicated arrays (long or string elements) —
  * a two-pointer merge with zero per-row allocation.
  *
  * `array_intersect` builds an OpenHashSet per invocation; on a blocked
  * self-join every document rebuilds its set once per pair it appears in.
  * Sorting once at the document level (sort_array) and merge-counting at the
  * pair level moves the O(n) set construction out of the O(pairs) stage —
  * the same restructuring as pre-normalizing vectors for cosine.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other            => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> or two " +
          s"array<string> inputs, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    if (elemType == LongType) {
      while (i < nx && j < ny) {
        val cmp = java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, j, c, cmp) =
        (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"),
          ctx.freshName("cmp"))
      val cmpExpr = elemType match {
        case LongType =>
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        case _ =>
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      }
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column entry point; both inputs MUST be sorted ascending & distinct
    * (produce with `sort_array(array_distinct(...))`). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
