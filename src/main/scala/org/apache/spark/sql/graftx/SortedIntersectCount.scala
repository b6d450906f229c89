package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection SIZE of two ascending-sorted long arrays via a fused
  * two-pointer merge scan — the verification kernel of the PPJoin
  * similarity join (DedupOps.ngramJaccardPrefix).
  *
  * Why native: the builtin alternatives either allocate per row
  * (`size(array_intersect)` builds a hash set AND materializes the
  * intersection array — measured GC-bound at ~500k verification pairs
  * per query in a long-lived session) or fall off codegen entirely
  * (`aggregate(a, 0, acc -> acc + array_contains(b, x))` routes every
  * element access through interpreted eval). This is an O(n1+n2)
  * primitive loop inside whole-stage codegen with zero allocation —
  * the per-pair cost that matters when verification runs billions of
  * candidate pairs at corpus scale.
  *
  * Contract: inputs must be sorted ascending. Arrays with duplicate
  * elements count matched duplicates pairwise (standard merge
  * semantics); the dedup pipeline always passes DISTINCT token-hash
  * sets, where merge count == set-intersection size. Null arrays →
  * null (BinaryExpression default); a null ELEMENT → null, matching
  * the builtin composition rather than fabricating a count.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    var j = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |long $c = 0L;
         |int $i = 0; int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
