package graft.algo

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd graph kernels (same design as sim.VecKernels: tight
  * generated loop on the codegen path, identical interpreted eval off it).
  */
object GraphKernels {

  /** |a ∩ b| for two SORTED, duplicate-free array<long> columns — the
    * triangle-closing inner loop. Spark's `array_intersect` builds a hash
    * set and materializes the intersection array per row; counting
    * triangles needs only the SIZE, and the inputs are presorted
    * (`sort_array(collect_list(...))`), so a two-pointer merge does it
    * with zero allocation. NULL if either side is NULL (neither occurs on
    * the triangle path — inner joins — but the semantics are total).
    * Contract: both arrays ascending and deduplicated, elements non-null;
    * the caller (TriangleCount) guarantees this by construction. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  /** Σ x[p] over an array<int> of state POSITIONS (dense-index adjacency;
    * p < 0 = endpoint outside the state table, skipped — the same skip as
    * the packed kernels). x enters per round as a Ref-carried broadcast
    * handle (StateMap.Ref discipline: plan built once, fresh contents per
    * collect). Summation order = the pack's sorted-neighbor order —
    * deterministic, unlike the shuffle path's aggregate merge order. */
  def nbrSumIdx(nbrs: Column,
      xR: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Double]]])
      : Column =
    column(NbrSumIdx(expression(nbrs), xR))
}

private[algo] case class NbrSumIdx(child: Expression,
    ref: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "nbr_sum_idx"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val x = ref.value.value
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val p = arr.getInt(i)
      if (p >= 0) s += x(p)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("nbrSumRef", ref, graft.util.StateMap.refCls)
    val xa = ctx.addMutableState("double[]", "nbrSumX",
      v => s"$v = (double[]) ((org.apache.spark.broadcast.Broadcast) $bRef.value()).value();")
    val cGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    ev.copy(code = code"""
      ${cGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${cGen.isNull}) {
        ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${cGen.value};
        int $n = $arr.numElements();
        for (int $i = 0; $i < $n; $i++) {
          int $p = $arr.getInt($i);
          if ($p >= 0) ${ev.value} += $xa[$p];
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[algo] case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    ev.copy(code = code"""
      ${aGen.code}
      ${bGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${aGen.isNull} && !${bGen.isNull}) {
        ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${aGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${bGen.value};
        int $na = $a.numElements();
        int $nb = $b.numElements();
        int $i = 0; int $j = 0;
        while ($i < $na && $j < $nb) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { ${ev.value}++; $i++; $j++; }
          else if ($x < $y) { $i++; }
          else { $j++; }
        }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
