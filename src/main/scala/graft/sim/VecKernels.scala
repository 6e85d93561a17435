package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd vector kernels for the similarity surface.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) have no
  * `doGenCode`: they run interpreted, boxing every element through a
  * lambda dispatch. The ANN inner loop pays that per PLANE per ROW —
  * `hyperplaneSigns` evaluated ~64 planes x 128 interpreted lambda steps
  * per vector, and `cosine` three interpreted folds per candidate pair.
  * At 10^9 vectors that interpreter tax IS the dot-product cost. These
  * expressions generate the tight Java loop instead (one fused pass,
  * primitive doubles, no boxing) and fall back to an identical
  * interpreted `eval` off the codegen path.
  *
  * Bitwise parity contract (the DuckDB oracles hash results): summation
  * is sequential i = 0..n-1 — the same chain as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — and the null semantics
  * mirror the HOF pipeline: NULL if either array is NULL, any element is
  * NULL, or the lengths differ (zip_with pads the shorter side with NULL,
  * which nulls the whole fold). Fusing dot/norm accumulators into one
  * pass keeps each accumulator's own chain unchanged, so results are
  * bit-identical to the three separate folds. */
object VecKernels {

  /** dot(v, w) of an array<double> column with a LITERAL weight vector
    * (hyperplane row). The weights enter generated code through the
    * references array — 64 planes inline would bloat the generated source
    * past Janino's method limits and defeat its compile cache. */
  def dotLit(v: Column, w: Array[Double]): Column =
    column(DotLit(expression(v), w.toIndexedSeq))

  /** Fused one-pass cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))
}

// Weights are an IndexedSeq (value equality), not Array (reference equality),
// so Catalyst canonicalization / subexpression elimination can dedupe two
// dotLit instances over the same plane.
private[sim] case class DotLit(child: Expression, weights: IndexedSeq[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_lit"

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != wArr.length) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getDouble(i) * wArr(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("dotWeights", wArr, "double[]")
    val cGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val ok = ctx.freshName("ok")
    val s = ctx.freshName("s")
    ev.copy(code = code"""
      ${cGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${cGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${cGen.value};
        int $n = $arr.numElements();
        if ($n == $w.length) {
          boolean $ok = true;
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($arr.isNullAt($i)) { $ok = false; break; }
            $s += $arr.getDouble($i) * $w[$i];
          }
          if ($ok) { ${ev.isNull} = false; ${ev.value} = $s; }
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[sim] case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; sa += x * x; sb += y * y
      i += 1
    }
    // 0-vectors: 0.0/0.0 = NaN, same as the interpreted fold pipeline;
    // NaN fails any >= threshold filter downstream.
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val ok = ctx.freshName("ok")
    val dot = ctx.freshName("dot")
    val sa = ctx.freshName("sa")
    val sb = ctx.freshName("sb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    ev.copy(code = code"""
      ${aGen.code}
      ${bGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${aGen.isNull} && !${bGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${aGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${bGen.value};
        int $n = $a.numElements();
        if ($n == $b.numElements()) {
          boolean $ok = true;
          double $dot = 0.0, $sa = 0.0, $sb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $ok = false; break; }
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $dot += $x * $y; $sa += $x * $x; $sb += $y * $y;
          }
          if ($ok) {
            ${ev.isNull} = false;
            ${ev.value} = $dot / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
          }
        }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
