package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 64-bit SimHash over a token array (VecKernels design:
  * tight generated loop on the codegen path, identical interpreted eval
  * off it).
  *
  * Bit-for-bit identical to the staged HOF pipeline it replaces
  * (Dedup.simhash round-5 form): per token, md5("sb:" + token); bit k of
  * the token's contribution = bit (k % 4) of hex nibble (k / 4) — i.e. of
  * the HIGH nibble of digest byte k/8 when (k/4) is even, LOW when odd —
  * summed as +1/−1 into 64 integer counters; packed bit k set iff the
  * counter is > 0. All-integer math, so there is no float-order concern;
  * the DuckDB oracle (Oracles.simhashPairs) replays the same nibbles.
  *
  * Why: the HOF form (transform + aggregate + zip_with over 64-long
  * arrays) runs interpreted — ~64 boxed lambda steps per TOKEN — measured
  * 4.7 s over the sf0.1 corpus where this kernel runs the whole corpus in
  * a few hundred ms. One MessageDigest instance per generated-class/task,
  * reset by digest().
  */
object SimHashKernel {
  /** simhash64(tokens): NULL for a NULL array; 0 for an empty one. */
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))

  /** Shared digest helper (eval path + generated code both call it). */
  def hashToken(md: java.security.MessageDigest, token: org.apache.spark.unsafe.types.UTF8String,
                sums: Array[Int]): Unit = {
    val bytes = ("sb:" + token.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val dig = md.digest(bytes) // digest() resets the instance
    var k = 0
    while (k < 64) {
      val hexPos = k >>> 2 // hex char index 0..15 (first 8 digest bytes)
      val b = dig(hexPos >>> 1) & 0xff
      val nib = if ((hexPos & 1) == 0) b >>> 4 else b & 0xf
      if (((nib >>> (k & 3)) & 1) == 1) sums(k) += 1 else sums(k) -= 1
      k += 1
    }
  }

  def pack(sums: Array[Int]): Long = {
    var out = 0L
    var k = 0
    while (k < 64) { if (sums(k) > 0) out |= (1L << k); k += 1 }
    out
  }
}

private[dedup] case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val sums = new Array[Int](64)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    java.util.Arrays.fill(sums, 0)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        SimHashKernel.hashToken(md, arr.getUTF8String(i), sums)
      i += 1
    }
    SimHashKernel.pack(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdv = ctx.addMutableState("java.security.MessageDigest", "shMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
             catch (Exception e) { throw new RuntimeException(e); }""")
    val sumsV = ctx.addMutableState("int[]", "shSums", v => s"$v = new int[64];")
    val cGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val helper = SimHashKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${cGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${cGen.isNull}) {
        ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${cGen.value};
        java.util.Arrays.fill($sumsV, 0);
        int $n = $arr.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i))
            $helper.hashToken($mdv, $arr.getUTF8String($i), $sumsV);
        }
        ${ev.value} = $helper.pack($sumsV);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
