package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sim.{Similarity, VecKernels}

/** Parity of the codegen'd vector kernels (VecKernels.CosineSim/DotLit)
  * against the interpreted HOF folds they replaced. The folds are kept
  * HERE as the reference implementation: the kernels must be bitwise
  * equal on the happy path and agree on every null/mismatch edge, since
  * the DuckDB oracles hash the results (q_embed_pairs, q_ann_topk,
  * q_lsh_embed_pairs, q_ivf_topk). */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-kernel interpreted implementation, verbatim. */
  private def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(a, lit(0.0), (s, v) => s + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (s, v) => s + v * v))
    dot / (na * nb)
  }

  private def dotLitHof(v: Column, w: Array[Double]): Column = {
    val plane = array(w.map(lit): _*)
    aggregate(zip_with(v, plane, (x, c) => x * c), lit(0.0), (s, x) => s + x)
  }

  private val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0, -0.5), Seq(0.5, -1.0, 2.0, 4.0)),
    (2L, Seq(0.1, 0.2, 0.30000000000000004, 1e-9), Seq(7.0, 1e300, -1e300, 2.0)),
    (4L, Seq(-1.5, 2.25, 3.125, 4.0625), Seq(9.9, 8.8, 7.7, 6.6))
  ).toDF("id", "a", "b")

  test("cosine kernel is bitwise-identical to the interpreted folds") {
    val rows = vecs
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("k"),
        cosineHof(col("a"), col("b")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, h) = (r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(h), s"row ${r.getLong(0)}: $k vs $h")
    }
  }

  test("zero-norm vectors: kernel yields NaN where the ANSI fold THREW") {
    val z = Seq((1L, Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("id", "a", "b")
    // The replaced HOF pipeline was a latent crash: ANSI Divide throws
    // DIVIDE_BY_ZERO even on doubles, so one all-zero embedding killed the
    // whole job. The kernel's raw Java division gives NaN, which every
    // downstream `>= threshold` filter drops — the behavior a dedup/ANN
    // pipeline wants for degenerate vectors.
    intercept[Exception] {
      z.select(cosineHof(col("a"), col("b")).as("h")).collect()
    }
    val k = z.select(Similarity.cosine(col("a"), col("b")).as("k")).collect()(0).getDouble(0)
    assert(k.isNaN)
  }

  test("dotLit kernel is bitwise-identical to the interpreted fold") {
    val w = Array(0.123456, -7.5, 3.25, 1e-7)
    val rows = vecs
      .select(VecKernels.dotLit(col("a"), w).as("k"), dotLitHof(col("a"), w).as("h"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null/mismatch edges: null array, null element, length mismatch") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)), // clean
      (2L, null, Seq[java.lang.Double](3.0, 4.0)), // null array
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null elem
      (4L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](3.0, 4.0)) // len mismatch
    ).toDF("id", "a", "b")
    val rows = df
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("k"),
        cosineHof(col("a"), col("b")).as("h"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row ${r.getLong(0)} null disagreement")
    }
    assert(!rows(0).isNullAt(1))
    assert(rows.drop(1).forall(_.isNullAt(1)))
    // dotLit mismatch/null edges: kernel returns NULL where zip_with's
    // null-padding nulls the fold — identical once wrapped in the sign
    // test's otherwise(0L), which is how hyperplaneSigns consumes it
    val w2 = Array(1.0, 2.0)
    val signs = df.select(col("id"),
      when(VecKernels.dotLit(col("a"), w2) >= 0, 1L).otherwise(0L).as("k"),
      when(dotLitHof(col("a"), w2) >= 0, 1L).otherwise(0L).as("h"))
      .orderBy("id").collect()
    signs.foreach { r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}") }
  }

  test("kernels survive both codegen and interpreted evaluation") {
    // eval() path: wrap in a filter over a tiny local relation with
    // codegen disabled via config toggle on a dedicated plan
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val r = vecs.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
      assert(r.length == 3)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
