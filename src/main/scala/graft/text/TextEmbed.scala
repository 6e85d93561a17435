package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Portable

/** Deterministic text embeddings via the hashing trick (signed feature
  * hashing), so the similarity surface (lshPairs / ivfTopK / topK) runs
  * end-to-end from raw text instead of presupplied embedding columns.
  *
  * Each token hashes ONCE (portable md5): bucket = h mod dim picks the
  * component, bit 8 of h picks the sign; a document's raw vector is the
  * signed token-count per bucket, L2-normalized. Identical token
  * multisets give identical embeddings (planted duplicates collide
  * exactly), and every value is DuckDB-replicable bit-for-bit — integer
  * component sums, one sqrt, one division.
  *
  * Shape at 100 TB: explode tokens -> map-side hash -> ONE (doc, dim)
  * aggregation (partial combine does most work map-side since dim is
  * small) -> per-doc norm join. No HOF lambdas on the hot path; the md5
  * is a codegen'd map-side expression.
  */
object TextEmbed {

  private def hashed(docs: DataFrame, dim: Int, idCol: String, textCol: String) = {
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("w"))
    tok.select(col("doc_id"),
        Portable.u32(Portable.key(lit("eb"), col("w"))).as("h"))
      .select(col("doc_id"),
        pmod(col("h"), lit(dim.toLong)).cast("int").as("dim"),
        when(pmod(floor(col("h") / 256L), lit(2L)) === 0L, 1L).otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("raw"))
  }

  /** Embedding as rows (doc_id, dim, value) with every dim present
    * (zero-filled) — the oracle-friendly shape. */
  def embeddingRows(docs: DataFrame, dim: Int = 16,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val comp = hashed(docs, dim, idCol, textCol)
    val norm = comp.groupBy("doc_id")
      .agg(sqrt(sum(col("raw") * col("raw")).cast("double")).as("nrm"))
    val grid = docs.select(col(idCol).cast("long").as("doc_id"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(dim - 1))).as("dim"))
    grid.join(comp, Seq("doc_id", "dim"), "left")
      .join(norm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dim"),
        when(col("nrm") > 0,
          coalesce(col("raw"), lit(0L)).cast("double") / col("nrm"))
          .otherwise(0.0).as("value"))
  }

  /** Embedding as (vec_id, embedding array<double>) — the similarity-surface
    * shape (drop-in for the embeddings table). Array assembly is
    * sort-collect + struct-field extraction: no higher-order function. */
  def embeddings(docs: DataFrame, dim: Int = 16,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    embeddingRows(docs, dim, idCol, textCol)
      .groupBy(col("doc_id").as("vec_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("value"))))
        .getField("value").as("embedding"))
}
