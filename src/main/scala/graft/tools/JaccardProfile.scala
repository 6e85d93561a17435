package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dedup.Dedup

/** Phase profile for q_jaccard_pairs (bench: ~56-75 s at sf0.1 for only
  * 260k shingle rows / max df 25 — overhead, not data). Times each phase
  * of Dedup.jaccardPairs separately so the slow stage has a name. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.JaccardProfile"
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("jaccard-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jprof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val threshold = 0.4
    // Re-create jaccardPairs' phases inline, forcing each with a count.
    val sh0 = t("shingleTable") {
      val d = Dedup.shingleTable(docs, "doc_id", "text", 3); d.count(); d }
    val dfs = t("df+cap") {
      val d = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000); d.count(); d }
    val sh = t("join+persist") {
      val d = sh0.join(dfs, Seq("sh")).persist(); d.count(); d }
    val sizes = t("sizes") {
      val d = sh.groupBy("id").agg(count(lit(1)).as("sz")); d.count(); d }
    val pref = t("prefix-rank") {
      val d = sh.withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(col("df"), col("sh"))))
        .join(sizes, Seq("id"))
        .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
        .select(col("sh"), col("id"), col("sz"))
      d.count(); d }
    val cands = t("candidates") {
      val d = pref.select(col("sh"), col("id").as("ida"), col("sz").as("sza"))
        .join(pref.select(col("sh"), col("id").as("idb"), col("sz").as("szb")), Seq("sh"))
        .filter(col("ida") < col("idb"))
        .filter(lit(threshold) * greatest(col("sza"), col("szb")) - lit(1e-9)
          <= least(col("sza"), col("szb")))
        .select("ida", "idb", "sza", "szb").distinct()
      println(s"[jprof]   candidate rows = ${d.count()}"); d }
    t("verify+final") {
      val inter = cands
        .join(sh.select(col("id").as("ida"), col("sh")), Seq("ida"))
        .join(sh.select(col("id").as("idb"), col("sh")), Seq("idb", "sh"))
        .groupBy("ida", "idb", "sza", "szb").agg(count(lit(1)).as("inter"))
      val pairs = inter
        .withColumn("jraw",
          col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
        .filter(col("jraw") >= threshold)
      println(s"[jprof]   pairs = ${pairs.count()}") }
    t("end-to-end (as shipped)") {
      Dedup.jaccardPairs(docs, threshold).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
