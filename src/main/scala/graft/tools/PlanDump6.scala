package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-6 plan evidence: `.explain("formatted")` for each named query,
  * written to plans/r06/<query>_<tag>.txt. Usage:
  *   runMain graft.tools.PlanDump6 <sfDir> <tag> q_a,q_b,...
  * Pinned queries materialize their pin during construction; the dumped
  * plan is exactly what the bench's noop sink executes afterwards. For the
  * queries whose interesting plan is the pre-pin computation (q_edges and
  * every graph query's extraction prologue), the extraction plan itself is
  * dumped separately under `extraction_<tag>.txt`.
  */
object PlanDump6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val tag = if (args.length > 1) args(1) else "before"
    val names = if (args.length > 2) args(2).split(",").map(_.trim).toSeq
                else Seq("q_triangles")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("plans/r06").mkdirs()
    // the shared extraction prologue, un-pinned, so Exchange counts in the
    // extraction itself are visible (inside a query it hides behind the pin)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ext = graft.ingest.EdgeExtraction.cooccurrence(li, "l_suppkey", "l_partkey", 1000)
    Files.writeString(Paths.get(s"plans/r06/extraction_$tag.txt"),
      ext.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    // q_triangles / q_ari execute during query construction (count() /
    // collect()s), so their final plans are literals; dump the actual
    // triangle-count computation plan as supplementary evidence.
    locally {
      import org.apache.spark.sql.functions.col
      val e = graft.io.Iterate.pin(ext.toDF()).as[graft.model.Edge](
        org.apache.spark.sql.Encoders.product[graft.model.Edge])
      val deg = graft.graph.GraphOps.degrees(e)
      val or = e.toDF()
        .join(deg.select(col("id").as("src"), col("degree").as("ds")), Seq("src"))
        .join(deg.select(col("id").as("dst"), col("degree").as("dd")), Seq("dst"))
      // the count plan: reconstruct via the public API path
      val plan = {
        val adjPlanHolder = new StringBuilder
        // use the internal shape through the public count() path is not
        // explainable (it is an action); rebuild the identical frame:
        val oriented = or.select(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.struct(col("ds"), col("src")) <
              org.apache.spark.sql.functions.struct(col("dd"), col("dst")), col("src"))
            .otherwise(col("dst")).as("u"),
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.struct(col("ds"), col("src")) <
              org.apache.spark.sql.functions.struct(col("dd"), col("dst")), col("dst"))
            .otherwise(col("src")).as("v"))
        val adj = oriented.groupBy(col("u")).agg(
          org.apache.spark.sql.functions.sort_array(
            org.apache.spark.sql.functions.collect_list(col("v"))).as("nbrs"))
        val annotated = oriented
          .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
          .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
          .select(graft.algo.GraphKernels.sortedIntersectCount(col("nu"), col("nv")).as("t"))
          .agg(org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum(col("t")),
            org.apache.spark.sql.functions.lit(0L)).as("n"))
        adjPlanHolder.append(annotated.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        adjPlanHolder.toString
      }
      Files.writeString(Paths.get(s"plans/r06/q_triangles_internal_$tag.txt"), plan)
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    // jaccard/containment pin their pair sets during construction, so the
    // public query plans explain as bare RDD scans; dump the actual pre-pin
    // pair computation as supplementary evidence (same convention as
    // q_triangles_internal).
    // tag "dedup_r6start": verbatim replica of the ROUND-6-MID (pre-
    // ranked-cache) jaccard/containment shapes, dumped once as the
    // `_internal_before` evidence for the shared-cache + positional-bound
    // change (the live code no longer builds those shapes).
    if (tag == "dedup_r6start") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def oldCache() = graft.dedup.Dedup.shingleTable(docs, "doc_id", "text", 3)
        .repartition(col("sh"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
        .filter(col("df") <= 1000)
        .persist()
      locally { // old jaccardPairs
        val t = 0.4
        val sh = oldCache()
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
        val pref = sh
          .withColumn("rk", row_number().over(
            Window.partitionBy("id").orderBy(col("df"), col("sh"))))
          .join(sizes, Seq("id"))
          .filter(col("rk") <= col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1)
          .select(col("sh"), col("id"), col("sz"), col("rk"))
        val cands = pref.select(col("sh"), col("id").as("ida"), col("sz").as("sza"),
            col("rk").as("rka"))
          .join(pref.select(col("sh"), col("id").as("idb"), col("sz").as("szb"),
            col("rk").as("rkb")), Seq("sh"))
          .filter(col("ida") < col("idb"))
          .filter(lit(t) * greatest(col("sza"), col("szb")) - lit(1e-9)
            <= least(col("sza"), col("szb")))
          .groupBy("ida", "idb", "sza", "szb")
          .agg(count(lit(1)).as("cnt"), max(col("rka")).as("ma"), max(col("rkb")).as("mb"))
          .filter(col("cnt") + least(col("sza") - col("ma"), col("szb") - col("mb"))
            >= lit(t) / (1.0 + t) * (col("sza") + col("szb")) - lit(1e-9))
          .select("ida", "idb", "sza", "szb")
        val inter = cands
          .join(sh.select(col("id").as("ida"), col("sh")), Seq("ida"))
          .join(sh.select(col("id").as("idb"), col("sh")), Seq("idb", "sh"))
          .groupBy("ida", "idb", "sza", "szb").agg(count(lit(1)).as("inter"))
        val pairs = inter
          .withColumn("jraw",
            col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .filter(col("jraw") >= t)
          .select(col("ida"), col("idb"), round(col("jraw"), 6).as("jaccard"))
        Files.writeString(Paths.get(s"plans/r06/q_jaccard_pairs_internal_before.txt"),
          pairs.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      locally { // old containmentPairs
        val t = 0.6
        val sh = oldCache()
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
        val pref = sh
          .withColumn("rk", row_number().over(
            Window.partitionBy("id").orderBy(col("df"), col("sh"))))
          .join(sizes, Seq("id"))
          .filter(col("rk") <= col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1)
          .select(col("sh"), col("id"), col("sz"))
        val cands = pref.select(col("sh"), col("id").as("ida"), col("sz").as("sza"))
          .join(sh.select(col("sh"), col("id").as("idb")), Seq("sh"))
          .filter(col("ida") =!= col("idb"))
          .select("ida", "idb", "sza").distinct()
          .join(sizes.select(col("id").as("idb"), col("sz").as("szb")), Seq("idb"))
          .filter(lit(t) * col("sza") - lit(1e-9) <= col("szb"))
          .select("ida", "idb", "sza")
        val inter = cands
          .join(sh.select(col("id").as("ida"), col("sh")), Seq("ida"))
          .join(sh.select(col("id").as("idb"), col("sh")), Seq("idb", "sh"))
          .groupBy("ida", "idb", "sza").agg(count(lit(1)).as("inter"))
        val pairs = inter
          .withColumn("craw", col("inter").cast("double") / col("sza"))
          .filter(col("craw") >= t)
          .select(col("ida"), col("idb"), round(col("craw"), 6).as("containment"))
        Files.writeString(Paths.get(s"plans/r06/q_containment_internal_before.txt"),
          pairs.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      spark.stop()
      return
    }
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val (jp, jsh) = graft.dedup.Dedup.jaccardPairsFrame(docs, 0.4)
      Files.writeString(Paths.get(s"plans/r06/q_jaccard_pairs_internal_$tag.txt"),
        jp.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      jsh.unpersist(blocking = false)
      val (cp, csh) = graft.dedup.Dedup.containmentPairsFrame(docs, 0.6)
      Files.writeString(Paths.get(s"plans/r06/q_containment_internal_$tag.txt"),
        cp.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      csh.unpersist(blocking = false)
    }
    // q_lpa1's one-shot vote runs during construction (bestLabels collect),
    // so its public plan is a parallelize scan; dump the plan-side step()
    // (the over-budget fallback and pre-change shape) and the map-state
    // vote plan it replaced it with.
    locally {
      import org.apache.spark.sql.functions.col
      import graft.util.StateMap
      val li2 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val e = graft.io.Iterate.pin(
        graft.ingest.EdgeExtraction.cooccurrence(li2, "l_suppkey", "l_partkey", 1000).toDF())
        .as[graft.model.Edge](org.apache.spark.sql.Encoders.product[graft.model.Edge])
      val labels = graft.graph.GraphOps.vertices(e)
        .select(col("id"), (col("id") % 3).as("label"))
      val symP = graft.graph.GraphOps.symmetrize(e).select("src", "dst")
      val stepPlan = graft.algo.LabelPropagation.step(symP, labels)
        .select(col("id"), col("bestLabel").as("label"))
      Files.writeString(Paths.get(s"plans/r06/q_lpa1_internal_stepform_$tag.txt"),
        stepPlan.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      val labB = spark.sparkContext.broadcast(StateMap.longLong(Array(0L), Array(0L), 1))
      val mapPlan = graft.algo.LabelPropagation.stepPlanMap(
        symP, new StateMap.Ref(labB), weighted = false,
        org.apache.spark.sql.functions.lit(true))
      Files.writeString(Paths.get(s"plans/r06/q_lpa1_internal_mapform_$tag.txt"),
        mapPlan.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      labB.destroy()
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r06/${name}_$tag.txt"), plan)
      // drop pins between queries so construction-time caches don't pile up
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      System.err.println(s"[plandump] $name -> plans/r06/${name}_$tag.txt")
    }
    spark.stop()
  }
}
