package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase profile of the triangle-census pipeline at the 30× corpus
  * (r12 verdict item 4 — profile BEFORE touching code, the
  * GRAPH_PROFILE_r12 pattern). Reproduces `graph_triangles`'s stages
  * with per-phase noop materialization under the session derivation
  * cache, the same smoke session shape (local[32], 64 shuffle
  * partitions, cached-plan AQE coalescing):
  *
  *   1. derivation — the shared checkpointed LSH pair frame, cold
  *   2. degree     — per-node degree aggregate over the pair leaf
  *   3. oriented   — low-degree-first orientation (two broadcast joins)
  *   4. wedges     — the oriented self-join's wedge stream, materialized
  *   5. full       — the declared query end-to-end (post-derivation),
  *                   where the wedge stream PIPELINES into the close
  *                   join instead of materializing
  *
  * Usage: runMain graft.GraphProfile [dir] (default /tmp/graft_scale —
  * run ScaleSmoke first to build the corpus).
  */
object GraphProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.dedup.derivationCache", "true")

    def phase(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      println(f"[graphprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    phase("derivation (cold)")(
      queries.DedupQueries.minhashPairsCheckpointed(spark, dir))

    val pairs = queries.DedupQueries.minhashPairsCheckpointed(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))
    phase("degree")(deg)

    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val bh = graft.operators.ConnectedComponents.hintIf(true)
    def oriented = pairs
      .join(bh(deg.select(col("id").as("a"), col("dg").as("da"))), "a")
      .join(bh(deg.select(col("id").as("b"), col("dg").as("db"))), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("src"),
        when(lowFirst, col("b")).otherwise(col("a")).as("dst"))
    phase("oriented")(oriented)

    def wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("x"),
        least(col("e1.dst"), col("e2.dst")).as("u"),
        greatest(col("e1.dst"), col("e2.dst")).as("v"))
    phase("wedges (materialized)")(wedges)

    (1 to 2).foreach { rep =>
      phase(s"full graph_triangles (post-derivation, rep $rep)")(
        SparkEntry.queries("graph_triangles")(spark, dir))
    }
    (1 to 2).foreach { rep =>
      phase(s"full graph_pagerank (post-derivation, rep $rep)")(
        SparkEntry.queries("graph_pagerank")(spark, dir))
    }
    spark.stop()
  }
}
