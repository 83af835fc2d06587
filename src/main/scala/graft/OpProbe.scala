package graft

import org.apache.spark.sql.SparkSession

/** Single-operator timing probe under the ScaleSmoke session shape
  * (local[32], 64 shuffle partitions, AQE) — for iterating on ONE
  * query's physical plan against any fixture dir (including the 30×
  * tables a ScaleSmoke run leaves in /tmp/graft_scale) without paying
  * the full smoke:
  *
  *   sbt "runMain graft.OpProbe graph_pagerank /tmp/graft_scale 2"
  *
  * Prints each noop-sink pass's seconds; pass 1 is cold (the smoke's
  * methodology), later passes steady-state.
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpProbe <query> <sfDir> [reps]")
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce cached plans: a persisted partial frame
      // otherwise freezes the full shuffle width and every tiny
      // downstream job launches a stage of mostly-empty tasks
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // attribution hooks (see ExactlyOnce.phaseTimed, PageRank.run)
      .config("spark.graft.state.timing",
        sys.env.getOrElse("SPARK_GRAFT_STATE_TIMING", "false"))
      .config("spark.graft.graph.timing",
        sys.env.getOrElse("SPARK_GRAFT_GRAPH_TIMING", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[op-probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
