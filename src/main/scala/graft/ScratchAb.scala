package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B timer for a handful of ops at 30x — NOT part of the
  * surface; delete before round end. Usage:
  *   sbt "runMain graft.ScratchAb dedup_canonical graph_triangles"
  */
object ScratchAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scale"
    val ops = if (args.nonEmpty) args.toSeq
      else Seq("dedup_clusters_star", "dedup_canonical", "graph_triangles")
    // two passes: report both cold and warm
    (1 to 2).foreach { pass =>
      ops.foreach { op =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(op)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"AB pass=$pass op=$op rows=$n sec=$s%.2f")
      }
    }
    spark.stop()
  }
}
