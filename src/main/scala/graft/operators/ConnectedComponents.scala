package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns
  * near-duplicate candidate PAIRS into duplicate CLUSTERS (every doc
  * labeled with the smallest doc id reachable through the pair graph;
  * singletons label themselves).
  *
  * Algorithm: each round, every vertex takes the min of its own label
  * and its neighbors' labels; stops when no label changes. Rounds needed
  * = graph diameter (tiny for dedup graphs — near-dup components are
  * shallow). Each round is one shuffle join + one aggregation;
  * `localCheckpoint` truncates the growing lineage so round N's plan
  * doesn't replay rounds 1..N-1 — the standard iterative-algorithm
  * pattern on DataFrames (large-star/small-star is the same loop with
  * smarter edge rewriting for web-scale graphs).
  */
object ConnectedComponents {

  /** @param vertices single column `id` (long)
    * @param edges two columns `a`, `b` (long pairs, either orientation)
    * @return `id`, `cluster_id` = min id in the component
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val biEdges = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()

    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val propagated = biEdges
        .join(labels, biEdges("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp"))
        .unionAll(propagated)
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .filter(col("n.comp") =!= col("l.comp"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id"), col("comp").as("cluster_id"))
  }
}
