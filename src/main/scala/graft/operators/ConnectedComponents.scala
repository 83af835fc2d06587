package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns
  * near-duplicate candidate PAIRS into duplicate CLUSTERS (every doc
  * labeled with the smallest doc id reachable through the pair graph;
  * singletons label themselves).
  *
  * Algorithm: each round, every vertex takes the min of its own label
  * and its neighbors' labels; stops when no label changes. Rounds needed
  * = graph diameter (tiny for dedup graphs — near-dup components are
  * shallow). Each round is ONE Spark job: the propagation join +
  * aggregation also carries each vertex's previous label, and the
  * number of changed labels is collected as an observed metric
  * (`Observation`) during the same materialization — no separate
  * convergence-check job. `localCheckpoint` truncates the growing
  * lineage so round N's plan doesn't replay rounds 1..N-1 — the
  * standard iterative-algorithm pattern on DataFrames
  * (large-star/small-star is the same loop with smarter edge rewriting
  * for web-scale graphs).
  */
object ConnectedComponents {

  /** @param vertices single column `id` (long)
    * @param edges two columns `a`, `b` (long pairs, either orientation)
    * @return `id`, `cluster_id` = min id in the component
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame =
    runCounted(vertices, edges, maxIter)._1

  /** [[run]] plus the number of propagation rounds executed (diameter
    * rounds to converge + one round that observes zero changes).
    */
  def runCounted(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
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
        .select(col("dst").as("id"), col("comp"),
          lit(null).cast("long").as("old"))
      // every vertex appears exactly once in `labels`, so max(old) per id
      // recovers its previous label next to the new min(comp)
      val merged = labels
        .select(col("id"), col("comp"), col("comp").as("old"))
        .unionAll(propagated)
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"), max(col("old")).as("old"))
      val obs = Observation()
      val next = merged
        .observe(obs, count(when(col("comp") =!= col("old"), 1)).as("changed"))
        .select(col("id"), col("comp"))
        .localCheckpoint() // eager: the one job per round; obs fills here
      val changed = obs.get("changed").asInstanceOf[Long]
      labels = next
      converged = changed == 0
      iter += 1
    }
    (labels.select(col("id"), col("comp").as("cluster_id")), iter)
  }
}
