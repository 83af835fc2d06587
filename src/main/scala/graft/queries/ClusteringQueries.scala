package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.{arrayDot, l2Norm}
import graft.operators.KMeans

/** Embedding-space clustering for the curation pipeline:
  *
  *   - [[sim_kmeans]]: distributed Lloyd's k-means (k = 8, 2 rounds,
  *     deterministic lowest-id seed) — the learned-codebook operator
  *     behind semantic dedup and IVF/PQ training.
  *   - [[dedup_semantic]]: SemDeDup-style semantic dedup report — per
  *     cluster, the representative nearest its centroid plus how many
  *     members sit within the near-duplicate cosine band of that
  *     representative. Members compare against their cluster's ONE
  *     representative (O(n) total), never pairwise — that is the whole
  *     point of clustering first at 100 TB.
  *
  * Both are verified against a fully-unrolled DuckDB oracle (the same
  * seed → assign → exact-decimal-mean loop, iteration by iteration), so
  * the driver's hash gate covers the entire fixed point, not just the
  * final projection.
  */
object ClusteringQueries {

  private val K = 8
  private val Iters = 2
  /** Same near-dup cosine band as `dedup_embedding`. */
  private val CosThreshold = 0.25

  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables.rebalance(Tables.embeddings(s, dir)).select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2Norm(col("v")))

  // ---------------------------------------------------------------- SQL
  private def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, 65),
       |    i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)])),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Argmin assignment of `n` against centroid CTE `cents`, named `out`. */
  private def assignSql(out: String, cents: String): String =
    s"""$out AS (SELECT vec_id, cluster FROM (
       |  SELECT n.vec_id, $cents.cluster,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |      (${dot(s"$cents.c", s"$cents.c")} -
       |       ${dot("n.v", s"$cents.c")} * 2) ASC,
       |      $cents.cluster ASC) AS r
       |  FROM n CROSS JOIN $cents) WHERE r = 1)""".stripMargin

  /** Exact-decimal 6dp-quantized means of assignment CTE `asn` → `out`. */
  private def meansSql(out: String, asn: String): String =
    s"""${out}d AS (
       |  SELECT $asn.cluster, u.dim,
       |    ROUND(CAST(SUM(u.x) AS DOUBLE) / COUNT(*), 6) AS m
       |  FROM u JOIN $asn USING (vec_id) GROUP BY $asn.cluster, u.dim),
       |$out AS (SELECT cluster, list(m ORDER BY dim) AS c
       |  FROM ${out}d GROUP BY cluster)""".stripMargin

  /** The full unrolled loop: n → c0 → a0 → c1 → a1 → c2 → a2. */
  private val kmeansCtes: String = {
    val vecSql =
      """e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS norm
        |FROM e)""".stripMargin
    val rounds = (1 to Iters).map { i =>
      s"""${meansSql(s"c$i", s"a${i - 1}")},
         |${assignSql(s"a$i", s"c$i")}""".stripMargin
    }.mkString(",\n")
    s"""$vecSql,
       |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
       |  v AS c
       |  FROM (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT $K)),
       |u AS (SELECT vec_id,
       |  unnest(range(1, len(v) + 1)) AS dim,
       |  unnest(list_transform(v, el -> CAST(el AS DECIMAL(28,14)))) AS x
       |  FROM n),
       |${assignSql("a0", "c0")},
       |$rounds""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------ Lloyd's k-means (k = 8)
    "sim_kmeans" -> QueryDef(
      (s, dir) => {
        val (asn, _) = KMeans.fit(vectors(s, dir), K, Iters)
        asn.select(col("vec_id"), col("cluster")).orderBy(col("vec_id"))
      },
      Some(s"""WITH $kmeansCtes
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
        FROM a$Iters ORDER BY vec_id""")),

    // ----------------------------- SemDeDup-style semantic dedup report
    "dedup_semantic" -> QueryDef(
      (s, dir) => {
        val vecs = vectors(s, dir)
        val snap = KMeans.fitSnapshot(vecs, K, Iters)
        // membership = the per-row argmin against the final centroid
        // snapshot, with the winning centroid vector carried as a
        // struct field (r17, guide §2.4): the old
        // crossJoin(broadcast(cents)) + groupBy(vec_id) min_by shape
        // paid a corpus-wide hash(vec_id) exchange carrying the full
        // vector payload (and a SortAggregate pair around it) just to
        // pick each row's own argmin. The argmin key is unchanged
        // (score, cluster) with the identical score expression, so
        // membership is bit-identical — now a zero-exchange map.
        val members = vecs
          .withColumn("a", KMeans.nearest(snap, col("v"),
            carryCentroid = true))
          .select(col("vec_id"), col("v"), col("norm"),
            col("a.cluster").as("cluster"), col("a.c").as("c"))
        // representative: the member nearest its centroid — full
        // squared L2, in the SAME association order as the oracle SQL
        // (v·v − 2·v·c + c·c), on the carried centroid
        val reps = members
          .withColumn("d",
            arrayDot(col("v"), col("v")) - arrayDot(col("v"), col("c")) * 2
              + arrayDot(col("c"), col("c")))
          .groupBy(col("cluster"))
          .agg(min_by(struct(col("vec_id"), col("v"), col("norm")),
            struct(col("d"), col("vec_id"))).as("r"))
          .select(col("cluster"), col("r.vec_id").as("rep_vec_id"),
            col("r.v").as("rv"), col("r.norm").as("rnorm"))
        members.join(broadcast(reps), "cluster")
          .withColumn("cos",
            arrayDot(col("v"), col("rv")) / (col("norm") * col("rnorm")))
          .groupBy(col("cluster"), col("rep_vec_id"))
          .agg(count(lit(1)).as("n_members"),
            sum(when(col("vec_id") =!= col("rep_vec_id")
              && col("cos") >= CosThreshold, 1L).otherwise(0L))
              .as("n_near_dup"))
          .orderBy(col("cluster"))
      },
      Some(s"""WITH $kmeansCtes,
        m AS (SELECT n.vec_id, n.v, n.norm, a$Iters.cluster
          FROM n JOIN a$Iters USING (vec_id)),
        sc AS (SELECT m.vec_id, m.cluster,
            (${dot("m.v", "m.v")} - ${dot("m.v", s"c$Iters.c")} * 2
              + ${dot(s"c$Iters.c", s"c$Iters.c")}) AS d
          FROM m JOIN c$Iters USING (cluster)),
        rep AS (SELECT sc.cluster, sc.vec_id AS rep_vec_id, m.v AS rv,
            m.norm AS rnorm
          FROM (SELECT cluster, vec_id,
              ROW_NUMBER() OVER (PARTITION BY cluster
                ORDER BY d ASC, vec_id ASC) AS r FROM sc) sc
          JOIN m ON sc.vec_id = m.vec_id WHERE sc.r = 1)
        SELECT m.cluster, rep.rep_vec_id,
          COUNT(*) AS n_members,
          CAST(SUM(CASE WHEN m.vec_id <> rep.rep_vec_id
            AND ${dot("m.v", "rep.rv")} / (m.norm * rep.rnorm)
              >= $CosThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
        FROM m JOIN rep ON m.cluster = rep.cluster
        GROUP BY m.cluster, rep.rep_vec_id ORDER BY m.cluster""")))
}
