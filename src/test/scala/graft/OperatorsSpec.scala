package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.{ExactlyOnce, ScoredId, TopKAggregator}

/** Exactly-once machinery, the bounded top-k aggregator, SQL function
  * registration, and approximate aggregates.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("upsertByKey is idempotent under duplicated input") {
    val clean = Seq(("k1", 1L, "a"), ("k2", 2L, "b"))
      .toDF("partitionKey", "ts", "value")
    val dup = clean.unionAll(clean).unionAll(
      Seq(("k1", 0L, "stale")).toDF("partitionKey", "ts", "value"))
    val out = ExactlyOnce.upsertByKey(dup, "partitionKey", "ts")
      .orderBy("partitionKey")
    assert(out.collect().map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("k1", "a"), ("k2", "b")))
  }

  test("writeFenced skips replayed epochs") {
    val ledger = Files.createTempDirectory("graft_ledger").toString
    var writes = 0
    val w1 = ExactlyOnce.writeFenced(spark, ledger, 7L)(() => writes += 1)
    val w2 = ExactlyOnce.writeFenced(spark, ledger, 7L)(() => writes += 1)
    val w3 = ExactlyOnce.writeFenced(spark, ledger, 8L)(() => writes += 1)
    assert(w1 && !w2 && w3)
    assert(writes == 2)
  }

  test("foreachBatch exactly-once: replayed batch leaves target unchanged") {
    val target = Files.createTempDirectory("graft_eo").toString
    val ledger = s"$target/_ledger"
    val batch = Seq(("k1", "v1"), ("k2", "v2")).toDF("partitionKey", "value")
    ExactlyOnce.foreachBatchExactlyOnce(target, ledger)(batch, 0L)
    ExactlyOnce.foreachBatchExactlyOnce(target, ledger)(batch, 0L) // replay
    ExactlyOnce.foreachBatchExactlyOnce(target, ledger)(batch, 1L)
    val n = spark.read.parquet(target).count()
    assert(n == 4, s"expected 2 epochs x 2 rows, got $n")
  }

  test("TopKAggregator: k-bounded, deterministic, matches window top-k") {
    val data = queries.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        col("o_orderkey").as("id"),
        col("o_totalprice").as("score"))
    val viaAgg = data.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => ScoredId(t._2, t._3))
      .agg(new TopKAggregator(3).toColumn)
      .flatMap { case (cust, top) => top.map(s => (cust, s.id, s.score)) }
      .toDF("cust", "id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = data
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey").as("cust"), col("id"), col("score"))
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("java_string_hash registered as a SQL function") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT java_string_hash('test_db.events.0') AS h").head().getInt(0)
    assert(got == "test_db.events.0".hashCode)
  }

  test("ConnectedComponents: chain graph converges in diameter+1 rounds, one job each") {
    // chain 0-1-2-...-9: worst case for min-label propagation (label 0
    // travels one hop per round). diameter = 9, plus one round that
    // observes zero changes = 10 rounds; the fold-in convergence check
    // means each round is a single job (no separate count() pass).
    val vertices = (0L to 9L).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) =
      operators.ConnectedComponents.runCounted(vertices, edges)
    val got = labels.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L to 9L).map(i => (i, 0L)))
    assert(rounds == 10, s"expected diameter+1 = 10 rounds, got $rounds")
  }

  test("ConnectedComponents.runStar: 1000-node chain converges in O(log n) rounds") {
    // The adversarial case for min-label propagation (would need ~1000
    // rounds); large-star/small-star halves path lengths every
    // alternation, so a 1000-node chain must converge well inside
    // log-ish rounds.
    val n = 1000
    val vertices = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) =
      operators.ConnectedComponents.runStarCounted(vertices, edges)
    assert(rounds <= 15, s"expected O(log n) alternations, got $rounds")
    val got = labels.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until n.toLong).map(i => (i, 0L)))
  }

  test("ConnectedComponents.runStar matches min-label on a multi-component graph") {
    // components: {0..4} (star), {10,11,12} (triangle), {20,21} (edge),
    // {30} (singleton)
    val vertices = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L))
      .toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 2L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)).toDF("a", "b")
    val star = operators.ConnectedComponents.runStar(vertices, edges)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val minl = operators.ConnectedComponents.run(vertices, edges)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(star == minl)
    assert(star.toMap.apply(30L) == 30L) // singleton labels itself
  }

  test("graph_pagerank: singletons settle at the damping floor, hubs above it") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val paired = queries.DedupQueries.minhashPairs(spark, sf)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pr.nonEmpty)
    // a doc with no candidate edges receives no contributions: its rank
    // is exactly the damping floor 0.15 in micros after round 1
    pr.foreach { case (id, rank) =>
      if (!paired(id)) assert(rank == 150000L, s"singleton $id rank $rank")
      else assert(rank > 150000L, s"paired doc $id rank $rank not above floor")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val l = queries.Tables.lineitem(spark, sf)
    val exact = l.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = l.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
