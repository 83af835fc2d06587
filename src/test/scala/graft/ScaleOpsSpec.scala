package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Scale-pattern operators: salted joins/aggregations equivalence, and
  * bucketed tables for co-located (shuffle-free) joins.
  */
class ScaleOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val o = queries.Tables.orders(spark, sf)
    val c = queries.Tables.customer(spark, sf)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    val salted = Salting.saltedJoin(o, c,
        o("o_custkey"), c("c_custkey"), o("o_orderkey"), n = 8)
      .select(col("o_orderkey"), col("c_name"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted aggregation equals plain groupBy count") {
    val o = queries.Tables.orders(spark, sf)
    val plain = o.groupBy(col("o_custkey").as("__k"))
      .agg(count(lit(1)).as("n"))
    val salted = Salting.saltedCount(o, col("o_custkey"),
      col("o_orderkey"), n = 8)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without an exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end
    val o = queries.Tables.orders(spark, sf)
    val c = queries.Tables.customer(spark, sf)
    o.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("graft_orders_b")
    c.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("graft_cust_b")
    val j = spark.table("graft_orders_b").join(
      spark.table("graft_cust_b"),
      col("o_custkey") === col("c_custkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    // both sides bucketed on the join key: no shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(j.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_cust_b")
  }
}
