package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** File-format scan coverage (SURVEY §2.2 row 1): CSV and JSON
  * round-trips against the parquet source of truth, plus partitioned
  * parquet writes with partition pruning — the lake-side surface a CDC
  * landing zone needs.
  */
class FormatsSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_fmt").toString

  test("csv round-trip preserves values") {
    val src = queries.Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/nation_csv")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0)
  }

  test("json round-trip preserves values") {
    val src = queries.Tables.region(spark, sf)
    src.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.schema(src.schema).json(s"$tmp/region_json")
    assert(back.exceptAll(src).count() == 0 && back.count() == src.count())
  }

  test("orc round-trip preserves values (the third columnar landing format)") {
    val src = queries.Tables.supplier(spark, sf)
    src.write.mode("overwrite").orc(s"$tmp/supplier_orc")
    val back = spark.read.schema(src.schema).orc(s"$tmp/supplier_orc")
    assert(back.exceptAll(src).count() == 0 && back.count() == src.count())
  }

  test("partitioned parquet write + partition pruning on read") {
    val src = queries.Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
    src.write.mode("overwrite").partitionBy("status")
      .parquet(s"$tmp/orders_part")
    val one = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("status") === "F")
    val plan = one.queryExecution.executedPlan.toString
    // pruning: only the status=F directory is scanned
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan)
    val expected = src.filter(col("o_orderstatus") === "F").count()
    assert(one.count() == expected)
  }

  test("debezium json lines parse with the typed envelope schema") {
    import graft.model.CdcEnvelope
    val lines = sources.CdcReplay.batch(spark, sf)
    val parsed = lines.select(
      from_json(col("value"), CdcEnvelope.mysqlEnvelope).as("e"))
      .select(col("e.source.db"), col("e.op"), col("e.after"))
    assert(parsed.count() == 1000)
    assert(parsed.filter(col("db") === "test_db").count() == 1000)
    // delete rows (op=d) have null after image
    assert(parsed.filter(col("op") === "d" && col("after").isNull).count() == 100)
  }
}
