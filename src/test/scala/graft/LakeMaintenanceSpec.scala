package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.LakeMaintenance

class LakeMaintenanceSpec extends SparkSpec {

  test("compaction reduces file count without changing data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val src = queries.Tables.events(spark, sf)
    src.repartition(40).write.parquet(dir) // simulate 40 micro-batch files
    val before = new java.io.File(dir).list()
      .count(_.endsWith(".parquet"))
    assert(before >= 40)
    LakeMaintenance.compact(spark, dir)
    val after = new java.io.File(dir).list()
      .count(_.endsWith(".parquet"))
    assert(after < before, s"$after should be < $before")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("event_id"))).head().getLong(0) ==
      src.agg(sum(col("event_id"))).head().getLong(0))
  }

  test("schema evolution: old epochs null-fill newly added columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/epoch=0")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/epoch=1")
    val all = LakeMaintenance.readEvolved(spark, dir)
    assert(all.columns.toSet == Set("id", "v", "score", "epoch"))
    assert(all.count() == 2)
    assert(all.filter(col("id") === 1L).select(col("score")).head().isNullAt(0))
    assert(all.filter(col("id") === 2L).select(col("score")).head().getDouble(0) == 9.5)
  }
}
