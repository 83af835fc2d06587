package graft

import org.apache.spark.sql.functions._

import graft.functions.JavaHash

/** JavaStringHash must equal java.lang.String.hashCode bit-for-bit, in
  * both the interpreted and whole-stage-codegen paths, and the partition
  * assignment must equal the reference's abs(hashCode % n)
  * (FlinkCDCSimplePartitioner.scala:13).
  */
class JavaHashSpec extends SparkSpec {
  import spark.implicits._

  test("expression equals String.hashCode (codegen path over a DataFrame)") {
    val samples = Seq("", "a", "test_db.events.0", "db.table.no_pk",
      "polygenelubricants", // hashCode == Integer.MIN_VALUE
      "ünïcödé-キー", "x" * 500)
    val got = samples.toDF("s")
      .select(col("s"), JavaHash.javaStringHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach { s => assert(got(s) == s.hashCode, s"for '$s'") }
  }

  test("partitionFor equals abs(hashCode % n) with Java sign semantics") {
    val samples = Seq("test_db.events.1", "polygenelubricants", "a", "zz")
    val got = samples.toDF("s")
      .select(col("s"), JavaHash.partitionFor(col("s"), 12).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach { s =>
      assert(got(s) == math.abs(s.hashCode % 12), s"for '$s'")
    }
  }

  test("property: 200 seeded-random strings hash identically") {
    val rnd = new scala.util.Random(42)
    val samples = (1 to 200).map { _ =>
      val len = rnd.nextInt(40)
      (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val got = samples.distinct.toDF("s")
      .select(col("s"), JavaHash.javaStringHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach(s => assert(got(s) == s.hashCode, s"for '$s'"))
  }
}
