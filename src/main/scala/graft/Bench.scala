package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes the headline queries (one per major
  * operator family — set SPARK_GRAFT_BENCH_ALL=1 for the full declared
  * surface) on SPARK_GRAFT_SF_DIR and prints ONE JSON line with
  * per-query seconds.
  *
  * A warm-up pass (table counts + one tiny query) runs before timing so
  * the first measured query doesn't absorb JVM/codegen/classloading
  * startup; queries run in name order for stable attribution.
  */
object Bench {

  /** One representative per family: scan+agg, shuffle join, broadcast
    * join, window, CDC enrichment, CDC routing, MinHash LSH, inverted-
    * index jaccard, brute-force kNN, text analysis.
    */
  val headline: Seq[String] = Seq(
    "rel_q1_agg", "rel_join_shuffle", "rel_join_broadcast", "rel_window",
    "cdc_enrich_mysql", "cdc_route_topic_partition",
    "dedup_minhash_pairs", "dedup_ngram_jaccard",
    "sim_knn_brute", "txt_tokens")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // runtime row-level filtering for big SMJs (a 100 TB lever; ~free here)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table and run one query end-to-end untimed
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try graft.queries.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }
    try SparkEntry.queries("rel_q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }

    // per-query shuffle-byte accounting: stage-completion metrics
    // accumulated across the timed pass (listener delivery is async, so
    // a short settle runs after each query before the delta is read —
    // close enough for the MB-granularity the artifact reports)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) shuffleBytes.addAndGet(
            m.shuffleReadMetrics.totalBytesRead +
              m.shuffleWriteMetrics.bytesWritten)
        }
      })

    val timedSet =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.toSeq
      else SparkEntry.queries.toSeq.filter(q => headline.contains(q._1))
    val shuffleMb = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = timedSet.sortBy(_._1).map { case (name, fn) =>
      // full materialization through the noop sink: unlike count(),
      // Catalyst cannot eliminate the final ORDER BY under an aggregate,
      // so the bench pays the same sort stages the Verify parquet dump
      // does. A failed query records the sentinel -1, not its
      // time-to-failure (the error goes to stderr).
      try {
        // One untimed pass first: the first execution of a plan is
        // dominated by codegen + JIT of its generated classes (~5 s vs
        // ~1 s steady-state for the CDC queries on this box) — a local
        // single-JVM artifact that amortizes to zero on a real cluster
        // run, where the same stage executes thousands of tasks. The
        // timed pass measures steady-state throughput.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // drain warm-up garbage outside the timed window, so the
        // allocation burst doesn't bill a GC pause to the timed pass
        System.gc()
        Thread.sleep(200) // settle async listener events from the warm pass
        val sb0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        shuffleMb(name) =
          math.round((shuffleBytes.get() - sb0) / 1048576.0 * 100) / 100.0
        name -> dt
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sm = shuffleMb.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.filter(_._2 >= 0).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$sm,"sf":"$sfDir","failed":$failed,"materialization":"noop-sink","methodology":"per-query warm run, then timed steady-state run"}""")
    spark.stop()
  }
}
