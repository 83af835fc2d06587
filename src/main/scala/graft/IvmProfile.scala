package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-epoch overhead attribution for the chained durable-state
  * pipeline (r9 verdict item 1): drives the SAME six-materializer
  * CDC→IVM chain as ScaleSmoke's `cdc_ivm_e2e` arm — replay → enrich
  * → versioned replica → signed deltas → signed rollup → two-stage
  * join-view cascade — on the sf0.001 fixture, with
  * `spark.graft.state.timing=true` so every `advanceStateBucketed`
  * prints its fence/probe/write/retire phase seconds.
  *
  * The steady epochs ingest 8 rows: at that size the computation is
  * ~zero, so the printed epoch time IS the pipeline's fixed per-epoch
  * cost, phase-attributed. A near-empty epoch dominated by `write`
  * lines means parquet-commit fixed cost; by `probe`/`fence` lines,
  * driver-side job or ledger overhead.
  *
  *   sbt "runMain graft.IvmProfile"          (3 steady epochs)
  *   sbt "runMain graft.IvmProfile 5"        (5 steady epochs)
  *   sbt "runMain graft.IvmProfile 3 /tmp/graft_scale/events.parquet"
  *     (attribute at the 30x scale a prior ScaleSmoke left behind)
  */
object IvmProfile {

  def main(args: Array[String]): Unit = {
    val steadyEpochs = args.headOption.map(_.toInt).getOrElse(3)
    val eventsSrc = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // let AQE coalesce CACHED plans too: the chained pipeline persists
      // its per-epoch partials, and without this the persist freezes the
      // full shuffle width — every downstream probe/write job of an
      // 8-row epoch launches ~64 mostly-empty tasks
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.state.timing", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val ss: SparkSession = spark
    import spark.implicits._

    // bucket count is the data-term lever: a steady epoch reads and
    // rewrites touched_buckets x (state_mass / buckets) rows, so the
    // count must be sized to the state mass (args(2); the 30x profile
    // at 64 buckets showed the replica write dominating the floor)
    val IvmBuckets = args.lift(2).map(_.toInt).getOrElse(64)
    val dir = "/tmp/graft_ivmprof"
    val feed = s"$dir/feed"
    val rep = s"$dir/replica"
    val roll = s"$dir/rollup"
    val v1 = s"$dir/view1"
    val v2 = s"$dir/view2"
    val hfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(dir), true)

    val evAll = eventsSrc.map(spark.read.parquet(_))
      .getOrElse(queries.Tables.events(spark, "/root/testdata/sf0.001"))
    evAll.repartition(1).write.mode("overwrite")
      .parquet(s"$feed/events.parquet")
    val maxEvId = evAll.agg(max(col("event_id"))).head().getLong(0)
    def steadyEvents(e: Int) = evAll.orderBy(col("event_id")).limit(8)
      .withColumn("event_id", col("event_id") + lit(maxEvId + e * 1000L))

    val dim1Rows = evAll.select(col("event_type").cast("string"))
      .distinct()
      .select(col("event_type").as("d_et"),
        upper(col("event_type").substr(1, 1)).as("category"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val dim2Rows = dim1Rows.map(_._2).distinct.sorted
      .map(c => (c, (c.length + 1).toLong))
    def dim1Df(rows: Seq[(String, String)], s: Int) =
      rows.toDF("d_et", "category").withColumn("s", lit(s))
    def dim2Df(rows: Seq[(String, Long)], s: Int) =
      rows.toDF("cat2", "boost").withColumn("s", lit(s))

    val epochSecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val body = (batch: org.apache.spark.sql.DataFrame, id: Long) => {
      val t0 = System.nanoTime()
      val enr = graft.operators.CdcEnrichment.enrichMySql(
        batch.select(col("value")).as[String], queries.CdcQueries.config)
        .toDF().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def step[T](tag: String)(f: => T): T = {
        val s0 = System.nanoTime()
        val r = f
        println(f"[ivm-profile]   step $tag ${(System.nanoTime() - s0) / 1e9}%.3f s")
        r
      }
      try {
        val deltas = graft.operators.CdcDeltas.signedDeltas(enr)
          .select(col("image").getItem("event_type").as("event_type"),
            col("image").getItem("value").as("value"), col("sign"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // no serial head counts (see ScaleSmoke's arm): the forked
          // consumers fill both caches on first touch
          val (d1, d2) = if (id == 0)
            (dim1Df(dim1Rows, 1), dim2Df(dim2Rows, 1))
          else (dim1Df(Nil, 1), dim2Df(Nil, 1))
          // replica, rollup, and the view cascade are independent
          // states fed by the SAME cached inputs — fork/join so the
          // epoch pays max(branches), not their sum
          graft.operators.Concurrent.all[Any](spark)(
            () => step("replica")(
              graft.operators.CdcApply.materializerVersioned(
                spark, rep, IvmBuckets)(enr, id)),
            () => step("rollup")(
              graft.streaming.StreamingRollup.materializerSigned(
                spark, roll, Seq("event_type"), Seq("v_sum" -> "value"),
                "sign", IvmBuckets)(deltas, id)),
            () => {
              // staged cascade: jv1's advances commit WHILE jv2
              // prepares from jv1's (pre-commit-derived) increment;
              // the downstream handoff pre-computes jv2's left bucket
              // set inside jv1's prepare so jv2 pays no probe job
              val (inc1, jv2Left, commit1) = step("jv1-prepare")(
                graft.streaming.StreamingJoinView.materializerSignedCascade(
                  spark, v1, Seq("event_type"), Seq("d_et"),
                  Some("sign"), Some("s"), IvmBuckets,
                  downstream = Some((Seq("category"), IvmBuckets)))(
                  deltas, d1, id))
              graft.operators.Concurrent.both(spark)(
                step("jv1-commit")(commit1()),
                step("jv2")(graft.streaming.StreamingJoinView
                  .materializerSigned(spark, v2, Seq("category"),
                    Seq("cat2"), Some("__m"), Some("s"), IvmBuckets,
                    precomputedLeft = jv2Left)(
                    inc1, d2, id)))
            })
          val sec = (System.nanoTime() - t0) / 1e9
          val n = enr.count() // warm-cache bookkeeping read
          epochSecs += ((id, sec, n))
          println(f"[ivm-profile] epoch $id: $sec%.2f s, $n rows")
        } finally deltas.unpersist()
      } finally enr.unpersist()
      ()
    }
    val q = graft.sources.CdcReplay.stream(spark, feed)
      .writeStream.foreachBatch(body).start()
    q.processAllAvailable() // bulk epoch 0
    (1 to steadyEpochs).foreach { e =>
      steadyEvents(e).write.mode("append").parquet(s"$feed/events.parquet")
      q.processAllAvailable()
    }
    q.stop()

    val steady = epochSecs.filter(_._3 <= 16)
    val steadyAvg =
      if (steady.isEmpty) Double.NaN
      else steady.map(_._2).sum / steady.size
    println(f"[ivm-profile] steady epochs: ${steady.size}, avg " +
      f"$steadyAvg%.2f s — that average is the chained pipeline's fixed " +
      "per-epoch overhead (8-row deltas; compute ~zero)")

    // SPARK_GRAFT_IVM_DIAG=1: decompose one state write's cost into its
    // raw I/O floor — bare read of the replica's last-epoch touched
    // slice, bare read+rewrite of it — vs the protocol's full write
    // (read + merge agg + clustered write + commit). Separates "parquet
    // at this volume costs X" from "the advance plan costs Y on top".
    if (sys.env.get("SPARK_GRAFT_IVM_DIAG").contains("1")) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(rep), spark.sparkContext.hadoopConfiguration)
      val epochs = fs.listStatus(new org.apache.hadoop.fs.Path(rep))
        .map(_.getPath.getName).filter(_.startsWith("state-"))
        .map(_.stripPrefix("state-").toLong).sorted
      val last = epochs.last
      val slice = s"$rep/state-$last"
      def t(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[ivm-diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val df = spark.read.parquet(slice)
      println(s"[ivm-diag] slice $slice rows=${df.count()}")
      (1 to 2).foreach { r =>
        t(s"bare read+noop rep $r")(
          spark.read.parquet(slice).write.format("noop")
            .mode("overwrite").save())
        t(s"bare read+parquet-rewrite rep $r")(
          spark.read.parquet(slice).write.mode("overwrite")
            .parquet(s"/tmp/graft_ivmprof/diag_rewrite"))
        // the fused advance plan alone (merge agg, no parquet sink)
        val merged = spark.read.parquet(slice).drop("__bucket")
          .withColumn("__bucket",
            graft.operators.ExactlyOnce.bucketOf("partitionKey", IvmBuckets))
          .repartition(8, col("__bucket"))
          .groupBy(col("__bucket"), col("partitionKey"))
          .agg(max_by(
            struct(col("after"), col("ts_ms"), col("pos"), col("deleted")),
            struct(col("ts_ms"), col("pos"))).as("__w"))
          .select(col("partitionKey"), col("__w.after").as("after"),
            col("__w.ts_ms").as("ts_ms"), col("__w.pos").as("pos"),
            col("__w.deleted").as("deleted"), col("__bucket"))
        t(s"advance-agg+noop rep $r")(
          merged.write.format("noop").mode("overwrite").save())
        t(s"advance-agg+partitioned-write rep $r")(
          merged.write.mode("overwrite").partitionBy("__bucket")
            .parquet(s"/tmp/graft_ivmprof/diag_state"))
      }
    }
    spark.stop()
  }
}
