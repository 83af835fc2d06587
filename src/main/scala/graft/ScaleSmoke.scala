package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual 10-30x scale smoke (not part of the driver contract): clones
  * the sf0.1 events table with shifted ids to ~3M rows and runs the
  * heavy operators, checking wall-time scales roughly linearly — no
  * cliffs (skew, memory, quadratic blowup).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $l: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    val base = queries.Tables.events(spark, "/root/testdata/sf0.1")
    val big = (0 until 30).map(i =>
      base.withColumn("event_id", col("event_id") + lit(i.toLong * 100000)))
      .reduce(_ unionAll _)
    val dir = "/tmp/graft_scale"
    big.repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"[scale] built ${spark.read.parquet(s"$dir/events.parquet").count()} events")

    time("cdc enrichment pipeline (3M envelopes)") {
      queries.CdcQueries.flagship(spark, dir).count()
    }
    time("sessionize 3M") {
      SparkEntry.queries("evt_sessionize")(spark, dir).count()
    }
    time("scd2 3M") {
      SparkEntry.queries("cdc_scd2_history")(spark, dir).count()
    }

    // 30x documents (150k docs, every text present 30 times — a
    // near-dup-saturated corpus, the WORST case for the dedup family:
    // every LSH bucket holds 30 identical signatures) and embeddings
    // (60k vectors). Checks the curation/dedup surface for cliffs.
    val docs = queries.Tables.documents(spark, "/root/testdata/sf0.1")
    (0 until 30).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embs = queries.Tables.embeddings(spark, "/root/testdata/sf0.1")
    (0 until 30).map(i =>
      embs.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"[scale] built ${spark.read.parquet(s"$dir/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")

    Seq("dedup_exact", "dedup_minhash_pairs", "dedup_simhash",
      "dedup_clusters_star", "dedup_canonical", "graph_pagerank",
      "txt_decontaminate", "txt_boilerplate", "samp_domain_mix",
      "samp_stratified", "samp_weighted", "pack_sequences",
      "pipe_curate_e2e", "emb_quantize_int8", "emb_pq_codes",
      "sim_knn_lsh", "sim_kmeans", "dedup_semantic", "emb_whiten",
      "txt_tokenize_vocab", "docs_chunk_overlap", "rel_global_ids",
      "rel_band_join_bucketed", "dedup_incremental", "emb_outlier",
      "samp_epoch_mix", "mm_shard_manifest", "evt_ab_lift",
      // dup-saturated corpus is the worst case for span mining (every
      // gram is duplicated => maximal islands) and exercises the
      // sketch's eviction path hard (30x token stream)
      "txt_dup_spans", "txt_heavy_hitters", "txt_bpe_pairs",
      // triangle census on the saturated graph: every 30-clique emits
      // C(30,3) = 4060 triangles/bucket — the orientation bound's test
      "graph_triangles", "pipe_curriculum", "txt_sentences").foreach { q =>
      time(s"$q 30x") {
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        0L
      }
    }
    spark.stop()
  }
}
