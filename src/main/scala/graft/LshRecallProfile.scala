package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mechanism profiler for the 100× LSH clone-recall erosion (round-15,
  * VERDICT r14 item 2): the 30× smoke reads clone recall 0.9915, the
  * 100× smoke 0.9539 against the 0.95 gate — same construction, same
  * operator. This instrument decomposes the loss to its mechanism on
  * the IDENTICAL corpus the gate runs ([[ScaleHarness.build100xTables]]):
  *
  *   - per UNDER-CAP truth cluster (text-hash census size 1 < s ≤ cap),
  *     the recall of `dedup_minhash_pairs` within the cluster;
  *   - for every LOST cluster, its four band buckets' composition —
  *     total docs, docs belonging to over-cap CLONE SETS (full-signature
  *     sets > cap), distinct over-cap sets present — testing the
  *     band-pollution hypothesis: a cluster's pairs are emitted iff ANY
  *     of its four band buckets is ≤ cap, so a cluster is lost exactly
  *     when over-cap clone mass collides into ALL four of its buckets;
  *   - counterfactual arms, measured (not guessed) on the same frame:
  *     cap bumps (128/256) vs the clone-set-aware cap (drop DOCS whose
  *     full-signature set exceeds the cap globally — they are exact
  *     dedup's province by the cap's own rationale — then apply the
  *     bucket cap to the remainder), each with recovered recall AND the
  *     per-bucket pair-work it re-admits (sum of C(n,2) over re-kept
  *     buckets — the quadratic blowup the cap exists to bound).
  *
  * Writes one JSON line to args(0) (default LSH_RECALL_PROFILE_r15.json).
  * Run manually: SPARK_DRIVER_MEM=24g sbt "runMain graft.LshRecallProfile"
  */
object LshRecallProfile {

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("LSH_RECALL_PROFILE_r15.json")
    HostLoad.awaitQuiet(threshold = 8.0, maxWaitSec = 180, tag = "lshprof")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.dedup.derivationCache", "true")
    val dir = "/tmp/graft_scale100"
    val cap = queries.DedupQueries.MinHashBucketCap

    val docsPath = s"$dir/documents.parquet"
    val haveDocs =
      try spark.read.parquet(docsPath).count() > 400000
      catch { case _: Throwable => false }
    if (!haveDocs || args.contains("--rebuild")) {
      val (_, nd, _) = ScaleHarness.build100xTables(
        spark, "/root/testdata/sf0.1", dir)
      println(s"[lshprof] built 100x corpus: $nd docs")
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // ---- truth census: text-hash clusters, under/over-cap strata ----
    val docs = spark.read.parquet(docsPath)
      .select(col("doc_id"), xxhash64(col("lang"), col("text")).as("th"))
      .persist(mem)
    val clusters = docs.groupBy(col("th"))
      .agg(count(lit(1)).as("s"), min(col("doc_id")).as("rep"))
      .persist(mem)
    val under = clusters.filter(col("s") > 1 && col("s") <= cap)
    val over = clusters.filter(col("s") > cap)
    val nUnderClusters = under.count()
    val nOverClusters = over.count()
    val nUnderPairs = under.agg(coalesce(
      sum(col("s") * (col("s") - 1) / 2), lit(0L)).cast("long"))
      .head().getLong(0)

    // ---- per-cluster LSH recall (the gate, decomposed) ----
    val cand = queries.DedupQueries.minhashPairs(spark, dir)
    val docsUnder = docs.join(under.select(col("th")), Seq("th"),
      "left_semi")
    val hitsPerCluster = cand
      .join(docsUnder.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("th", "ha"), Seq("doc_a"))
      .join(docsUnder.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("th", "hb"), Seq("doc_b"))
      .filter(col("ha") === col("hb"))
      .groupBy(col("ha").as("th")).agg(count(lit(1)).as("hit_pairs"))
    val perCluster = under
      .join(hitsPerCluster, Seq("th"), "left")
      .withColumn("hit_pairs", coalesce(col("hit_pairs"), lit(0L)))
      .withColumn("truth_pairs", (col("s") * (col("s") - 1) / 2)
        .cast("long"))
      .persist(mem)
    val lost = perCluster.filter(col("hit_pairs") === 0)
    val partial = perCluster.filter(col("hit_pairs") > 0 &&
      col("hit_pairs") < col("truth_pairs"))
    val nLost = lost.count()
    val nPartial = partial.count()
    val hitPairsTotal = perCluster.agg(sum(col("hit_pairs"))).head()
      .getLong(0)
    val recallNow = hitPairsTotal.toDouble / nUnderPairs
    println(f"[lshprof] under-cap: $nUnderClusters clusters / " +
      f"$nUnderPairs pairs; recall=$recallNow%.4f; lost clusters=$nLost, " +
      f"partially-recalled=$nPartial")

    // ---- band-bucket composition (the mechanism census) ----
    val bandF = queries.DedupQueries.lshBandFrame(spark, dir).persist(mem)
    val fsigSizes = bandF.select(col("doc_id"), col("fsig")).distinct()
      .groupBy(col("fsig")).agg(count(lit(1)).as("fs"))
    val docMeta = bandF.select(col("doc_id"), col("fsig")).distinct()
      .join(fsigSizes, Seq("fsig"))
      .join(docs, Seq("doc_id"))
      .join(over.select(col("th"), lit(true).as("is_over")), Seq("th"),
        "left")
      .select(col("doc_id"), col("th"), col("fs"),
        coalesce(col("is_over"), lit(false)).as("is_over"))
    val bucketComp = bandF.join(docMeta, Seq("doc_id"))
      .groupBy(col("sigh")).agg(
        count(lit(1)).as("n"),
        sum(when(col("is_over"), 1L).otherwise(0L)).as("n_over_docs"),
        countDistinct(when(col("is_over"), col("th"))).as("n_over_sets"),
        sum(when(col("fs") > cap, 1L).otherwise(0L)).as("n_bigfsig_docs"))
      .persist(mem)

    // per lost/under cluster: its 4 buckets via the representative doc
    // (all members share the signature, so the rep's buckets ARE the
    // cluster's)
    val clusterBands = bandF
      .join(under.select(col("rep").as("doc_id"), col("th"), col("s")),
        Seq("doc_id"))
      .join(bucketComp, Seq("sigh"))
    val clusterStats = clusterBands.groupBy(col("th"), col("s")).agg(
      min(col("n")).as("min_n"),
      max(col("n")).as("max_n"),
      sum(when(col("n") > cap, 1L).otherwise(0L)).as("bands_over"),
      sum(when(col("n_over_docs") > 0, 1L).otherwise(0L))
        .as("bands_with_overcap_mass"),
      min(col("n") - col("n_bigfsig_docs")).as("min_n_prime"),
      max(col("n_over_sets")).as("max_over_sets_in_band"))
      .join(perCluster.select(col("th"), col("hit_pairs"),
        col("truth_pairs")), Seq("th"))
      .persist(mem)
    // the cluster's own clone-set size (fsig fan-out): if ITS fsig is
    // over cap (shared with over-cap mass), a clone-set-aware cap drops
    // its docs too
    val clusterFs = bandF.select(col("doc_id"), col("fsig")).distinct()
      .join(under.select(col("rep").as("doc_id"), col("th")), Seq("doc_id"))
      .join(fsigSizes, Seq("fsig"))
      .select(col("th"), col("fs").as("cluster_fs"))
    val cs = clusterStats.join(clusterFs, Seq("th")).persist(mem)

    // hypothesis tests
    val lostStats = cs.filter(col("hit_pairs") === 0)
    val lostAllBandsOver = lostStats.filter(col("bands_over") === 4).count()
    val lostWithOvercapPollution = lostStats
      .filter(col("bands_over") === 4 &&
        col("bands_with_overcap_mass") === 4).count()
    val keptMinNLe = cs.filter(col("hit_pairs") > 0 &&
      col("min_n") <= cap).count()
    val keptTotal = cs.filter(col("hit_pairs") > 0).count()
    println(s"[lshprof] lost=$nLost, all-4-bands-over-cap=" +
      s"$lostAllBandsOver, all-4-polluted-by-over-cap-sets=" +
      s"$lostWithOvercapPollution; kept with min_n<=cap: " +
      s"$keptMinNLe/$keptTotal")
    val lostSample = lostStats.orderBy(col("th")).limit(8)
      .collect().map(r =>
        s"""{"s":${r.getAs[Long]("s")},"min_n":${r.getAs[Long]("min_n")},"max_n":${r.getAs[Long]("max_n")},"bands_over":${r.getAs[Long]("bands_over")},"bands_with_overcap_mass":${r.getAs[Long]("bands_with_overcap_mass")},"min_n_prime":${r.getAs[Long]("min_n_prime")},"max_over_sets_in_band":${r.getAs[Long]("max_over_sets_in_band")},"cluster_fs":${r.getAs[Long]("cluster_fs")}}""")
      .mkString("[", ",", "]")

    // ---- counterfactual arms ----
    def pairsRecoveredIf(pred: org.apache.spark.sql.Column): Long =
      cs.filter(pred)
        .agg(coalesce(sum(col("truth_pairs")), lit(0L))).head().getLong(0)
    // arm: plain cap bump to c — cluster recovered iff any band ≤ c
    def capArm(c: Int): (Double, Long, Long) = {
      val rec = pairsRecoveredIf(col("min_n") <= c).toDouble / nUnderPairs
      val readmitted = bucketComp.filter(col("n") > cap && col("n") <= c)
      val row = readmitted.agg(
        coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0L)).cast("long"),
        count(lit(1))).head()
      (rec, row.getLong(0), row.getLong(1))
    }
    val (rec128, work128, buckets128) = capArm(128)
    val (rec256, work256, buckets256) = capArm(256)
    // arm: clone-set-aware cap — docs in over-cap FULL-SIGNATURE sets
    // drop globally (exact dedup's province), bucket cap on the rest.
    // A cluster is recovered iff its own set stays under cap AND any
    // band's residual bucket is ≤ cap.
    val recCsa = pairsRecoveredIf(col("cluster_fs") <= cap &&
      col("min_n_prime") <= cap).toDouble / nUnderPairs
    val csaReadmitted = bucketComp.filter(col("n") > cap &&
      (col("n") - col("n_bigfsig_docs")) <= cap)
    val csaRow = csaReadmitted.agg(
      coalesce(sum((col("n") - col("n_bigfsig_docs")) *
        (col("n") - col("n_bigfsig_docs") - 1) / 2), lit(0L)).cast("long"),
      count(lit(1))).head()
    val (workCsa, bucketsCsa) = (csaRow.getLong(0), csaRow.getLong(1))
    val underDroppedByCsa = cs.filter(col("cluster_fs") > cap).count()
    // current kept work for scale reference
    val workNow = bucketComp.filter(col("n") <= cap)
      .agg(coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0L))
        .cast("long")).head().getLong(0)
    println(f"[lshprof] arms: now=$recallNow%.4f (work $workNow) | " +
      f"cap128=$rec128%.4f (+$work128 pair-rows over $buckets128 buckets) " +
      f"| cap256=$rec256%.4f (+$work256 over $buckets256) | " +
      f"clone-set-aware=$recCsa%.4f (+$workCsa over $bucketsCsa; " +
      f"$underDroppedByCsa under-cap clusters dropped by shared fsig)")

    val json =
      s"""{"metric":"lsh_recall_profile_100x","corpus":"100x-sf0.1","bucket_cap":$cap,"under_cap":{"clusters":$nUnderClusters,"truth_pairs":$nUnderPairs,"recall_now":${math
          .round(recallNow * 10000) / 10000.0},"lost_clusters":$nLost,"partially_recalled_clusters":$nPartial},"over_cap_clusters":$nOverClusters,"mechanism":{"lost_with_all4_bands_over_cap":$lostAllBandsOver,"lost_with_all4_bands_holding_overcap_clone_sets":$lostWithOvercapPollution,"kept_clusters_with_a_band_under_cap":$keptMinNLe,"kept_clusters":$keptTotal,"lost_sample":$lostSample},"arms":{"kept_pair_work_now":$workNow,"cap_128":{"recall":${math
          .round(rec128 * 10000) / 10000.0},"readmitted_pair_work":$work128,"readmitted_buckets":$buckets128},"cap_256":{"recall":${math
          .round(rec256 * 10000) / 10000.0},"readmitted_pair_work":$work256,"readmitted_buckets":$buckets256},"clone_set_aware_cap":{"recall":${math
          .round(recCsa * 10000) / 10000.0},"readmitted_pair_work":$workCsa,"readmitted_buckets":$bucketsCsa,"under_cap_clusters_dropped_by_shared_fsig":$underDroppedByCsa}},"methodology":"truth = text-hash clusters 1<s<=cap on the gated 100x corpus (ScaleHarness.build100xTables); per-cluster recall of dedup_minhash_pairs; band composition via the rep doc's 4 (band|sig) buckets joined to a per-bucket census of total docs, over-cap clone-set docs (full-signature sets > cap), and distinct over-cap sets; arms evaluated on the same frame"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[lshprof] wrote $outPath")
    println(json)
    spark.stop()
  }
}
