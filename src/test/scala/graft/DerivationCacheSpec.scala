package graft

import org.apache.spark.sql.functions._

/** Session derivation cache (`spark.graft.dedup.derivationCache`):
  * a memo hit must be result-invisible — identical rows to the
  * cache-off path — across BOTH cached families (LSH signatures/pairs
  * and the gram-hash frames), the cache must survive a hostile storage
  * sweep (an unpersist of its blocks) by detecting the dead checkpoint
  * and rebuilding, and a rewritten fixture directory must invalidate
  * the memo via the leaf-file signature — never by failing or
  * returning stale/partial data.
  */
class DerivationCacheSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("cache-on results are identical to cache-off for the LSH family") {
    val off = spark.newSession()
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    Seq("dedup_minhash_pairs", "graph_pagerank", "graph_triangles",
      "dedup_minhash_jaccard_est", "dedup_clusters_star").foreach { q =>
      val expect = rows(SparkEntry.queries(q)(off, sf))
      val got = rows(SparkEntry.queries(q)(on, sf))
      assert(got == expect, s"$q diverged under the derivation cache")
    }
    assert(queries.DedupQueries.memoOwnedRddIds(on).nonEmpty,
      "cache-on session should own memoized derivation blocks")
    assert(queries.DedupQueries.memoOwnedRddIds(off).isEmpty,
      "cache-off session must not register memo entries")
  }

  test("memo entries rebuild after their blocks are swept") {
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    val first = rows(SparkEntry.queries("dedup_minhash_pairs")(on, sf))
    // hostile sweep: unpersist EVERYTHING, including the memo's blocks
    // (a localCheckpointed RDD cannot recompute — the probe must catch
    // the dead entry and rebuild from source)
    on.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val second = rows(SparkEntry.queries("dedup_minhash_pairs")(on, sf))
    assert(second == first, "post-sweep rebuild diverged")
  }

  test("memo entries rebuild after PARTIAL block loss (non-first block)") {
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    val first = rows(SparkEntry.queries("dedup_minhash_pairs")(on, sf))
    val ownedBefore = queries.DedupQueries.memoOwnedRddIds(on)
    // kill the LAST cached block of every multi-partition memo
    // checkpoint: a 1-row probe reads only the first partition and
    // would pass, then the consumer would crash mid-query on the
    // missing block — the storage-info completeness check must evict
    // and rebuild instead
    val victims = on.sparkContext.getRDDStorageInfo
      .filter(i => ownedBefore.contains(i.id))
      .filter(_.numCachedPartitions >= 2)
    assert(victims.nonEmpty, "no multi-partition memo checkpoint to maim")
    victims.foreach(v => org.apache.spark.graft.BlockSurgeon
      .removeRddBlock(v.id, v.numPartitions - 1))
    val second = rows(SparkEntry.queries("dedup_minhash_pairs")(on, sf))
    assert(second == first,
      "partial block loss must rebuild, never fail or serve partial data")
    assert(queries.DedupQueries.memoOwnedRddIds(on) != ownedBefore,
      "maimed entries were served as-is — the eviction never happened")
  }

  test("cache-on results are identical to cache-off for the gram family") {
    val off = spark.newSession()
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    Seq("txt_dup_spans", "txt_dup_spans_prefix",
      "dedup_ngram_jaccard", "dedup_containment").foreach { q =>
      val expect = rows(SparkEntry.queries(q)(off, sf))
      val got = rows(SparkEntry.queries(q)(on, sf))
      assert(got == expect, s"$q diverged under the derivation cache")
    }
  }

  test("memo entries rebuild when the fixture directory is rewritten") {
    import org.apache.spark.sql.functions._
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    val off = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dcache-fixture-")
      .toAbsolutePath.toString
    val docs = off.read.parquet(s"$sf/documents.parquet")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val first = rows(SparkEntry.queries("dedup_minhash_pairs")(on, tmp))
    assert(first == rows(SparkEntry.queries("dedup_minhash_pairs")(off, tmp)))
    // rewrite the fixture in place (half the corpus): a signature-blind
    // memo — blocks still live, probe passes — would keep serving
    // `first`; the leaf-file (path, length, mtime) signature must
    // detect the rewrite and rebuild from the new data
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val second = rows(SparkEntry.queries("dedup_minhash_pairs")(on, tmp))
    val expect = rows(SparkEntry.queries("dedup_minhash_pairs")(off, tmp))
    assert(second == expect, "stale memo served after the fixture rewrite")
    assert(first != second,
      "fixture rewrite did not change the pair set — test is vacuous")
  }

  test("memo is keyed by data directory") {
    val off = spark.newSession()
    val on = spark.newSession()
    on.conf.set("spark.graft.dedup.derivationCache", "true")
    // warm the memo on sf0.001 FIRST, then ask for sf0.01: a dir-blind
    // memo would serve the sf0.001 pairs (both SFs happen to emit the
    // same pair COUNT, so compare full content against the cache-off
    // derivation of each dir)
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val expect = rows(SparkEntry.queries("dedup_minhash_pairs")(off, d))
      val got = rows(SparkEntry.queries("dedup_minhash_pairs")(on, d))
      assert(got == expect, s"memo entry for $d served wrong content")
    }
  }

  // KEEP LAST IN THIS SUITE: it stops the shared SparkContext. Within a
  // funsuite, tests run in registration order, so the earlier tests see
  // the live context; the next SUITE's lazy getOrCreate builds a fresh
  // one (suites run sequentially in the single forked test JVM).
  test("entries of a stopped session are purged on the next cache use " +
      "(session-churn leak guard)") {
    val dead = spark.newSession()
    dead.conf.set("spark.graft.dedup.derivationCache", "true")
    rows(SparkEntry.queries("dedup_minhash_pairs")(dead, sf))
    assert(queries.DerivationCache.entryCount(dead) > 0,
      "warm-up did not register a memo entry")
    spark.stop() // kills the shared context; `dead`'s blocks die with it
    assert(dead.sparkContext.isStopped)
    // a NEW session's first cache touch must reclaim the dead entries —
    // the map must not pin the stopped session's object graph forever
    val fresh = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    fresh.conf.set("spark.graft.dedup.derivationCache", "true")
    rows(SparkEntry.queries("dedup_minhash_pairs")(fresh, sf))
    assert(queries.DerivationCache.entryCount(dead) == 0,
      "stopped session's memo entries survived a live-session cache use")
    assert(queries.DedupQueries.memoOwnedRddIds(dead).isEmpty)
    // clear() on a stopped session is safe and a no-op beyond the purge
    queries.DedupQueries.clearDerivationMemos(dead)
  }
}
