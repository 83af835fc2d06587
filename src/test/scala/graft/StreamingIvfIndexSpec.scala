package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.{ExactlyOnce, Ivf}
import graft.streaming.StreamingIvfIndex

/** Durable standing IVF index: epoch-fenced incremental ingest must
  * converge to the frozen-codebook batch answer exactly, write only
  * touched shards per epoch, prune its candidate reads to the probed
  * cells' shards, and fence replays.
  */
class StreamingIvfIndexSpec extends SparkSpec {

  private val Shards = 16

  private def embs() = queries.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"), col("embedding"))

  // sorted: the compared sides run different physical plans, so the
  // bit-exact row-content check must not lean on collect() order
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("three-epoch ingest == frozen-codebook batch search, bit-exact; " +
      "steady epochs write only touched shards; replays fenced") {
    val root = Files.createTempDirectory("graft_ivfidx").toString
    val e = embs()
    // epoch 0 = bulk (trains + freezes the codebook); 1-2 = increments
    val bulk = e.filter(col("vec_id") % 10 < 8)
    val inc1 = e.filter(col("vec_id") % 10 === 8)
    val inc2 = e.filter(col("vec_id") % 10 === 9)
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(bulk, 0L))
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(inc1, 1L))
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(inc2, 2L))

    // the index holds every ingested vector exactly once
    val idx = StreamingIvfIndex.index(spark, root)
    assert(idx.count() == e.count())
    assert(idx.select(col("vec_id")).distinct().count() == e.count())

    // parity: the standing index's self-probe search equals the batch
    // path with the SAME frozen codebook over the full corpus — the
    // train-then-freeze contract makes the comparison exact
    val cents = StreamingIvfIndex.codebook(spark, root)
    val nodesAll = e.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", graft.functions.VectorOps.l2Norm(col("v")))
    val indexedAll = Ivf.assignCarrying(nodesAll, cents)
    val probes = indexedAll.filter(
        queries.SimilarityQueries.probePred(col("vec_id")))
      .select(col("vec_id").as("probe_id"),
        col("v").as("pv"), col("norm").as("pnorm"))
    val want = rows(Ivf.scanCandidates(indexedAll,
      Ivf.routeProbes(cents, probes, 2), 10))
    val got = rows(StreamingIvfIndex.searchSelf(spark, root, 10, 2, Shards))
    assert(want.nonEmpty)
    assert(got == want, "standing-index search diverged from the " +
      "frozen-codebook batch answer")

    // o_touched: the increments touched a strict subset of shards
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq(1, 2).foreach { ep =>
      val p = new org.apache.hadoop.fs.Path(s"$root/state/state-$ep")
      val touched = fs.listStatus(p)
        .count(_.getPath.getName.startsWith("__bucket="))
      assert(touched > 0 && touched < Shards,
        s"epoch $ep touched $touched/$Shards shards — not O(touched)")
    }

    // replay of a committed epoch with garbage content: fenced no-op
    import spark.implicits._
    val garbage = Seq((999999L, 0, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "label", "embedding")
    assert(!StreamingIvfIndex.materializer(spark, root, Shards)(garbage, 1L))
    assert(StreamingIvfIndex.index(spark, root).count() == e.count())
  }

  test("search reads ONLY the probed cells' shards (pruned input files)") {
    val root = Files.createTempDirectory("graft_ivfidx2").toString
    StreamingIvfIndex.materializer(spark, root, Shards)(embs(), 0L)
    val cents = StreamingIvfIndex.codebook(spark, root)
    // one probe vector -> nprobe=1 nearest cell -> exactly 1 shard
    import spark.implicits._
    val one = embs().orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("pv"))
    val res = StreamingIvfIndex.search(spark, root, one, 5, 1, Shards)
    val routed = Ivf.routeProbes(cents,
      one.withColumn("pnorm",
        graft.functions.VectorOps.l2Norm(col("pv"))), 1)
    val shard = routed.select(
      ExactlyOnce.bucketOf("cell_id", Shards).as("s")).head().getInt(0)
    val BucketLeaf = ".*/__bucket=(\\d+)/[^/]+$".r
    val files = res.inputFiles.filter(_.contains("__bucket="))
    assert(files.nonEmpty)
    assert(files.forall(f => BucketLeaf.findFirstMatchIn(f)
        .exists(_.group(1).toInt == shard)),
      s"candidate read left the probed shard $shard: ${files.toSeq}")
    assert(res.count() > 0)
  }

  test("a torn epoch-0 codebook dir (no _SUCCESS) is retrained, not " +
      "skipped or read partially") {
    val root = Files.createTempDirectory("graft_ivfidx4").toString
    // simulate a crash DURING the codebook job: the dir exists with a
    // stray part file but no _SUCCESS commit marker — a dir-exists gate
    // would skip retraining and every assignment after would be wrong
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val cbDir = new org.apache.hadoop.fs.Path(s"$root/codebook")
    fs.mkdirs(cbDir)
    fs.create(new org.apache.hadoop.fs.Path(cbDir,
      "part-00000-torn.snappy.parquet"), true).close()
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(embs(), 0L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(cbDir, "_SUCCESS")),
      "replayed codebook write left no commit marker")
    // the retrained codebook is readable and search works end to end
    assert(StreamingIvfIndex.codebook(spark, root).count() > 0)
    assert(StreamingIvfIndex.searchSelf(spark, root, 5, 1, Shards)
      .count() > 0)
  }

  test("retrain recovers recall lost to quantizer drift, deterministically, " +
      "with exact parity against the retrained-codebook batch path") {
    val root = Files.createTempDirectory("graft_ivfrt").toString + "/idx"
    StreamingIvfIndex.materializer(spark, root, Shards)(embs(), 0L)

    // drift epoch: a blob straddling the Voronoi boundary of the two
    // CLOSEST frozen cells — convex centroid mixes 0.5±t tilted per
    // member (alternating sides), plus a small common ramp so members'
    // nearest neighbors interleave across the boundary. Under the
    // frozen codebook the blob splits across both cells, so nprobe=1
    // probes miss their minority-side neighbors; after Lloyd retrain
    // the quantizer re-centers on the corpus it actually holds and the
    // blob consolidates. All constants are deterministic in the frozen
    // codebook (itself deterministic), so the spec is stable.
    val cb = StreamingIvfIndex.codebook(spark, root)
      .orderBy(col("cell_id")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def dist(x: Array[Double], y: Array[Double]) =
      math.sqrt(x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum)
    val (ia, ib, _) = (for (i <- cb.indices; j <- cb.indices if i < j)
      yield (i, j, dist(cb(i)._2, cb(j)._2))).minBy(_._3)
    val ca = cb(ia)._2; val cbv = cb(ib)._2
    val dim = ca.length
    val eta = 0.02 * dist(ca, cbv)
    import spark.implicits._
    val drift = (0 until 120).map { i =>
      val s = if (i % 2 == 0) 0.05 else -0.05
      val v = (0 until dim).map { d =>
        val w = if (d % 2 == 0) 1.0 else -1.0
        ((0.5 + s) * ca(d) + (0.5 - s) * cbv(d) +
          i * eta * w / math.sqrt(dim)).toFloat
      }
      (900000L + i, 99, v)
    }.toDF("vec_id", "label", "embedding")
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(drift, 1L))

    val probes = StreamingIvfIndex.index(spark, root)
      .filter(col("vec_id") >= 900000L)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("norm").as("pnorm")).localCheckpoint()
    val truth = Ivf.bruteTopK(StreamingIvfIndex.index(spark, root),
      probes, 5).localCheckpoint()
    val before = Ivf.recallAtK(StreamingIvfIndex.search(spark, root,
      probes.select(col("probe_id"), col("pv")), 5, 1, Shards), truth, 5)
    assert(before < 0.99,
      f"drift construction did not degrade frozen recall ($before%.4f) — " +
        "the recovery assertion below would be vacuous")

    val rt = root + "_rt"
    assert(StreamingIvfIndex.retrain(spark, root, rt, Shards, rounds = 3))
    val after = Ivf.recallAtK(StreamingIvfIndex.search(spark, rt,
      probes.select(col("probe_id"), col("pv")), 5, 1, Shards), truth, 5)
    assert(after > before && after >= 0.99,
      f"retrain did not recover recall: before=$before%.4f after=$after%.4f")
    // the retrained index holds exactly the same vectors
    assert(StreamingIvfIndex.index(spark, rt).count() ==
      StreamingIvfIndex.index(spark, root).count())

    // parity: standing search over the retrained index == batch scan
    // with the retrained codebook over the same corpus, bit-exact
    val rtCents = StreamingIvfIndex.codebook(spark, rt)
    val reNodes = StreamingIvfIndex.index(spark, root)
      .select(col("vec_id"), col("v"), col("norm"))
    val reIndexed = Ivf.assignCarrying(reNodes, rtCents)
    val want = rows(Ivf.scanCandidates(reIndexed,
      Ivf.routeProbes(rtCents, probes, 2), 10))
    val got = rows(StreamingIvfIndex.search(spark, rt,
      probes.select(col("probe_id"), col("pv")), 10, 2, Shards))
    assert(want.nonEmpty && got == want,
      "retrained standing search diverged from the retrained-codebook" +
        " batch answer")

    // determinism: a second retrain into a fresh root is bit-identical
    val rt2 = root + "_rt2"
    assert(StreamingIvfIndex.retrain(spark, root, rt2, Shards, rounds = 3))
    assert(rows(StreamingIvfIndex.codebook(spark, rt2)) ==
      rows(StreamingIvfIndex.codebook(spark, rt)))
    assert(rows(StreamingIvfIndex.index(spark, rt2)) ==
      rows(StreamingIvfIndex.index(spark, rt)))
    // replay of the retrain epoch: fenced no-op
    assert(!StreamingIvfIndex.retrain(spark, root, rt, Shards, rounds = 3))
  }

  test("a retrain replay AFTER the live src ingested more epochs is " +
      "fenced BEFORE touching the dst codebook") {
    val root = Files.createTempDirectory("graft_ivfrt3").toString + "/idx"
    StreamingIvfIndex.materializer(spark, root, Shards)(embs(), 0L)
    val rt = root + "_rt"
    assert(StreamingIvfIndex.retrain(spark, root, rt, Shards, rounds = 2))
    val cbCommitted = rows(StreamingIvfIndex.codebook(spark, rt))
    // retrain scratch is cleaned up after the fenced commit
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$rt/_retrain_codebook_1")), "retrain left round scratch behind")
    // the live src moves on: new, scaled vectors change what a
    // recompute would train — the r15-advice hazard was the replay
    // recomputing THIS different codebook and clobbering the dst while
    // its state stayed fenced at the old assignment
    val more = embs().orderBy(col("vec_id")).limit(64)
      .withColumn("vec_id", col("vec_id") + lit(800000L))
      .withColumn("embedding", transform(col("embedding"),
        x => (x * lit(2.0f)).cast("float")))
    assert(StreamingIvfIndex.materializer(spark, root, Shards)(more, 1L))
    // the replay is fenced with the dst codebook bytes untouched
    assert(!StreamingIvfIndex.retrain(spark, root, rt, Shards, rounds = 2))
    assert(rows(StreamingIvfIndex.codebook(spark, rt)) == cbCommitted,
      "fenced retrain replay clobbered the committed dst codebook")
  }

  test("a grown index rebuckets to more shards and searches identically") {
    val root = Files.createTempDirectory("graft_ivfidx3").toString
    StreamingIvfIndex.materializer(spark, root, Shards)(embs(), 0L)
    val before = rows(StreamingIvfIndex.searchSelf(spark, root, 10, 2, Shards))
    // adopt 4x the shards (the bucket-sizing lever) without rebuilding
    val root2 = Files.createTempDirectory("graft_ivfidx3b").toString
    assert(ExactlyOnce.rebucketState(spark, s"$root/state",
      s"$root2/state", "cell_id", Shards * 4))
    // the codebook is frozen content — carry it over verbatim
    StreamingIvfIndex.codebook(spark, root).write
      .parquet(s"$root2/codebook")
    val after = rows(StreamingIvfIndex.searchSelf(spark, root2, 10, 2,
      Shards * 4))
    assert(after == before, "rebucketed index answers diverged")
  }
}
