package graft

import org.apache.spark.sql.functions._

import graft.queries.{CurationQueries, Tables}

/** Curation-operator contracts: deterministic sampling (reproducible
  * across runs — the property rand()-based sampling lacks), uniform
  * domain rebalancing, packing-bin bookkeeping invariants, and the
  * plan shapes that make each safe at 100 TB (scan-level filters, a
  * broadcast-only join for the tiny count table, per-group windows).
  */
class CurationSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ------------------------------------------------------- samp_hash

  test("samp_hash: deterministic — two runs produce identical samples") {
    val a = q("samp_hash").collect().map(_.toString).toSeq
    val b = q("samp_hash").collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("samp_hash: shuffle-free scan→filter plan (no Exchange before sort)") {
    val p = plan("samp_hash")
    // The only exchange allowed is the final ORDER BY's range partitioning;
    // sampling itself must be a scan-level filter (no aggregate, no join).
    assert(!p.contains("Join"), p)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r.findFirstIn(p).isEmpty, p)
  }

  test("samp_hash: keeps ~10% (hash uniformity on the fixture)") {
    val total = Tables.documents(spark, sf).count().toDouble
    val kept = q("samp_hash").count().toDouble
    val frac = kept / total
    assert(frac > 0.04 && frac < 0.2, s"kept fraction $frac")
  }

  // ------------------------------------------------- samp_domain_mix

  test("samp_domain_mix: count table joins via broadcast, not shuffle") {
    val p = plan("samp_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("samp_domain_mix: kept volumes are near-uniform across sources") {
    val kept = q("samp_domain_mix").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSrc = Tables.documents(spark, sf)
      .groupBy(col("source")).count().agg(min("count")).head().getLong(0)
    // every source is downsampled to <= the smallest source's volume,
    // and lands within hash noise of the target
    kept.values.foreach { n =>
      assert(n <= minSrc, s"$n > min source volume $minSrc")
      assert(n >= (minSrc * 0.5).toLong, s"$n far below target $minSrc")
    }
  }

  // --------------------------------------------------- pack_sequences

  test("pack_sequences: window is partitioned by lang (no global window)") {
    val p = plan("pack_sequences")
    assert(!p.contains("SinglePartition"), p)
  }

  test("pack_sequences: bins are contiguous and offsets stay in [0, ctx)") {
    val rows = q("pack_sequences").collect()
    assert(rows.nonEmpty)
    val ctx = CurationQueries.PackCtxLen
    rows.foreach { r =>
      val off = r.getLong(4)
      assert(off >= 0 && off < ctx, s"offset $off outside [0, $ctx)")
    }
    // per lang: bin of each doc == floor(cumsum_before / ctx), bins never decrease
    rows.groupBy(_.getString(0)).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getLong(1)).foreach { r =>
        assert(r.getLong(3) == cum / ctx, s"bin mismatch at $r (cum=$cum)")
        assert(r.getLong(4) == cum % ctx, s"offset mismatch at $r (cum=$cum)")
        cum += r.getLong(2)
      }
    }
  }

  // -------------------------------------------------- txt_repetition

  test("txt_repetition: ratios are in [0,1] and a repeated text scores high") {
    val rows = q("txt_repetition").collect()
    rows.foreach { r =>
      val t = r.getDouble(1); val g = r.getDouble(2)
      assert(t >= 0.0 && t <= 1.0, r.toString)
      assert(g >= 0.0 && g <= 1.0, r.toString)
    }
    // a fully-repeated synthetic doc must score near 1 on both ratios
    import spark.implicits._
    val rep = Seq(("d1", ("the cat sat " * 50).trim)).toDF("doc_id", "text")
      .withColumn("toks", split(trim(col("text")), " "))
      .select(
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("dup"))
      .head().getDouble(0)
    assert(rep > 0.9, s"repeated text dup_token_ratio $rep")
  }

  // ------------------------------------------------- rel_percentiles

  test("rel_percentiles: quartiles are ordered and bracket the group range") {
    val rows = q("rel_percentiles").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, qs) =>
      val vals = qs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(vals.length == 3)
      assert(vals(0) <= vals(1) && vals(1) <= vals(2), vals.mkString(","))
    }
  }

  // --------------------------------------------- docs_chunk_overlap

  test("chunking tiles every document: stride 96, size <= 128, full cover") {
    import spark.implicits._
    val chunks = q("docs_chunk_overlap")
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_toks")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    assert(chunks.size.toLong === nDocs, "every doc gets >= 1 chunk")
    chunks.values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, idx, start, n), i) =>
        assert(idx === i.toLong)
        assert(start === i.toLong * 96)
        assert(n >= 1 && n <= 128, s"chunk len $n")
      }
      // consecutive chunks overlap by 32 tokens except a shorter tail
      sorted.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, _)) =>
          assert(s1 + n1 - s2 === 32L || s1 + n1 < s2 + 32,
            s"bad overlap at $s1+$n1 vs $s2")
        case _ =>
      }
    }
  }

  // --------------------------------------------- docs_quality_model

  test("quality model: score in (-1,1), keep == (score > 0)") {
    val rows = q("docs_quality_model").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (score, keep) = (r.getDouble(1), r.getLong(2))
      assert(score > -1.0 && score < 1.0, s"softsign out of range: $score")
      assert((keep == 1L) === (score > 0.0), r.toString)
    }
    // the fixture corpus is not degenerate: both classes occur
    val kept = rows.count(_.getLong(2) == 1L)
    assert(kept > 0 && kept < rows.length,
      s"degenerate classifier: $kept/${rows.length} kept")
  }

  // ------------------------------------------ docs_length_histogram

  test("length histogram: buckets tile the corpus, bounds respect 2^b") {
    val rows = q("docs_length_histogram").collect()
    assert(rows.nonEmpty)
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_len"), r.getAs[Long]("max_len"))
      assert(lo <= hi)
      if (b > 0) {
        assert(lo >= (1L << b), s"bucket $b min $lo")
        assert(hi < (1L << (b + 1)), s"bucket $b max $hi")
      }
    }
  }

  // ------------------------------------------------ samp_epoch_mix

  test("epoch mix: emitted volume bounded by floor/ceil of the rate") {
    val rows = q("samp_epoch_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, n, emitted) = (r.getAs[Long]("rate_micro"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_emitted"))
      assert(rate >= 500000L && rate <= 2500001L)
      val lo = (rate / 1000000L) * n
      val hi = (rate / 1000000L + 1L) * n
      assert(emitted >= lo && emitted <= hi,
        s"emitted $emitted outside [$lo, $hi] for rate $rate, n $n")
    }
  }

  // --------------------------------------------- mm_shard_manifest

  test("shard manifest: contiguous shard ids, byte totals conserved") {
    val m = q("mm_shard_manifest").collect()
      .groupBy(_.getAs[String]("source"))
    val totals = graft.queries.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(sum(length(encode(col("text"), "utf-8")).cast("long")).as("b"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(m.keySet === totals.keySet)
    m.foreach { case (src, shards) =>
      val ids = shards.map(_.getAs[Long]("shard_id")).sorted
      assert(ids.head === 0L)
      assert(ids === (0L until ids.length).toArray.toSeq.toArray,
        s"$src shard ids not contiguous: ${ids.mkString(",")}")
      assert(shards.map(_.getAs[Long]("shard_bytes")).sum === totals(src)._1)
      assert(shards.map(_.getAs[Long]("n_samples")).sum === totals(src)._2)
    }
  }
}
