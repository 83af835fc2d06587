package graft

import org.apache.spark.sql.functions._

import graft.operators.MisraGries
import graft.queries.Tables

/** Properties of the pipeline-ops wave (OpsQueries): the Misra–Gries
  * guarantee the exact heavy-hitter query relies on, Z-order locality,
  * and the orphan census invariants.
  */
class DataOpsSpec extends SparkSpec {

  test("MisraGries summary contains every item above n/(k+1) support " +
      "(skewed stream, k far below vocabulary size)") {
    import spark.implicits._
    val k = 8
    // 3 hot items (1000 each) buried in 3000 unique cold items: vocab
    // 3003 >> k, hot support 1000/6000 = 1/6 > 1/(k+1)
    val items = (1 to 1000).flatMap(_ => Seq("hot_a", "hot_b", "hot_c")) ++
      (1 to 3000).map(i => s"cold_$i")
    val ds = spark.createDataset(items).repartition(7) // force merges
    val sk = ds.select(new MisraGries(k).toColumn).head()
    assert(sk.n === items.size)
    assert(Set("hot_a", "hot_b", "hot_c").subsetOf(sk.counts.keySet),
      s"hot items missing from summary: ${sk.counts.keySet}")
    assert(sk.counts.size <= k)
  }

  test("MisraGries merge keeps counts as lower bounds within n/(k+1)") {
    val k = 4
    val mg = new MisraGries(k)
    val s1 = (1 to 500).map(_ => "x").foldLeft(mg.zero)(mg.reduce) // exact x=500
    val s2 = (1 to 120).flatMap(i => Seq("x", s"noise_$i"))
      .foldLeft(mg.zero)(mg.reduce)
    val m = mg.merge(s1, s2)
    assert(m.n === 500 + 240)
    val err = m.n / (k + 1)
    val xCount = m.counts.getOrElse("x", 0L)
    assert(xCount <= 620 && xCount >= 620 - err,
      s"x=$xCount outside [${620 - err}, 620]")
  }

  test("heavy-hitter query equals the exact full word count above the " +
      "same threshold (sketch nominates a superset)") {
    val hh = queries.OpsQueries.defs("txt_heavy_hitters").fn(spark, sf)
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val n = exact.count()
    val expect = exact.groupBy("word").count()
      .filter(col("count") * 65 > n)
      .select(col("word"), col("count").as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
    assert(hh.collect().toSeq === expect.collect().toSeq)
  }

  test("z-order files cluster BOTH dimensions: mean per-file envelope is " +
      "much narrower than the global range") {
    val files = queries.OpsQueries.defs("lake_zorder").fn(spark, sf).collect()
    assert(files.length > 4, s"expected many z-buckets, got ${files.length}")
    val totalRows = files.map(_.getAs[Long]("n")).sum
    assert(totalRows === Tables.orders(spark, sf).count())
    def meanSpan(lo: String, hi: String): Double =
      files.map(r => (r.getAs[Long](hi) - r.getAs[Long](lo)).toDouble).sum / files.length
    val custGlobal = files.map(_.getAs[Long]("max_cust")).max -
      files.map(_.getAs[Long]("min_cust")).min
    val dayGlobal = files.map(_.getAs[Long]("max_day")).max -
      files.map(_.getAs[Long]("min_day")).min
    // interleaving 6 prefix bits splits ~3 bits per dimension → each file
    // should cover roughly 1/8 of each range; allow 2× slack
    assert(meanSpan("min_cust", "max_cust") < custGlobal / 4.0)
    assert(meanSpan("min_day", "max_day") < dayGlobal / 4.0)
  }

  test("orphan census: totals equal table counts and fixture FKs resolve") {
    val rows = queries.OpsQueries.defs("dq_orphans").fn(spark, sf).collect()
    val byRel = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("orphan_rows"), r.getAs[Long]("total_rows"))).toMap
    assert(byRel("lineitem->orders")._2 === Tables.lineitem(spark, sf).count())
    assert(byRel("orders->customer")._2 === Tables.orders(spark, sf).count())
    assert(byRel("supplier->nation")._2 === Tables.supplier(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("orphan_rows") >= 0L)
      assert(r.getAs[Long]("orphan_rows") <= r.getAs[Long]("total_rows"))
    }
  }

  test("duplicated spans are maximal: ≥8 words each, per-doc " +
      "non-overlapping gram runs in sorted order") {
    val spans = queries.OpsQueries.defs("txt_dup_spans").fn(spark, sf).collect()
    assert(spans.nonEmpty)
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("span_start"))
      sorted.foreach(r => assert(r.getAs[Long]("span_words") >= 8L))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // islands are maximal: the next span's first gram start must
          // leave a gap of ≥2 gram positions (adjacent would have merged)
          val aLastGram = a.getAs[Long]("span_start") + a.getAs[Long]("span_words") - 8
          assert(b.getAs[Long]("span_start") > aLastGram + 1)
        case _ =>
      }
    }
  }

  test("z-order layout skips more files than the natural date layout " +
      "under 2-D range probes") {
    val rep = queries.OpsQueries.defs("lake_skip_report").fn(spark, sf).collect()
    assert(rep.length === 16)
    val natMean = rep.map(_.getAs[Long]("nat_files")).sum.toDouble / 16
    val zMean = rep.map(_.getAs[Long]("z_files")).sum.toDouble / 16
    assert(zMean < natMean,
      s"z-order should prune better: z=$zMean vs nat=$natMean")
  }

  test("dq_expectations profiles every orders column with sane bounds") {
    val prof = queries.OpsQueries.defs("dq_expectations").fn(spark, sf).collect()
    assert(prof.map(_.getString(0)).toSet === Set("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val nRows = Tables.orders(spark, sf).count()
    prof.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nRows)
      assert(r.getAs[Long]("n_null") === 0L)
      assert(r.getAs[Long]("n_distinct") > 0L)
    }
    val ok = prof.find(_.getString(0) == "o_orderkey").get
    assert(ok.getAs[Long]("n_distinct") === nRows) // PK uniqueness check
  }
}
