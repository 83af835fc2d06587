package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ExactlyOnce

/** DURABLE incremental equi-join view — materialized-view maintenance
  * of `L ⋈ R` under streaming deltas, the join-shaped sibling of
  * [[StreamingRollup]] (which maintains a grouped aggregate). This is
  * the classic bilinear IVM identity
  *
  *   Δ(L ⋈ R)  =  ΔL ⋈ R_old  +  L_old ⋈ ΔR  +  ΔL ⋈ ΔR
  *
  * kept exact under crash/replay by computing it from POST-commit
  * state only (see below), so the increment is a pure function of
  * (committed state, batchId) and replays regenerate it bit-for-bit.
  *
  * Three bucketed states live under one root, all hash-bucketed on the
  * SAME packed join key (`ExactlyOnce.bucketOf`, so matching rows of
  * either side and their join rows share a bucket number):
  *
  *   `root/left`, `root/right` — per-side multiplicity logs: one row
  *     per distinct value-tuple per epoch that touched it, carrying
  *     `__m` (signed multiplicity delta) and `__e` (the epoch that
  *     ingested it). Each epoch's advance compacts the PRIOR rows of
  *     the buckets it touches to one row per value-tuple (`max(__e)`
  *     keeps the tag strictly below the current epoch) and appends its
  *     own delta still tagged `__e = batchId` — which is what makes
  *     the increment replay-stable: after a torn epoch the replay
  *     finds the delta already in state, still distinguishable from
  *     older rows by its tag, and recomputes the identical increment.
  *   `root/view` — the join result as (left cols, right cols, `__m`),
  *     `__m` = Σ products of side multiplicities; a row whose
  *     multiplicity reaches zero vanishes from state.
  *
  * Per-epoch cost is O(batch + touched buckets' state) on every path:
  * the side advances rewrite only buckets their delta lands in, the
  * increment joins read ONLY those buckets
  * ([[ExactlyOnce.currentStateBuckets]] — bucket pruning, the read
  * twin of MERGE INTO file pruning), and the view advance rewrites
  * only buckets the increment lands in. The standing 100 TB view is
  * never rescanned.
  *
  * Retractions are first-class: a side row with sign −1 subtracts its
  * multiplicity, the view loses `δm_L × m_R` join rows exactly, and a
  * fully-retracted pair vanishes. Out-of-order retractions carry a
  * transiently-negative multiplicity until the matching insert
  * balances them — same contract as [[StreamingRollup]]'s signed arm.
  *
  * Behavioral anchor: the reference maintains per-table replicas from
  * a CDC stream (flink-cdc-msk `MySQLCDC2AWSMSK.scala:116-131`,
  * op-ordered upserts); joining two such replicas incrementally — an
  * enriched orders⋈customer view kept current as CDC arrives — is the
  * natural next step a lake deployment of that pipeline takes, and
  * the signed arm is exactly the before/after-image algebra a
  * Debezium feed supplies.
  *
  * Contracts: the two sides' non-key column names must be disjoint
  * (checked, loud error — rename before joining). Null-keyed rows are
  * DROPPED at ingestion (SQL equi-joins never match them) and the
  * packed key length-prefixes each part, so no key value can collide
  * with a different key tuple.
  */
object StreamingJoinView {

  /** Physical buckets per state (tests; production scales this with
    * join-key cardinality).
    */
  val DefaultBuckets = 16

  private def emptyLike(spark: SparkSession, p: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], p.schema)

  /** The packed join key — the shared [[StateKeys.packKey]]
    * length-prefixed encoding, so no key value — whatever bytes it
    * contains — can collide with a different key tuple. Null-keyed
    * rows never reach this (filtered in [[partials]] — SQL equi-joins
    * drop them anyway), so the encoding's null marker is inert here.
    */
  private def packKey(keys: Seq[String]): org.apache.spark.sql.Column =
    StateKeys.packKey(keys)

  /** One side's epoch delta: one row per distinct value-tuple with the
    * packed join key, the signed multiplicity (`__m` = Σ sign, rows
    * netting zero inside one batch drop out), and the epoch tag.
    * Null-keyed rows are dropped here — an equi-join can never match
    * them, and packing them would make distinct null tuples collide.
    */
  private def partials(batch: DataFrame, keys: Seq[String],
      signCol: Option[String], batchId: Long): DataFrame = {
    val sign = signCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val valueCols = batch.columns.toSeq.filterNot(signCol.contains)
    batch.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(sign).as("__m"))
      .filter(col("__m") =!= 0)
      .withColumn("__jkey", packKey(keys))
      .withColumn("__e", lit(batchId))
  }

  /** Fold one side's delta into its multiplicity log: prior rows of
    * the touched buckets compact to one row per value-tuple (tag =
    * their newest epoch, strictly < batchId), the delta appends still
    * tagged with THIS epoch.
    */
  private def advanceSide(spark: SparkSession, dir: String, p: DataFrame,
      batchId: Long, numBuckets: Int, retain: Int): Unit = {
    val valueCols = p.columns.toSeq.filterNot(Set("__m", "__e"))
    ExactlyOnce.advanceStateBucketed(spark, dir, batchId, p,
      "__jkey", numBuckets, retain)(emptyLike(spark, p)) { current =>
      current
        .groupBy(valueCols.map(col): _*)
        .agg(sum(col("__m")).as("__m"), max(col("__e")).as("__e"))
        .filter(col("__m") =!= 0)
        .select(p.columns.map(col): _*)
        .unionByName(p)
    }
    ()
  }

  /** `l ⋈ r` on the packed key with multiplied multiplicities. */
  private def half(l: DataFrame, r: DataFrame): DataFrame = {
    val lv = l.withColumnRenamed("__m", "__ml").drop("__e")
    val rv = r.withColumnRenamed("__m", "__mr").drop("__e")
    lv.join(rv, Seq("__jkey"))
      .withColumn("__m", col("__ml") * col("__mr"))
      .drop("__ml", "__mr")
  }

  /** foreachBatch body, insert-only feeds (every row multiplicity +1).
    * A streaming caller with one tagged feed splits it:
    * `materializer(...)(batch.filter($"side"==="l").select(lCols),
    * batch.filter($"side"==="r").select(rCols), id)`.
    * Returns this epoch's view increment (see [[materializerSigned]]).
    */
  def materializer(spark: SparkSession, root: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      numBuckets: Int = DefaultBuckets, retain: Int = 2)(
      leftBatch: DataFrame, rightBatch: DataFrame, batchId: Long): DataFrame =
    materializerSigned(spark, root, leftKeys, rightKeys,
      None, None, numBuckets, retain)(leftBatch, rightBatch, batchId)

  /** foreachBatch body with retractions: each side may carry a sign
    * column (±1, the CDC after/before-image shape); `None` means
    * insert-only for that side.
    *
    * Returns this epoch's VIEW INCREMENT (both sides' columns + `__m`
    * multiplicity deltas, negative for retracted join rows) — the
    * cascade hook: feeding the increment into ANOTHER view's side with
    * `signCol = "__m"` maintains a multi-way join ((L⋈R)⋈S and deeper)
    * incrementally, each stage O(its delta + touched buckets). The
    * increment is a pure function of post-commit state and `batchId`,
    * so a replayed epoch returns the identical frame (the downstream
    * view fences itself) — consume it within the epoch (it reads state
    * versions the NEXT epoch's retirement may sweep).
    */
  def materializerSigned(spark: SparkSession, root: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftSign: Option[String], rightSign: Option[String],
      numBuckets: Int = DefaultBuckets, retain: Int = 2)(
      leftBatch: DataFrame, rightBatch: DataFrame, batchId: Long): DataFrame = {
    val lVals = leftBatch.columns.toSet -- leftSign
    val rVals = rightBatch.columns.toSet -- rightSign
    val clash = lVals & rVals
    require(clash.isEmpty,
      s"join-view sides share non-key column names ${clash.mkString(", ")}" +
        " — rename one side's columns before materializing (the view" +
        " carries both sides' columns side by side)")

    val pL = partials(leftBatch, leftKeys, leftSign, batchId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pR = partials(rightBatch, rightKeys, rightSign, batchId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      advanceSide(spark, s"$root/left", pL, batchId, numBuckets, retain)
      advanceSide(spark, s"$root/right", pR, batchId, numBuckets, retain)

      // the increment reads POST-commit state (identical on replay —
      // a fenced side advance leaves exactly what the pre-crash run
      // committed), restricted to the buckets this epoch's keys land
      // in: matching rows of the OTHER side share those buckets by
      // co-bucketing, so nothing outside them can join
      val bexpr = ExactlyOnce.bucketOf("__jkey", numBuckets).as("__b")
      val touched = pL.select(bexpr).unionByName(pR.select(bexpr))
        .distinct().collect().map(_.getInt(0)).toSet
      val lt = ExactlyOnce.currentStateBuckets(spark, s"$root/left",
        touched, Some(numBuckets))(emptyLike(spark, pL))
      val rt = ExactlyOnce.currentStateBuckets(spark, s"$root/right",
        touched, Some(numBuckets))(emptyLike(spark, pR))
      val tagL = lt.filter(col("__e") === batchId)
      val oldL = lt.filter(col("__e") < batchId)
      val tagR = rt.filter(col("__e") === batchId)

      //   ΔL ⋈ R_new  +  L_old ⋈ ΔR
      // = ΔL ⋈ R_old  +  ΔL ⋈ ΔR  +  L_old ⋈ ΔR  — the exact Δ(L⋈R)
      val inc = half(tagL, rt).unionByName(half(oldL, tagR))

      ExactlyOnce.advanceStateBucketed(spark, s"$root/view", batchId,
        inc, "__jkey", numBuckets, retain)(emptyLike(spark, inc)) { current =>
        current.unionByName(inc)
          .groupBy(inc.columns.filterNot(_ == "__m").map(col).toSeq: _*)
          .agg(sum(col("__m")).as("__m"))
          .filter(col("__m") =!= 0)
          .select(inc.columns.map(col): _*)
      }
      inc.drop("__jkey")
    } finally { pL.unpersist(); pR.unpersist() }
  }

  /** The standing join view: both sides' columns plus `__m`, the exact
    * multiplicity this (left, right) value pair has in the bag join of
    * everything ingested so far. A view that is committed but
    * currently EMPTY (no keys match yet, or every match retracted) is
    * returned as an empty frame with the schema derived from the side
    * states — distinct from "never started", which errors.
    */
  def view(spark: SparkSession, root: String): DataFrame = {
    require(ExactlyOnce.hasCommittedState(spark, s"$root/view"),
      s"no committed join-view state under $root")
    def side(dir: String) = ExactlyOnce.currentStateBucketed(spark, dir)(
      sys.error(s"join-view side state at $dir committed only empty " +
        "epochs; no schema exists to shape an empty view"))
    ExactlyOnce.currentStateBucketed(spark, s"$root/view") {
      val l = side(s"$root/left").drop("__m", "__e")
      val r = side(s"$root/right").drop("__m", "__e", "__jkey")
      val schema = org.apache.spark.sql.types.StructType(
        l.schema.fields ++ r.schema.fields :+
          org.apache.spark.sql.types.StructField("__m",
            org.apache.spark.sql.types.LongType))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }.drop("__jkey")
  }

  /** TIME TRAVEL: the join view exactly as it stood when epoch `asOf`
    * committed. Depth = the `retain` the materializer ran with; pass
    * the same value (see [[ExactlyOnce.currentStateBucketedAsOf]]).
    * Unlike [[view]] there is no empty-schema fallback: an epoch whose
    * view had never matched reads as whatever buckets existed then —
    * possibly none, in which case the side states' schemas still
    * shape the frame via the same derivation.
    */
  def viewAsOf(spark: SparkSession, root: String, asOf: Long,
      retain: Int = 2): DataFrame = {
    def side(dir: String) = ExactlyOnce.currentStateBucketedAsOf(
      spark, dir, asOf, retain)(
      sys.error(s"join-view side state at $dir had committed only" +
        s" empty epochs at epoch $asOf; no schema exists"))
    ExactlyOnce.currentStateBucketedAsOf(spark, s"$root/view", asOf,
      retain) {
      val l = side(s"$root/left").drop("__m", "__e")
      val r = side(s"$root/right").drop("__m", "__e", "__jkey")
      val schema = org.apache.spark.sql.types.StructType(
        l.schema.fields ++ r.schema.fields :+
          org.apache.spark.sql.types.StructField("__m",
            org.apache.spark.sql.types.LongType))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }.drop("__jkey")
  }

  /** [[view]] exploded to plain bag-semantics rows (each row repeated
    * `__m` times) — insert-only convenience; errors if any
    * multiplicity is negative (a retraction still in flight has no
    * bag representation).
    */
  def viewRows(spark: SparkSession, root: String): DataFrame = {
    val v = view(spark, root)
    // explicit pre-pass: explode(array_repeat) silently DROPS a
    // negative-multiplicity row (empty array), so an in-plan guard
    // could never fire — and viewRows is a convenience reader, not the
    // per-epoch hot path, so one extra cheap scan is the honest check
    require(v.filter(col("__m") < 0).limit(1).collect().isEmpty,
      "negative join-view multiplicity: a retraction is in flight; " +
        "read view() for the signed form")
    v.withColumn("__r", explode(array_repeat(lit(1), col("__m").cast("int"))))
      .drop("__m", "__r")
  }
}
