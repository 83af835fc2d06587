package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once delivery machinery (SURVEY §7 hard part 1).
  *
  * Flink's Kafka sink reaches exactly-once with transactional two-phase
  * commit tied to checkpoints (reference `DeliveryGuarantee.EXACTLY_ONCE`,
  * MySQLCDC2AWSMSK.scala:187, txn timeout 900 s :178). Spark's Kafka
  * sink is at-least-once: a failed micro-batch is REPLAYED, so the same
  * (batchId, row) set can be produced twice.
  *
  * The Spark-native strategies, in preference order:
  *
  *  1. **Idempotent downstream** (reference README.md:33 itself
  *     recommends at_least_once + dedup): every record carries
  *     `partitionKey`; a keyed consumer (or [[upsertByKey]] for a lake
  *     target) collapses duplicates. This is the default.
  *  2. **Batch-id fencing** ([[foreachBatchExactlyOnce]]): `foreachBatch`
  *     exposes a stable `batchId` per epoch; a committed-epoch ledger
  *     makes the write idempotent — replayed batches are skipped. This
  *     is exactly the two-phase-commit shape, with the ledger as the
  *     commit marker.
  *  3. **Transactional producer inside foreachBatch**
  *     ([[foreachBatchTransactional]]): per-partition transactional
  *     producers behind the [[TxnProducer]] seam (the real deployment
  *     plugs in kafka-clients' `KafkaProducer` with
  *     `transactional.id = s"$group-$partitionId"`,
  *     initTransactions/commitTransaction — Flink's KafkaSink uses the
  *     same per-subtask-producer design). The epoch ledger fences
  *     replays; an epoch that crashed mid-send has no commit marker, so
  *     the replay re-runs every partition's transaction and the aborted
  *     first attempt stays invisible to `read_committed` consumers.
  */
object ExactlyOnce {

  /** Minimal transactional-producer surface — what the fencing state
    * machine needs from kafka-clients' KafkaProducer. Instantiated PER
    * input partition on the executor (transactions are per-producer, so
    * atomicity is per partition — the same granularity as Flink's
    * per-subtask producers).
    */
  trait TxnProducer extends Serializable {
    def beginTransaction(): Unit
    def send(key: String, value: String): Unit
    def commitTransaction(): Unit
    def abortTransaction(): Unit
    def close(): Unit
    /** Full ProducerRecord form (topic, partition, key/value bytes;
      * partition -1 = let the broker's partitioner choose). Default
      * delegates to the string [[send]] for producers that only care
      * about payloads; broker-bound implementations override. Null key
      * or value are legal Kafka records (unkeyed produce, tombstones) —
      * decoded as null, never dereferenced.
      */
    def sendRecord(topic: String, partition: Int,
        key: Array[Byte], value: Array[Byte]): Unit =
      send(Option(key).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).orNull,
        Option(value).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).orNull)
  }

  /** Producers that can recover broker-side transaction state — the
    * piece that closes the commit-vs-marker residual window (round-3
    * verdict item 6). The real binding: a producer re-created with the
    * SAME `transactional.id` can finish its predecessor's transaction
    * idempotently (Flink's KafkaCommitter recovery path — resume the
    * checkpointed transaction, call commit, and treat "already
    * committed" responses as success; kafka-clients exposes this
    * through initTransactions + the idempotent commit of a resumed
    * transaction).
    *
    * The transactional identity MUST be scoped to the epoch, not just
    * the partition: the factory receives `batchId` precisely so the id
    * is `s"$group-txn-$batchId-$partitionId"`. With an id stable across
    * epochs, the broker's "last transaction committed" state persists
    * past the epoch that produced it, so after epoch N commits, epoch
    * N+1's first (normal, non-crashed) task would probe true, skip all
    * of its sends, and still write its marker — silent data loss for
    * every epoch after the first. Epoch-scoped ids are exactly Flink's
    * per-checkpoint transactional.id rotation; Kafka's zombie fencing
    * still applies between attempts of the SAME epoch, which is the
    * only place two live producers can share an id.
    */
  trait RecoverableTxnProducer extends TxnProducer {
    /** Resume this `transactional.id`'s previous transaction, if any,
      * and drive it to COMMITTED idempotently. Returns true when a
      * prior attempt's transaction is now committed — its records are
      * visible to `read_committed` consumers, so the replaying task
      * must NOT re-send — false when no prior transaction committed
      * (it aborted, or never began): the replay owns a clean slate and
      * sends normally. Because the id carries the epoch, "prior
      * attempt" can only mean a prior attempt of THIS epoch — a
      * previous epoch's committed transaction lives under a different
      * id and can never fence this one.
      */
    def resumeAndCommit(): Boolean
  }

  /** Upsert-by-key into a parquet/delta-style target: latest record per
    * `partitionKey` wins (ts tie-broken by value hash for determinism).
    * Running it over data containing duplicates yields the same target
    * state as running it over the deduplicated input — the idempotence
    * that makes at-least-once delivery exactly-once downstream.
    */
  def upsertByKey(batch: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, xxhash64(col("value")).asc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Wrap a batch writer with an epoch ledger at `ledgerPath` (one empty
    * marker file per committed batchId). Replayed epochs are skipped —
    * the micro-batch equivalent of Kafka's transaction commit marker.
    * Returns true when the batch was written, false when fenced.
    */
  def writeFenced(spark: SparkSession, ledgerPath: String, batchId: Long)(
      write: () => Unit): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(ledgerPath),
      spark.sparkContext.hadoopConfiguration)
    val ledger = new org.apache.hadoop.fs.Path(ledgerPath)
    if (epochFenced(fs, ledger, batchId)) false
    else {
      write()
      // commit marker AFTER the write
      fs.create(new org.apache.hadoop.fs.Path(
        ledger, s"epoch-$batchId"), true).close()
      true
    }
  }

  private def stateFs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  // ---- ledger I/O, one listing per operation (r9 verdict item 1) ----
  // The chained IVM pipeline advances up to eight states per epoch, and
  // each advance used to pay several ledger listings plus a content
  // read per marker — a fixed cost that dominated near-empty steady
  // epochs (and on an object store each of those is a billable RPC).
  // Two caches cut it to ONE listing per ledger operation:
  //
  //   - content: ledger files are write-once (atomic tmp+rename, or
  //     create-then-delete), so parsed content is cached JVM-wide keyed
  //     by (path, length, mtime) — a file re-created in place (a test
  //     rebuilding a state dir) changes its mtime/len and misses;
  //   - owners: the bucket->epochs map is memoized against the full
  //     listing's (name, len, mtime) signature, so consecutive reads of
  //     an unchanged ledger (the fence probe, the state read, and the
  //     retirement sweep of one epoch; every epoch of an idle stream)
  //     parse it once. Correct under the single-writer invariant AND
  //     under foreign writers: any change to the ledger changes the
  //     signature, which is re-listed every call.
  private def listLedger(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
    try fs.listStatus(ledger).toSeq
    catch { case _: java.io.FileNotFoundException => Nil }

  private val ledgerContentCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedLedgerText(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): String = {
    val key = s"${st.getPath}@${st.getLen}:${st.getModificationTime}"
    val hit = ledgerContentCache.get(key)
    if (hit != null) hit
    else {
      // bound the cache: markers retire continuously, so stale keys
      // accumulate over an unbounded run — a full clear every 8k
      // entries costs one re-read burst, never correctness
      if (ledgerContentCache.size > 8192) ledgerContentCache.clear()
      val txt = readLedgerText(fs, st.getPath)
      ledgerContentCache.put(key, txt)
      txt
    }
  }

  private def ledgerSignature(
      sts: Seq[org.apache.hadoop.fs.FileStatus]): String =
    sts.map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")

  private val ownersCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[Int, Seq[Long]])]()

  // Tolerant marker-name parse: the per-(epoch, partition) fencing of
  // runFenced writes `epoch-N.part-P` siblings, so a name must match the
  // exact `epoch-<digits>` shape to count as an epoch marker — anything
  // else in the ledger dir is ignored rather than crashing state reads.
  private val EpochMarkerRe = "^epoch-(\\d+)$".r
  private val HwmMarkerRe = "^hwm-(\\d+)$".r

  private def committedEpochs(spark: SparkSession, stateDir: String): Seq[Long] = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    listLedger(fs, ledger).map(_.getPath.getName)
      .collect { case EpochMarkerRe(e) => e.toLong }
  }

  /** The ledger's committed high watermark: every epoch `<= hwm` is
    * committed, even after its individual marker was folded away (the
    * anti-unbounded-ledger device — per-epoch markers below the
    * watermark are deleted once nothing references them, so ledger
    * listings stay O(live state), not O(total epochs ever)). Sound
    * because foreachBatch epochs commit sequentially: a committed epoch
    * implies every lower epoch committed before it.
    */
  private def ledgerHwm(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path): Option[Long] =
    listLedger(fs, ledger).map(_.getPath.getName)
      .collect { case HwmMarkerRe(e) => e.toLong }.maxOption

  private def epochFenced(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path, batchId: Long): Boolean =
    fencedInNames(listLedger(fs, ledger).map(_.getPath.getName), batchId)

  /** Advance the ledger's high watermark to `upTo` and fold the
    * individual epoch markers it subsumes. Crash-ordered: the new hwm
    * file lands FIRST, so fencing never weakens mid-fold (a half-folded
    * ledger has both the hwm and some markers — epochFenced honors
    * either).
    */
  private def foldLedger(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path, upTo: Long): Unit = {
    val newHwm = math.max(upTo, ledgerHwm(fs, ledger).getOrElse(Long.MinValue))
    fs.create(new org.apache.hadoop.fs.Path(ledger, s"hwm-$newHwm"), true).close()
    fs.listStatus(ledger).toSeq.map(_.getPath.getName).foreach {
      case n @ EpochMarkerRe(e) if e.toLong <= newHwm =>
        fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false)
      case n @ HwmMarkerRe(e) if e.toLong < newHwm =>
        fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false)
      case _ => ()
    }
  }

  // -------------------------------------------------------------------
  // Bucketed versioned state — the O(touched-buckets) epoch protocol of
  // the foreachBatch materializers (CDC replica MERGE, SCD2 history
  // MERGE). The state is hash-bucketed on its key: epoch `e` writes
  // `state-<e>/__bucket=<b>` for ONLY the buckets its batch touches,
  // and the epoch marker records that bucket list, so a bucket's
  // current content lives at the NEWEST committed epoch that touched
  // it. This mirrors MERGE INTO file pruning on a lake table: an epoch
  // rewrites the files its keys land in, never the whole table. The
  // crash windows inherit the single-marker reasoning:
  //
  //   - crash after some bucket writes, before the marker → every new
  //     bucket dir is an uncommitted orphan (the marker is what makes
  //     an epoch's buckets visible); the replayed epoch's Overwrite
  //     clears them and then commits;
  //   - content-bearing ledger files (markers carry the bucket list,
  //     owners snapshots carry the bucket index) land via tmp+rename,
  //     so a crash mid-write leaves an invisible `.tmp`, never a
  //     visible-but-truncated commit point;
  //   - crash after the marker, before retirement → superseded bucket
  //     versions linger; readers resolve per-bucket newest, the next
  //     epoch's retirement sweep removes them;
  //   - retirement keeps the TWO newest versions of each bucket (a
  //     one-epoch grace window, so a reader that resolved state while
  //     epoch N commits can finish scanning N-1's files);
  //   - every retirement folds all but the newest marker into an
  //     `owners-<E>` snapshot (bucket -> owning epochs) plus the
  //     `hwm-<E>` fence — ownership and fencing are SEPARATE, so a
  //     cold bucket owned by an ancient epoch never blocks the fold
  //     and ledger listings stay O(1) files / O(buckets) content over
  //     an unbounded stream;
  //   - a read failure of a committed bucket PROPAGATES — never
  //     conflated with the genuinely-empty before-first-commit state.
  // -------------------------------------------------------------------

  private def bucketExpr(keyCol: String, numBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")

  /** The protocol's key→bucket map, public so a co-bucketed caller (the
    * join-view materializer keeps three states on the SAME key) can
    * compute touched buckets with the exact formula the state writer
    * uses — any drift would silently split keys across layouts.
    */
  def bucketOf(keyCol: String, numBuckets: Int): Column =
    bucketExpr(keyCol, numBuckets)

  private val OwnersRe = "^owners-(\\d+)$".r
  private val StateDirRe = "^state-(\\d+)$".r

  /** Atomic content-bearing ledger write: tmp then rename, so the file
    * is either absent or complete — never visibly truncated.
    */
  private def atomicLedgerWrite(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path, name: String,
      content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(ledger, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(ledger, name)))
      sys.error(s"ledger rename failed for $name under $ledger")
  }

  private def readLedgerText(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** bucket -> owning epochs, newest first: the newest `owners-<E>`
    * snapshot plus every epoch marker above E. Bounded retry covers
    * the one benign race — a concurrent retirement folding a listed
    * marker between listStatus and open.
    */
  private def bucketOwners(spark: SparkSession,
      stateDir: String): Map[Int, Seq[Long]] = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    def attempt(): Map[Int, Seq[Long]] = {
      val sts = listLedger(fs, ledger)
      if (sts.isEmpty) return Map.empty
      ownersFromListing(fs, stateDir, sts)
    }
    var lastErr: Throwable = null
    (1 to 3).foreach { _ =>
      try return attempt()
      catch { case e: java.io.FileNotFoundException => lastErr = e }
    }
    throw lastErr
  }

  /** The owners map derived from an already-taken ledger listing —
    * memoized against the listing's signature (see the cache note
    * above), so repeated derivations within and across epochs of an
    * unchanged ledger cost nothing beyond the listing itself.
    */
  private def ownersFromListing(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String,
      sts: Seq[org.apache.hadoop.fs.FileStatus]): Map[Int, Seq[Long]] = {
    val sig = ledgerSignature(sts)
    val cached = ownersCache.get(stateDir)
    if (cached != null && cached._1 == sig) return cached._2
    val byName = sts.map(s => s.getPath.getName -> s).toMap
    val names = byName.keySet
    val snapE = names.collect { case OwnersRe(e) => e.toLong }
    val snapMax = if (snapE.isEmpty) None else Some(snapE.max)
    val snap: Map[Int, Seq[Long]] = snapMax match {
      case None => Map.empty
      case Some(e) =>
        cachedLedgerText(fs, byName(s"owners-$e"))
          .split('\n').filter(_.nonEmpty).map { line =>
            val Array(b, es) = line.split(':')
            b.toInt -> es.split(',').filter(_.nonEmpty)
              .map(_.toLong).toSeq
          }.toMap
    }
    val live = names.toSeq
      .collect { case EpochMarkerRe(e) if snapMax.forall(e.toLong > _) =>
        e.toLong }.sorted
    val owners = live.foldLeft(snap) { (acc, e) =>
      val bs = cachedLedgerText(fs, byName(s"epoch-$e"))
        .split(',').filter(_.nonEmpty).map(_.toInt)
      bs.foldLeft(acc)((m, b) =>
        m.updated(b, (e +: m.getOrElse(b, Nil)).distinct))
    }
    ownersCache.put(stateDir, (sig, owners))
    owners
  }

  /** The bucket-count pin: the hash fan-out is structural (a key's
    * bucket must be stable across every epoch and reader), so the first
    * epoch records it and later epochs fail fast on a mismatch instead
    * of silently splitting keys across incompatible layouts.
    */
  /** The cluster-scale write lever: per-epoch bucket-clustering
    * exchange ON by default (locally: O(1) files per bucket). A
    * cluster deployment sets `spark.graft.state.clusterByBucket=false`
    * once on the session and every materializer entry point — CDC
    * replica, SCD2, rollup, join view, sketches, reservoir, schema
    * census, dup-spans LSM — inherits it; an explicit parameter at the
    * protocol layer overrides the conf (specs exercise both).
    */
  val ClusterByBucketConf = "spark.graft.state.clusterByBucket"

  private def resolveClusterByBucket(spark: SparkSession,
      explicit: Option[Boolean]): Boolean =
    explicit.getOrElse(
      spark.conf.getOption(ClusterByBucketConf).forall(_.toBoolean))

  private def readPinnedBuckets(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path): Option[Int] =
    pinnedInNames(listLedger(fs, ledger).map(_.getPath.getName))

  private def pinnedInNames(names: Seq[String]): Option[Int] =
    names.collect { case s if s.startsWith("buckets-") =>
      s.stripPrefix("buckets-").toInt }.headOption

  private def fencedInNames(names: Seq[String], batchId: Long): Boolean =
    names.collect { case HwmMarkerRe(e) => e.toLong }.maxOption
      .exists(batchId <= _) || names.contains(s"epoch-$batchId")

  private def pinBucketCount(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path, names: Seq[String],
      numBuckets: Int): Unit = {
    pinnedInNames(names) match {
      case Some(b) if b != numBuckets => sys.error(
        s"state at ${ledger.getParent} is bucketed $b ways; refusing " +
          s"to advance it $numBuckets ways (keys would change buckets)")
      case Some(_) => ()
      case None =>
        fs.create(new org.apache.hadoop.fs.Path(
          ledger, s"buckets-$numBuckets"), true).close()
    }
  }

  /** Per-advance phase timing behind `spark.graft.state.timing=true` —
    * the attribution instrument for the chained-materializer fixed
    * cost (use `graft.IvmProfile` to drive it on a steady epoch).
    */
  private def phaseTimed[T](spark: SparkSession, tag: String)(f: => T): T =
    if (!spark.conf.getOption("spark.graft.state.timing").contains("true")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[state-timing] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** The state's on-disk schema as last written or inferred in this
    * JVM — keyed by stateDir and refreshed on every write, so the
    * writer's reads skip parquet footer inference (the schema is
    * protocol-stable across epochs: the first advance may widen
    * aggregate types — e.g. sum over decimal — and every later epoch
    * reproduces that widened shape). Write-path only: cross-JVM
    * readers still infer, because only the single writer can know the
    * dir was not rebuilt underneath the cache.
    */
  private val stateSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** One bucketed epoch: fold `batch` into the keyed state at
    * `stateDir`, writing ONLY the buckets the batch touches — per-epoch
    * write cost O(touched buckets' state + batch), never O(history).
    * `advance` receives the touched buckets' current rows (or `empty`
    * before any commit) and must return those buckets' full next
    * content — true for any per-key merge (its output keys are a subset
    * of input-state keys ∪ batch keys, all in touched buckets).
    *
    * The touched-bucket probe collects ≤ `numBuckets` distinct ints to
    * the driver — iteration control, same class as the k-row KMeans
    * convergence probe. Returns true when the epoch advanced the state,
    * false when fenced (already committed — replays are no-ops).
    */
  def advanceStateBucketed(spark: SparkSession, stateDir: String,
      batchId: Long, batch: DataFrame, keyCol: String, numBuckets: Int,
      retain: Int = 2, clusterByBucket: Option[Boolean] = None,
      knownTouched: Option[Set[Int]] = None,
      knownNarrow: Option[Boolean] = None,
      advancePre: Option[(DataFrame, Int) => DataFrame] = None)(
      empty: => DataFrame)(advance: DataFrame => DataFrame): Boolean = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(retain >= 2, "retain must keep at least current + one grace" +
      " version (2); larger values enable deeper as-of time travel")
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    // ONE ledger listing serves the fence probe, the bucket-count pin,
    // AND (through the signature-memoized owners derivation) the
    // bucket->epoch index — the batched fence check of the r9 verdict:
    // the chained pipeline advances eight states per epoch, and each
    // redundant listing/content-read was pure fixed cost (an RPC each
    // on an object store)
    val ledgerSts = phaseTimed(spark, s"fence+pin $stateDir")(
      listLedger(fs, ledger))
    val ledgerNames = ledgerSts.map(_.getPath.getName)
    if (fencedInNames(ledgerNames, batchId)) return false
    pinBucketCount(fs, ledger, ledgerNames, numBuckets)
    val bExpr = bucketExpr(keyCol, numBuckets)
    // the epoch evaluates `batch` several times (touched-bucket probe
    // here, plus whatever advance() does) — pin it so a source-backed
    // micro-batch is scanned once, not once per job. A caller passing
    // `knownTouched` (a SUPERSET of the batch's actual bucket set it
    // computed anyway — the join-view materializer shares one probe
    // across its three states) skips both the probe job and the
    // persist; it is responsible for caching the batch itself.
    val ownPersist = knownTouched.isEmpty
    if (ownPersist)
      batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // collect_set, not distinct().collect(): the partial aggregate
      // collapses to <= numBuckets ints per task with no wide shuffle —
      // a single tiny job instead of a two-stage exchange per advance.
      // The same job also reads max(spark_partition_id()) — the cached
      // batch's actual partition count, which the narrow-batch write
      // gate below needs — so the own-probe path never has to finalize
      // the plan through batch.rdd (which under AQE can execute
      // upstream shuffle stages outside phase attribution).
      var probedParts: Option[Int] = None
      val touched = knownTouched.getOrElse(
        phaseTimed(spark, s"probe $stateDir") {
          // partition id projected BEFORE the agg (a nondeterministic
          // expression may not appear as an aggregate argument)
          val r = batch.select(bExpr.as("__bucket"),
              spark_partition_id().as("__pid"))
            .agg(collect_set(col("__bucket")), max(col("__pid"))).head()
          probedParts = Some(if (r.isNullAt(1)) 0 else r.getInt(1) + 1)
          r.getSeq[Int](0).toSet
        })
      val owners = ownersFromListing(fs, stateDir, ledgerSts)
      if (touched.nonEmpty) {
        val paths = touched.toSeq.sorted
          .flatMap(b => owners.get(b).flatMap(_.headOption)
            .map(e => s"$stateDir/state-$e/__bucket=$b"))
          .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
        // the writer knows its own state schema (refreshed every
        // write below) — skip footer inference on the read
        val pinnedSchema = Option(stateSchemaCache.get(stateDir))
        val current =
          if (paths.isEmpty) empty
          else pinnedSchema match {
            case Some(s) => spark.read.schema(s).parquet(paths: _*)
            case None => spark.read.parquet(paths: _*)
          }
        // cluster-by-bucket (local default ON): one extra exchange so
        // each bucket lands in O(1) files, not (tasks x buckets)
        // fragments. At cluster scale turn it OFF and let every task
        // write its bucket slice in parallel — correctness is
        // unaffected (readers list all files under a bucket dir), only
        // the file count per bucket grows. The lever is reachable from
        // EVERY materializer entry point without a signature: set
        // `spark.graft.state.clusterByBucket=false` on the session;
        // the explicit parameter (tests) overrides the conf. The
        // exchange sizes itself to the TOUCHED bucket count: a
        // near-empty steady epoch shuffles into |touched| partitions,
        // not numBuckets mostly-empty tasks (hash partitioning by
        // __bucket keeps each bucket in one task either way).
        // near-empty epochs skip the exchange entirely (r10 verdict
        // item 3): at ≤ 4 touched buckets the batch upstream is a
        // handful of cached partitions, so writing it directly costs
        // at most a few files per bucket while the exchange costs a
        // whole extra stage + AQE round per state per epoch — the
        // dominant share of the chained pipeline's steady-epoch floor
        // (six states × ~0.15 s). Larger epochs keep the exchange and
        // its O(1)-files-per-bucket guarantee. The skip ALSO requires a
        // narrow batch upstream (r11 advice): a wide skewed batch whose
        // keys land in ≤ 4 buckets would otherwise fan out
        // (write tasks × buckets) fragments per epoch — readers
        // tolerate it, but commit-listing cost balloons. Narrowness
        // resolves in preference order: the own-probe's measured
        // partition count (free — read in the same probe job), then
        // the caller's `knownNarrow` declaration (knownTouched callers
        // own their batch's cache and shape), then a last-resort
        // `.rdd` probe — which under AQE finalizes the plan and can
        // execute upstream stages, so it is phase-attributed, and a
        // probe FAILURE is logged (distinct from "genuinely wide")
        // before conservatively keeping the exchange.
        def narrowBatch: Boolean = probedParts.map(_ <= 32)
          .orElse(knownNarrow)
          .getOrElse(phaseTimed(spark, s"narrow-probe $stateDir")(
            try batch.rdd.getNumPartitions <= 32 catch {
              case t: Throwable =>
                println(s"[state] narrow-probe failed at $stateDir " +
                  s"(${t.getClass.getSimpleName}: ${t.getMessage}); " +
                  "keeping the bucket-clustering exchange")
                false
            }))
        // a FUSED advance (`advancePre`) folds the bucket-clustering
        // exchange into its own keyed aggregate: it repartitions the
        // merge input by __bucket and groups by (__bucket, key) — a
        // hash partitioning on a subset of the grouping keys satisfies
        // the aggregate's ClusteredDistribution, so the whole advance +
        // clustering runs on ONE exchange where the generic path pays
        // two (the advance's own key exchange + the bucket repartition).
        // The r13 30× IVM profile measured the two-exchange replica
        // write at a flat ~2.2 s/steady epoch at BOTH 64 and 256
        // buckets — exchange count, not bucket volume, set the floor.
        // Used only on the clustering path; the ≤4-touched skip keeps
        // the plain advance (no exchange at all beats one).
        lazy val wantCluster = resolveClusterByBucket(spark, clusterByBucket) &&
          (touched.size > 4 || !narrowBatch)
        val clustered =
          if (advancePre.isDefined && wantCluster)
            advancePre.get(current, math.min(numBuckets, touched.size))
          else {
            val next = advance(current).withColumn("__bucket", bExpr)
            if (wantCluster)
              next.repartition(math.min(numBuckets, touched.size),
                col("__bucket")) else next
          }
        phaseTimed(spark, s"write $stateDir")(
          clustered
            .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
            .parquet(s"$stateDir/state-$batchId"))
        stateSchemaCache.put(stateDir,
          org.apache.spark.sql.types.StructType(
            clustered.schema.fields.filterNot(_.name == "__bucket")))
      }
      // the marker carries the touched-bucket list — it is both the
      // atomic commit point (tmp+rename: absent or complete, never
      // truncated) and the reader's bucket->epoch index; an all-empty
      // epoch commits an empty list purely for fencing
      atomicLedgerWrite(fs, ledger, s"epoch-$batchId",
        touched.toSeq.sorted.mkString(","))
      // hand the post-commit ownership view forward so retirement does
      // not re-read the whole ledger it just derived
      val ownersAfter = touched.toSeq.sorted.foldLeft(owners)((m, b) =>
        m.updated(b, (batchId +: m.getOrElse(b, Nil)).distinct))
      phaseTimed(spark, s"retire $stateDir")(
        retireBucketed(spark, stateDir, ownersAfter, retain))
      true
    } finally if (ownPersist) batch.unpersist()
  }

  /** Retirement sweep: filesystem-driven and idempotent, crash-safe at
    * any point (deletions only ever remove superseded, orphaned, or
    * subsumed artifacts):
    *
    *   1. delete every bucket dir outside its bucket's `retain` newest
    *      committed versions (default keep-2 = current + one-epoch
    *      reader grace; larger `retain` keeps a deeper version history
    *      for [[currentStateBucketedAsOf]] time travel) — this also
    *      sweeps orphan dirs of uncommitted epochs, which own nothing
    *      by construction;
    *   2. drop epoch dirs that hold no buckets any more;
    *   3. fold ALL markers below the newest one into an `owners-<E>`
    *      snapshot (per bucket, its surviving owners at or below E)
    *      plus the `hwm-<E>` fence, then delete the subsumed markers
    *      and older snapshots. Ownership lives in the snapshot,
    *      fencing in the hwm — a cold bucket owned by an old epoch
    *      folds like any other, so the ledger stays O(1) files.
    */
  private def retireBucketed(spark: SparkSession, stateDir: String,
      owners: Map[Int, Seq[Long]], retain: Int = 2): Unit = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val BucketDirRe = "^__bucket=(\\d+)$".r
    fs.listStatus(root).toSeq.map(_.getPath.getName).foreach {
      case n @ StateDirRe(es) =>
        val e = es.toLong
        val p = new org.apache.hadoop.fs.Path(s"$stateDir/$n")
        fs.listStatus(p).toSeq.map(_.getPath.getName).foreach {
          case bn @ BucketDirRe(bs) =>
            if (!owners.getOrElse(bs.toInt, Nil).take(retain).contains(e))
              fs.delete(new org.apache.hadoop.fs.Path(p, bn), true)
          case _ => ()
        }
        if (!fs.listStatus(p).exists(
            s => BucketDirRe.matches(s.getPath.getName)))
          fs.delete(p, true)
      case _ => ()
    }
    // single-writer invariant makes the ledger sweep safe: any .tmp
    // seen here is a crash orphan (this epoch's own atomic writes all
    // completed their renames before this point)
    val TmpRe = "^(?:epoch|owners|hwm)-\\d+\\.tmp$".r
    val names = fs.listStatus(ledger).toSeq.map(_.getPath.getName)
    names.filter(TmpRe.matches).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false))
    val markerEpochs = names.collect { case EpochMarkerRe(e) => e.toLong }
      .sorted
    if (markerEpochs.size > 1) {
      val foldUpTo = markerEpochs.init.last
      val snapshot = owners.toSeq.sortBy(_._1).flatMap { case (b, es) =>
        val kept = es.take(retain).filter(_ <= foldUpTo)
        if (kept.isEmpty) None else Some(s"$b:${kept.mkString(",")}")
      }.mkString("\n")
      // snapshot THEN fence THEN delete — a crash anywhere leaves both
      // the folded view and the markers it subsumes, and readers merge
      // them idempotently. An all-empty snapshot (every owner above the
      // fold point, or an idle stream of empty epochs) writes nothing:
      // readers without an owners file resolve from live markers alone.
      if (snapshot.nonEmpty && !fs.exists(new org.apache.hadoop.fs.Path(
          ledger, s"owners-$foldUpTo")))
        atomicLedgerWrite(fs, ledger, s"owners-$foldUpTo", snapshot)
      if (!fs.exists(new org.apache.hadoop.fs.Path(ledger, s"hwm-$foldUpTo")))
        atomicLedgerWrite(fs, ledger, s"hwm-$foldUpTo", "")
      names.foreach {
        case n @ EpochMarkerRe(e) if e.toLong <= foldUpTo =>
          fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false)
        case n @ OwnersRe(e) if e.toLong < foldUpTo =>
          fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false)
        case n @ HwmMarkerRe(e) if e.toLong < foldUpTo =>
          fs.delete(new org.apache.hadoop.fs.Path(ledger, n), false)
        case _ => ()
      }
    }
  }

  /** True when `batchId` committed at `stateDir` — marker present, or
    * at/below the folded high watermark. The public probe for readers
    * of per-epoch side outputs (e.g. a materializer's event log):
    * an epoch directory without a committed marker is crash debris and
    * must stay invisible.
    */
  def isEpochCommitted(spark: SparkSession, stateDir: String,
      batchId: Long): Boolean =
    epochFenced(stateFs(spark, stateDir),
      new org.apache.hadoop.fs.Path(s"$stateDir/_ledger"), batchId)

  /** True once any epoch has committed state at `stateDir` — the guard
    * that keeps "not started yet" distinct from "committed and empty".
    */
  def hasCommittedState(spark: SparkSession, stateDir: String): Boolean = {
    val fs = stateFs(spark, stateDir)
    committedEpochs(spark, stateDir).nonEmpty ||
      ledgerHwm(fs, new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")).nonEmpty
  }

  /** Operational introspection of any graft state directory — the
    * report a deployment watches instead of `du`-ing a 100 TB state:
    * one row per (component, bucket) slice with its file count and
    * bytes, the component kind (`versioned` = `state-<e>` under the
    * versioned protocol, `base`/`delta` = the append-only LSM,
    * `flat` = a non-bucketed component), and whether the slice is LIVE
    * (the newest committed owner of its bucket / a live LSM component)
    * or awaiting retirement. Metadata-only: a filesystem listing, no
    * parquet data is read — cost is O(files), which the protocols keep
    * at O(buckets x retain + live deltas).
    */
  def stateReport(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val fs = stateFs(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val ComponentRe = "^(state|base|delta)-(\\d+)$".r
    val BucketDirRe = "^__bucket=(\\d+)$".r
    val owners = bucketOwners(spark, stateDir)
    val liveAppended = appendedComponentDirs(spark, stateDir)
      .map(d => new org.apache.hadoop.fs.Path(d).getName).toSet
    def slice(p: org.apache.hadoop.fs.Path): (Long, Long) = {
      val files = fs.listStatus(p).toSeq.filterNot(_.getPath.getName
        .startsWith("_"))
      (files.size.toLong, files.map(_.getLen).sum)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.Row]
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath).foreach { comp =>
        comp.getName match {
          case ComponentRe(kindRaw, eStr) =>
            val e = eStr.toLong
            val kind = if (kindRaw == "state") "versioned" else kindRaw
            val children = fs.listStatus(comp).toSeq
            val bucketDirs = children.filter(c =>
              BucketDirRe.matches(c.getPath.getName))
            if (bucketDirs.isEmpty) {
              val (nf, nb) = slice(comp)
              // a versioned state-<e> with no __bucket= children is an
              // epoch that committed EMPTY touched buckets (partitioned
              // writes emit no dir for an empty slice) — still the
              // protocol's component, and live iff it is the newest
              // committed owner of any bucket; only base/delta content
              // without bucket dirs is genuinely flat (appendDelta)
              val (kindHere, live) =
                if (kindRaw == "state")
                  ("versioned", owners.values.exists(_.headOption.contains(e)))
                else ("flat", liveAppended(comp.getName))
              rows += org.apache.spark.sql.Row(
                comp.getName, kindHere, e, null, nf, nb, live)
            } else bucketDirs.foreach { bd =>
              val b = BucketDirRe.findFirstMatchIn(bd.getPath.getName)
                .get.group(1).toInt
              val (nf, nb) = slice(bd.getPath)
              val live =
                if (kindRaw == "state")
                  owners.get(b).flatMap(_.headOption).contains(e)
                else liveAppended(comp.getName)
              rows += org.apache.spark.sql.Row(
                comp.getName, kind, e, b, nf, nb, live)
            }
          case _ => () // _ledger, spans dirs, foreign content
        }
      }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      StructType(Seq(
        StructField("component", StringType),
        StructField("kind", StringType),
        StructField("epoch", LongType),
        StructField("bucket", IntegerType),
        StructField("files", LongType),
        StructField("bytes", LongType),
        StructField("live", BooleanType))))
      .orderBy(col("epoch"), col("component"), col("bucket"))
  }

  /** The current state under [[advanceStateBucketed]]'s protocol: per
    * bucket, the newest committed epoch's version (a bucket whose owner
    * epoch wrote it empty contributes nothing). `empty` is returned
    * before the first commit AND for a committed-but-all-empty state —
    * callers needing the distinction check [[hasCommittedState]].
    */
  def currentStateBucketed(spark: SparkSession, stateDir: String)(
      empty: => DataFrame): DataFrame = {
    val fs = stateFs(spark, stateDir)
    val paths = bucketOwners(spark, stateDir).toSeq.sortBy(_._1)
      .flatMap { case (b, es) =>
        es.headOption.map(e => s"$stateDir/state-$e/__bucket=$b") }
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (paths.isEmpty) empty else spark.read.parquet(paths: _*)
  }

  private val MigParamsRe = "^migparams-(\\d+)-(\\d+)$".r

  /** MAINTENANCE: migrate a bucketed state to a NEW bucket count — the
    * adoption path for the bucket-sizing lever (IVM_PROFILE_r14
    * measured it: a standing state whose per-bucket slice has grown
    * with the corpus pays the slice size on every touched-bucket
    * advance; at 256 buckets the 100× IVM chain ran BELOW the 30×
    * floor). Reads the src's live rows (newest committed version per
    * bucket) and folds them into `dstDir` under the new assignment
    * across `waves` fenced epochs, pinning `newBuckets` there — any
    * later advance or pruned probe with a mismatched count fails
    * loudly via the existing bucket-count guards, so a half-switched
    * caller cannot silently read wrong buckets.
    *
    * WAVES (the O(wave) memory shape): wave `w` owns exactly the dst
    * buckets `d` with `d % waves == w` and commits them as its own
    * fenced epoch `batchId - waves + 1 + w` (the LAST wave commits at
    * `batchId` itself). Each wave scans the src's live rows and keeps
    * only the keys whose NEW bucket lands in its group, so every dst
    * bucket is written exactly once (write amplification 1×, no
    * cross-wave rewrite) and the per-epoch working set — shuffle
    * buffers, write tasks — is O(state / waves), never O(state). The
    * src is re-SCANNED per wave (columnar parquet read, no
    * materialization), the deliberate trade for the bounded heap: the
    * monolithic form pinned the whole live state via the advance's
    * batch persist, which at the 100× smoke doubled old-gen to
    * 17.6 GB of 32 GB — one notch up it does not fit. Queries keep
    * reading the SRC throughout (it is never touched); the final
    * `hwm-batchId` fence is the cutover point after which the dst is
    * whole.
    *
    * Scope: LIVE state only. As-of history does not migrate — the src
    * dir is left intact and stays readable for time travel; retire it
    * once its retention window is no longer needed. `dstDir` must be
    * fresh; re-running the SAME parameters after a mid-wave crash
    * resumes exactly where it stopped (committed waves are fenced
    * no-ops, remaining waves run) and a fully-committed replay returns
    * false — the same at-least-once contract every epoch write
    * carries.
    *
    * Provenance: before migrating, the dst ledger gets a marker naming
    * the src dir (a deterministic digest of its path) plus a
    * `migparams-<batchId>-<waves>` pin. The resumed/replayed path
    * VERIFIES both and the pinned bucket count — a dst that happens to
    * carry an unrelated state whose epochs committed is a mis-pointed
    * migration, not a replay, and a re-run with a different epoch or
    * wave split would interleave incompatible bucket-group
    * assignments; both fail loudly instead of silently proceeding.
    *
    * Ledger tags: the src's non-structural ledger stamps (the packed-
    * key codec tag and any other operator-declared tags) are COPIED to
    * the dst before the migration epochs — the materializer resuming
    * on the dst would otherwise trip its own codec-stamp guard
    * ("committed epochs but no codec stamp") on state this very op
    * produced from correctly-stamped input.
    *
    * After the last wave the dst fence rises to `hwm-batchId`
    * IDEMPOTENTLY — on the normal path and on a replay that found
    * every wave already committed — closing the crash window between
    * the final wave's commit and the fence write: the migration
    * reflects every src epoch ≤ batchId, so a resumed pipeline that
    * replays any pre-migration epoch against the dst must be fenced,
    * not double-applied.
    */
  def rebucketState(spark: SparkSession, srcDir: String, dstDir: String,
      keyCol: String, newBuckets: Int, batchId: Long = 0L,
      retain: Int = 2, waves: Int = 1,
      crashAfterWave: Option[Int] = None): Boolean = {
    require(srcDir != dstDir,
      "rebucket migrates into a NEW state dir; in-place would destroy" +
        " the fencing its own crash-safety rests on")
    require(hasCommittedState(spark, srcDir),
      s"no committed state at $srcDir to rebucket")
    require(waves >= 1 && waves <= newBuckets,
      s"waves must be in [1, newBuckets]; got $waves of $newBuckets")
    require(batchId >= waves - 1,
      s"batchId $batchId leaves no room for $waves wave epochs" +
        " (wave epochs are batchId-waves+1..batchId and must be >= 0)")
    val provenance = "migsrc-" + java.util.UUID.nameUUIDFromBytes(
      srcDir.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    val migParams = s"migparams-$batchId-$waves"
    val fs = stateFs(spark, dstDir)
    val dstLedger = new org.apache.hadoop.fs.Path(s"$dstDir/_ledger")
    if (hasCommittedState(spark, dstDir)) {
      // only a resumed/fenced replay of THIS migration may pass: the
      // dst must name this src as its provenance, pin the same
      // (batchId, waves) parameterization, and pin the new count
      val names = listLedger(fs, dstLedger).map(_.getPath.getName)
      if (!names.contains(provenance)) sys.error(
        s"$dstDir has committed epochs but no provenance marker" +
          s" for $srcDir — it holds an UNRELATED state, not a replay of" +
          " this migration; refusing to report it as fenced")
      // validate against ALL migparams markers — a stale marker from a
      // crashed pre-commit attempt alongside the real one is a conflict
      // we must surface, not a coin-flip for collectFirst to resolve
      val pins = names.collect { case MigParamsRe(b, w) => (b.toLong, w.toInt) }
      if (pins.isEmpty) {
        // pre-marker dst (or a marker lost to a partial ledger): fall
        // back to the strict pre-r16 fence — only a replay of the SAME
        // final epoch may pass; a different batchId would run unfenced
        // wave epochs on top of the completed migration
        require(isEpochCommitted(spark, dstDir, batchId),
          s"$dstDir has committed state and provenance for $srcDir but" +
            s" no migparams pin and no committed epoch $batchId — a" +
            " replay with different parameters on top of a completed" +
            " migration would duplicate live state; rebuild the dst" +
            " to re-migrate")
      } else pins.foreach { case (b, w) =>
        require(b == batchId,
          s"$dstDir carries a migration from a different epoch" +
            s" (batchId $b, not $batchId) — a replay must use the" +
            " SAME parameters; rebuild the dst to re-migrate")
        if (w != waves) sys.error(
          s"$dstDir was part-migrated with $w waves, not $waves — a" +
            " different wave split would interleave incompatible" +
            s" bucket-group epochs; resume with waves=$w or rebuild" +
            " the dst")
      }
      if (!pinnedInNames(names).contains(newBuckets)) sys.error(
        s"$dstDir carries provenance for $srcDir but is pinned" +
          s" ${pinnedInNames(names).getOrElse("un")}-bucketed, not" +
          s" $newBuckets — a half-committed or mis-parameterized" +
          " migration; rebuild the dst")
    }
    // pre-advance, crash-safe order: markers + tags with no committed
    // state are inert; each wave's own fence makes its commit atomic.
    // A crashed PRE-COMMIT attempt may have left stale migparams-*
    // markers with different parameters — with no committed state they
    // pinned nothing, so clear them before writing this run's pin (on
    // the committed path the pins were just validated equal, so the
    // only removal is a same-name overwrite-equivalent)
    fs.mkdirs(dstLedger)
    listLedger(fs, dstLedger).map(_.getPath.getName)
      .filter(n => n.startsWith("migparams-") && n != migParams)
      .foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(dstLedger, n), false))
    fs.create(new org.apache.hadoop.fs.Path(dstLedger, provenance), true)
      .close()
    fs.create(new org.apache.hadoop.fs.Path(dstLedger, migParams), true)
      .close()
    val srcLedger = new org.apache.hadoop.fs.Path(s"$srcDir/_ledger")
    listLedger(stateFs(spark, srcDir), srcLedger).map(_.getPath.getName)
      .filterNot(n => EpochMarkerRe.matches(n) || HwmMarkerRe.matches(n) ||
        OwnersRe.matches(n) || CompactMarkerRe.matches(n) ||
        n.startsWith("buckets-") || n.startsWith("migsrc-") ||
        n.startsWith("migparams-"))
      .foreach(tag => fs.create(
        new org.apache.hadoop.fs.Path(dstLedger, tag), true).close())
    def live = currentStateBucketed(spark, srcDir)(sys.error(
      s"state at $srcDir is committed but every bucket is empty —" +
        " nothing to rebucket"))
    var advancedAny = false
    (0 until waves).foreach { w =>
      val waveEpoch = batchId - waves + 1 + w
      val group = (0 until newBuckets).filter(_ % waves == w).toSet
      val waveRows =
        if (waves == 1) live
        else live.filter(
          bucketExpr(keyCol, newBuckets) % lit(waves) === lit(w))
      // knownTouched = the wave's whole bucket group (a superset of
      // the rows' actual buckets, which is the contract): skips both
      // the touched-bucket probe job AND the batch persist — the rows
      // stream from the src scan straight through the bucket-
      // clustering exchange into the write, so nothing state-sized is
      // ever pinned in memory
      val adv = advanceStateBucketed(spark, dstDir, waveEpoch, waveRows,
        keyCol, newBuckets, retain, knownTouched = Some(group),
        knownNarrow = Some(false))(waveRows.limit(0))(
        _.unionByName(waveRows))
      advancedAny ||= adv
      // test seam: simulate a crash after this wave's commit and
      // before anything later (the next wave, or the hwm fence)
      crashAfterWave.filter(_ == w).foreach(_ => sys.error(
        s"simulated crash after wave $w of $waves"))
    }
    // IDEMPOTENT cutover fence: written whenever the loop completes —
    // whether this invocation advanced waves or found them all fenced.
    // A crash between the last wave's commit and this write is healed
    // by the replay's all-fenced pass reaching here and writing it.
    // Content-free marker, so create-overwrite is the right atomicity
    // (the tmp+rename path fails on an existing destination — exactly
    // the healing-replay case).
    fs.create(new org.apache.hadoop.fs.Path(dstLedger, s"hwm-$batchId"),
      true).close()
    advancedAny
  }

  /** [[currentStateBucketed]] restricted to a bucket subset — the read
    * half of bucket pruning: a caller that knows which buckets its keys
    * land in (via [[bucketOf]]) scans only those buckets' newest
    * versions, never the whole state. At 100 TB this is the difference
    * between probing a few state files and rescanning the table.
    */
  def currentStateBuckets(spark: SparkSession, stateDir: String,
      buckets: Set[Int], expectedBuckets: Option[Int] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None)(
      empty: => DataFrame): DataFrame = {
    validateProbeFanout(spark, stateDir, expectedBuckets)
    val fs = stateFs(spark, stateDir)
    val paths = bucketOwners(spark, stateDir).toSeq.sortBy(_._1)
      .collect { case (b, es) if buckets.contains(b) =>
        es.headOption.map(e => s"$stateDir/state-$e/__bucket=$b") }
      .flatten
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (paths.isEmpty) empty
    else schema match {
      // a caller that KNOWS the state schema (the join-view
      // materializer probing its own side states) skips footer
      // inference — one fewer fixed cost per probe in the hot path
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** TIME TRAVEL: the bucketed state AS OF committed epoch `asOf` —
    * per bucket, the newest version at or below `asOf` (a lake table's
    * `VERSION AS OF`, resolved from the same owners index current
    * reads use; zero extra write-path cost). Depth is bounded by the
    * writer's `retain`: with the default 2 only the previous epoch is
    * reachable; a writer that wants N-epoch history passes `retain`
    * accordingly. Pass the SAME `retain` here — it is how the reader
    * distinguishes three cases that look alike on disk:
    *
    *   - owner found, dir present → that version, read it;
    *   - owner found within the retained window but dir absent → the
    *     owner epoch wrote the bucket EMPTY (partitioned writes emit
    *     no dir for an empty slice) — contributes nothing, silently;
    *   - owner found OUTSIDE the retained window, or no owner ≤ asOf
    *     in a possibly-truncated list → the version may have been
    *     retired: FAIL LOUDLY rather than return wrong (empty) data.
    */
  def currentStateBucketedAsOf(spark: SparkSession, stateDir: String,
      asOf: Long, retain: Int = 2)(empty: => DataFrame): DataFrame = {
    require(isEpochCommitted(spark, stateDir, asOf),
      s"epoch $asOf never committed at $stateDir — as-of reads name a" +
        " committed epoch")
    resolveVersioned(spark, stateDir, retain, None,
      _ <= asOf, s"at or below epoch $asOf")(empty)
  }

  /** Shared version resolver for the historical readers ([[currentStateBucketedAsOf]],
    * [[stateBucketsBefore]]): per bucket, the newest owner satisfying
    * `pick`, with the three-way disambiguation the scaladocs above
    * describe (in-window + dir present → read; in-window + dir absent →
    * written empty; out-of-window or unprovable → fail loudly).
    */
  private def resolveVersioned(spark: SparkSession, stateDir: String,
      retain: Int, buckets: Option[Set[Int]], pick: Long => Boolean,
      describe: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)(
      empty: => DataFrame): DataFrame = {
    val fs = stateFs(spark, stateDir)
    val paths = bucketOwners(spark, stateDir).toSeq.sortBy(_._1)
      .filter { case (b, _) => buckets.forall(_.contains(b)) }
      .flatMap { case (b, es) =>
        es.find(pick) match {
          case Some(e) if es.take(retain).contains(e) =>
            val p = s"$stateDir/state-$e/__bucket=$b"
            if (fs.exists(new org.apache.hadoop.fs.Path(p))) Some(p)
            else None // owner epoch wrote this bucket empty
          case Some(e) => sys.error(
            s"bucket $b's version $describe (epoch $e) is outside the" +
              s" $retain-version retained window — the version was" +
              " retired; advance with a larger retain to keep deeper" +
              " history")
          case None if es.size >= retain => sys.error(
            s"bucket $b has no retained version $describe and its" +
              s" $retain-deep owner list may be truncated — cannot" +
              " prove the bucket was empty then; advance with a larger" +
              " retain to keep deeper history")
          case None => None // bucket provably born outside the window
        }
      }
    if (paths.isEmpty) empty
    else schema match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** The bucketed state STRICTLY BEFORE epoch `batchId`, restricted to
    * a bucket subset — the read the changelog-lookup producer needs:
    * "what did this epoch's touched buckets hold before it committed",
    * answered identically whether the epoch's own advance has already
    * committed or not (its versions carry epoch ≥ `batchId` and are
    * skipped), which is what makes a lookup-derived changelog
    * replay-stable across the torn-epoch window. Resolvable as long as
    * the pre-epoch versions sit inside the retirement grace: with the
    * default retain=2 that is exactly until the NEXT epoch commits —
    * the same window foreachBatch replays are confined to. Same
    * retired-vs-written-empty disambiguation as
    * [[currentStateBucketedAsOf]].
    */
  def stateBucketsBefore(spark: SparkSession, stateDir: String,
      batchId: Long, buckets: Set[Int], retain: Int = 2,
      expectedBuckets: Option[Int] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None)(
      empty: => DataFrame): DataFrame = {
    validateProbeFanout(spark, stateDir, expectedBuckets)
    resolveVersioned(spark, stateDir, retain, Some(buckets),
      _ < batchId, s"below epoch $batchId", schema)(empty)
  }

  /** The versioned twin of the appended-state fan-out guard: a caller
    * that computed its touched-bucket set mod N must probe a state
    * pinned N ways — a mismatch silently reads the wrong buckets
    * (for the changelog-lookup producer that means missed retractions,
    * a correctness bug, not a perf one), so it fails loudly instead.
    */
  private def validateProbeFanout(spark: SparkSession, stateDir: String,
      expected: Option[Int]): Unit =
    expected.foreach { nb =>
      pinnedBucketCount(spark, stateDir).foreach { pinned =>
        if (pinned != nb) sys.error(
          s"state at $stateDir is bucketed $pinned ways but the probe" +
            s" computed its touched buckets mod $nb — the pruned read" +
            " would probe the wrong buckets")
      }
    }

  /** APPEND-ONLY epoch-fenced state — the durable form of a standing
    * index whose per-epoch update is a disjoint DELTA (the
    * StreamingDupSpans ordered-feed shape): each epoch writes only its
    * `delta-<batchId>` directory, committed by the same ledger-marker
    * protocol as [[advanceStateBucketed]] (crash before the marker → the delta
    * is invisible and the replay overwrites it). The standing state is
    * the UNION of a compacted base (if any) plus every later committed
    * delta — a miniature LSM:
    *
    *   - [[appendDelta]]: O(delta) written per epoch, never O(history);
    *   - [[appendedState]]: base-so-far ∪ committed deltas after it;
    *   - [[compactAppended]]: folds base + deltas ≤ the newest
    *     committed epoch into one `base-<epoch>` directory (a pure
    *     rewrite — delta key sets are disjoint by construction), then
    *     retires the inputs; its own `compact-<epoch>` marker makes the
    *     fold atomic the same way epoch markers do.
    */
  def appendDelta(spark: SparkSession, stateDir: String, batchId: Long)(
      delta: => DataFrame): Boolean = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    if (epochFenced(fs, ledger, batchId)) false
    else {
      delta.write.mode(SaveMode.Overwrite)
        .parquet(s"$stateDir/delta-$batchId")
      fs.create(new org.apache.hadoop.fs.Path(
        ledger, s"epoch-$batchId"), true).close()
      true
    }
  }

  /** [[appendDelta]] with the delta HASH-PARTITIONED by key bucket —
    * the per-bucket LSM that gives the append-only protocol a
    * bucket-pruned READ path ([[appendedStateBuckets]]) while keeping
    * the O(delta) write: each epoch writes
    * `delta-<batchId>/__bucket=<b>` for only the buckets its delta
    * lands in, under the same ledger-marker commit (crash before the
    * marker → the delta is invisible; the replay overwrites it). The
    * bucket count is pinned like [[advanceStateBucketed]]'s — a key's
    * bucket is structural. Probes then read only the touched buckets'
    * slice of base + deltas instead of the whole standing index: at a
    * 100 TB index the difference between scanning a few files and
    * rescanning the index every micro-batch.
    */
  def appendDeltaBucketed(spark: SparkSession, stateDir: String,
      batchId: Long, keyCol: String, numBuckets: Int,
      clusterByBucket: Option[Boolean] = None)(
      delta: => DataFrame): Boolean = {
    require(numBuckets > 0, "numBuckets must be positive")
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    // one listing serves fence + pin, same as advanceStateBucketed
    val names = listLedger(fs, ledger).map(_.getPath.getName)
    if (fencedInNames(names, batchId)) false
    else {
      pinBucketCount(fs, ledger, names, numBuckets)
      val tagged = delta.withColumn("__bucket",
        bucketExpr(keyCol, numBuckets))
      // cluster by bucket: O(1) files per touched bucket (same trade
      // and same conf-driven lever as advanceStateBucketed)
      val clustered = if (resolveClusterByBucket(spark, clusterByBucket))
        tagged.repartition(numBuckets, col("__bucket")) else tagged
      clustered
        .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
        .parquet(s"$stateDir/delta-$batchId")
      fs.create(new org.apache.hadoop.fs.Path(
        ledger, s"epoch-$batchId"), true).close()
      true
    }
  }

  /** The bucket-pruned read of a bucketed-append state: base + every
    * committed delta, restricted to `buckets` — the probe side of the
    * per-bucket LSM. Missing `__bucket=<b>` children are buckets that
    * component never touched (partitioned writes emit no dir for an
    * empty slice) and contribute nothing. Two loud-failure guards —
    * both are silent-data-loss bugs if allowed through: a component
    * holding data files but no `__bucket=` dirs is a FLAT
    * ([[appendDelta]]-written) legacy state a pruned probe would read
    * as empty, and `expectedBuckets` (when given) is checked against
    * the ledger's pinned fan-out so a caller bucketing its probe keys
    * a different number of ways cannot silently probe the wrong
    * buckets.
    */
  def appendedStateBuckets(spark: SparkSession, stateDir: String,
      buckets: Set[Int], expectedBuckets: Option[Int] = None)(
      empty: => DataFrame): DataFrame = {
    validateProbeFanout(spark, stateDir, expectedBuckets)
    val fs = stateFs(spark, stateDir)
    val BucketDirRe = "^__bucket=(\\d+)$".r
    val paths = appendedComponentDirs(spark, stateDir).flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (!fs.exists(p)) Nil
      else {
        val names = fs.listStatus(p).toSeq.map(_.getPath.getName)
        val hits = names.collect {
          case n @ BucketDirRe(b) if buckets.contains(b.toInt) => s"$d/$n"
        }
        if (!names.exists(BucketDirRe.matches) &&
            names.exists(_.startsWith("part-"))) sys.error(
          s"appended state component $d is FLAT (part-* files, no " +
            "__bucket= dirs — written by appendDelta, not " +
            "appendDeltaBucketed); a bucket-pruned probe would miss " +
            "every standing key in it. Rebuild the state bucketed, or " +
            "read it with appendedState.")
        hits
      }
    }
    if (paths.isEmpty) empty else spark.read.parquet(paths: _*)
  }

  private val verifiedLedgerTags =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Ledger codec/layout stamp (the loud-failure twin of the bucket
    * pin): `tag` names the persisted key ENCODING the materializer
    * writes (e.g. `StateKeys.CodecTag`, the length-prefixed packKey
    * format). On a fresh state dir the stamp lands before the first
    * commit; on resume, a dir that carries committed epochs WITHOUT
    * the stamp fails loudly — it predates the stamp (the pre-round-9
    * `concat_ws` encoding, or foreign content), and advancing it would
    * silently split every group whose packed bytes changed: old keys
    * never merge with new, rollup sums go wrong, strata duplicate.
    * An operator who has verified a dir's encoding out-of-band can
    * adopt it by creating `<stateDir>/_ledger/<tag>` manually.
    * Memoized per (stateDir, tag) after the first successful check, so
    * steady epochs pay nothing.
    */
  def ensureLedgerTag(spark: SparkSession, stateDir: String,
      tag: String): Unit = {
    val memo = s"$stateDir#$tag"
    if (verifiedLedgerTags.contains(memo)) return
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    val names = listLedger(fs, ledger).map(_.getPath.getName)
    if (!names.contains(tag)) {
      val committed = names.exists(n =>
        EpochMarkerRe.matches(n) || HwmMarkerRe.matches(n) ||
          OwnersRe.matches(n) || CompactMarkerRe.matches(n))
      if (committed) sys.error(
        s"state at $stateDir carries committed epochs but no '$tag' " +
          "codec stamp — it was written by an older key encoding; " +
          "resuming would silently split every group whose packed key " +
          "bytes changed. Rebuild the state from source, or stamp " +
          s"$stateDir/_ledger/$tag manually after verifying the " +
          "encoding matches.")
      fs.mkdirs(ledger)
      fs.create(new org.apache.hadoop.fs.Path(ledger, tag), true).close()
    }
    verifiedLedgerTags.add(memo)
    ()
  }

  /** The ledger's pinned bucket fan-out, if any epoch has committed. */
  def pinnedBucketCount(spark: SparkSession, stateDir: String): Option[Int] =
    readPinnedBuckets(stateFs(spark, stateDir),
      new org.apache.hadoop.fs.Path(s"$stateDir/_ledger"))

  /** The live component dirs of an appended state, oldest first:
    * newest committed base (if any) + every committed, unretired
    * delta after it.
    */
  private def appendedComponentDirs(spark: SparkSession,
      stateDir: String): Seq[String] = {
    val fs = stateFs(spark, stateDir)
    val base = committedCompacts(spark, stateDir).sorted.lastOption
    base.map(b => s"$stateDir/base-$b").toSeq ++
      committedEpochs(spark, stateDir)
        .filter(e => base.forall(_ < e)).sorted
        .map(e => s"$stateDir/delta-$e")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
  }

  private val CompactMarkerRe = "^compact-(\\d+)$".r

  private def committedCompacts(spark: SparkSession, stateDir: String): Seq[Long] = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    if (!fs.exists(ledger)) Nil
    else fs.listStatus(ledger).toSeq.map(_.getPath.getName)
      .collect { case CompactMarkerRe(e) => e.toLong }
  }

  /** The standing appended state: newest committed base ∪ every
    * committed delta after it, or `empty` before the first commit.
    */
  def appendedState(spark: SparkSession, stateDir: String)(
      empty: => DataFrame): DataFrame = {
    val fs = stateFs(spark, stateDir)
    // a bucketed component whose epoch had an all-empty delta holds no
    // partition dirs at all (only _SUCCESS) — committed, but nothing to
    // read and no schema to infer: skip it
    val parts = appendedComponentDirs(spark, stateDir)
      .filter { d =>
        fs.listStatus(new org.apache.hadoop.fs.Path(d)).exists { s =>
          val n = s.getPath.getName
          n.startsWith("__bucket=") || n.startsWith("part-")
        }
      }
      .map(d => spark.read.parquet(d))
    if (parts.isEmpty) empty else parts.reduce(_ unionByName _)
  }

  /** TIME TRAVEL over the append-only LSM: the standing state exactly
    * as it stood when epoch `asOf` committed — the appended twin of
    * [[currentStateBucketedAsOf]], so every durable graft state
    * (replica, rollup, join view, LSH index, dup-spans gram index)
    * answers "as of epoch N" the same way. Reconstruction = newest
    * base at or below `asOf` plus every committed delta in between;
    * depth is bounded by COMPACTION, not a retain count: compaction at
    * epoch E folds all deltas ≤ E into `base-E` and retires them, so
    * an `asOf` strictly below the newest base is no longer
    * reconstructable and FAILS LOUDLY (compact less often — e.g. the
    * dup-spans materializer's `compactEvery` — to keep deeper
    * history). A committed delta whose directory is absent committed
    * empty and contributes nothing.
    */
  def appendedStateAsOf(spark: SparkSession, stateDir: String,
      asOf: Long)(empty: => DataFrame): DataFrame = {
    require(isEpochCommitted(spark, stateDir, asOf),
      s"epoch $asOf never committed at $stateDir — as-of reads name a" +
        " committed epoch")
    val newestBase = committedCompacts(spark, stateDir).maxOption
    newestBase.filter(_ > asOf).foreach(b => sys.error(
      s"appended state at $stateDir was compacted at epoch $b: every" +
        s" delta at or below $b is folded into base-$b and retired," +
        s" so the state as of epoch $asOf is no longer" +
        " reconstructable — compact less often to keep deeper as-of" +
        " history"))
    val fs = stateFs(spark, stateDir)
    val dirs = newestBase.map(b => s"$stateDir/base-$b").toSeq ++
      committedEpochs(spark, stateDir)
        .filter(e => newestBase.forall(_ < e) && e <= asOf).sorted
        .map(e => s"$stateDir/delta-$e")
    val parts = dirs
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      .filter { d =>
        fs.listStatus(new org.apache.hadoop.fs.Path(d)).exists { s =>
          val n = s.getPath.getName
          n.startsWith("__bucket=") || n.startsWith("part-")
        }
      }
      .map(d => spark.read.parquet(d))
    if (parts.isEmpty) empty else parts.reduce(_ unionByName _)
  }

  /** The as-of-reachable committed epochs of an APPENDED state: the
    * newest base (if any) and every committed delta after it — exactly
    * the epochs [[appendedStateAsOf]] can reconstruct. Operational
    * introspection (surfaced by `graft.StateReport`).
    */
  def appendedAsOfEpochs(spark: SparkSession, stateDir: String): Seq[Long] = {
    val base = committedCompacts(spark, stateDir).maxOption
    (base.toSeq ++ committedEpochs(spark, stateDir)
      .filter(e => base.forall(_ < e))).sorted
  }

  /** The distinct owner epochs of a VERSIONED state's retained bucket
    * versions — the candidate as-of points [[currentStateBucketedAsOf]]
    * resolves from (per-bucket retention still applies at read time).
    * Operational introspection (surfaced by `graft.StateReport`).
    */
  def versionedOwnerEpochs(spark: SparkSession,
      stateDir: String): Seq[Long] =
    bucketOwners(spark, stateDir).values.flatten.toSeq.distinct.sorted

  /** Fold the current base + committed deltas into one `base-<epoch>`
    * directory and retire the inputs. Returns the new base epoch, or
    * None when there is nothing to compact.
    */
  def compactAppended(spark: SparkSession, stateDir: String)(
      empty: => DataFrame): Option[Long] = {
    val fs = stateFs(spark, stateDir)
    val ledger = new org.apache.hadoop.fs.Path(s"$stateDir/_ledger")
    val upTo = committedEpochs(spark, stateDir).sorted.lastOption
    upTo.filter(e => !committedCompacts(spark, stateDir).contains(e)).map { e =>
      val folded = appendedState(spark, stateDir)(empty)
      // a per-bucket LSM ([[appendDeltaBucketed]]) folds to a bucketed
      // base, so compaction preserves the pruned-read layout
      val w = folded.write.mode(SaveMode.Overwrite)
      (if (folded.columns.contains("__bucket"))
        w.partitionBy("__bucket") else w).parquet(s"$stateDir/base-$e")
      fs.create(new org.apache.hadoop.fs.Path(
        ledger, s"compact-$e"), true).close()
      // retirement only AFTER the compact marker — a crash mid-delete
      // leaves both the base and some inputs, and the reader prefers
      // the base while skipping retired delta dirs. EVERY other base
      // dir goes, committed or not: an unmarked base is an orphan of a
      // crashed compaction (invisible to readers by construction), and
      // leaving it would leak disk forever.
      val BaseRe = "^base-(\\d+)$".r
      fs.listStatus(new org.apache.hadoop.fs.Path(stateDir)).toSeq
        .map(_.getPath.getName).foreach {
          case n @ BaseRe(b) if b.toLong != e =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/$n"), true)
          case _ => ()
        }
      committedEpochs(spark, stateDir).filter(_ <= e).foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/delta-$d"), true))
      // retired compact markers + folded epoch markers: everything at or
      // below the new base is subsumed by it, so the ledger listing —
      // read several times per epoch — stays O(live deltas), not
      // O(total epochs ever)
      committedCompacts(spark, stateDir).filter(_ < e).foreach(b =>
        fs.delete(new org.apache.hadoop.fs.Path(
          ledger, s"compact-$b"), false))
      foldLedger(fs, ledger, e)
      e
    }
  }

  /** writeStream.foreachBatch body with fencing: idempotent parquet
    * append target (each epoch writes its own subdirectory, so a
    * replayed epoch is a no-op and a torn write is overwritten on
    * replay — rename-based atomicity).
    */
  def foreachBatchExactlyOnce(targetDir: String, ledgerPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    writeFenced(spark, ledgerPath, batchId) { () =>
      batch.write.mode("overwrite").parquet(s"$targetDir/epoch=$batchId")
    }
  }

  /** Strategy 3: writeStream.foreachBatch body sending `key`/`value`
    * string columns through per-partition transactional producers,
    * fenced per (epoch, partition) — NOT per whole epoch. Kafka
    * transactions are per-producer, so atomicity is per partition; if
    * the ledger only fenced whole epochs, an epoch where partition A
    * committed but partition B crashed would replay BOTH, re-sending A's
    * records as visible duplicates to `read_committed` consumers (the
    * same hole a stage retry after one task's commit opens). So each
    * partition task writes its own `epoch-N.part-P` marker right after
    * its commit, and a replayed / retried task that finds its marker
    * skips without producing. Once every partition holds a marker the
    * driver seals the epoch with the `epoch-N` marker (the fast-path
    * fence for whole-epoch replays) and the part markers are garbage.
    *
    * The commit-vs-marker window: a crash BETWEEN a partition's
    * `commitTransaction()` and its marker write leaves committed
    * records with no marker. A naive replay would re-send them. When
    * the factory supplies a [[RecoverableTxnProducer]] (epoch-scoped
    * `transactional.id` per (batchId, partition) — the factory gets
    * the batchId for exactly this reason; see the trait scaladoc), the
    * replaying task first probes the broker through
    * `resumeAndCommit()`: a prior committed transaction of THIS epoch
    * means the records are already visible, so the task only writes
    * its missing marker and skips the send — Flink's
    * recover-and-re-commit shape with per-checkpoint id rotation.
    * Remaining broker-only residue, stated explicitly: Kafka forgets a
    * transactional.id's state after `transactional.id.expiration.ms`
    * (default 7 days); a replay arriving later than that cannot
    * distinguish committed-then-crashed from never-ran and will
    * re-send. That bound is the broker's, not this operator's.
    */
  def foreachBatchTransactional(ledgerPath: String,
      producerFactory: Long => TxnProducer)(
      batch: DataFrame, batchId: Long): Unit =
    runFenced(
      batch.select(col("key").cast("string"), col("value").cast("string")),
      ledgerPath, batchId, producerFactory)(
      (p, r) => p.send(r.getString(0), r.getString(1)))

  /** [[foreachBatchTransactional]] over the full Kafka writer shape
    * (`key` binary, `value` binary, `topic` string, optional
    * `partition` int — exactly what [[KafkaProjection.project]] emits):
    * each row goes through [[TxnProducer.sendRecord]] so a broker-bound
    * producer sees the real ProducerRecord fields, byte-for-byte. Same
    * per-(epoch, partition) fencing and recovery probe.
    */
  def foreachBatchTransactionalKafka(ledgerPath: String,
      producerFactory: Long => TxnProducer)(
      batch: DataFrame, batchId: Long): Unit = {
    val hasPartition = batch.columns.contains("partition")
    val projected =
      if (hasPartition)
        batch.select(col("topic"), col("partition").cast("int"),
          col("key").cast("binary"), col("value").cast("binary"))
      else
        batch.select(col("topic"), lit(-1).as("partition"),
          col("key").cast("binary"), col("value").cast("binary"))
    runFenced(projected, ledgerPath, batchId, producerFactory)((p, r) =>
      p.sendRecord(r.getString(0), r.getInt(1),
        r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3)))
  }

  private def runFenced(projected: DataFrame, ledgerPath: String,
      batchId: Long, producerFactory: Long => TxnProducer)(
      sendRow: (TxnProducer, org.apache.spark.sql.Row) => Unit): Unit = {
    val spark = projected.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(ledgerPath),
      spark.sparkContext.hadoopConfiguration)
    val epochMarker = new org.apache.hadoop.fs.Path(s"$ledgerPath/epoch-$batchId")
    if (fs.exists(epochMarker)) return // whole epoch already sealed
    projected
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pfs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(ledgerPath),
          new org.apache.hadoop.conf.Configuration())
        val pMarker = new org.apache.hadoop.fs.Path(
          s"$ledgerPath/epoch-$batchId.part-$pid")
        if (!pfs.exists(pMarker)) {
          val p = producerFactory(batchId)
          try {
            // recovery probe first: a missing marker does NOT mean the
            // records were not produced — the previous attempt may have
            // crashed between its commit and its marker write
            val priorCommitted = p match {
              case r: RecoverableTxnProducer => r.resumeAndCommit()
              case _ => false
            }
            if (!priorCommitted) {
              p.beginTransaction()
              try {
                rows.foreach(r => sendRow(p, r))
                p.commitTransaction()
              } catch {
                case e: Throwable => p.abortTransaction(); throw e
              }
            }
          } finally p.close()
          pfs.create(pMarker, true).close() // partition commit marker
        }
      }
    // foreachPartition returned ⇒ every partition committed (or was
    // already fenced): seal the epoch
    fs.create(epochMarker, true).close()
  }
}
