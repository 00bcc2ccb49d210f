package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACTLY-ONCE ingest for the incremental curation loops.
  *
  * Spark's `foreachBatch` is at-least-once by contract: after a crash,
  * the last batch whose offsets were logged but whose epoch was never
  * committed REPLAYS with the identical input file set. The batch
  * incremental operators ([[TextDedupOps.dedupIncremental]] /
  * [[TextDedupOps.lshIncrementalIndexed]]) are pure, but the SINK
  * side of an ingest loop — append survivors to the corpus, append
  * their signatures to the persisted index — is not idempotent as
  * plain parquet appends: a replay double-appends the survivors
  * (duplicate corpus rows) and their signatures (duplicate band rows
  * that inflate `maxBucketSize` bucket counts and can silently
  * suppress real candidates near the cap). Worse, the replayed
  * survivor COMPUTATION consults an index that already contains the
  * crashed attempt's rows, so every replayed doc near-dup-matches its
  * own half-committed copy and the batch's survivors vanish — losing
  * data, the exact failure a 100 TB nightly ingest cannot have.
  *
  * This module closes the loop with a COMMIT LOG (the lakehouse
  * write-audit-publish pattern, re-expressed minimally):
  *
  *   - `<log>/`: filename-encoded markers — one empty
  *     `begin-<batchId>` / `commit-<batchId>` file per event, created
  *     atomically; the committed HIGH-WATER-MARK is the max commit
  *     marker. foreachBatch ids are strictly increasing and
  *     sequential, so a single hwm (not a set) captures the committed
  *     prefix. Reading the log is one directory listing and writing a
  *     marker one FS create — the protocol adds NO Spark jobs to a
  *     micro-batch.
  *   - A replayed batch with id ≤ hwm SKIPS entirely — the whole
  *     batch effect is already durable.
  *   - Corpus writes go to `corpusDir/ingest_id=<batch>` partition
  *     directories with OVERWRITE semantics — a replay self-cleans
  *     any partial files. Readers ([[committedCorpus]]) filter
  *     `ingest_id <= hwm`, a pure partition prune, so uncommitted
  *     data is never read even while it sits on disk.
  *   - Index appends are STAMPED with `ingest_id` (see
  *     [[TextDedupOps.appendSigsToIndex]]); committed readers filter
  *     by the hwm, and a replay whose previous attempt died
  *     mid-append subtracts the already-visible stamped rows
  *     (`exceptAll` — sound because the replayed computation is
  *     deterministic) before appending the remainder.
  *   - The `begin` marker is the write-ahead half: it is appended
  *     BEFORE any index write, so a replay knows whether the
  *     recovery subtraction is needed at all (absent begin ⇒ plain
  *     append, no extra scan on the happy path).
  *
  * With the log in place, intra-batch WRITE ORDER no longer carries
  * correctness weight (uncommitted rows are invisible regardless of
  * which write crashed), and maintenance (vacuum/compaction) refuses
  * to run over an in-flight batch — see
  * `TextDedupOps.requireNoInFlightIngest`.
  *
  * SINGLE-WRITER CONTRACT (r18 verdict task #4): one store (one commit
  * log) takes ONE ingest writer — a single streaming query whose
  * foreachBatch ids are strictly increasing and sequential (Spark's
  * own contract for one checkpoint). Backfills run through the same
  * query, or between streams with batch ids that CONTINUE the
  * sequence — never a second concurrent query. The entry protocol
  * enforces everything the log can observe:
  *   - `batchId == hwm` skips (the benign redelivery: a crash between
  *     this module's commit marker and Spark's own epoch commit
  *     re-offers exactly the last committed batch);
  *   - `batchId < hwm` REJECTS loudly — batch ids regressed, the
  *     signature of a stream restarted with a FRESH checkpoint (ids
  *     reset to 0); a silent skip would drop that stream's new data;
  *   - a begun-but-uncommitted marker for a DIFFERENT id REJECTS —
  *     the only in-flight id an entry may see is its own crashed
  *     attempt; anything else is a skipped-ahead batch or a second
  *     writer, whose partial stamped rows this batch's commit would
  *     otherwise promote to committed (the ADVICE-flagged hazard);
  *   - two writers racing the SAME fresh batch id inside one listing
  *     window are caught by the begin marker's atomic
  *     create-if-absent: the loser's create finds the winner's file
  *     and REJECTS before any write (on object stores without atomic
  *     create-if-absent, front the log with a consistent store — the
  *     same caveat the log carries generally).
  * A replayed RECOVERY of an in-flight id cannot distinguish its own
  * crashed begin from a live twin's — recovery remains single-writer
  * by contract.
  *
  * MAINTENANCE LEASE (r18 verdict task #2): vacuum/compaction REWRITE
  * the index (folding stamps into the unstamped base), so an ingest
  * append racing the rewrite would land in the old directory and be
  * silently dropped by the swap. Maintenance therefore runs under a
  * `maint-<stamp>` lease marker in the log dir
  * ([[withMaintenanceLease]]): each side writes its INTENT first and
  * checks the other's second — maintenance creates the lease, then
  * checks for in-flight begins; ingest creates its begin, then checks
  * for leases (retracting the begin if it backs off) — so at most one
  * side can proceed, on any filesystem with read-after-write listing
  * visibility. A lease left by a maintainer that died mid-rewrite
  * blocks ingest until the SAME maintenance op is re-run (idempotent:
  * IndexSwap recovery + rewrite complete the job and release), or
  * [[breakMaintenanceLease]] clears it manually.
  *
  * DELETES vs RECOVERY: tombstone deletes (the index tier's
  * deleteFrom*) are legal at ANY point, including between a crashed
  * ingest attempt and its replay — soundness rests on monotonicity:
  * a delete only REMOVES matches, so the replay's survivor set is
  * always a SUPERSET of the crashed attempt's, and the exceptAll
  * recovery subtraction (visible stamped rows ⊆ recomputed
  * survivors) never strands a stale row. Appends cannot shrink the
  * view mid-batch because the single-writer contract serializes
  * them. IngestCommitSpec pins the delete-between-crash-and-replay
  * interleaving.
  *
  * CORPUS TAKEDOWN (r19): [[deleteFromCorpus]] tombstones document
  * ids out of every committed read (and out of the exact-dedup
  * matching view — a taken-down doc surrenders its claim on the
  * content); [[vacuumCorpus]] folds the tombstones physically by
  * rewriting ONLY the affected `ingest_id` partitions under the
  * maintenance lease — the compliance delete path, O(affected
  * batches) not O(corpus).
  *
  * Scale: per batch the log costs ONE directory listing (≤ 2 marker
  * files per batch between compactions;
  * [[TextDedupOps.compactLshIndex]] folds the history to a single
  * marker) and 1-2 atomic file creates — no Spark jobs. Recovery —
  * the rare path — costs one stamped-row scan bounded by parquet
  * row-group stats to roughly the crashed batch's own files.
  *
  * Reference semantics: the reference engine's eager single-process
  * loops get exactly-once trivially (one process, one store); this is
  * the distributed re-expression a restartable 100 TB pipeline needs.
  */
object IngestCommit {

  // The log is FILENAME-ENCODED: one empty marker file per event,
  // `begin-<batchId>` / `commit-<batchId>`. The name IS the record,
  // so reading the log is ONE directory listing (no Spark job, no
  // parquet — the first cut stored parquet rows and paid 2-3 driver
  // jobs per micro-batch, measurable on the ingest witnesses), and
  // writing a marker is one atomic create. Compaction is plain file
  // deletes (keep the max commit marker) — every intermediate state
  // of a crashed compaction parses to the same (hwm, in-flight). On
  // object stores without atomic create-if-absent, front the log dir
  // with a consistent store — the same caveat IndexSwap documents.
  private val MarkerRe = "(begin|commit)-([0-9]+)".r

  private def fsOf(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Maintenance-lease marker prefix — `maint-<nanotime stamp>`.
    * Deliberately OUTSIDE MarkerRe: lease files are invisible to the
    * hwm/in-flight parse and survive [[compactLog]]. */
  private val LeasePrefix = "maint-"

  /** (committed high-water-mark, begun-but-uncommitted batch ids,
    * live maintenance leases). (-1, ∅, ∅) for a missing or empty
    * log. One FS listing. */
  private def logStateFull(spark: SparkSession,
      logDir: String): (Long, Set[Long], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return (-1L, Set.empty, Nil)
    val names = fs.listStatus(p).map(_.getPath.getName)
    val committed = names.collect { case MarkerRe("commit", id) => id.toLong }
    val begun = names.collect { case MarkerRe("begin", id) => id.toLong }
    val leases = names.filter(_.startsWith(LeasePrefix)).toSeq.sorted
    (if (committed.isEmpty) -1L else committed.max,
      begun.toSet -- committed.toSet, leases)
  }

  /** (committed high-water-mark, begun-but-uncommitted batch ids).
    * (-1, ∅) for a missing or empty log. One FS listing. */
  private[graft] def logState(spark: SparkSession,
      logDir: String): (Long, Set[Long]) = {
    val (hwm, inFlight, _) = logStateFull(spark, logDir)
    (hwm, inFlight)
  }

  /** None when no log directory exists (a legacy, non-exactly-once
    * store — readers then take the raw view); Some(hwm) otherwise,
    * where hwm = -1 means "log present, nothing committed yet". */
  def committedHwm(spark: SparkSession,
      logDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    if (!fsOf(spark, p).exists(p)) None
    else Some(logState(spark, logDir)._1)
  }

  /** Create one marker file. `strict` turns the atomic
    * create-if-absent into a DETECTOR: a fresh (non-recover) begin
    * whose file already exists means another writer's begin for the
    * same id landed between this entry's log read and now — the one
    * same-id race a listing alone cannot see — so it throws instead
    * of proceeding to writes the other writer's commit would promote.
    * Non-strict creates (commit markers, replayed begins) stay
    * tolerant: a crash straight after a successful create legally
    * re-runs into its own marker. */
  private[graft] def appendLog(spark: SparkSession, logDir: String,
      batchId: Long, kind: String, strict: Boolean = false): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$logDir/$kind-$batchId")
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    try fs.create(p, false).close() // atomic create-if-absent
    catch {
      case e: Exception if (e.isInstanceOf[
            org.apache.hadoop.fs.FileAlreadyExistsException] ||
          e.isInstanceOf[java.io.IOException]) && fs.exists(p) =>
        if (strict) throw new IllegalStateException(
          s"concurrent ingest writer detected: $kind-$batchId at " +
            s"$logDir appeared after this entry's log read — two " +
            "writers are racing one store (single-writer contract); " +
            "stop one stream and replay", e)
    }
  }

  /** Shared entry protocol for every ingest*Batch wrapper (the
    * single-writer contract in the header, made enforceable): parse
    * the log ONCE, then skip/reject/proceed. Returns None when the
    * batch must SKIP (it is exactly the committed hwm — the benign
    * Spark-epoch redelivery), Some(recover) otherwise, where recover
    * means this id's previous attempt died begun-but-uncommitted.
    * With `writeAhead` the begin marker is created here, and the
    * maintenance-lease check runs AFTER it is durable (intent first,
    * check second — see the header; the begin is retracted before a
    * back-off reject so it leaves no stuck in-flight id). */
  private def beginIngest(spark: SparkSession, logDir: String,
      batchId: Long, op: String, writeAhead: Boolean): Option[Boolean] = {
    val (hwm, inFlight, leases) = logStateFull(spark, logDir)
    if (batchId == hwm) return None
    require(batchId > hwm,
      s"$op: batch id $batchId regressed below the committed " +
        s"high-water-mark $hwm at $logDir — the signature of a stream " +
        "restarted with a FRESH checkpoint (foreachBatch ids reset to " +
        "0), whose batches a silent skip would DROP; resume the " +
        "original checkpoint, or point the new stream at a new " +
        "store/log")
    require(inFlight.forall(_ == batchId),
      s"$op: in-flight (begun, uncommitted) ingest batch(es) " +
        s"${(inFlight - batchId).toSeq.sorted.mkString(", ")} at " +
        s"$logDir while entering batch $batchId — one store takes ONE " +
        "sequential writer (single-writer contract); replay the " +
        "in-flight batch to completion before this one")
    val recover = inFlight.contains(batchId)
    def leaseReject(live: Seq[String]): Unit =
      require(live.isEmpty,
        s"$op: maintenance lease(s) ${live.mkString(", ")} live at " +
          s"$logDir — a vacuum/compaction is mid-rewrite (or died " +
          "there); re-run that maintenance op to completion (it " +
          "recovers and releases), or clear a stale lease with " +
          "IngestCommit.breakMaintenanceLease, then replay this batch")
    if (recover || !writeAhead) leaseReject(leases)
    else {
      appendLog(spark, logDir, batchId, "begin", strict = true)
      val leasesNow = logStateFull(spark, logDir)._3
      if (leasesNow.nonEmpty) {
        // retract: nothing is written yet, so backing off must not
        // leave an in-flight id that would block the maintenance
        val p = new org.apache.hadoop.fs.Path(s"$logDir/begin-$batchId")
        fsOf(spark, p).delete(p, false)
        leaseReject(leasesNow)
      }
    }
    Some(recover)
  }

  /** Run `body` (a vacuum/compaction rewrite) under a maintenance
    * lease on `logDir` — the mutual-exclusion half the entry-time
    * in-flight guard alone cannot give (an ingest batch beginning
    * after the guard passed but before the swap renamed would have
    * its append silently dropped with the old directory). Acquiring
    * TAKES OVER any lease already on disk (the stale-lease rule:
    * maintenance is idempotent — IndexSwap recovery plus a re-run
    * complete any crashed rewrite — so re-running the SAME op IS the
    * takeover; concurrent maintainers are out of contract exactly as
    * concurrent ingest writers are). The lease is released on any
    * normal exit including a guard reject (live layouts only mutate
    * via atomic swap-ins, so a mid-body failure leaves a servable
    * index); process death keeps it on disk, blocking ingest until
    * the op is re-run or [[breakMaintenanceLease]] clears it. */
  private[graft] def withMaintenanceLease[T](spark: SparkSession,
      logDir: String, op: String)(body: => T): T = {
    val dirP = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, dirP)
    fs.mkdirs(dirP)
    val stale = fs.listStatus(dirP).map(_.getPath.getName)
      .filter(_.startsWith(LeasePrefix))
    val token = s"$LeasePrefix${System.nanoTime()}"
    val tokenP = new org.apache.hadoop.fs.Path(s"$logDir/$token")
    try fs.create(tokenP, false).close()
    catch { case _: java.io.IOException if fs.exists(tokenP) => () }
    stale.filter(_ != token).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$logDir/$n"), false); ()
    }
    try body
    finally { fs.delete(tokenP, false); () }
  }

  /** Fold a fully-committed ingest log to its single max commit
    * marker — the PUBLIC entry for stores with no index-maintenance
    * op to do it for them (the exact-dedup corpus log at
    * `corpusDir/_commits`, the SimHash hashes log at
    * `hashesDir/_commits`; the LSH and IVF-PQ logs fold inside
    * compactLshIndex / compactIvfPqIndex): a long-lived nightly
    * otherwise accumulates 1-2 marker files per batch and pays an
    * ever-growing directory listing on every hwm read. Refuses over
    * an in-flight (begun, uncommitted) batch; otherwise idempotent
    * and safe to run between batches — markers created AFTER its
    * listing are never touched, and every intermediate state of a
    * crashed fold parses to the same (hwm, in-flight). */
  def compactIngestLog(spark: SparkSession, logDir: String): Unit =
    compactLog(spark, logDir)

  /** Clear maintenance lease(s) left by a maintainer that died
    * mid-rewrite — the MANUAL stale-lease override. Prefer re-running
    * the maintenance op itself: it recovers the layout AND releases
    * the lease; break only when that is not an option (the index may
    * then still need IndexSwap recovery, which the next maintenance
    * entry performs). */
  def breakMaintenanceLease(spark: SparkSession, logDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(LeasePrefix))
      .foreach { n =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$logDir/$n"), false); ()
      }
  }

  /** Collapse a fully-committed log to its max commit marker — called
    * from [[TextDedupOps.compactLshIndex]] under its no-in-flight
    * guard. Idempotent: a crash mid-delete leaves extra markers whose
    * parse is unchanged (hwm = max commit). */
  private[llm] def compactLog(spark: SparkSession,
      logDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    val (hwm, inFlight) = logState(spark, logDir)
    require(inFlight.isEmpty,
      s"compactLog: in-flight ingest batch(es) at $logDir: " +
        inFlight.toSeq.sorted.mkString(", "))
    if (hwm < 0) return
    val keep = s"commit-$hwm"
    // delete ONLY recognized marker files: a foreign name in the log
    // dir (a stray _SUCCESS, a live maintenance lease, future protocol
    // metadata) is not this fold's to destroy
    fs.listStatus(p).foreach { st =>
      st.getPath.getName match {
        case n @ MarkerRe(_, _) if n != keep => fs.delete(st.getPath, false)
        case _ => ()
      }
      ()
    }
  }

  /** The COMMITTED corpus view: partition directories with
    * `ingest_id` at or below the high-water-mark, stamp dropped — a
    * pure partition prune, so a crashed batch's partial directory is
    * never even listed into the scan. `logDir` is the pipeline's
    * commit log ([[exactDedupIngestBatch]] keeps it at
    * `corpusDir/_commits`; [[nearDupIngestBatch]] at
    * `indexDir/commits`, one log per pipeline). */
  def committedCorpus(spark: SparkSession, corpusDir: String,
      logDir: String): DataFrame = {
    val hwm = committedHwm(spark, logDir).getOrElse(-1L)
    require(hwm >= 0,
      s"committedCorpus: no committed ingest batch recorded at $logDir")
    val base = spark.read.option("basePath", corpusDir).parquet(corpusDir)
      .filter(col("ingest_id") <= hwm).drop("ingest_id")
    minusCorpusTombstones(spark, corpusDir, base)
  }

  /** The committed corpus AS OF an earlier batch — the snapshot read
    * a reproducible training run pins ("train on the corpus exactly
    * as batch N left it"). Same pure partition prune as
    * [[committedCorpus]], at `asOfBatch` instead of the hwm; rejects
    * an id above the committed high-water-mark (uncommitted data
    * never serves, snapshot or not). Takedown tombstones STILL apply
    * — a compliance delete removes the document from every read, and
    * no snapshot may resurrect it. Snapshots survive [[vacuumCorpus]]
    * because the fold rewrites each `ingest_id` partition in place,
    * never merging batch boundaries. */
  def committedCorpusAsOf(spark: SparkSession, corpusDir: String,
      logDir: String, asOfBatch: Long): DataFrame = {
    val hwm = committedHwm(spark, logDir).getOrElse(-1L)
    require(hwm >= 0,
      s"committedCorpusAsOf: no committed ingest batch recorded at " +
        logDir)
    require(asOfBatch <= hwm,
      s"committedCorpusAsOf: as-of batch $asOfBatch is above the " +
        s"committed high-water-mark $hwm at $logDir — uncommitted " +
        "data never serves")
    val base = spark.read.option("basePath", corpusDir).parquet(corpusDir)
      .filter(col("ingest_id") <= asOfBatch).drop("ingest_id")
    minusCorpusTombstones(spark, corpusDir, base)
  }

  // ----- Corpus TAKEDOWN tier (r19) ---------------------------------
  // The matching indexes have had tombstone deletes since r16; the
  // ingested CORPUS itself had none — yet at 100 TB the most common
  // delete is not curation but COMPLIANCE: "remove these documents
  // from the training corpus" (takedown, opt-out, license recall),
  // which must not cost a corpus-sized rewrite. Same design as the
  // index tier: ids append to `corpusDir/_tombstones` (metadata-sized;
  // the underscore keeps Spark's listing from reading it as data),
  // every committed read anti-joins them out immediately, and
  // [[vacuumCorpus]] folds them physically — rewriting ONLY the
  // partitions that hold tombstoned rows, so the physical cost is
  // O(affected batches), not O(corpus).
  //
  // Matching semantics: a takedown removes the DOCUMENT, not its
  // claim on the content — [[exactDedupIngestBatch]] computes
  // survivorship against the tombstone-filtered view, so a later copy
  // of a deleted text is admitted again (the same rule the LSH /
  // SimHash index deletes follow). For near-dup pipelines the corpus
  // and the index are deleted separately ([[deleteFromCorpus]] +
  // TextDedupOps.deleteFromLshIndex / SimilarityOps
  // .deleteFromIvfPqIndex) — export and matching are different
  // lifecycles, and a caller may legitimately stop serving a doc
  // while keeping its near-dup shadow, or vice versa.

  /** Mark `ids` DELETED in an ingested corpus. Takes effect on the
    * next [[committedCorpus]] read (and on the next batch's
    * exact-dedup matching). Deleting an absent id is a harmless
    * no-op. The tombstone file is self-describing: its single column
    * name must be the corpus' id column. */
  def deleteFromCorpus(ids: DataFrame, corpusDir: String,
      idCol: String = "doc_id"): Unit =
    ids.select(col(idCol).cast("long").as(idCol)).distinct()
      .coalesce(1) // deletes are metadata-sized next to the corpus
      .write.mode("append").parquet(s"$corpusDir/_tombstones")

  private def corpusTombstones(spark: SparkSession,
      corpusDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/_tombstones")
    if (fsOf(spark, p).exists(p))
      Some(spark.read.parquet(p.toString))
    else None
  }

  /** Anti-join pending corpus tombstones out of `df` (no tombstones →
    * `df` unchanged, plan byte-identical to the pre-takedown read). */
  private def minusCorpusTombstones(spark: SparkSession,
      corpusDir: String, df: DataFrame): DataFrame =
    corpusTombstones(spark, corpusDir).fold(df) { t =>
      val idc = t.columns.head
      require(df.columns.contains(idc),
        s"corpus tombstones at $corpusDir/_tombstones key on '$idc' " +
          s"but the corpus columns are ${df.columns.mkString(", ")} — " +
          "deleteFromCorpus must use the corpus' id column")
      df.join(broadcast(t.select(col(idc).cast("long").as("__tomb_id"))
          .distinct()),
        df(idc).cast("long") === col("__tomb_id"), "left_anti")
    }

  /** Fold accumulated corpus tombstones into a PHYSICAL rewrite of
    * exactly the `ingest_id=<n>` partitions that hold tombstoned rows
    * — O(affected batches), never O(corpus). Each partition swaps
    * through [[IndexSwap]] (renames only, recovered on entry), and
    * the tombstone file clears LAST, so a crash at ANY point re-runs
    * to completion with the logical view ([[committedCorpus]])
    * unchanged throughout. Runs under the maintenance lease on
    * `logDir` — the pipeline's commit log (`corpusDir/_commits` for
    * the exact-dedup loop, the default; `indexDir/commits` etc. for
    * the index pipelines), so the wrapper's ingest is excluded for
    * the whole rewrite — and refuses over an in-flight batch. Same
    * object-store rename caveat as every IndexSwap user.
    *
    * `failpoint` is a test hook ("after-partition" per swapped
    * partition, "before-tombstone-clear"); production callers leave
    * the default no-op. */
  def vacuumCorpus(spark: SparkSession, corpusDir: String,
      logDir: String = "",
      failpoint: String => Unit = NoFailpoint): Unit = {
    val log = if (logDir.isEmpty) s"$corpusDir/_commits" else logDir
    withMaintenanceLease(spark, log, "vacuumCorpus") {
      val conf = spark.sparkContext.hadoopConfiguration
      recoverCorpusSwaps(spark, corpusDir)
      val (_, inFlight) = logState(spark, log)
      require(inFlight.isEmpty,
        s"vacuumCorpus: corpus at $corpusDir has in-flight (begun, " +
          s"uncommitted) ingest batch(es) " +
          s"${inFlight.toSeq.sorted.mkString(", ")} in $log — finish " +
          "or replay the ingest before maintenance")
      corpusTombstones(spark, corpusDir).foreach { tombRaw =>
        val idc = tombRaw.columns.head
        val tomb = tombRaw.select(col(idc).cast("long").as("__tomb_id"))
          .distinct()
        val base = spark.read.option("basePath", corpusDir)
          .parquet(corpusDir)
        require(base.columns.contains(idc),
          s"corpus tombstones at $corpusDir/_tombstones key on " +
            s"'$idc' but the corpus columns are " +
            base.columns.mkString(", "))
        // the partitions that actually hold tombstoned rows — bounded
        // by the batch count; the semi-join rides the slim id column
        val affected = base
          .join(broadcast(tomb),
            base(idc).cast("long") === col("__tomb_id"), "left_semi")
          .select(col("ingest_id").cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted
        affected.foreach { pid =>
          val sub = s"ingest_id=$pid"
          IndexSwap.swapIn(conf, corpusDir, sub) { tmp =>
            val part = spark.read.parquet(s"$corpusDir/$sub")
            part.join(broadcast(tomb),
                part(idc).cast("long") === col("__tomb_id"), "left_anti")
              .write.parquet(tmp)
          }
          failpoint("after-partition")
        }
      }
      failpoint("before-tombstone-clear")
      val tombP = new org.apache.hadoop.fs.Path(s"$corpusDir/_tombstones")
      fsOf(spark, tombP).delete(tombP, true) // LAST — a re-run of any
                                             // crashed state completes
      ()
    }
  }

  /** Finish partition swaps a previous [[vacuumCorpus]] crashed in —
    * one [[IndexSwap.recover]] per partition with a leftover
    * `.ingest_id=<n>.compact` / `.trash` directory. */
  private def recoverCorpusSwaps(spark: SparkSession,
      corpusDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    val SwapRe = """^\.(ingest_id=[^/.]+)\.(compact|trash)$""".r
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(p).map(_.getPath.getName)
      .collect { case SwapRe(sub, _) => sub }.distinct
      .foreach(sub => IndexSwap.recover(conf, corpusDir, sub))
  }

  /** Exactly-once EXACT-dedup ingest of one foreachBatch micro-batch:
    * dedup `batch` within itself and against the committed corpus
    * ([[TextDedupOps.dedupIncremental]]), publish the survivors as
    * `corpusDir/ingest_id=<batchId>`, then commit. Returns false —
    * without touching storage — when the batch is exactly the
    * committed hwm (the replay-skip); an id BELOW the hwm or a
    * foreign in-flight id rejects loudly per the single-writer
    * contract. No begin marker is needed: the only write is
    * the self-cleaning partition overwrite, so every crash point
    * replays to the identical end state. The log lives at
    * `corpusDir/_commits` (the underscore keeps Spark's file listing
    * from reading it as corpus data). */
  def exactDedupIngestBatch(batch: DataFrame, batchId: Long,
      corpusDir: String, idCol: String = "doc_id",
      textCol: String = "text",
      failpoint: String => Unit = _ => ()): Boolean = {
    val spark = batch.sparkSession
    val logDir = s"$corpusDir/_commits"
    if (beginIngest(spark, logDir, batchId, "exactDedupIngestBatch",
        writeAhead = false).isEmpty) return false
    val hwm = committedHwm(spark, logDir).getOrElse(-1L)
    // matching runs against the tombstone-FILTERED committed view: a
    // taken-down document surrenders its claim on the content, so a
    // later copy of its text is admitted again (the index-delete rule)
    val existing =
      if (hwm >= 0)
        minusCorpusTombstones(spark, corpusDir,
          spark.read.option("basePath", corpusDir).parquet(corpusDir)
            .filter(col("ingest_id") <= hwm))
          .select(col(textCol))
      else batch.select(col(textCol)).limit(0)
    TextDedupOps.dedupIncremental(batch, existing, idCol, textCol)
      .write.mode("overwrite").parquet(s"$corpusDir/ingest_id=$batchId")
    failpoint("after-corpus")
    appendLog(spark, logDir, batchId, "commit")
    true
  }

  /** Exactly-once NEAR-DUP ingest of one foreachBatch micro-batch
    * against a persisted LSH index: survivors are computed against the
    * COMMITTED index view, published to `corpusDir/ingest_id=<batch>`,
    * their signatures appended to the index stamped with the batch id,
    * and the batch committed — in that order, though under the log the
    * order is a convention, not a correctness dependency. Returns
    * false (no storage writes) for an already-committed batch.
    *
    * Driver-cost shape (the r17 witness measured ~10 actions per
    * micro-batch): here the banded join + component rounds run ONCE —
    * the slim survivor-ID set is checkpointed and the corpus write,
    * bands append, and sigs append all derive from checkpointed
    * inputs — and `kKnown` skips the per-append signature-length
    * probe job.
    *
    * `failpoint` is a test hook invoked at the named crash points
    * ("after-survivors", "after-corpus", "after-index"); production
    * callers leave the default no-op. */
  /** The default no-op failpoint. Reference-compared in
    * [[nearDupIngestBatch]] / [[simHashIngestBatch]]: with it, the
    * corpus publish and the index append run CONCURRENTLY
    * (independent outputs, both invisible until the commit marker —
    * crash order carries no correctness weight under the log); any
    * custom failpoint forces the sequential corpus→index order so
    * kill specs can target the exact inter-write states. */
  val NoFailpoint: String => Unit = _ => ()

  /** Exactly-once SIMHASH near-dup ingest — the banded-Hamming twin
    * of [[nearDupIngestBatch]] over the cheapest persisted index
    * (8 bytes of hash per document): survivors are computed against
    * the COMMITTED, tombstone-filtered hash view
    * ([[TextDedupOps.committedSimHashes]] — deletes via
    * [[TextDedupOps.deleteFromSimHashStore]] take effect on the next
    * batch's matching immediately), published to
    * `corpusDir/ingest_id=<batch>`, and their hashes appended under
    * `hashesDir/hashes` stamped with the batch id (r18 root-layout
    * stores migrate on first touch); the commit log lives at
    * `hashesDir/_commits`. This wrapper OWNS the store (every file it
    * writes carries `ingest_id`); recovery after a mid-append crash
    * subtracts the batch's already-visible rows exactly as the LSH
    * path does, and [[TextDedupOps.compactSimHashStore]] is the
    * maintenance tier (lease-guarded, like the siblings). Returns
    * false (no writes) for a replay of the hwm batch. */
  /** Exactly-once IVF-PQ ingest — the EMBEDDING-store member of the
    * family: unlike the dedup loops there is no survivorship (the
    * index stores what it is given; `dedupIds = true` drops batch
    * rows whose vec_id is already COMMITTED — see the inline note —
    * while within-batch id uniqueness stays the caller's job), so
    * the batch effect is a pure exactly-once APPEND — the batch's raw
    * vectors publish to `corpusDir/ingest_id=<batch>` (the float
    * store the exact re-rank reads back by id) and their PQ codes
    * append to the index's cell partitions stamped with the batch id
    * ([[SimilarityOps.appendIvfPqIndex]]). The commit log lives at
    * `indexDir/commits`; [[SimilarityOps.ivfPqTopKIndexed]] filters
    * its partition-pruned codes scan to committed rows whenever the
    * log exists, so a crashed attempt's partial append never serves,
    * and maintenance (vacuum/compaction) refuses to run over an
    * in-flight batch. Recovery after a mid-append crash subtracts the
    * already-visible stamped rows — sound because the encode is
    * deterministic against the STORED quantizers. Returns false (no
    * writes) for an already-committed batch. */
  def ivfPqIngestBatch(newVectors: DataFrame, batchId: Long,
      indexDir: String, corpusDir: String, cId: String = "vec_id",
      embCol: String = "embedding", dedupIds: Boolean = false,
      failpoint: String => Unit = NoFailpoint): Boolean = {
    val spark = newVectors.sparkSession
    val logDir = s"$indexDir/commits"
    val recover = beginIngest(spark, logDir, batchId,
      "ivfPqIngestBatch", writeAhead = true) match {
      case None => return false
      case Some(r) => r
    }
    val raw = newVectors.select(col(cId), col(embCol))
    // Optional cross-batch id dedup (r18 verdict task #5): a vec_id
    // already committed would otherwise double-serve from the codes
    // scan. Probe the committed corpus' slim id column with the
    // batch's ids broadcast (semi-join — one column-pruned,
    // partition-pruned scan), then anti-join the hits back out of the
    // batch (hits are ≤ batch-sized, broadcast again). Deterministic
    // on replay: the committed view is frozen at the hwm while this
    // batch is uncommitted. Within-batch id uniqueness stays the
    // caller's job (a deterministic pick between two different
    // embeddings under one id does not exist). Default OFF — legacy
    // plans stay byte-identical.
    val hwm = committedHwm(spark, logDir).getOrElse(-1L)
    val deduped =
      if (!dedupIds || hwm < 0) raw
      else {
        val committedIds = spark.read.option("basePath", corpusDir)
          .parquet(corpusDir)
          .filter(col("ingest_id") <= hwm).select(col(cId))
        val hit = committedIds
          .join(broadcast(raw.select(col(cId)).distinct()),
            Seq(cId), "left_semi")
          .distinct()
        raw.join(broadcast(hit), Seq(cId), "left_anti")
      }
    val batch = deduped
      .localCheckpoint(true) // consumed twice; caller lineage may be
                             // expensive and must not run per write
    failpoint("after-batch")
    def writeCorpus(): Unit =
      batch.write.mode("overwrite")
        .parquet(s"$corpusDir/ingest_id=$batchId")
    def writeIndex(): Unit =
      SimilarityOps.appendIvfPqIndex(batch, indexDir, cId, embCol,
        ingestId = Some(batchId), recover = recover)
    if (failpoint eq NoFailpoint) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val f1 = Future(writeCorpus()); val f2 = Future(writeIndex())
      val r1 = scala.util.Try(Await.result(f1, Duration.Inf))
      val r2 = scala.util.Try(Await.result(f2, Duration.Inf))
      r1.get; r2.get
    } else {
      writeCorpus(); failpoint("after-corpus")
      writeIndex(); failpoint("after-index")
    }
    appendLog(spark, logDir, batchId, "commit")
    true
  }

  def simHashIngestBatch(batch: DataFrame, batchId: Long,
      hashesDir: String, corpusDir: String, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3, bands: Int = 4,
      maxBucketSize: Int = Int.MaxValue,
      failpoint: String => Unit = NoFailpoint): Boolean = {
    val spark = batch.sparkSession
    val logDir = s"$hashesDir/_commits"
    val recover = beginIngest(spark, logDir, batchId,
      "simHashIngestBatch", writeAhead = true) match {
      case None => return false
      case Some(r) => r
    }
    // r19: hash files live under hashesDir/hashes (r18 root layouts
    // migrate on first touch) so the store gets the IndexSwap-based
    // delete/compaction tier its siblings have; the matching view —
    // committed at the hwm, tombstones anti-joined — is the shared
    // committedSimHashes read. Unstamped rows (a compacted base, or
    // out-of-contract direct writes) read as committed-at-any-
    // watermark, the family's null-means-committed convention.
    TextDedupOps.migrateSimHashLayout(spark, hashesDir)
    val dataDir = TextDedupOps.simHashDataDir(hashesDir)
    val existing = TextDedupOps.committedSimHashes(spark, hashesDir,
      idCol)
    val surv = TextDedupOps.simHashIncremental(batch, existing, idCol,
      textCol, maxHamming, bands, maxBucketSize)
      .localCheckpoint(true) // consumed twice (corpus + hash append);
                             // batch-sized, and it truncates the
                             // banded-join lineage like the LSH path
    failpoint("after-survivors")
    // survivor hashes recompute row-locally from the checkpointed
    // survivors — no shuffle, and exactly the hashes the next batch's
    // committed view must serve
    val survHashes = TextDedupOps.simHash(surv, idCol, textCol)
      .select(col(idCol).cast("long").as(idCol), col("simhash"))
    def writeCorpus(): Unit =
      surv.write.mode("overwrite")
        .parquet(s"$corpusDir/ingest_id=$batchId")
    def writeIndex(): Unit = {
      val dataP = new org.apache.hadoop.fs.Path(dataDir)
      val hasData = fsOf(spark, dataP).exists(dataP)
      val toWrite =
        if (!recover || !hasData) survHashes
        else {
          // pinned schema: the crashed attempt may be the store's
          // FIRST write, and the recovery read must not depend on
          // which footer inference lands on
          val vis = spark.read
            .schema(TextDedupOps.simHashReadSchema(idCol))
            .parquet(dataDir)
            .filter(col("ingest_id") === batchId)
            .select(col(idCol).cast("long").as(idCol), col("simhash"))
          survHashes.exceptAll(vis)
        }
      toWrite.withColumn("ingest_id", lit(batchId))
        .write.mode("append").parquet(dataDir)
    }
    if (failpoint eq NoFailpoint) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val f1 = Future(writeCorpus()); val f2 = Future(writeIndex())
      val r1 = scala.util.Try(Await.result(f1, Duration.Inf))
      val r2 = scala.util.Try(Await.result(f2, Duration.Inf))
      r1.get; r2.get
    } else {
      writeCorpus(); failpoint("after-corpus")
      writeIndex(); failpoint("after-index")
    }
    appendLog(spark, logDir, batchId, "commit")
    true
  }

  def nearDupIngestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, corpusDir: String, idCol: String = "doc_id",
      textCol: String = "text", shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.7,
      maxBucketSize: Int = Int.MaxValue,
      failpoint: String => Unit = NoFailpoint): Boolean = {
    val spark = batch.sparkSession
    val logDir = s"$indexDir/commits"
    val recover = beginIngest(spark, logDir, batchId,
      "nearDupIngestBatch", writeAhead = true) match {
      case None => return false
      case Some(r) => r
    }
    // Core filters the index to rows committed at the hwm — the
    // crashed attempt's own stamped rows are invisible, making the
    // survivor set identical on every replay (the determinism the
    // recovery subtraction in appendSigsToIndex relies on)
    val (nwSigs, survivors) = TextDedupOps.lshIncrementalIndexedCore(
      batch, indexDir, idCol, textCol, shingleN, k, bands, threshold,
      maxBucketSize)
    val ids = survivors.select(col(idCol).cast("long").as(idCol))
      .localCheckpoint(true) // slim; the ONE pair computation per batch
    failpoint("after-survivors")
    val surv = batch.join(ids, Seq(idCol), "left_semi")
    val survSigs = nwSigs
      .select(shiftright(col(idCol), 1).as(idCol), col("signature"))
      .join(ids, Seq(idCol), "left_semi")
    def writeCorpus(): Unit =
      surv.write.mode("overwrite")
        .parquet(s"$corpusDir/ingest_id=$batchId")
    def writeIndex(): Unit =
      TextDedupOps.appendSigsToIndex(survSigs, indexDir, idCol, bands,
        shingleN, ingestId = Some(batchId), recover = recover,
        kKnown = Some(k))
    if (failpoint eq NoFailpoint) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val f1 = Future(writeCorpus()); val f2 = Future(writeIndex())
      val r1 = scala.util.Try(Await.result(f1, Duration.Inf))
      val r2 = scala.util.Try(Await.result(f2, Duration.Inf))
      r1.get; r2.get // rethrow AFTER both settle — no stray in-flight
                     // write may outlive this batch into the next
    } else {
      writeCorpus(); failpoint("after-corpus")
      writeIndex(); failpoint("after-index")
    }
    appendLog(spark, logDir, batchId, "commit")
    true
  }
}
