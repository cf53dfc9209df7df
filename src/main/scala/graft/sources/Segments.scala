package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Generic maintenance for `batch=<id>` segment tables — the layout all
  * streaming writers here share ([[RollupTable.writeSegment]],
  * [[graft.dedup.LshIndex.appendBatch]], [[graft.ann.IvfIndex.appendBatch]]).
  * A long-running stream writes one segment per micro-batch, so a day of
  * short triggers accretes thousands of small files and every later scan
  * pays the per-file open cost.
  */
object Segments {

  /** Absorbed-segment manifest inside the temp dir: one batch id per line.
    * Underscore-prefixed, so parquet listings ignore it before and after the
    * promote.
    */
  private val Manifest = "_ABSORBED"

  /** Whether `path` holds at least one parquet DATA file (recursively) — the
    * zero-row-write detector the per-store empty-build refusals share: a
    * dynamic-partition overwrite of an empty frame leaves a dataless dir
    * (markers only) that every later read dies on with an unhelpful
    * schema-inference error, so builders check the WRITTEN output instead of
    * pre-executing the input plan. What to DELETE and how to word the
    * refusal is per-store policy and stays at the call sites.
    */
  def hasParquetData(spark: SparkSession, path: String): Boolean = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var hasData = false
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (!hasData && it.hasNext)
        hasData = it.next().getPath.getName.endsWith(".parquet")
    }
    hasData
  }

  /** Ids of the live `batch=<id>` segments, ascending. Empty for a missing
    * or segment-less table.
    */
  def segmentIds(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .sorted.toSeq
  }

  /** Snapshot read: the table's rows as of the commit of batch `maxBatch` —
    * exactly the segments with id ≤ `maxBatch`. Batch ids are monotone and a
    * segment only ever holds rows of batches ≤ its own id (a [[compact]]ed
    * segment absorbs every id below the surviving one), so any LIVE segment
    * id is a valid snapshot point and reproduces the table bit-for-bit as it
    * stood after that batch — the reproducibility pin a training run records
    * ("built from index X as of batch N") so the exact corpus a model saw
    * can be re-read later regardless of what the ingest stream absorbed
    * since.
    *
    * Compaction COARSENS history the way `VACUUM` does elsewhere: absorbing
    * batches 0..k into `batch=k` leaves snapshots at ≥ k servable and ones
    * below k gone. Requesting a collapsed snapshot fails loudly (listing the
    * ids still live) rather than silently serving a partial corpus: a
    * reproducibility pin that cannot be honored must never degrade into
    * "some rows".
    *
    * The `batch` partition column is pruned at planning time (`batch` is a
    * directory key), so a snapshot read scans only its segments' files.
    */
  def readAsOf(
      spark: SparkSession, path: String, maxBatch: Long,
      dropBatch: Boolean = true,
      options: Map[String, String] = Map.empty): DataFrame = {
    val ids = segmentIds(spark, path)
    require(ids.nonEmpty, s"no segments under $path")
    require(
      ids.min <= maxBatch,
      s"snapshot batch=$maxBatch predates live history (compaction collapsed it); " +
        s"earliest available id: ${ids.min}, live ids: ${ids.mkString(", ")}")
    val snap = spark.read.option("basePath", path).options(options).parquet(path)
      .filter(col("batch") <= maxBatch)
    if (dropBatch) snap.drop("batch") else snap
  }

  /** A compaction that cannot lose rows to either failure mode a live
    * pipeline exposes:
    *
    * '''Checkpoint replay of the newest segment.''' A stream that crashes
    * after `foreachBatch` wrote segment N but before the offset commit will
    * REPLAY batch N on restart, rewriting `batch=N` whole
    * (`mode("overwrite")`). Absorbing N into the compacted segment would
    * therefore hand the entire index to that overwrite. So by default
    * (`protectLatest = true`) the newest segment is never absorbed: the
    * compacted rows land at the second-highest id and a replay touches only
    * the one segment that genuinely is batch N's own data. Repeated runs
    * keep the table at two segments. Pass `protectLatest = false` only for a
    * quiesced table (no stream attached, or its last batch provably
    * committed) to fold the tail segment in as well.
    *
    * '''Concurrent single writers.''' The read, the delete, and the promote
    * all operate on an explicit snapshot of segment paths taken once at
    * entry — never on a re-listing — so a micro-batch landing a NEW
    * `batch=M` mid-compaction is simply invisible to the run and survives it
    * untouched (its id is above every absorbed id, so the promote cannot
    * collide with it). Compactors themselves are mutually excluded by an
    * exclusive-create lease file (`.compact_lease`) carrying the holder's
    * UUID and heartbeated (mtime refresh) at `leaseTtlMs / 4` for the whole
    * run, so a live compaction of any duration is never classified dead. A
    * holder whose heartbeats stopped for `leaseTtlMs` is taken over by
    * atomically RENAMING its lease to a claimant-unique name — exactly one
    * claimant's rename succeeds; losers fail fast. A second live compactor
    * fails fast with `IllegalStateException` rather than queueing —
    * compaction is maintenance, not a data path. As a last backstop against
    * a holder frozen past the TTL and resuming mid-commit, ownership
    * (lease exists and still carries this run's UUID) is re-verified
    * immediately before the first destructive step; a usurped run aborts
    * with every source segment intact.
    *
    * '''Crash anywhere in the commit window.''' The compacted copy lands
    * complete in a dot-prefixed per-run temp dir (invisible to parquet
    * listings); only after a final ownership check is the `_ABSORBED`
    * manifest — the commit point — written into it, naming exactly the
    * segment ids it replaces; only then are sources removed and the temp
    * dir promoted to `batch=<max absorbed id>`. Recovery on the next run
    * replays from the manifest: with manifest + `_SUCCESS` present the copy
    * is complete and the commit finishes (delete exactly the manifest's
    * ids, promote); any other leftover temp dir predates its manifest, so
    * no source was ever deleted for it — it is discarded and the run starts
    * fresh.
    *
    * Rows pass through `transform` (identity by default — plain compaction)
    * and are repartitioned by `partitionCols` so each partition directory
    * holds one file per compaction run (bounded file count); with the
    * default transform every query over the table returns identical results
    * before and after. `meta` files (name → content) are written into the
    * compacted segment before the manifest, so they promote — and recover —
    * atomically with the data; [[graft.ann.IvfIndex.recluster]] uses this to
    * swap its centroid set in the same commit that re-assigns the rows.
    * `meta` is BY-NAME, evaluated under the compaction lease after the copy:
    * a caller that derives its meta by READING the table's current manifests
    * ([[graft.ann.IvfIndex.compactSegments]] carries them forward) must not
    * evaluate them before the lease — a manifest-swapping rewrite committing
    * between the read and this compact's promote would be silently reverted
    * by the stale stamp. Under the lease the window is closed: any such
    * rewrite needs this same lease and either committed before us (fresh
    * read) or fails fast while we hold it.
    * `force` runs the rewrite even for a single source segment (a no-op for
    * plain compaction, required when `transform`/`meta` change content).
    * `segmentFilter` restricts which segment IDS are absorbable: only ids it
    * accepts are read, deleted, or targeted — segments it rejects survive
    * the run untouched, like any segment landing after the entry snapshot.
    * A caller whose segment-id NAMESPACE carries meaning (e.g. the pair
    * store's tier-by-modulus layout) compacts one id class at a time: the
    * compacted rows land at the max absorbed id, which stays inside the
    * class, so the id-derived semantics survive compaction.
    *
    * @return number of source segments absorbed (0 = nothing to do).
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      protectLatest: Boolean = true,
      leaseTtlMs: Long = 15L * 60 * 1000,
      transform: DataFrame => DataFrame = identity,
      meta: => Map[String, String] = Map.empty,
      force: Boolean = false,
      segmentFilter: Long => Boolean = _ => true): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withLease(fs, root, leaseTtlMs) { (holder, assertOwned) =>
      // per-run temp dir: a second compactor that slips past a filesystem
      // whose exclusive-create is check-then-act (RawLocalFileSystem) writes
      // its own copy and aborts at assertOwned — never a shared-dir clash
      val tmp = new Path(root, s".compact_tmp.$holder")
      def segId(p: Path): Long = p.getName.stripPrefix("batch=").toLong
      def listed() = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      // only COMMITTED segments (carrying the parquet _SUCCESS marker) are
      // absorbable: a dir whose write is still in flight — e.g. an absorb
      // racing the lease this compaction runs under — has data files but no
      // marker yet. Ingesting it would copy a partial (or soon-deleted-and-
      // retried) segment into the compacted snapshot AND delete it as a
      // source, double-absorbing the retry's rows. Skipped here, the
      // in-flight segment simply survives the run untouched, like any
      // segment landing after the entry snapshot.
      def segments() = listed().filter(p =>
        p.getName.startsWith("batch=") && segmentFilter(segId(p)) &&
          fs.exists(new Path(p, "_SUCCESS")))

      // recovery: manifest + _SUCCESS ⇒ that temp dir is a COMPLETE copy of
      // exactly the manifest's segments, written by a holder that still
      // owned the lease at manifest time, and the commit must finish — some
      // of those sources may already be half-deleted, so re-compacting would
      // lose the rows whose only remaining copy is the temp dir. Anything
      // less — including a present-but-empty manifest — ⇒ the crash predates
      // the manifest (and therefore the first source delete): discard. At
      // most one manifested dir can exist (the manifest is written under an
      // ownership check immediately before the deletes).
      listed().filter(_.getName.startsWith(".compact_tmp")).foreach { old =>
        val mf = new Path(old, Manifest)
        if (fs.exists(mf) && fs.exists(new Path(old, "_SUCCESS"))) {
          val ids = readLines(fs, mf).map(_.trim).filter(_.nonEmpty).map(_.toLong)
          if (ids.nonEmpty) {
            assertOwned()
            ids.foreach(id => fs.delete(new Path(root, s"batch=$id"), true))
            fs.rename(old, new Path(root, s"batch=${ids.max}"))
            return ids.length
          }
        }
        fs.delete(old, true)
      }

      val segs = segments()
      val absorbed =
        if (protectLatest && segs.nonEmpty) {
          val newest = segs.map(segId).max
          segs.filter(segId(_) != newest)
        } else segs
      if (absorbed.length <= (if (force) 0 else 1)) return 0
      val target = absorbed.map(segId).max

      var promoted = false
      try {
        // read ONLY the snapshot paths (basePath keeps the partition
        // columns): a segment landing concurrently is not in this lineage
        // and is never deleted below. mergeSchema, because segments can span
        // ENGINE GENERATIONS (a pre-PQ IVF segment lacks the code columns):
        // single-footer inference sampled from a legacy file would infer a
        // schema WITHOUT those columns and the rewrite — whose sources are
        // deleted after the promote — would destroy every coded row's codes
        // irreversibly. Merged, the union schema keeps all columns, nulls
        // exactly on the rows that never had them. Footer cost is fine here:
        // compaction is maintenance, not a query path.
        val data = transform(spark.read.option("basePath", path)
          .option("mergeSchema", "true")
          .parquet(absorbed.map(_.toString).toSeq: _*).drop("batch"))
        val sized = // one task → one file per partition dir
          if (partitionCols.nonEmpty) data.repartition(partitionCols.map(col): _*)
          else data.coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
        val writer = sized.write.mode("overwrite")
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
          .parquet(tmp.toString)
        meta.foreach { case (name, content) => writeLines(fs, new Path(tmp, name), Seq(content)) }
        assertOwned() // abort BEFORE the commit point if usurped
        // the manifest IS the commit: recovery finishes everything after it
        writeLines(fs, new Path(tmp, Manifest), absorbed.map(segId(_).toString).toSeq)
        absorbed.foreach(fs.delete(_, true))
        fs.rename(tmp, new Path(root, s"batch=$target"))
        promoted = true
        absorbed.length
      } finally {
        // an aborted run's un-manifested copy is pure garbage — reclaim it
        if (!promoted)
          try if (!fs.exists(new Path(tmp, Manifest))) fs.delete(tmp, true)
          catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Exclusive-create lease scoped to `body`; `body` receives the holder's
    * UUID and an `assertOwned` callback to re-verify ownership before
    * destructive steps.
    *
    * The lease file carries the holder's UUID and its mtime is refreshed by
    * a daemon heartbeat every `ttlMs / 4` while `body` runs, so liveness —
    * not run duration — decides staleness. A lease whose mtime is older
    * than `ttlMs` belongs to a dead holder: takeover renames it to a
    * claimant-unique name first (rename is atomic; exactly one concurrent
    * claimant wins, the rest get `false` and fail fast), verifies the
    * claimed file really was the stale one (rename preserves mtime — a
    * fresh mtime means a concurrent winner already re-created the lease,
    * so it is restored and this claimant bows out), and only then
    * re-creates it. After any acquisition the content is read back — past a
    * settle delay, because a local filesystem's exclusive create is
    * check-then-act, so a racing creator truncates visibly only after its
    * own create — and must equal this run's UUID. A racer that slips
    * through anyway loses at the next `assertOwned` before anything
    * destructive.
    */
  private def withLease[T](fs: FileSystem, root: Path, ttlMs: Long)(
      body: (String, () => Unit) => T): T = {
    val lease = new Path(root, ".compact_lease")
    val holder = java.util.UUID.randomUUID().toString
    if (!fs.exists(root)) fs.mkdirs(root)
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lease, false)
        try out.write(holder.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    def owned(): Boolean =
      try readLines(fs, lease).headOption.map(_.trim).contains(holder)
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val age =
        try Some(System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime)
        catch { case _: java.io.FileNotFoundException => None } // released between create and stat
      age.foreach { a =>
        if (a <= ttlMs)
          throw new IllegalStateException(
            s"compaction lease at $lease is held (age ${a}ms <= ttl ${ttlMs}ms); " +
              "another compactor is live")
        val claimed = new Path(root, s".compact_lease.stale.$holder")
        val won = // local-FS rename may throw (copy fallback on a vanished src)
          try fs.rename(lease, claimed)
          catch { case _: java.io.IOException => false }
        if (!won)
          throw new IllegalStateException(
            s"lost the takeover race for stale lease at $lease")
        // rename preserves mtime: if the claimed file is FRESH, the race's
        // winner already re-created the lease and this rename stole a LIVE
        // holder's file — restore it (the holder's content is intact) and
        // bow out instead of joining it in the body
        val claimedAge =
          System.currentTimeMillis() - fs.getFileStatus(claimed).getModificationTime
        if (claimedAge <= ttlMs) {
          try fs.rename(claimed, lease) catch { case _: java.io.IOException => () }
          throw new IllegalStateException(
            s"stale lease at $lease was taken over by a live claimant first")
        }
        fs.delete(claimed, false)
      }
      if (!tryAcquire())
        throw new IllegalStateException(s"lost the race re-acquiring lease at $lease")
    }
    Thread.sleep(50) // settle: let a check-then-act racer's truncate become visible
    if (!owned())
      throw new IllegalStateException(s"lease at $lease was usurped right after acquisition")
    def assertOwned(): Unit =
      if (!owned())
        throw new IllegalStateException(
          s"lease at $lease no longer names this holder — aborting before any destructive step")
    val beat = new Thread(() => {
      val interval = math.max(50L, ttlMs / 4)
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        try if (owned()) fs.setTimes(lease, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () } // racing release; next owned() settles it
      } catch { case _: InterruptedException => () }
    }, s"segments-lease-heartbeat-${root.getName}")
    beat.setDaemon(true)
    beat.start()
    try body(holder, () => assertOwned())
    finally {
      beat.interrupt()
      if (owned()) fs.delete(lease, false)
    }
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def writeLines(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
  }
}
