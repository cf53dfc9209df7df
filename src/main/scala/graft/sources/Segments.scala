package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
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
    * complete in a dot-prefixed temp dir (invisible to parquet listings)
    * together with an `_ABSORBED` manifest naming exactly the segment ids it
    * replaces; only then are sources removed and the temp dir promoted to
    * `batch=<max absorbed id>`. Recovery on the next run replays from the
    * manifest: with manifest + `_SUCCESS` present the copy is complete and
    * the commit finishes (delete exactly the manifest's ids, promote);
    * without them no source was ever deleted, so the temp dir is discarded
    * and the run starts fresh.
    *
    * Rows pass through untouched and are repartitioned by `partitionCols` so
    * each partition directory holds one file per compaction run (bounded
    * file count); every query over the table returns identical results
    * before and after.
    *
    * @return number of source segments absorbed (0 = nothing to do).
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      protectLatest: Boolean = true,
      leaseTtlMs: Long = 15L * 60 * 1000): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withLease(fs, root, leaseTtlMs) { assertOwned =>
      val tmp = new Path(root, ".compact_tmp")
      def segId(p: Path): Long = p.getName.stripPrefix("batch=").toLong
      def segments() = fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(_.getPath)

      // recovery: manifest + _SUCCESS ⇒ the temp dir is a COMPLETE copy of
      // exactly the manifest's segments and the commit must finish — some of
      // those sources may already be half-deleted, so re-compacting would
      // lose the rows whose only remaining copy is the temp dir. Anything
      // less — including a present-but-empty manifest — ⇒ the crash predates
      // the first source delete: discard and start over.
      if (fs.exists(tmp)) {
        val mf = new Path(tmp, Manifest)
        if (fs.exists(mf) && fs.exists(new Path(tmp, "_SUCCESS"))) {
          val ids = readLines(fs, mf).map(_.trim).filter(_.nonEmpty).map(_.toLong)
          if (ids.nonEmpty) {
            assertOwned()
            ids.foreach(id => fs.delete(new Path(root, s"batch=$id"), true))
            fs.rename(tmp, new Path(root, s"batch=${ids.max}"))
            return ids.length
          }
        }
        fs.delete(tmp, true)
      }

      val segs = segments()
      val absorbed =
        if (protectLatest && segs.nonEmpty) {
          val newest = segs.map(segId).max
          segs.filter(segId(_) != newest)
        } else segs
      if (absorbed.length <= 1) return 0
      val target = absorbed.map(segId).max

      // read ONLY the snapshot paths (basePath keeps the partition columns):
      // a segment landing concurrently is not in this lineage and is never
      // deleted below
      val data = spark.read.option("basePath", path)
        .parquet(absorbed.map(_.toString): _*).drop("batch")
      val sized = // one task → one file per partition dir
        if (partitionCols.nonEmpty) data.repartition(partitionCols.map(col): _*)
        else data.coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      val writer = sized.write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(tmp.toString)
      writeLines(fs, new Path(tmp, Manifest), absorbed.map(segId(_).toString))
      assertOwned() // abort BEFORE the first source delete if usurped
      absorbed.foreach(fs.delete(_, true))
      fs.rename(tmp, new Path(root, s"batch=$target"))
      absorbed.length
    }
  }

  /** Exclusive-create lease scoped to `body`; `body` receives an
    * `assertOwned` callback to re-verify ownership before destructive steps.
    *
    * The lease file carries the holder's UUID and its mtime is refreshed by
    * a daemon heartbeat every `ttlMs / 4` while `body` runs, so liveness —
    * not run duration — decides staleness. A lease whose mtime is older
    * than `ttlMs` belongs to a dead holder: takeover renames it to a
    * claimant-unique name first (rename is atomic; exactly one concurrent
    * claimant wins, the rest get `false` and fail fast) and only then
    * re-creates it. After any acquisition the content is read back and must
    * equal this run's UUID.
    */
  private def withLease[T](fs: FileSystem, root: Path, ttlMs: Long)(
      body: (() => Unit) => T): T = {
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
        if (!fs.rename(lease, claimed))
          throw new IllegalStateException(
            s"lost the takeover race for stale lease at $lease")
        fs.delete(claimed, false)
      }
      if (!tryAcquire())
        throw new IllegalStateException(s"lost the race re-acquiring lease at $lease")
    }
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
    try body(() => assertOwned())
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
