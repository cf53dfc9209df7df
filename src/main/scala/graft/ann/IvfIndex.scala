package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import SimilarityOps.{probeCells, withCentroidAssignment, withNorm}

/** Durable IVF index — the similarity-search analogue of the rollup table's
  * materialization discipline: a 100 TB embedding corpus is assigned to its
  * cells ONCE, persisted PARTITIONED BY `centroid_id`, and every search
  * touches only the probed cells' partitions.
  *
  * Index schema: (vec_id, v double-array, nn squared norm, pq raw-vector PQ
  * codes, rpq residual PQ codes, centroid_id),
  * laid out `batch=<id>/centroid_id=<k>/` — incoming embedding batches are
  * assigned in isolation (the centroid set is fixed and deterministic, so
  * assignments computed at different times agree bit-for-bit) and absorbed
  * as replay-idempotent segments, the same discipline as
  * [[graft.dedup.LshIndex]] and the rollup's streaming writer.
  *
  * Search shape at scale: the query batch is small — its per-query nprobe
  * cell list BROADCASTS, and Spark's dynamic partition pruning turns the
  * broadcast into a `centroid_id` partition filter on the index scan, so a
  * 2-of-8 probe reads ~1/4 of the index and shuffles nothing but the final
  * per-query top-k. Norms are precomputed at index time; search evaluates
  * one codegen'd dot product per (query, candidate).
  */
object IvfIndex {

  /** Per-segment centroid manifest: one line per centroid, comma-joined
    * doubles. Every segment records the centroid set it was assigned under;
    * the newest segment's manifest IS the index's current set, so a
    * [[recluster]] — whose single rewritten segment carries the new
    * manifest — swaps data and centroids in one atomic promote. Segments of
    * a live index always agree: [[appendBatch]] copies the set it read, and
    * recluster rewrites every segment.
    */
  private val CentroidsFile = "_CENTROIDS"

  /** Per-segment fit-quality manifest: the mean squared residual (distance²
    * to the assigned centroid) measured when the current centroid set was
    * FIT — the denominator of [[driftRatio]]. Carried forward by
    * [[appendBatch]] like the centroid manifest, replaced by
    * [[recordBaseline]] (which [[materialize]] and [[recluster]] call).
    */
  private val ResidualFile = "_RESIDUAL"

  /** Advisory lease a [[recluster]] holds for its WHOLE run (fit +
    * swap), not just the final compact: the quiescence requirement the r7
    * doc comment stated in prose, made structural. [[appendBatch]] refuses
    * to absorb while the lease is fresh — a batch assigned under the
    * outgoing centroid set that lands mid-recluster would survive the swap
    * snapshot untouched and silently carry stale cell ids ever after. A
    * lease whose heartbeat (mtime) stopped for [[ReclusterLeaseTtlMs]] is
    * treated as a crashed run and ignored/reclaimed.
    */
  private val ReclusterLease = ".recluster_lease"

  /** Heartbeat staleness horizon. The `graft.ivf.leaseTtlMs` system property
    * override exists so the spec can pin the liveness semantics (a heartbeat
    * outliving the TTL keeps absorbs failing) without a 15-minute test.
    */
  def ReclusterLeaseTtlMs: Long =
    sys.props.get("graft.ivf.leaseTtlMs") match {
      case None => 15L * 60 * 1000
      case Some(v) => v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft.ivf.leaseTtlMs must be a millisecond count, got '$v'"))
    }

  /** The lease's liveness timestamp is its CONTENT (a millis payload the
    * holder rewrites on every heartbeat), falling back to file mtime when
    * the payload is absent/unreadable (the instant between exclusive-create
    * and the first payload write, or a lease left by an older engine
    * generation). Content, not `setTimes`: the Hadoop FileSystem base class
    * implements setTimes as a silent no-op on object stores (S3A et al.),
    * where an mtime heartbeat never refreshes and any recluster longer than
    * the TTL is misclassified as crashed — the r9 advisory's exact gap.
    */
  private def leaseInfo(
      spark: SparkSession, indexPath: String): Option[(org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path, Long)] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, ReclusterLease)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val fromPayload =
        try {
          val in = fs.open(p)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          text.trim.toLongOption
        } catch { case _: java.io.IOException => None }
      val mtime = try fs.getFileStatus(p).getModificationTime
        catch { case _: java.io.IOException => 0L }
      Some((fs, p, fromPayload.getOrElse(mtime)))
    }
  }

  private def writeLeasePayload(
      fs: org.apache.hadoop.fs.FileSystem, lease: org.apache.hadoop.fs.Path): Unit = {
    val out = fs.create(lease, true)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Fails loudly when a live recluster holds the index. */
  private def assertNotReclustering(spark: SparkSession, indexPath: String): Unit =
    leaseInfo(spark, indexPath).foreach { case (_, _, mtime) =>
      if (System.currentTimeMillis() - mtime < ReclusterLeaseTtlMs)
        throw new IllegalStateException(
          s"recluster in progress on $indexPath (lease heartbeat " +
            s"${System.currentTimeMillis() - mtime} ms ago): absorbing now would land a " +
            "segment assigned under the outgoing centroid set; retry after it completes " +
            "(a streaming absorb fails its micro-batch and replays cleanly on restart)")
    }

  private def serializeCents(cents: IndexedSeq[Array[Double]]): String =
    cents.map(_.mkString(",")).mkString("\n")

  private def parseCents(text: String): IndexedSeq[Array[Double]] =
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.split(",").map(_.toDouble)).toIndexedSeq

  /** The centroid set the index currently assigns and probes with: the
    * newest segment's manifest, falling back through older segments (a
    * reader racing [[appendBatch]] between its parquet and manifest writes
    * sees the previous — identical — set), then to the deterministic
    * md5-seeded [[SimilarityOps.centroids]] for an empty index.
    */
  /** Newest segment's copy of meta file `name` (respecting an `asOf` pin),
    * falling back through older segments — the shared read side of the
    * centroid and residual manifests.
    */
  private def newestMeta(
      spark: SparkSession, indexPath: String, name: String,
      asOf: Option[Long], excludeBatch: Option[Long] = None): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => asOf.forall(s.getPath.getName.stripPrefix("batch=").toLong <= _))
      .filter(s => !excludeBatch.contains(s.getPath.getName.stripPrefix("batch=").toLong))
      .sortBy(-_.getPath.getName.stripPrefix("batch=").toLong)
      .iterator
      .map(s => new org.apache.hadoop.fs.Path(s.getPath, name))
      .find(fs.exists)
      .map { p =>
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
  }

  private def writeSegMeta(
      spark: SparkSession, segDir: String, name: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(segDir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def currentCentroids(
      spark: SparkSession, indexPath: String,
      asOf: Option[Long] = None): IndexedSeq[Array[Double]] =
    newestMeta(spark, indexPath, CentroidsFile, asOf)
      .map(parseCents)
      .getOrElse(SimilarityOps.centroids)

  /** ROOT-level trained-PQ-codebook manifest (`indexPath/_PQ_CODEBOOK`,
    * 64 comma-joined lines in (m, k) order). Unlike the per-segment centroid
    * manifest it is IMMUTABLE for the index's life: [[materialize]] writes it
    * once (when a trained codebook is supplied) and every absorb, search and
    * recluster encodes/ranks under it — stored codes and query LUTs must
    * always agree on the codeword set, and "retrain the codebook" is a
    * rebuild-the-index operation, not an in-place swap (there is no moment
    * at which old codes and a new LUT can correctly coexist). Absent ⇒ the
    * deterministic md5 seed codebook (pre-training engine generations).
    */
  private val PqCodebookFile = "_PQ_CODEBOOK"

  /** Manifest of the codebook governing the RAW-vector `pq` codes, when it
    * differs from [[PqCodebookFile]]. A codebook trained on RESIDUALS
    * (centered near 0) carries almost no ranking signal for raw subvectors
    * sitting a centroid-magnitude away — encoding `pq` under it would
    * silently collapse [[searchAdc]] quality (r11 review finding). So the
    * governed retrain trains and commits BOTH: residuals → [[PqCodebookFile]]
    * (serves `rpq`/[[searchRadc]]), raw subvectors → this file (serves
    * `pq`/[[searchAdc]]). Fallback when absent: the shared [[PqCodebookFile]]
    * manifest (the r10 install semantics — one installed codebook governed
    * both), then the md5 seed.
    */
  private val PqCodebookRawFile = "_PQ_CODEBOOK_RAW"

  /** Per-segment schema-generation marker: present iff the segment's parquet
    * files carry the `pq`/`rpq` code columns. When EVERY live segment
    * carries it, the ADC searches can use cheap single-footer schema
    * inference instead of the per-query all-footers merge job (r10
    * advisory) — any footer then surfaces the code columns. Absent on
    * segments written by pre-marker engine generations, which conservatively
    * keeps the merge.
    */
  private val CodedMeta = "_CODED"

  /** The governing codebook manifest's TEXT, if any: the newest segment's
    * [[PqCodebookFile]] meta (committed atomically with a retrain's
    * re-encoded rows — see [[recluster]]), falling back to the root-level
    * install-time file. None ⇒ the deterministic md5 seed codebook.
    */
  private def manifestStamp(
      spark: SparkSession, indexPath: String, name: String,
      excludeBatch: Option[Long]): Option[String] =
    newestMeta(spark, indexPath, name, asOf = None, excludeBatch = excludeBatch)
      .orElse {
        val p = new org.apache.hadoop.fs.Path(indexPath, name)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
          finally in.close()
        }
      }

  private def pqManifestStamp(
      spark: SparkSession, indexPath: String,
      excludeBatch: Option[Long] = None): Option[String] =
    manifestStamp(spark, indexPath, PqCodebookFile, excludeBatch)

  /** The RAW-code codebook manifest's text, if any dedicated one governs —
    * see [[PqCodebookRawFile]]; None means "shared manifest or seed".
    */
  private def pqRawManifestStamp(
      spark: SparkSession, indexPath: String,
      excludeBatch: Option[Long] = None): Option[String] =
    manifestStamp(spark, indexPath, PqCodebookRawFile, excludeBatch)

  /** Driver-side memo of parsed codebooks and the coded-marker sweep, keyed
    * by index path and validated against a cheap stamp (live segment ids +
    * root-manifest status) — the codebook manifest is install-once /
    * swap-by-whole-segment-commit, so a parse is only repaid when the
    * segment set or root file actually changed. Searches and absorbs stop
    * paying a manifest open+parse (and the ADC paths an all-footers merge
    * job) per call (r10 advisories).
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String), (String, IndexedSeq[IndexedSeq[Array[Double]]])]()
  private val codedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Boolean)]()

  /** Memo of the LIVE index relation per (indexPath, mergeSchema), validated
    * by [[metaStamp]]: `spark.read.parquet` pays a distributed file-listing
    * job (plus, under mergeSchema, the all-footers merge job) at
    * DataFrame-CONSTRUCTION time — per search, on the serving hot path, even
    * when the segment set hasn't moved (r11 verdict #2: "pay per-probe, not
    * per-index"). Reusing the resolved relation reuses its InMemoryFileIndex
    * and merged schema, so an unchanged index costs zero jobs to plan
    * against; any absorb/compact/recluster moves the stamp (segment set or
    * a promoted dir's mtime) and the next search relists once. Entries are
    * one per (index, flag) — replaced on stamp move, bounded like
    * [[graft.dedup.LshIndex]]'s hot-bucket memo. The cached plan is bound to
    * the SparkSession that built it; a different live session rebuilds.
    */
  private val indexRelCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Boolean), (String, DataFrame)]()

  private def liveIndexRel(
      spark: SparkSession, indexPath: String, mergeSchema: Boolean): DataFrame = {
    val key = (indexPath, mergeSchema)
    val stamp = metaStamp(spark, indexPath)
    val cached = indexRelCache.get(key)
    if (cached != null && cached._1 == stamp && (cached._2.sparkSession eq spark))
      return cached._2
    val opts = if (mergeSchema) Map("mergeSchema" -> "true") else Map.empty[String, String]
    val df = spark.read.option("basePath", indexPath).options(opts).parquet(indexPath)
    indexRelCache.put(key, (stamp, df))
    df
  }

  private[ann] def invalidateMetaCaches(indexPath: String): Unit = {
    codebookCache.remove((indexPath, PqCodebookFile))
    codebookCache.remove((indexPath, PqCodebookRawFile))
    codedCache.remove(indexPath)
    indexRelCache.remove((indexPath, true))
    indexRelCache.remove((indexPath, false))
    ()
  }

  /** Cheap cache-validity token: the live segment (id, dir-mtime) pairs plus
    * both root manifests' (mtime, length) — one root listing and two stats.
    * Every codebook-affecting event moves it: install writes a root file,
    * absorbs add a segment, and retrain/recluster/compaction promote a FRESH
    * segment directory by rename — so even a single-segment recluster that
    * folds `batch=N` back to `batch=N` (ids unchanged, root files untouched,
    * new codebooks committed as segment meta) moves the stamp, which an
    * ids-only token missed: a concurrent process's codebookCache kept
    * serving the outgoing codebook against re-encoded codes (ADVICE r12).
    */
  private def metaStamp(spark: SparkSession, indexPath: String): String = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getModificationTime))
        .sortBy(_._1)
        .map { case (id, m) => s"$id@$m" }
        .toSeq
    def rootStat(name: String): String =
      try {
        val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(indexPath, name))
        s"${st.getModificationTime}:${st.getLen}"
      } catch { case _: java.io.FileNotFoundException => "absent" }
    s"${segs.mkString(",")}|${rootStat(PqCodebookFile)}|${rootStat(PqCodebookRawFile)}"
  }

  private def parseCodebookManifest(
      indexPath: String, text: String): IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rows = parseCents(text)
    require(rows.size == SimilarityOps.PqM * SimilarityOps.PqK,
      s"$indexPath codebook manifest: expected " +
        s"${SimilarityOps.PqM * SimilarityOps.PqK} codewords, got ${rows.size}")
    // row LENGTH too: a 64-line manifest of wrong-width codewords (trained
    // under a different Dim/PqM split, or hand-edited) would otherwise
    // dot_arrays over mismatched lengths deep inside every encode and LUT
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.length == SimilarityOps.PqSubDim,
        s"$indexPath codebook manifest line ${i + 1}: codeword has " +
          s"${r.length} coefficients, expected ${SimilarityOps.PqSubDim}")
    }
    rows.grouped(SimilarityOps.PqK).toIndexedSeq
  }

  private def cachedCodebook(
      spark: SparkSession, indexPath: String, name: String)(
      resolve: => Option[String]): Option[IndexedSeq[IndexedSeq[Array[Double]]]] = {
    val stamp = metaStamp(spark, indexPath)
    val key = (indexPath, name)
    val cached = codebookCache.get(key)
    if (cached != null && cached._1 == stamp)
      return if (cached._2 == null) None else Some(cached._2)
    val cb = resolve.map(parseCodebookManifest(indexPath, _))
    codebookCache.put(key, (stamp, cb.orNull))
    cb
  }

  /** The codebook governing the RESIDUAL `rpq` codes (and [[searchRadc]]'s
    * LUTs): newest-segment/root [[PqCodebookFile]] manifest, else the seed.
    */
  def currentPqCodebook(
      spark: SparkSession, indexPath: String): IndexedSeq[IndexedSeq[Array[Double]]] =
    cachedCodebook(spark, indexPath, PqCodebookFile)(pqManifestStamp(spark, indexPath))
      .getOrElse(SimilarityOps.pqCodebook)

  /** The codebook governing the RAW `pq` codes (and [[searchAdc]]'s LUTs):
    * a dedicated [[PqCodebookRawFile]] manifest when a retrain committed
    * one, else the shared [[PqCodebookFile]] manifest (r10 install
    * semantics), else the seed.
    */
  def currentPqCodebookRaw(
      spark: SparkSession, indexPath: String): IndexedSeq[IndexedSeq[Array[Double]]] =
    cachedCodebook(spark, indexPath, PqCodebookRawFile)(pqRawManifestStamp(spark, indexPath))
      .getOrElse(currentPqCodebook(spark, indexPath))

  /** True iff every live segment carries the [[CodedMeta]] marker — the ADC
    * paths then read with single-footer inference (every footer has the code
    * columns) instead of the per-query distributed footer-merge job.
    */
  private def allSegmentsCoded(spark: SparkSession, indexPath: String): Boolean = {
    val stamp = metaStamp(spark, indexPath)
    val cached = codedCache.get(indexPath)
    if (cached != null && cached._1 == stamp) return cached._2
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = graft.sources.Segments.segmentIds(spark, indexPath)
    val coded = ids.nonEmpty && ids.forall(id =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/batch=$id", CodedMeta)))
    codedCache.put(indexPath, (stamp, coded))
    coded
  }

  /** Codebook shape gate shared by install and read: mis-shaped codebooks
    * must fail AT THE CALLER, not inside a later query plan.
    */
  private def requireCodebookShape(cb: IndexedSeq[IndexedSeq[Array[Double]]]): Unit = {
    require(cb.size == SimilarityOps.PqM,
      s"codebook has ${cb.size} subspaces, expected ${SimilarityOps.PqM}")
    cb.zipWithIndex.foreach { case (ks, m) =>
      require(ks.size == SimilarityOps.PqK,
        s"codebook subspace $m has ${ks.size} codewords, expected ${SimilarityOps.PqK}")
      ks.zipWithIndex.foreach { case (c, k) =>
        require(c.length == SimilarityOps.PqSubDim,
          s"codeword ($m, $k) has ${c.length} coefficients, " +
            s"expected ${SimilarityOps.PqSubDim}")
      }
    }
  }

  /** `codebook` installs the trained set governing the RESIDUAL codes (and,
    * absent `codebookRaw`, the raw codes too — the r10 single-manifest
    * semantics). `codebookRaw` optionally installs a separate raw-subvector
    * set for `pq`/[[searchAdc]] — a residual-trained codebook's codewords
    * live near 0 and rank raw vectors poorly, so serving both ADC modes
    * trained means installing both (what [[recluster]]'s retrain commits).
    */
  def materialize(
      spark: SparkSession, embeddings: DataFrame, indexPath: String,
      codebook: Option[IndexedSeq[IndexedSeq[Array[Double]]]] = None,
      codebookRaw: Option[IndexedSeq[IndexedSeq[Array[Double]]]] = None): Unit = {
    // a zero-row first build writes NO parquet (dynamic-partition write of
    // an empty frame), leaving an index every later read dies on with an
    // unhelpful schema-inference error (ADVICE r12's empty-index family) —
    // and on the codebook-install branch it would additionally strand the
    // just-written manifests. Fail the build with the diagnostic on BOTH
    // branches — but verify non-emptiness from the WRITTEN segment
    // (one file listing), not a pre-write `embeddings.isEmpty` probe, which
    // ran an extra Spark job evaluating the input plan head on every build
    // (ADVICE r13: the bench's crossJoin-replicated 10× frame paid that
    // limit-1 execution per repeated materialize). An empty write leaves a
    // markerless dataless dir; [[requireSegmentNonEmpty]] deletes it whole
    // (meta included) so no unreadable index survives the refusal. Later
    // zero-row appendBatches stay legal (an idle micro-batch).
    (codebook, codebookRaw) match {
      case (None, None) =>
        // re-materializing onto an index that already holds segments must
        // refuse BEFORE the overwrite: the post-write check would otherwise
        // let an accidentally-empty frame destroy the existing batch=0
        // (mode overwrite deletes the old files first) and then "refuse" —
        // review r14. The pre-write isEmpty probe costs one extra plan-head
        // job, acceptable on the rare rebuild-in-place path; FRESH builds
        // (the common case) keep the job-free post-write check.
        if (hasSegments(spark, indexPath)) {
          require(!embeddings.isEmpty,
            s"materialize: embeddings frame holds zero rows — refusing to " +
              s"overwrite the existing index at $indexPath")
        }
        appendBatch(spark, indexPath, embeddings, batchId = 0L)
        requireSegmentNonEmpty(spark, indexPath, batchId = 0L)
        recordBaseline(spark, indexPath)
      case _ =>
        require(codebook.nonEmpty,
          "codebookRaw without codebook: install the residual set too (a raw-only " +
            "install would leave rpq under the seed while pq is trained — pass both)")
        // Codebook install rides the SAME lease a recluster holds (r10
        // advisory): the former check-then-act (segments-empty check, then
        // manifest write) let a concurrent appendBatch land a segment
        // encoded under the md5 seed between the two, with the manifest then
        // claiming trained — stored codes and query LUTs silently disagree.
        // Under the lease, a concurrent absorb fails loudly at
        // [[assertNotReclustering]] (or at its own post-write lease
        // re-check); and if OUR first absorb aborts, the manifests are
        // deleted on the way out so a later codebook-less materialize cannot
        // silently inherit a trained manifest with no trained segments.
        codebook.foreach(requireCodebookShape)
        codebookRaw.foreach(requireCodebookShape)
        withReclusterLease(spark, indexPath) { fs =>
          require(graft.sources.Segments.segmentIds(spark, indexPath).isEmpty,
            s"$indexPath already holds segments encoded under another codebook — " +
              "a trained codebook must be installed before the first absorb " +
              "(retrain = recluster(retrainCodebook = true) or rebuild, never " +
              "an in-place file swap)")
          val installed = Seq(
            codebook.map(PqCodebookFile -> _),
            codebookRaw.map(PqCodebookRawFile -> _)).flatten
          installed.foreach { case (name, cbx) =>
            val p = new org.apache.hadoop.fs.Path(indexPath, name)
            val out = fs.create(p, true)
            try out.write(serializeCents(cbx.flatten).getBytes("UTF-8")) finally out.close()
          }
          invalidateMetaCaches(indexPath)
          try {
            absorb(spark, indexPath, embeddings, batchId = 0L, checkLease = false)
            requireSegmentNonEmpty(spark, indexPath, batchId = 0L)
            recordBaseline(spark, indexPath)
          } catch {
            case t: Throwable =>
              // abort path: no segment may be left encoded-less under a
              // trained manifest — absorb already deleted its segment, so
              // removing the manifests restores the pre-install state whole
              installed.foreach { case (name, _) =>
                try fs.delete(new org.apache.hadoop.fs.Path(indexPath, name), false)
                catch { case _: java.io.IOException => () }
              }
              invalidateMetaCaches(indexPath)
              throw t
          }
        }
    }
  }

  /** The first-build zero-row refusal ([[materialize]]): checks the WRITTEN
    * segment for data files instead of pre-executing the input plan. On an
    * empty write, the dataless segment dir (its meta files included) is
    * deleted whole before the throw — the refusal leaves no trace a later
    * build or read could trip on.
    */
  private def requireSegmentNonEmpty(
      spark: SparkSession, indexPath: String, batchId: Long): Unit =
    if (!graft.sources.Segments.hasParquetData(spark, s"$indexPath/batch=$batchId")) {
      val seg = new org.apache.hadoop.fs.Path(s"$indexPath/batch=$batchId")
      seg.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(seg, true)
      invalidateMetaCaches(indexPath)
      throw new IllegalArgumentException(
        s"materialize: embeddings frame holds zero rows — refusing to build " +
          s"an empty (unreadable) index at $indexPath")
    }

  /** Assign ONLY `embeddings` (vec_id, embedding) under the index's current
    * centroid set and absorb them as the `batch=<id>` segment — overwritten
    * whole, so replays are idempotent.
    *
    * '''vec_id contract''': ids must be GLOBALLY unique across every batch
    * ever absorbed (they are upsert-free identities, not per-batch
    * sequence numbers). [[search]] excludes self-matches by id alone, so a
    * re-emitted id would silently hide ALL stored vectors sharing it from
    * that id's queries — IvfIndexSpec pins this exclusion semantics.
    */
  def appendBatch(
      spark: SparkSession, indexPath: String, embeddings: DataFrame, batchId: Long): Unit =
    absorb(spark, indexPath, embeddings, batchId, checkLease = true)

  /** [[appendBatch]] body; `checkLease = false` only for the caller that
    * HOLDS the recluster lease itself ([[materialize]]'s codebook-install
    * path) — every external absorb must see a live lease as a hard failure.
    */
  private def absorb(
      spark: SparkSession, indexPath: String, embeddings: DataFrame, batchId: Long,
      checkLease: Boolean): Unit = {
    VectorFunctions.register(spark)
    if (checkLease) assertNotReclustering(spark, indexPath)
    // codebook identity snapshot (BOTH manifests): the sets we ENCODE under
    // must still govern the index when our segment becomes live (see the
    // re-check below). Our own batch id is excluded — a checkpoint replay's
    // earlier attempt may have left the segment (and its codebook meta
    // copies) behind.
    val cbStampAtEntry = pqManifestStamp(spark, indexPath, excludeBatch = Some(batchId))
    val cbRawStampAtEntry = pqRawManifestStamp(spark, indexPath, excludeBatch = Some(batchId))
    val cents = currentCentroids(spark, indexPath)
    val baseline = baselineResidual(spark, indexPath)
    // `pq` = the vector's 8-code PQ vector, encoded once at absorb time (the
    // IVFADC layout — [[searchAdc]] ranks candidates from these ~3 bytes
    // without touching `v`). Codes depend only on the FIXED codebook, never
    // on the centroid set, so a recluster re-assigns cells but carries codes.
    // `rpq` = the same codebook over the RESIDUAL v − centroid (the FAISS
    // IndexIVFPQ default, served by [[searchRadc]]) — centroid-DEPENDENT, so
    // a recluster must re-encode it (and does).
    val cb = currentPqCodebook(spark, indexPath)
    val cbRaw = currentPqCodebookRaw(spark, indexPath)
    SimilarityOps.withPqCodes(
        withCentroidAssignment(withNorm(embeddings, "vec_id", "v", "nn"), "v", cents),
        "v", "pq", cbRaw)
      .withColumn("r", SimilarityOps.residualCol("v", "centroid_id", cents))
      .select(col("vec_id"), col("v"), col("nn"), col("pq"),
        SimilarityOps.pqCodeCol("r", cb).as("rpq"), col("centroid_id"))
      .write.mode("overwrite")
      .partitionBy("centroid_id")
      .parquet(s"$indexPath/batch=$batchId")
    // Close the check-then-act window (r8 advisory): the lease was absent at
    // entry, but a recluster acquiring it DURING our write job would swap the
    // index under a segment it never saw — that segment would survive the
    // snapshot with stale cell ids. Re-verify after the write; if a fresh
    // lease appeared, our segment must not become live: delete it and fail
    // (a streaming absorb's micro-batch fails and replays cleanly).
    if (checkLease) leaseInfo(spark, indexPath).foreach { case (fs, _, mtime) =>
      if (System.currentTimeMillis() - mtime < ReclusterLeaseTtlMs) {
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/batch=$batchId"), true)
        throw new IllegalStateException(
          s"recluster acquired $indexPath while batch=$batchId was being written: " +
            "the segment was assigned under the outgoing centroid set and has been " +
            "deleted; retry after the recluster completes")
      }
    }
    // Codebook stability re-check (r10 advisory): a codebook install
    // ([[materialize]] with a trained set) or retrain
    // ([[recluster]](retrainCodebook = true)) that completed entirely within
    // our write window leaves this segment encoded under the OUTGOING
    // codebook while the index manifest claims the new one — stored codes
    // and query LUTs would silently disagree. Same remedy as the centroid
    // race: the segment must not become live.
    if (pqManifestStamp(spark, indexPath, excludeBatch = Some(batchId)) != cbStampAtEntry ||
      pqRawManifestStamp(spark, indexPath, excludeBatch = Some(batchId)) != cbRawStampAtEntry) {
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/batch=$batchId"), true)
      throw new IllegalStateException(
        s"a PQ codebook was installed on $indexPath while batch=$batchId was being " +
          "absorbed: the segment was encoded under the outgoing codebook and has " +
          "been deleted; retry against the re-coded index")
    }
    // recorded after the data so a half-written segment never becomes the
    // centroid source of truth; identical to every live segment's set anyway.
    // The fit-time residual baseline rides along unchanged: absorbing a batch
    // does not re-fit, so the denominator of driftRatio must not move.
    writeSegMeta(spark, s"$indexPath/batch=$batchId", CentroidsFile, serializeCents(cents))
    baseline.foreach(r =>
      writeSegMeta(spark, s"$indexPath/batch=$batchId", ResidualFile, r.toString))
    // the governing codebook manifests ride along too (newest-segment
    // precedence — see [[currentPqCodebook]]): a retrained codebook committed
    // atomically as segment meta stays authoritative through later absorbs
    cbStampAtEntry.foreach(text =>
      writeSegMeta(spark, s"$indexPath/batch=$batchId", PqCodebookFile, text))
    cbRawStampAtEntry.foreach(text =>
      writeSegMeta(spark, s"$indexPath/batch=$batchId", PqCodebookRawFile, text))
    // schema-generation marker (r10 advisory): this segment's parquet files
    // carry the pq/rpq code columns, so a search may skip the all-footers
    // schema merge when EVERY live segment carries the marker
    writeSegMeta(spark, s"$indexPath/batch=$batchId", CodedMeta, "pq,rpq")
    invalidateMetaCaches(indexPath)
    // Final verification (r9 advisory): the lease re-check above cannot see
    // a recluster that acquired AND released entirely within our write
    // window — its compacted segment carries the NEW centroid set while our
    // (possibly newer-numbered) segment carries the OLD one, silently
    // reverting the recluster for every subsequent reader. So after OUR
    // manifest is down, re-read the newest manifest among all OTHER
    // segments and compare it to the set we assigned under; on mismatch our
    // segment must not stay live: delete it and fail (a streaming absorb's
    // micro-batch replays cleanly against the post-recluster index).
    val liveCents = newestMeta(
      spark, indexPath, CentroidsFile, asOf = None, excludeBatch = Some(batchId))
      .map(parseCents)
      .getOrElse(SimilarityOps.centroids)
    val agree = liveCents.size == cents.size &&
      liveCents.zip(cents).forall { case (a, b) => a.sameElements(b) }
    if (!agree) {
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/batch=$batchId"), true)
      throw new IllegalStateException(
        s"a recluster swapped $indexPath's centroid set while batch=$batchId was " +
          "being absorbed: the segment was assigned under the outgoing set and has " +
          "been deleted; retry against the re-fit index")
    }
  }

  def read(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.option("basePath", indexPath).parquet(indexPath).drop("batch")

  /** The distinct `centroid_id` partitions a query batch's nprobe schedule
    * touches — what dynamic partition pruning bounds every search's scans
    * to. Exposed for capacity accounting (the bench derives per-mode scan
    * bytes from these cells' parquet column-chunk metadata) and for
    * operators sizing cache/locality by probe footprint.
    */
  def probedCells(
      spark: SparkSession, indexPath: String, queries: DataFrame, nprobe: Int,
      asOf: Option[Long] = None): Seq[Int] = {
    VectorFunctions.register(spark)
    probeCells(withNorm(queries, "qid", "qv", "qn"), nprobe,
      currentCentroids(spark, indexPath, asOf))
      .select("probe").distinct().collect().map(_.getInt(0)).sorted.toSeq
  }

  /** Number of (query, stored-row) CANDIDATE pairs a batch's probe schedule
    * evaluates — Σ over queries of their probed cells' populations, i.e. the
    * per-batch compute cost every search mode pays before ranking (float
    * dots, ADC lookups alike). The capacity statistic that shows what cell
    * BALANCE buys: [[probedCells]] bounds the bytes a batch reads (distinct
    * cells), this bounds the work — a hot cell inflates it for every query
    * probing it, and a [[maintainCellBudget]] re-fit shrinks it at equal
    * nprobe.
    */
  def candidateRows(
      spark: SparkSession, indexPath: String, queries: DataFrame, nprobe: Int,
      asOf: Option[Long] = None): Long = {
    VectorFunctions.register(spark)
    val probes = probeCells(withNorm(queries, "qid", "qv", "qn"), nprobe,
      currentCentroids(spark, indexPath, asOf))
    indexFrame(spark, indexPath, asOf, excludeSegment = None)
      .join(broadcast(probes.select("qid", "probe")), col("probe") === col("centroid_id"))
      .count()
  }

  /** Snapshot read — the index exactly as it stood after `maxBatch` was
    * absorbed ([[graft.sources.Segments.readAsOf]] contract: live ids are
    * valid snapshot points; compaction collapses older ones, and a collapsed
    * request fails loudly). NOTE a [[recluster]] rewrites every segment into
    * one, so it — like compaction — coarsens snapshot history.
    */
  def readAsOf(spark: SparkSession, indexPath: String, maxBatch: Long): DataFrame =
    graft.sources.Segments.readAsOf(spark, indexPath, maxBatch)

  // ---------------------------------------------------------------------------
  // Drift detection — when is a recluster worth its full-index rewrite?
  // ---------------------------------------------------------------------------

  /** The deterministic md5 sample every fit/drift statistic runs on (same
    * rule as [[recluster]]'s Lloyd sample): keyed on vec_id, so the sample is
    * stable across runs and engines, and grows with the corpus.
    */
  private def sampled(df: DataFrame, samplePpm: Long): DataFrame =
    if (samplePpm >= 1000000L) df
    else df.filter(
      expr(s"conv(substr(md5(cast(vec_id AS STRING)), 1, 6), 16, 10) % 1000000 < $samplePpm"))

  /** Mean squared distance of stored vectors to their assigned centroid —
    * the scalar that quantifies how well the current centroid set fits the
    * corpus the index has grown into. One distributed aggregate over the
    * (sampled) index; sums pass through DECIMAL so the statistic is
    * bit-stable across partitionings.
    */
  def meanResidual(
      spark: SparkSession, indexPath: String, samplePpm: Long = 1000000L): Double =
    residualUnder(spark, read(spark, indexPath), currentCentroids(spark, indexPath), samplePpm)

  private def residualUnder(
      spark: SparkSession, index: DataFrame,
      cents: IndexedSeq[Array[Double]], samplePpm: Long): Double = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    VectorFunctions.register(spark)
    // nn (|v|²) is stored at index time; least-of-cells gives |c|²−2v·c of
    // the ASSIGNED centroid, so nn + dmin is the true squared distance
    val row = withCentroidAssignment(
      sampled(index.select("vec_id", "v", "nn"), samplePpm),
      "v", cents, keepDistance = Some("dmin"))
      .select((col("nn") + col("dmin")).as("r2"))
      .agg(
        sum(col("r2").cast(DecimalType(28, 6))).cast(DoubleType).as("s"),
        count(lit(1)).as("n"))
      .head()
    require(row.getLong(1) > 0, "empty index (or empty sample): no residual to measure")
    row.getDouble(0) / row.getLong(1)
  }

  /** The residual recorded when the current centroid set was fit, if any. */
  def baselineResidual(spark: SparkSession, indexPath: String): Option[Double] =
    newestMeta(spark, indexPath, ResidualFile, asOf = None).map(_.trim.toDouble)

  /** Measure the current residual and record it as the drift baseline in the
    * newest segment (from where [[appendBatch]] carries it forward).
    * [[materialize]] and [[recluster]] call this at fit time; call it
    * manually only after attaching to an index built by an older engine
    * generation that never recorded one.
    */
  def recordBaseline(
      spark: SparkSession, indexPath: String, samplePpm: Long = 1000000L): Double = {
    val r = meanResidual(spark, indexPath, samplePpm)
    val newest = graft.sources.Segments.segmentIds(spark, indexPath).max
    writeSegMeta(spark, s"$indexPath/batch=$newest", ResidualFile, r.toString)
    r
  }

  /** Current mean residual over the fit-time baseline. ≈ 1 right after a
    * fit; grows as absorbed batches drift away from the centroid set (the
    * drifted mass sits far from every cell, degrading both recall and the
    * evenness that partition pruning relies on). A ratio ≥ ~1.5 is the usual
    * signal to [[recluster]]; [[maintainIfDrifted]] wires that policy.
    */
  def driftRatio(
      spark: SparkSession, indexPath: String, samplePpm: Long = 1000000L): Double = {
    val base = baselineResidual(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"no fit-time residual recorded under $indexPath — call recordBaseline " +
          "(indexes materialized by this engine record one automatically)"))
    meanResidual(spark, indexPath, samplePpm) / base
  }

  /** The maintenance policy: recluster iff the corpus drifted past
    * `threshold`. Cheap when healthy (one sampled aggregate); the
    * full-index rewrite runs only when the fit genuinely degraded.
    *
    * @return the measured drift ratio and whether a recluster ran.
    */
  def maintainIfDrifted(
      spark: SparkSession,
      indexPath: String,
      threshold: Double = 1.5,
      maxIter: Int = 10,
      samplePpm: Long = 1000000L): (Double, Boolean) = {
    val ratio = driftRatio(spark, indexPath, samplePpm)
    if (ratio >= threshold) {
      recluster(spark, indexPath, maxIter = maxIter, samplePpm = samplePpm)
      (ratio, true)
    } else (ratio, false)
  }

  /** Bound the segment count accreted by incremental absorbs — same
    * crash-safe protocol as the rollup's compactor, repartitioned so each
    * cell directory holds one file per run.
    *
    * The compacted segment carries the index's manifests as its meta: the
    * generic compactor knows nothing of [[CentroidsFile]]/[[ResidualFile]]/
    * [[PqCodebookFile]], so without the carry a full compaction
    * (`protectLatest = false`) deleted every segment holding them and the
    * index silently reverted to the DEFAULT centroid set — stored
    * `centroid_id` assignments under a re-fit set, probes under the default
    * (r11 self-review finding, spec-pinned). The [[CodedMeta]] marker is
    * carried only when every source was marked: the rewrite merges schemas,
    * so its output has the code columns iff some source did — all-marked is
    * the conservative witness (plain compaction never re-encodes; legacy
    * null codes stay null, as pinned).
    */
  def compactSegments(
      spark: SparkSession, indexPath: String, protectLatest: Boolean = true): Int = {
    // the manifest read is a BY-NAME argument, evaluated inside the
    // compaction lease AFTER the copy: read eagerly here, a recluster
    // committing new manifests between this read and the promote would be
    // silently reverted by the stale stamp (r11 review finding) — under the
    // lease, a concurrent recluster's own compact fails fast instead
    def meta =
      Map(CentroidsFile -> serializeCents(currentCentroids(spark, indexPath))) ++
        baselineResidual(spark, indexPath).map(ResidualFile -> _.toString) ++
        pqManifestStamp(spark, indexPath).map(PqCodebookFile -> _) ++
        pqRawManifestStamp(spark, indexPath).map(PqCodebookRawFile -> _) ++
        (if (allSegmentsCoded(spark, indexPath)) Some(CodedMeta -> "pq,rpq") else None)
    val n = graft.sources.Segments.compact(
      spark, indexPath, Seq("centroid_id"), protectLatest, meta = meta)
    invalidateMetaCaches(indexPath)
    n
  }

  /** Segment ids the streaming absorber writes under (see
    * [[graft.dedup.LshIndex.StreamingSegmentBase]] — same discipline).
    */
  val StreamingSegmentBase = 1000000000L

  /** Streaming semantic search over a growing corpus: every micro-batch of
    * embeddings is probed against the stored index for its cosine top-k
    * (written to `neighborsOut/batch=<segment>`) and then absorbed as index
    * segment `StreamingSegmentBase + batchId`. Probe-before-absorb plus
    * own-segment exclusion keeps checkpoint replays deterministic.
    *
    * `driftMetricsOut` (optional) emits one `(segment, drift_ratio)` row per
    * absorbed batch — the [[driftRatio]] statistic measured AFTER the absorb,
    * written replay-idempotently to `driftMetricsOut/batch=<segment>`. The
    * stream itself cannot recluster (the rewrite requires a quiesced index),
    * so this is the signal an operator watches to decide when to stop the
    * stream and run [[maintainIfDrifted]]. A stream bootstrapping an EMPTY
    * index records its first batch's residual as the baseline ("the corpus
    * as first fit"); an index built by [[materialize]]/[[recluster]] already
    * carries one.
    *
    * `probe` selects the neighbor-search plan each batch runs: `"float"`
    * (exact dots over probed cells — [[search]]), `"adc"` ([[searchAdc]]) or
    * `"radc"` ([[searchRadc]]) — the ADC modes are what a corpus-scale
    * stream actually serves with, since the probe cost is paid EVERY
    * micro-batch and the code-only scan is the one that stays
    * memory-bandwidth-flat as the absorbed index grows.
    *
    * `cellBudget` (optional) turns [[maintainCellBudget]] into an AUTOMATIC
    * governed policy (VERDICT r13 #2 — the stream previously published
    * occupancy skew per batch but nothing ever acted on it): after each
    * absorb, if the largest cell exceeds the budget, the grow-K re-fit runs
    * RIGHT THERE, between this batch's absorb and the next trigger — the one
    * point in a single-writer stream where the index is quiesced by
    * construction, so the recluster lease it takes can never collide with
    * this stream's own absorbs. The breach CHECK is one grouped count per
    * batch (the [[cellStats]] scan — same order of cost as the drift metric
    * this stream already publishes); a healthy index pays nothing else and
    * is NEVER rewritten. `maintainCooldownBatches` bounds rewrite frequency
    * when mass is indivisible (identical vectors breach forever; the
    * no-progress skip stops the rewrites once K stops growing, and the
    * cooldown spaces the doubling attempts before that). Each re-fit that
    * actually runs emits a replay-idempotent ledger row to
    * `maintainLedgerOut/batch=<segment>` — (segment, max_cell_before,
    * k_before, k_after, target) — the audit trail an operator reads to see
    * what the policy did and why. A checkpoint-replayed batch re-checks and
    * finds the budget met (the re-fit already ran), so replays never
    * double-rewrite.
    *
    * `driftRefitThreshold` (optional) is the DRIFT sibling of `cellBudget`
    * — the second published signal made actionable: after each absorb, if
    * [[driftRatio]] is at/past the threshold, [[maintainIfDriftedRetrain]]
    * runs right there (re-fit + codebook retrain + whole-index re-encode,
    * one atomic commit under the recluster lease), emitting its own ledger
    * row to `driftLedgerOut/batch=<segment>` — (segment, drift_ratio,
    * threshold, k). Both policies share the cooldown state: any in-stream
    * whole-index rewrite spaces the next rewrite attempt, which is the
    * point of the cooldown. The check is one sampled aggregate per batch
    * (exactly what `driftMetricsOut` already pays); a healthy stream never
    * rewrites, and a replayed batch finds the drift healed and skips.
    */
  def streamingAbsorb(
      embStream: DataFrame, indexPath: String, neighborsOut: String, checkpoint: String,
      k: Int = 3, nprobe: Int = 2,
      driftMetricsOut: Option[String] = None, driftSamplePpm: Long = 1000000L,
      probe: String = "float",
      cellBudget: Option[Long] = None,
      maintainCooldownBatches: Int = 10,
      maintainLedgerOut: Option[String] = None,
      maintainMaxIter: Int = 5,
      maintainMaxK: Int = 4096,
      driftRefitThreshold: Option[Double] = None,
      driftLedgerOut: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val probeFn: (SparkSession, DataFrame, Long) => DataFrame = probe match {
      case "float" => (s, b, seg) => search(s, indexPath, b, k, nprobe, Some(seg))
      case "adc" => (s, b, seg) => searchAdc(s, indexPath, b, k, nprobe, excludeSegment = Some(seg))
      case "radc" => (s, b, seg) => searchRadc(s, indexPath, b, k, nprobe, excludeSegment = Some(seg))
      case other => throw new IllegalArgumentException(
        s"probe must be one of float/adc/radc, got '$other'")
    }
    embStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val segment = StreamingSegmentBase + batchId
        val out =
          if (hasSegments(spark, indexPath))
            probeFn(spark, batch, segment)
          else
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType))))
        out.write.mode("overwrite").parquet(s"$neighborsOut/batch=$segment")
        appendBatch(spark, indexPath, batch, segment)
        driftMetricsOut.foreach { metricsPath =>
          if (baselineResidual(spark, indexPath).isEmpty)
            recordBaseline(spark, indexPath, driftSamplePpm)
          val ratio = driftRatio(spark, indexPath, driftSamplePpm)
          // occupancy skew over the SAME md5 sample (max/mean is invariant
          // under uniform sampling) — the grow-K trip wire, like drift_ratio
          // is for [[maintainIfDrifted]]. With `cellBudget` unset the stream
          // only PUBLISHES the signal for an operator; with it set, the
          // policy block below acts on the breach itself (between triggers,
          // where this single-writer stream is quiesced — see the scaladoc)
          val occ = sampled(read(spark, indexPath).select("vec_id", "centroid_id"),
            driftSamplePpm)
            .groupBy("centroid_id").agg(count(lit(1)).as("n"))
            .agg(max(col("n")).cast("double").as("mx"), avg(col("n")).as("mean"))
            .head()
          val skew = occ.getDouble(0) / occ.getDouble(1)
          import spark.implicits._
          Seq((segment, ratio, skew))
            .toDF("segment", "drift_ratio", "occupancy_skew")
            .write.mode("overwrite").parquet(s"$metricsPath/batch=$segment")
        }
        def coolingDown: Boolean = {
          val lastRan = lastMaintainedBatch.get(indexPath)
          lastRan != null && batchId - lastRan.longValue() < maintainCooldownBatches
        }
        driftRefitThreshold.foreach { thr =>
          if (!coolingDown) {
            // a stream that bootstrapped an empty index has no fit-time
            // baseline yet — record one (the driftMetricsOut branch's rule)
            // so the ratio is measurable from the first absorbed batch
            if (baselineResidual(spark, indexPath).isEmpty)
              recordBaseline(spark, indexPath, driftSamplePpm)
            val kBefore = currentCentroids(spark, indexPath).size
            val (ratio, ran) = maintainIfDriftedRetrain(
              spark, indexPath, threshold = thr, samplePpm = driftSamplePpm)
            if (ran) {
              lastMaintainedBatch.put(indexPath, batchId)
              driftLedgerOut.foreach { ledgerPath =>
                import spark.implicits._
                Seq((segment, ratio, thr, kBefore))
                  .toDF("segment", "drift_ratio", "threshold", "k")
                  .write.mode("overwrite").parquet(s"$ledgerPath/batch=$segment")
              }
            }
          }
        }
        cellBudget.foreach { target =>
          if (!coolingDown) {
            val kBefore = currentCentroids(spark, indexPath).size
            val (maxCellBefore, ran) = maintainCellBudget(
              spark, indexPath, targetCellRows = target,
              maxIter = maintainMaxIter, maxK = maintainMaxK)
            if (ran) {
              lastMaintainedBatch.put(indexPath, batchId)
              val kAfter = currentCentroids(spark, indexPath).size
              maintainLedgerOut.foreach { ledgerPath =>
                import spark.implicits._
                Seq((segment, maxCellBefore, kBefore, kAfter, target))
                  .toDF("segment", "max_cell_before", "k_before", "k_after", "target_cell_rows")
                  .write.mode("overwrite").parquet(s"$ledgerPath/batch=$segment")
              }
            }
          }
        }
      }
  }

  /** Last batchId at which the in-stream grow-K policy actually re-fit, per
    * index path — the cooldown's driver-side state. Bounded (one entry per
    * index this JVM streams into); resetting on restart only costs one extra
    * breach CHECK, never a rewrite (a met budget always skips).
    */
  private val lastMaintainedBatch =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def hasSegments(spark: SparkSession, indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** Cosine top-k over the probed cells for a query batch (vec_id,
    * embedding): identical results to the one-shot
    * [[SimilarityOps.ivfTopKMultiProbe]] (same centroids, same tie-breaks —
    * until a [[recluster]] replaces the centroid set), but the corpus side
    * is the stored index — no re-assignment, no norm recomputation.
    *
    * Self-matches drop on `qid =!= vec_id` ALONE — not (segment, vec_id)
    * provenance — which is only correct under [[appendBatch]]'s global
    * vec_id uniqueness contract: a query whose id was ever absorbed matches
    * no stored row with that id, old or new. Re-emitting an id therefore
    * does not "update" a vector; it hides every stored copy from that id's
    * own queries while OTHER queries still see all copies.
    */
  def search(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      excludeSegment: Option[Long] = None,
      asOf: Option[Long] = None): DataFrame = {
    VectorFunctions.register(spark)
    // `asOf` pins BOTH the corpus rows and the centroid set (probes computed
    // under a later recluster's centroids would hit the wrong cells of the
    // snapshot) — so re-running a past search is bit-reproducible even after
    // the index grew or re-fit.
    val probes = probeCells(
      withNorm(queries, "qid", "qv", "qn"), nprobe, currentCentroids(spark, indexPath, asOf))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    indexFrame(spark, indexPath, asOf, excludeSegment)
      .join(broadcast(probes),
        col("probe") === col("centroid_id") && col("qid") =!= col("vec_id"))
      .withColumn("cos",
        SimilarityOps.dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"))
      .orderBy("qid", "rank")
  }

  /** The stored rows a search runs against: live index, `asOf` snapshot,
    * and/or own-segment exclusion (see [[streamingAbsorb]]'s probe-before-
    * absorb replay determinism).
    */
  /** `mergeSchema` (ADC paths only), because segments span ENGINE
    * GENERATIONS: a pre-PQ (or pre-residual-PQ) segment lacks the `pq`/`rpq`
    * column entirely, and the default single-footer schema inference would
    * make the column's presence a file-listing lottery — sampled from a
    * legacy file, the column VANISHES and even fully-coded segments read as
    * uncoded. Merged, the union schema always surfaces it, with nulls
    * exactly on legacy rows (which the ADC rankings order last — see
    * [[adcPoolRerank]]). The merge is a distributed all-footers job, so the
    * ADC callers only pay it when a LEGACY segment is actually live:
    * current-generation segments carry the [[CodedMeta]] marker, and
    * [[allSegmentsCoded]] (memoized per segment set) downgrades an all-coded
    * index to single-footer inference — any footer then has the columns.
    * The float [[search]] never merges: its columns (vec_id, v, nn,
    * centroid_id) exist in every generation.
    */
  private def indexFrame(
      spark: SparkSession, indexPath: String,
      asOf: Option[Long], excludeSegment: Option[Long],
      mergeSchema: Boolean = false): DataFrame = {
    asOf match {
      case Some(max) =>
        // snapshot reads are reproducibility pins, not the serving hot path —
        // uncached by design (their file set depends on the pin)
        val opts = if (mergeSchema) Map("mergeSchema" -> "true") else Map.empty[String, String]
        val snap = graft.sources.Segments.readAsOf(
          spark, indexPath, max, dropBatch = false, options = opts)
        excludeSegment.map(id => snap.filter(col("batch") =!= id)).getOrElse(snap)
          .drop("batch")
      case None =>
        val live = liveIndexRel(spark, indexPath, mergeSchema)
        excludeSegment.map(id => live.filter(col("batch") =!= id)).getOrElse(live)
          .drop("batch")
    }
  }

  /** An index NONE of whose segments carry `colName` (built entirely by an
    * older engine generation): surface the column as typed nulls so the ADC
    * paths degrade to "nothing ADC-rankable" instead of failing to resolve.
    */
  private def withOptionalCodes(index: DataFrame, colName: String): DataFrame =
    if (index.columns.contains(colName)) index
    else index.withColumn(colName, lit(null).cast("array<int>"))

  /** IVFADC search over the stored index — identical probe schedule to
    * [[search]], but the probed cells rank from their stored `pq` codes via
    * the broadcast per-query ADC LUT, and only the per-query top-`rerank`
    * survivors pay an exact full-width cosine. Same results as the one-shot
    * [[SimilarityOps.ivfAdcTopK]] when the index holds the embeddings corpus
    * (spec-pinned, like search ≡ ivfTopKMultiProbe) — under the default md5
    * codebook; an index whose [[PqCodebookFile]] manifest carries a trained
    * set encodes AND ranks under that set instead.
    *
    * Scale shape — why this is THE billion-scale serving plan: the candidate
    * scan selects only `(vec_id, pq, centroid_id)`, so Parquet column
    * pruning keeps the full float vectors out of the probe read entirely
    * (~3 code bytes vs 512 vector bytes per row, a ~100× byte reduction on
    * the dominant scan); the exact phase re-reads `v` for just
    * rerank × |queries| rows via a broadcast semi-join that ALSO carries
    * each survivor's cell, so dynamic partition pruning bounds that read to
    * the probed cells' segments. Memory bandwidth, not compute, bounds ANN
    * serving at 100 TB — this plan spends it only where ranking genuinely
    * needs it.
    */
  def searchAdc(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      rerank: Int = SimilarityOps.AdcRerank,
      excludeSegment: Option[Long] = None,
      asOf: Option[Long] = None,
      pushRerankIds: Boolean = false): DataFrame = {
    VectorFunctions.register(spark)
    val q = withNorm(queries, "qid", "qv", "qn")
    val index = withOptionalCodes(
      indexFrame(spark, indexPath, asOf, excludeSegment,
        mergeSchema = !allSegmentsCoded(spark, indexPath)), "pq")
    // the candidate phase runs over THIS index frame (indexOverride), not a
    // second indexFrame construction: a recluster completing between two
    // constructions would let the pool score the OLD generation's cell ids
    // while the rerank reads the new one — the (pcid, pcell) join would
    // silently miss re-fit cells. One frame, both phases, one generation.
    val adc = adcCandidates(spark, indexPath, queries, nprobe, excludeSegment, asOf,
      indexOverride = Some(index))
    if (pushRerankIds) adcPoolRerankPushed(spark, index, adc, q, k, rerank)
    else adcPoolRerank(index, adc, q, k, rerank)
  }

  /** The raw-code ADC CANDIDATE phase alone: codes-only scan → ONE broadcast
    * probe join (the LUT is a PROJECTION on the probe schedule — the
    * searchRadc shape; r12 verdict #5 measured that a separate
    * one-row-per-query LUT relation costs a second broadcast exchange and a
    * second hash join over every candidate row) → flat 8-lookup score.
    * Column pruning keeps `v` out of this scan entirely — this phase is the
    * part whose bytes shrink ~100× with the corpus; exposed separately so
    * the bench can decompose searchAdc's wall-clock: the exact rerank must
    * re-decode the probed cells' float vectors, which IS the float probe's
    * whole candidate scan while the index is page-cached, so locally
    * searchAdc's floor is float + this phase. `queries` is the raw
    * (vec_id, embedding) batch, like [[searchAdc]]'s.
    */
  private[graft] def adcCandidates(
      spark: SparkSession, indexPath: String, queries: DataFrame, nprobe: Int,
      excludeSegment: Option[Long] = None, asOf: Option[Long] = None,
      indexOverride: Option[DataFrame] = None): DataFrame = {
    VectorFunctions.register(spark)
    val q = withNorm(queries, "qid", "qv", "qn")
    val probes = probeCells(q, nprobe, currentCentroids(spark, indexPath, asOf))
    val index = indexOverride.getOrElse(withOptionalCodes(
      indexFrame(spark, indexPath, asOf, excludeSegment,
        mergeSchema = !allSegmentsCoded(spark, indexPath)), "pq"))
    val probeLut = probes.select(col("qid"), col("probe"),
      SimilarityOps.adcLutCol("qv", currentPqCodebookRaw(spark, indexPath)).as("lut"))
    index.select(col("vec_id"), col("pq"), col("centroid_id"))
      .join(broadcast(probeLut),
        col("probe") === col("centroid_id") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"), col("centroid_id").as("cell"),
        SimilarityOps.adcScore("pq", "lut").as("adc"))
  }

  /** Shared ADC tail: bound the pool, then exact-rerank it — the second and
    * third phases of [[searchAdc]]/[[searchRadc]].
    *
    * nulls LAST in the pool ranking: a segment absorbed by an engine
    * generation predating the code column carries it as null under schema
    * merge; asc alone would rank every such row ahead of all real candidates
    * and silently fill the rerank pool with unscored vectors. Last, they
    * degrade to "not ADC-rankable" instead (recluster re-encodes them
    * permanently).
    *
    * The pool keeps each survivor's CELL so the exact phase can join on the
    * partition column as well: without it the rerank scan reads every
    * segment's full-width vectors (a broadcast semi-join on vec_id alone
    * cannot prune partitions) — precisely the bytes ADC exists to avoid.
    * With it, dynamic partition pruning bounds the rerank read to the
    * probed cells, like the float [[search]]'s candidate scan.
    */
  private def adcPoolRerank(
      index: DataFrame, adc: DataFrame, q: DataFrame, k: Int, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy("qid").orderBy(asc_nulls_last("adc"), asc("cid"))
    val pool = adc
      .withColumn("prn", row_number().over(wAdc))
      .filter(col("prn") <= rerank)
      .select(col("qid").as("pqid"), col("cid").as("pcid"), col("cell").as("pcell"))
    // exact rerank: full vectors for ONLY the pooled candidates. Both the
    // pool and the query vectors ride INDEPENDENT tiny broadcasts (folding
    // them with a join was measured r13: the fold's own eager broadcast-join
    // job costs more than the second hash-join lookup saves, and carrying
    // qv through the pool window would inflate the candidate shuffle ~25×
    // at scale).
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    index.select(col("vec_id"), col("v"), col("nn"), col("centroid_id"))
      .join(broadcast(pool),
        col("vec_id") === col("pcid") && col("centroid_id") === col("pcell"))
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), col("qid") === col("pqid"))
      .withColumn("cos", SimilarityOps.dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("cid", col("pcid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  /** LATE-MATERIALIZATION variant of [[adcPoolRerank]] (VERDICT r13 #3): the
    * pool is collected (bounded driver state — rerank × |queries| id
    * triples, the same class as the probe schedules [[probedCells]] already
    * collects) and pushed into the rerank scan as STATIC `IN` filters on
    * (centroid_id, vec_id). The plain rerank's broadcast semi-join prunes
    * partitions via DPP but still DECODES every probed cell's float vectors
    * before the join filters rows; pushed, the partition pruning is static
    * and the vec_id IN set reaches the parquet reader as a row-group/page
    * filter, so only pages actually holding pooled candidates decode. The
    * trade is an extra Spark job (the pool collect materializes the
    * candidate phase) — whether the byte/decode saving beats the extra job
    * is measured, not assumed: the bench publishes both (`adc_vs_float` vs
    * `adc_pushed_vs_float`). Results are bit-identical to the plain tail
    * (the IN filters are a superset condition of the join; spec-pinned).
    */
  /** Pushed-pool budget for [[adcPoolRerankPushed]] (ADVICE r14): the pool
    * is rerank × |queries| rows, and unlike [[probedCells]] nothing upstream
    * bounds |queries| — an oversized pool would inflate the plan with
    * thousands of static `In(vec_id, …)` literals (planning cost is O(ids),
    * paid before a single row moves) and grow the driver collect without
    * bound. Past the cap the call falls back to [[adcPoolRerank]]'s plain
    * DPP tail — bit-identical results, no pushed page filter — so the
    * opt-in flag degrades to the measured-parity path instead of degrading
    * planning.
    */
  private[graft] val PushedPoolIdCap = 8192

  private def adcPoolRerankPushed(
      spark: SparkSession, index: DataFrame, adc: DataFrame, q: DataFrame,
      k: Int, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy("qid").orderBy(asc_nulls_last("adc"), asc("cid"))
    val poolDf = adc
      .withColumn("prn", row_number().over(wAdc))
      .filter(col("prn") <= rerank)
      .select(col("qid"), col("cid"), col("cell"))
    // the limit bounds the collect itself: an over-budget pool surfaces as
    // cap+1 rows, never as an unbounded driver array
    val poolRows = poolDf.limit(PushedPoolIdCap + 1).collect()
    if (poolRows.length > PushedPoolIdCap)
      return adcPoolRerank(index, adc, q, k, rerank)
    import spark.implicits._
    val pool = broadcast(
      poolRows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
        .toDF("pqid", "pcid", "pcell"))
    val ids = poolRows.map(_.getLong(1)).distinct.sorted.toSeq
    val cells = poolRows.map(_.getInt(2)).distinct.sorted.toSeq
    // an empty pool (all-legacy codes, or an empty query batch) has nothing
    // to rerank: a zero-arg isin would push a degenerate In() — make the
    // empty result explicit instead
    val poolFilter =
      if (poolRows.isEmpty) lit(false)
      else col("centroid_id").isin(cells: _*) && col("vec_id").isin(ids: _*)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    index.select(col("vec_id"), col("v"), col("nn"), col("centroid_id"))
      .filter(poolFilter)
      .join(pool,
        col("vec_id") === col("pcid") && col("centroid_id") === col("pcell"))
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), col("qid") === col("pqid"))
      .withColumn("cos", SimilarityOps.dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("cid", col("pcid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  /** Residual-IVFADC search over the stored index: ranks probed cells from
    * their stored RESIDUAL codes (`rpq`) via the per-(query, cell) LUT — the
    * FAISS-default IndexIVFPQ encoding, where a cell's codes quantize
    * v − centroid and the ADC estimate carries the |q − c|² constant so
    * candidates from different probed cells compete correctly. Same plan
    * shape and byte economics as [[searchAdc]]; same results as the one-shot
    * [[SimilarityOps.ivfRadcTopK]] under the index's current centroid set
    * (spec-pinned, including after a recluster re-fits that set — residual
    * codes are centroid-DEPENDENT, so [[recluster]] re-encodes them, unlike
    * the raw `pq` codes it carries through).
    */
  def searchRadc(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      rerank: Int = SimilarityOps.AdcRerank,
      excludeSegment: Option[Long] = None,
      asOf: Option[Long] = None,
      pushRerankIds: Boolean = false): DataFrame = {
    VectorFunctions.register(spark)
    val cents = currentCentroids(spark, indexPath, asOf)
    val q = withNorm(queries, "qid", "qv", "qn")
    val plut = SimilarityOps.radcLutArr(probeCells(q, nprobe, cents), cents,
      currentPqCodebook(spark, indexPath))
    val index = withOptionalCodes(
      indexFrame(spark, indexPath, asOf, excludeSegment,
        mergeSchema = !allSegmentsCoded(spark, indexPath)), "rpq")
    // one broadcast join does probe AND LUT delivery: the residual LUT row is
    // keyed by the same (qid, cell) pair the probe join matches on
    val adc = index.select(col("vec_id"), col("rpq"), col("centroid_id"))
      .join(broadcast(plut),
        col("probe") === col("centroid_id") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"), col("centroid_id").as("cell"),
        (SimilarityOps.adcScore("rpq", "lut") + col("qc2")).as("adc"))
    if (pushRerankIds) adcPoolRerankPushed(spark, index, adc, q, k, rerank)
    else adcPoolRerank(index, adc, q, k, rerank)
  }

  /** Re-fit the centroid set to the corpus the index has GROWN INTO and
    * atomically re-assign every stored vector — the drift/growth path a
    * frozen `install`-time clustering lacks (a corpus that shifts
    * distribution degrades recall and piles everything into a few hot
    * cells, destroying the partition pruning that makes [[search]] cheap).
    *
    * Lloyd iterations run over a deterministic md5-sampled fraction of the
    * stored vectors (`samplePpm` parts-per-million): assignment is the same
    * distributed argmin [[appendBatch]] uses; the update step reduces to
    * per-(cell, dimension) decimal sums, and only the K×dim mean matrix —
    * model state, not data — reaches the driver. Empty cells keep their
    * previous centroid. Iteration stops at `maxIter` or when no centroid
    * moves more than `tol` (L2).
    *
    * The swap rides [[graft.sources.Segments.compact]]'s crash-safe promote
    * protocol with a transform: every segment is read under the lease,
    * re-assigned under the new centroids, and committed as ONE segment
    * whose [[CentroidsFile]] manifest carries the new set — so a crash at
    * any point leaves either the complete old index or the complete new
    * one, never a mix, and recovery finishes the commit. Quiescence is
    * ENFORCED, not assumed: the run holds [[ReclusterLease]] end-to-end and
    * [[appendBatch]] fails loudly under it — a batch assigned under the old
    * set that landed mid-recluster would survive the snapshot untouched but
    * carry stale cell ids forever (the r7 advisory gap, closed).
    *
    * @return number of Lloyd iterations run.
    */
  /** Acquire the [[ReclusterLease]], heartbeat it from a daemon thread for
    * the whole `body`, and release it on the way out — the mutual-exclusion
    * shell [[recluster]] and [[materialize]]'s codebook install share.
    * Exclusive-create wins the race between two holders; a stale lease
    * (crashed run — the compact protocol left the data whole) is reclaimed
    * by delete + retry.
    */
  private def withReclusterLease[T](spark: SparkSession, indexPath: String)(
      body: org.apache.hadoop.fs.FileSystem => T): T = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lease = new org.apache.hadoop.fs.Path(root, ReclusterLease)
    def tryAcquire(): Boolean =
      try { val out = fs.create(lease, false); out.close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val fresh = leaseInfo(spark, indexPath)
        .exists { case (_, _, m) => System.currentTimeMillis() - m < ReclusterLeaseTtlMs }
      if (fresh)
        throw new IllegalStateException(s"another recluster already holds $indexPath")
      fs.delete(lease, false)
      require(tryAcquire(), s"lost the recluster lease race on $indexPath")
    }
    // the exclusive-create above wins the acquire race; the payload carries
    // the liveness timestamp from here on (see [[leaseInfo]])
    writeLeasePayload(fs, lease)
    // Heartbeat from a DAEMON THREAD for the whole run — Lloyd iterations,
    // the residual measurement, AND Segments.compact (r8 advisory: a
    // per-iteration heartbeat left the compact uncovered, so a swap longer
    // than the TTL — plausible at full-index-rewrite scale — let concurrent
    // absorbs classify the lease as crashed and land stale-cell segments
    // mid-swap). Liveness, not phase structure, keeps the lease fresh. The
    // beat REWRITES the payload (object-store-sound — see [[leaseInfo]]);
    // repeated failures are logged and counted, never silently swallowed
    // forever: a heartbeat that cannot write is a lease about to be
    // misclassified as crashed, which an operator must see.
    val beatFailures = new java.util.concurrent.atomic.AtomicLong(0)
    val beatStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      val log = org.slf4j.LoggerFactory.getLogger(IvfIndex.getClass)
      val interval = math.max(50L, ReclusterLeaseTtlMs / 4)
      try while (!beatStop.get && !Thread.interrupted()) {
        Thread.sleep(interval)
        // re-check AFTER the sleep: a write starting past the stop signal
        // would race the release's delete and resurrect the lease
        if (!beatStop.get) {
          try {
            writeLeasePayload(fs, lease)
            beatFailures.set(0)
          } catch {
            case e: java.io.IOException =>
              val n = beatFailures.incrementAndGet()
              log.warn(s"ivf recluster lease heartbeat failed $n time(s) on " +
                s"$lease — concurrent absorbs will misclassify this run as " +
                s"crashed after ${ReclusterLeaseTtlMs} ms: $e")
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"ivf-recluster-heartbeat-${root.getName}")
    beat.setDaemon(true)
    beat.start()
    try body(fs)
    finally {
      // Stop, then JOIN UNBOUNDED before deleting: a beat mid-write at
      // release time would otherwise re-create the lease AFTER the delete
      // (writeLeasePayload is an overwrite-create), leaving an orphan that
      // reads live and blocks every absorb/recluster for a full TTL. The
      // join is bounded in practice by one in-flight payload write (the
      // loop exits at the next flag check) — a TTL-derived cap is NOT safe:
      // with a short TTL a contended write outlives the cap and the
      // resurrect race reappears.
      beatStop.set(true)
      beat.interrupt()
      beat.join()
      fs.delete(lease, false)
    }
  }

  /** With `retrainCodebook = true`, the rewrite ALSO re-fits BOTH PQ
    * codebooks (`codebookRounds` Lloyd rounds per subspace over the same
    * deterministic sample: residual subvectors under the FITTED centroid
    * set — the FAISS IndexIVFPQ train recipe — for `rpq`, and raw
    * subvectors for `pq`, whose codewords must live at raw-vector scale)
    * and re-encodes both code columns under them; the new codebook
    * manifests commit as meta of the same compacted segment as the
    * re-encoded rows, so a crash anywhere leaves codes and manifests
    * agreeing (the governed drift→retrain path the r10 verdict asked for —
    * "retrain = rebuild" expressed as one atomic whole-index rewrite under
    * the lease; searches during the rebuild serve the old generation until
    * the promote). `maxIter = 0` keeps the centroid set and retrains the
    * codebooks alone.
    */
  def recluster(
      spark: SparkSession,
      indexPath: String,
      maxIter: Int = 10,
      tol: Double = 1e-9,
      samplePpm: Long = 1000000L,
      retrainCodebook: Boolean = false,
      codebookRounds: Int = 2,
      k: Option[Int] = None): Int = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    VectorFunctions.register(spark)
    // `k` re-sizes the centroid set: Lloyd re-inits from the deterministic
    // md5 seed at the new K instead of iterating the current set — the
    // GROW-K path (cells must stay O(n/K) as the corpus grows; a fixed K
    // eventually concentrates mass into hot cells, degrading partition
    // pruning and feeding the within-cell quadratic operators). Everything
    // downstream is size-agnostic: assignments, probes and the rpq
    // re-encode all run over the FITTED set, and raw pq codes carry (they
    // never depended on centroids). Growing K without iterations would
    // assign under a raw seed — require at least one Lloyd round.
    k.foreach { n =>
      require(maxIter >= 1,
        s"recluster(k = Some($n)) re-initializes centroids from the seed — " +
          "run at least one Lloyd iteration (maxIter >= 1) so cells reflect " +
          "the corpus, not the raw md5 init")
    }
    // Hold the recluster lease for the WHOLE run: concurrent absorbs fail
    // loudly ([[assertNotReclustering]]) instead of landing segments whose
    // cell ids the swap would silently invalidate.
    withReclusterLease(spark, indexPath) { _ =>
    var cents = k.map(SimilarityOps.seedCentroids)
      .getOrElse(currentCentroids(spark, indexPath))
    // md5-keyed sample: deterministic across runs and engines
    val sample = sampled(read(spark, indexPath).select("vec_id", "v"), samplePpm).cache()
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val stats = SimilarityOps.withCentroidAssignment(sample, "v", cents)
        .select(col("centroid_id").cast("int").as("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(
          sum(col("x").cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
          count(lit(1)).as("n"))
        .collect() // K×dim mean matrix — model state, bounded by cents.size × Dim
      val next = cents.indices.map { cell =>
        val rows = stats.filter(_.getInt(0) == cell)
        if (rows.isEmpty) cents(cell)
        else rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toArray
      }
      moved = cents.zip(next).exists { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum) > tol
      }
      cents = next
      iter += 1
    }
    val fitted = cents
    // Codebook retrain (under the same lease, over the same deterministic
    // sample): per-subspace Lloyd on residuals under the FITTED set — the
    // codewords must quantize the residual distribution the re-encoded index
    // will actually store.
    // BOTH codebooks train over the same sample: residual codewords serve
    // rpq/searchRadc; RAW-subvector codewords serve pq/searchAdc (a residual
    // codebook's codewords sit centered near 0 — encoding raw vectors under
    // them carries almost no ranking signal, r11 review finding)
    val newCodebook: Option[IndexedSeq[IndexedSeq[Array[Double]]]] =
      if (!retrainCodebook) None
      else Some(SimilarityOps.trainOnSubvectors(
        SimilarityOps.pqSubvectorsOf(sample, onResiduals = true, fitted), codebookRounds))
    val newCodebookRaw: Option[IndexedSeq[IndexedSeq[Array[Double]]]] =
      if (!retrainCodebook) None
      else Some(SimilarityOps.trainOnSubvectors(
        SimilarityOps.pqSubvectorsOf(sample, onResiduals = false, fitted), codebookRounds))
    sample.unpersist()
    // the post-fit residual baseline commits atomically with the swap: rows
    // are identical before and after the rewrite, so measuring against the
    // OLD segments under the FITTED centroids equals the post-commit value
    val postFitResidual =
      residualUnder(spark, read(spark, indexPath), fitted, samplePpm)
    // the codebook manifests the compacted segment must carry: the freshly
    // trained sets, else the currently governing ones (which may live as
    // meta of a segment this compact is about to DELETE — without the
    // carry, a recluster would silently revert a past retrain)
    val cbManifest = newCodebook.map(cb => serializeCents(cb.flatten))
      .orElse(pqManifestStamp(spark, indexPath))
    val cbRawManifest = newCodebookRaw.map(cb => serializeCents(cb.flatten))
      .orElse(pqRawManifestStamp(spark, indexPath))
    graft.sources.Segments.compact(
      spark, indexPath, Seq("centroid_id"), protectLatest = false,
      transform = { df =>
        // PQ codes are centroid-independent — carry them through the
        // re-assignment; re-encode segments written by a pre-PQ engine
        // generation (codes derive from v + the fixed codebook alone, so
        // the recomputation is exact). A MIXED index surfaces the column
        // with nulls on legacy rows under schema merge — coalesce encodes
        // exactly those, so the compacted index is fully coded either way.
        // A RETRAINED codebook invalidates every stored code: pq is then
        // re-encoded unconditionally under the RAW-trained set
        // (carry-through is only exact under the SAME codeword set).
        // RESIDUAL codes are centroid-dependent: every row's rpq is
        // unconditionally re-encoded under the fitted set (carrying them —
        // the pq treatment — would leave [[searchRadc]] ranking with LUTs
        // built from centroids the codes were never relative to).
        val cb = newCodebook.getOrElse(currentPqCodebook(spark, indexPath))
        val cbRaw = newCodebookRaw.getOrElse(currentPqCodebookRaw(spark, indexPath))
        val withPq = newCodebookRaw match {
          case Some(_) =>
            SimilarityOps.withPqCodes(df.drop("pq"), "v", "pq", cbRaw)
          case None =>
            if (df.columns.contains("pq"))
              df.withColumn("pq", coalesce(col("pq"), SimilarityOps.pqCodeCol("v", cbRaw)))
            else SimilarityOps.withPqCodes(df, "v", "pq", cbRaw)
        }
        withCentroidAssignment(withPq.drop("centroid_id").drop("rpq"), "v", fitted)
          .withColumn("r", SimilarityOps.residualCol("v", "centroid_id", fitted))
          .select(col("vec_id"), col("v"), col("nn"), col("pq"),
            SimilarityOps.pqCodeCol("r", cb).as("rpq"), col("centroid_id"))
      },
      meta = Map(
        CentroidsFile -> serializeCents(fitted),
        ResidualFile -> postFitResidual.toString,
        // the transform re-encodes every row, so the rewritten segment is
        // fully coded regardless of its sources' generations
        CodedMeta -> "pq,rpq") ++
        cbManifest.map(PqCodebookFile -> _) ++
        cbRawManifest.map(PqCodebookRawFile -> _),
      force = true)
    invalidateMetaCaches(indexPath)
    iter
    }
  }

  /** [[maintainIfDrifted]] with the codebook included in the rebuild: when
    * the drift ratio trips, the recluster re-fits centroids AND retrains the
    * PQ codebook, re-encoding the whole index under both in one atomic
    * commit — the governed path from "drift tripped" to "trained serving
    * state restored" (r10 verdict #6). Cheap when healthy (one sampled
    * aggregate, no rewrite).
    */
  def maintainIfDriftedRetrain(
      spark: SparkSession,
      indexPath: String,
      threshold: Double = 1.5,
      maxIter: Int = 10,
      samplePpm: Long = 1000000L,
      codebookRounds: Int = 2): (Double, Boolean) = {
    val ratio = driftRatio(spark, indexPath, samplePpm)
    if (ratio >= threshold) {
      recluster(spark, indexPath, maxIter = maxIter, samplePpm = samplePpm,
        retrainCodebook = true, codebookRounds = codebookRounds)
      (ratio, true)
    } else (ratio, false)
  }

  /** (largest cell's row count, total rows) — one grouped count over the
    * index, the statistic [[maintainCellBudget]] trips on. The per-cell
    * population is also what partition pruning's effectiveness rides on:
    * a probe of the hottest cell costs maxCell rows no matter how many
    * cells exist.
    */
  def cellStats(spark: SparkSession, indexPath: String): (Long, Long) = {
    val row = read(spark, indexPath)
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("total"))
      .head()
    // an empty-but-materialized index aggregates to one all-null row; fail
    // with a diagnostic instead of a bare NPE (the residualUnder discipline)
    require(!row.isNullAt(0),
      s"cellStats: index at $indexPath holds zero rows — nothing to maintain")
    (row.getLong(0), row.getLong(1))
  }

  /** Max-over-mean occupancy across OCCUPIED cells — ≈ 1 when balanced; a
    * large value means probe cost (and the within-cell quadratic operators'
    * task sizes) concentrate in few cells. The health signal an operator
    * watches alongside [[driftRatio]]; [[graft.dedup.FingerprintIndex]]
    * publishes the same shape for its hamming bands.
    */
  def occupancySkew(spark: SparkSession, indexPath: String): Double = {
    val row = read(spark, indexPath)
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), avg(col("n")).as("mean"))
      .head()
    require(!row.isNullAt(0),
      s"occupancySkew: index at $indexPath holds zero rows — no occupancy to measure")
    row.getLong(0) / row.getDouble(1)
  }

  /** GROW-K maintenance — the policy the per-cell operators' scale story
    * cites ("grow the centroid count with the corpus"), made governed like
    * [[maintainIfDrifted]]: when the largest cell exceeds `targetCellRows`
    * (the budget that keeps a 1-cell probe scan and a within-cell quadratic
    * task bounded), re-fit with K = max(ceil(total / targetCellRows),
    * 2 × current K) centroids — the volume-derived count, with doubling as
    * the floor so a PURE-SKEW breach (total/target ≤ current K) still makes
    * progress — clamped to `maxK`, seed-initialized and Lloyd-fit over the
    * corpus the index has grown into, then atomically rewritten (same
    * crash-safe promote as every recluster; raw pq codes carry, rpq
    * re-encodes, searches serve the old generation until the swap).
    *
    * A cell of genuinely IDENTICAL vectors is indivisible by ANY centroid
    * set — no K separates it, which is exactly why the within-cell
    * operators also carry the [[SimilarityOps]] sub-partition backstop;
    * this policy handles the separable-mass case (corpus growth, drifted
    * distribution) where re-fitting genuinely restores balance. Cheap when
    * healthy: one grouped count, no rewrite.
    *
    * @return (pre-maintenance max cell rows, whether a re-fit ran).
    */
  def maintainCellBudget(
      spark: SparkSession,
      indexPath: String,
      targetCellRows: Long,
      maxIter: Int = 5,
      samplePpm: Long = 1000000L,
      maxK: Int = 4096,
      retrainCodebook: Boolean = false): (Long, Boolean) = {
    require(targetCellRows >= 1, s"targetCellRows must be >= 1, got $targetCellRows")
    val (maxCell, total) = cellStats(spark, indexPath)
    if (maxCell <= targetCellRows) (maxCell, false)
    else {
      val currentK = currentCentroids(spark, indexPath).size
      val byVolume = math.ceil(total.toDouble / targetCellRows).toLong
      val kNew = math.min(maxK.toLong, math.max(byVolume, 2L * currentK)).toInt
      // no progress possible at the maxK clamp: a breach whose grown K
      // doesn't exceed the current K (currentK already at/above maxK, or a
      // clamped doubling) must NOT trigger a full index rewrite — a cron'd
      // policy loop would pay an endless recluster (and a currentK > maxK
      // index would actively SHRINK) with the same imbalance after. The
      // breach is either indivisible mass (identical vectors — the
      // SimilarityOps sub-partition backstop's case) or a maxK ceiling the
      // operator must raise deliberately.
      if (kNew <= currentK) {
        org.slf4j.LoggerFactory.getLogger(getClass)
          .info(s"maintainCellBudget: cell budget breached (maxCell=$maxCell > " +
            s"target=$targetCellRows) but grown K=$kNew would not exceed current " +
            s"K=$currentK (maxK=$maxK) — skipping the re-fit, no progress possible")
        (maxCell, false)
      } else {
        recluster(spark, indexPath, maxIter = math.max(1, maxIter),
          samplePpm = samplePpm, retrainCodebook = retrainCodebook,
          k = Some(kNew))
        (maxCell, true)
      }
    }
  }
}
