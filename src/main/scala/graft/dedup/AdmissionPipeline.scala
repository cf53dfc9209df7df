package graft.dedup

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED two-tier streaming near-dup admission pipeline
  * (VERDICT r14 #2 + #3): one `foreachBatch` drives the exact shingle tier
  * and the LSH tier into ONE [[PairStore]] with tier-tagged segments, under
  * a governed rebuild policy — what a user previously had to wire by hand
  * from [[ShingleIndex.streamingAdmission]] + [[LshIndex.streamingAbsorb]]
  * with two checkpoints and two pair outputs.
  *
  * '''Tier contract.''' Per micro-batch of new documents:
  *
  *  - '''exact tier''' ([[ShingleIndex.probePairs]] against the CURRENT
  *    posting-store generation): batch-vs-CORPUS pairs with exact Jaccard
  *    under the stored vocabulary. Its documented boundary: stream-vs-stream
  *    pairs within one rebuild window are NOT generated (the store cannot
  *    absorb — df caps are corpus-global).
  *  - '''LSH tier''' ([[LshIndex.candidates]] + absorb): the in-window
  *    companion. The LSH index starts EMPTY and absorbs only streamed
  *    batches, so its candidates are precisely the stream-vs-stream pairs
  *    the exact tier is blind to — no overlap between tiers. Its rows carry
  *    the minhash ESTIMATE (`inter` = agreeing permutations, `n_a` = `n_b` =
  *    [[DedupOps.NumPerms]], `jaccard` = est_sim) — recall- and
  *    precision-bounded, which is why they are tier-tagged: an exact
  *    consumer reads [[readPairsExact]] and never sees them.
  *  - '''rebuild tier''' (governance below): the exact catch-up — the new
  *    generation's full pair set anti-joined against every exact pair
  *    already stored, so after a rebuild the exact tiers' union covers every
  *    pair of the grown corpus, in-window flood included.
  *
  * '''Governed rebuild''' (the [[graft.ann.IvfIndex.streamingAbsorb]]
  * cellBudget pattern applied to the posting store): each batch pays one
  * extra aggregate — [[ShingleIndex.admissionStaleness]]'s unseen-shingle
  * fraction, the signal the exact tier's blind spot grows with — and when it
  * breaches `stalenessThreshold` (outside the cooldown), the pipeline
  * rebuilds the posting store's next GENERATION from the base corpus plus
  * every retained streamed batch, appends the exact catch-up segment, and
  * refreshes labels. A healthy stream never rebuilds; a replayed batch
  * re-measures staleness against the already-rebuilt generation, finds it
  * healed, and skips — segment overwrites keep every output
  * replay-idempotent, and the ledger row (one per batch, overwritten on
  * replay) records the view the LAST execution of that batch saw.
  *
  * '''Doc-level drift''' (VERDICT r15 #2 — the dilution hole): the aggregate
  * unseen fraction is computed over the batch's DISTINCT shingles, so a
  * batch where a minority of documents carry new vocabulary sits just above
  * the natural level and never trips while the blind spot grows for exactly
  * those documents. With `docStalenessBand` set, each batch also counts the
  * documents whose OWN unseen fraction clears the band
  * ([[ShingleIndex.admissionDocDrift]]), and the rebuild fires when EITHER
  * the aggregate breaches `stalenessThreshold` or the drifted-doc fraction
  * reaches `docDriftFracThreshold` — the ledger's `trip` column records
  * which signal(s) fired.
  *
  * '''Lagging-view semantics''' (same trade as the IVF index's neighbor
  * segments computed under a superseded centroid set): exact-tier segments
  * admitted under an OLDER generation's vocabulary are append-only — their
  * values name that generation's judgment. The catch-up guarantees the
  * exact union is a SUPERSET of the new generation's fixpoint; a pair whose
  * re-judged Jaccard fell below threshold under the grown vocabulary is not
  * retracted (retraction is a corpus-wide recompute — exactly what reading
  * [[ShingleIndex.allPairs]] of the current generation gives a consumer
  * that needs the strict fixpoint).
  *
  * '''Governed compaction''' (VERDICT r15 #1 — the last unbounded
  * small-files accretion): each micro-batch writes one LSH `batch=` segment,
  * one `docsRetain/batch=` dir, up to three pair segments, and a ledger row
  * — at a 1-minute trigger ~7k files/day. With `compactSegmentThreshold`
  * set, the loop counts pair segments at the TOP of each trigger (one FS
  * listing) and, at/past the threshold, runs [[compactStores]]: a
  * tier-preserving pair compaction (one segment-id residue class at a time,
  * so `tierOfSegment` survives the rewrite), the LSH index's
  * partition-layout compaction, and the ledger's. Absorbable segments are
  * those BELOW the running batch's own ids: on checkpoint replay only the
  * current batch re-executes, and its own (possibly half-written) segments
  * are the ones [[LshIndex.candidates]]' own-segment exclusion and the
  * overwrite idempotency rules key on — compaction never touches them, and
  * for committed segments it preserves rows exactly, so a replayed batch
  * reads the same index content and produces identical output. The
  * threshold is self-governing (a run drops the count far below it), and
  * the ledger row records segments before/after.
  *
  * '''Retained-batch folding''' (VERDICT r15 #6): the rebuild's delta is
  * `docsRetain`'s accreted `batch=` dirs — without folding, a year-long
  * stream re-reads every batch it ever saw on each rebuild. After a
  * successful rebuild the retained batches are part of the new generation's
  * corpus BY CONSTRUCTION, so (with `foldRetainedOnRebuild`, the default)
  * the rebuild writes that corpus as the new base snapshot
  * (`docsRetain/_base/gen=<n>`, write-temp-then-rename with a `_SUCCESS`
  * check — the [[PairStore.refreshLabels]] publication rule) and clears the
  * folded batch dirs. Idempotence under every crash window: the next
  * rebuild anti-joins still-present retained docs against the snapshot's
  * ids, so a crash between snapshot and clear — or a replayed batch
  * re-writing its retained dir after the fold — can never double-count a
  * document.
  *
  * Scale shape: the per-batch cost is the exact probe (one store scan), the
  * staleness aggregate (one store column scan; +1 for the doc-level signal
  * when enabled), the LSH band probe (broadcast batch onto the band index),
  * and the batch's own signing — all O(store columns) reads and O(batch)
  * work. The rebuild is the only corpus-sized step and runs only on breach,
  * like every other whole-index rewrite in this engine.
  */
object AdmissionPipeline {

  /** Segments per batch in the shared PairStore: exact, lsh, rebuild. */
  val TierStride = 3L

  /** Tier of a pair-store segment id under this pipeline's layout. Segments
    * below the streaming base are bootstrap loads (full-corpus exact pairs)
    * and read as exact.
    */
  def tierOfSegment(segment: Long): String =
    if (segment < PairStore.StreamingSegmentBase) "exact"
    else ((segment - PairStore.StreamingSegmentBase) % TierStride) match {
      case 0 => "exact"
      case 1 => "lsh"
      case _ => "rebuild"
    }

  private def tierCol(segCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(segCol < PairStore.StreamingSegmentBase, "exact")
      .otherwise(when(pmod(segCol - PairStore.StreamingSegmentBase, lit(TierStride)) === 0, "exact")
        .otherwise(when(pmod(segCol - PairStore.StreamingSegmentBase, lit(TierStride)) === 1, "lsh")
          .otherwise("rebuild")))

  /** All pair rows with their `tier` column derived from the segment id. */
  def readPairsTiered(spark: SparkSession, pairStorePath: String): DataFrame =
    spark.read.option("basePath", s"$pairStorePath/pairs")
      .parquet(s"$pairStorePath/pairs")
      .withColumn("tier", tierCol(col("batch")))
      .drop("batch")

  /** Exact-semantics pairs only (exact + rebuild tiers; bootstrap included).
    * The estimate-valued LSH tier never reaches a consumer of this view.
    */
  def readPairsExact(spark: SparkSession, pairStorePath: String): DataFrame =
    readPairsTiered(spark, pairStorePath)
      .filter(col("tier") =!= "lsh").drop("tier")

  /** Last batchId at which the rebuild policy actually ran, per generation
    * root — the cooldown's in-memory state (bounded: one entry per root this
    * JVM streams into). After a driver restart the entry is recovered from
    * the pair store's rebuild-tier segment ids ([[recoverLastRebuilt]] —
    * durable by construction, no extra state file), so a restart during
    * sustained drift cannot fire a second corpus-sized rebuild inside the
    * intended cooldown window (ADVICE r15). [[NoRebuildSentinel]] caches a
    * "recovered: none" answer so the recovery listing runs at most once per
    * root per JVM.
    */
  private val lastRebuiltBatch =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val NoRebuildSentinel = java.lang.Long.valueOf(Long.MinValue)

  /** Recover the last rebuild's batchId from the pair store: rebuild-tier
    * segment ids encode it, and compaction preserves each residue class's
    * maximum id, so the newest rebuild segment survives any maintenance.
    */
  private[graft] def recoverLastRebuilt(
      spark: SparkSession, pairStorePath: String): Option[Long] =
    graft.sources.Segments.segmentIds(spark, s"$pairStorePath/pairs")
      .filter(id => id >= PairStore.StreamingSegmentBase && tierOfSegment(id) == "rebuild")
      .map(id => (id - PairStore.StreamingSegmentBase - 2) / TierStride)
      .sorted.lastOption

  /** Test hook: forget the in-memory cooldown state for a root (simulates a
    * driver restart — the next batch must recover it from the store).
    */
  private[graft] def forgetCooldown(genRoot: String): Unit = {
    lastRebuiltBatch.remove(genRoot)
    ()
  }

  /** Compact every store the composed pipeline accretes, without disturbing
    * the semantics its segment ids carry. Pair segments compact one
    * TierStride residue class at a time (bootstrap ids join the exact
    * class): a filtered compaction's target is the max absorbed id, which
    * stays inside the class, so [[tierOfSegment]] keeps reading every row's
    * tier correctly. Only segments with ids below batch `beforeBatchId`'s
    * own are absorbable — the replay-determinism guard (only the current
    * batch can replay, and its own segments must stay individually
    * overwritable and excludable). Returns total segments absorbed.
    */
  def compactStores(
      spark: SparkSession,
      pairStorePath: String,
      lshIndexPath: String,
      ledgerOut: Option[String],
      beforeBatchId: Long): Int = {
    val exactSeg = PairStore.StreamingSegmentBase + TierStride * beforeBatchId
    val lshIdxSeg = LshIndex.StreamingSegmentBase + beforeBatchId
    var absorbed = 0
    (0L until TierStride).foreach { t =>
      absorbed += PairStore.compactPairsWhere(spark, pairStorePath,
        id => id < exactSeg && (
          if (t == 0L)
            id < PairStore.StreamingSegmentBase ||
              (id - PairStore.StreamingSegmentBase) % TierStride == 0L
          else
            id >= PairStore.StreamingSegmentBase &&
              (id - PairStore.StreamingSegmentBase) % TierStride == t),
        protectLatest = false)
    }
    absorbed += LshIndex.compactSegments(spark, lshIndexPath,
      protectLatest = false, segmentFilter = _ < lshIdxSeg)
    ledgerOut.foreach { out =>
      absorbed += graft.sources.Segments.compact(spark, out, Seq.empty,
        protectLatest = false, segmentFilter = _ < exactSeg)
    }
    absorbed
  }

  /** Complete base-corpus snapshot generations under `docsRetain/_base`
    * (underscore-prefixed, so the retained-batch partitioned read never sees
    * them). Complete = parquet `_SUCCESS` present — the publication rule.
    */
  private def baseSnapshotIds(
      fs: org.apache.hadoop.fs.FileSystem, docsRetain: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(s"$docsRetain/_base")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .sorted
  }

  /** Start-point builder for the composed pipeline. `genRoot` must hold a
    * bootstrapped generational posting store
    * ([[ShingleIndex.initGenerations]] over `baseDocs`); `lshIndexPath`
    * starts empty and is owned by this pipeline; `docsRetain` accretes the
    * streamed documents (replay-idempotent segments) — they are the delta a
    * rebuild folds into the next generation.
    *
    * @param stalenessThreshold unseen-shingle fraction at/past which a
    *        rebuild fires (None = no aggregate trigger; the ledger still
    *        publishes staleness every batch)
    * @param docStalenessBand per-doc unseen fraction at/past which a batch
    *        document counts as DRIFTED (None = doc-level signal off); with
    *        it set, a batch whose drifted-doc fraction reaches
    *        `docDriftFracThreshold` rebuilds even when the diluted aggregate
    *        stays under `stalenessThreshold`
    * @param docDriftFracThreshold fraction of a batch's shingled docs that
    *        must read drifted to trip the doc-level rebuild
    * @param lshSimThreshold minhash-estimate floor for LSH-tier pair rows
    * @param compactSegmentThreshold pair-segment count at/past which the
    *        loop compacts all its stores between triggers (0 = off — an
    *        operator runs [[compactStores]] by hand)
    * @param foldRetainedOnRebuild fold the retained batches into a base
    *        snapshot after each successful rebuild (see the class doc) so
    *        rebuild input stays one snapshot + the current window, not
    *        every batch ever streamed
    * @param pruneGenerationsKeep generations kept after a rebuild (the
    *        newest K complete — keeping ≥ 2 leaves the superseded one for
    *        in-flight readers, the deferred-eviction rule); 0 = never prune
    */
  def streamingTwoTier(
      docsStream: DataFrame,
      genRoot: String,
      lshIndexPath: String,
      docsRetain: String,
      pairStorePath: String,
      checkpoint: String,
      baseDocs: DataFrame,
      threshold: Double = 0.6,
      lshSimThreshold: Double = 0.6,
      refreshEvery: Int = 5,
      cap: Int = DedupOps.RawDfCap,
      stalenessThreshold: Option[Double] = None,
      docStalenessBand: Option[Double] = None,
      docDriftFracThreshold: Double = 0.3,
      rebuildCooldownBatches: Int = 5,
      ledgerOut: Option[String] = None,
      pruneGenerationsKeep: Int = 2,
      compactSegmentThreshold: Int = 0,
      foldRetainedOnRebuild: Boolean = true)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(refreshEvery >= 1, "refreshEvery must be >= 1")
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val docs = batch.select(col("doc_id"), col("text"))
        val exactSeg = PairStore.StreamingSegmentBase + TierStride * batchId
        val lshSeg = exactSeg + 1
        val rebuildSeg = exactSeg + 2

        // governed compaction FIRST (between this trigger's reads and the
        // previous trigger's writes): one FS listing decides; the filter
        // inside compactStores excludes this batch's own segment ids, so a
        // replayed batch still sees its own overwritable segments
        val pairSegsBefore =
          graft.sources.Segments.segmentIds(spark, s"$pairStorePath/pairs").length
        val compacted =
          if (compactSegmentThreshold > 0 && pairSegsBefore >= compactSegmentThreshold)
            compactStores(spark, pairStorePath, lshIndexPath, ledgerOut, batchId)
          else 0
        val pairSegsAfter =
          if (compacted > 0)
            graft.sources.Segments.segmentIds(spark, s"$pairStorePath/pairs").length
          else pairSegsBefore

        val genBefore = ShingleIndex.currentGeneration(spark, genRoot)
        val genPath = ShingleIndex.generationPath(genRoot, genBefore)

        // staleness signals FIRST (they describe the generation this batch
        // is about to probe), then the two tiers' pair segments
        val (nSh, unseenFrac, overcapFrac) =
          ShingleIndex.admissionStaleness(spark, genPath, docs)
        val (nDocs, nDrifted) = docStalenessBand match {
          case Some(band) => ShingleIndex.admissionDocDrift(spark, genPath, docs, band)
          case None => (-1L, -1L)
        }
        PairStore.appendPairs(spark, pairStorePath,
          ShingleIndex.orientProbePairs(
            ShingleIndex.probePairs(spark, genPath, docs, threshold)),
          exactSeg)

        // LSH tier: probe the absorbed stream (stream-vs-stream only), then
        // absorb this batch — probe-before-absorb + own-segment exclusion is
        // the replay-determinism rule of LshIndex.streamingAbsorb
        val lshIdxSeg = LshIndex.StreamingSegmentBase + batchId
        val lshPairs =
          if (!graft.sources.Segments.segmentIds(spark, lshIndexPath).exists(_ != lshIdxSeg))
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id_a", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("id_b", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("inter", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("n_a", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("n_b", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType))))
          else
            LshIndex.candidates(spark, lshIndexPath, docs,
              excludeSegment = Some(lshIdxSeg))
              .filter(col("est_sim") >= lshSimThreshold)
              .select(
                least(col("probe_id"), col("index_id")).as("id_a"),
                greatest(col("probe_id"), col("index_id")).as("id_b"),
                col("n_eq").cast("long").as("inter"),
                lit(DedupOps.NumPerms.toLong).as("n_a"),
                lit(DedupOps.NumPerms.toLong).as("n_b"),
                col("est_sim").as("jaccard"))
        PairStore.appendPairs(spark, pairStorePath, lshPairs, lshSeg)
        LshIndex.appendBatch(spark, lshIndexPath, docs, lshIdxSeg)

        // retain the batch's documents — the rebuild's delta
        docs.write.mode("overwrite").parquet(s"$docsRetain/batch=$exactSeg")

        // governance: breach → next generation + exact catch-up
        def coolingDown: Boolean = {
          val cached = lastRebuiltBatch.computeIfAbsent(genRoot, _ =>
            recoverLastRebuilt(spark, pairStorePath)
              .map(java.lang.Long.valueOf).getOrElse(NoRebuildSentinel))
          cached != NoRebuildSentinel &&
            batchId - cached.longValue() < rebuildCooldownBatches
        }
        val aggBreach = stalenessThreshold.exists(unseenFrac >= _) && nSh > 0
        val docBreach = docStalenessBand.isDefined && nDocs > 0 &&
          nDrifted.toDouble / nDocs >= docDriftFracThreshold
        val trip =
          if (aggBreach && docBreach) "both"
          else if (aggBreach) "agg"
          else if (docBreach) "doc"
          else "none"
        val rebuilt = (aggBreach || docBreach) && !coolingDown
        var catchUpPairs = -1L
        val genAfter =
          if (!rebuilt) genBefore
          else {
            val fs = new org.apache.hadoop.fs.Path(docsRetain)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            // rebuild corpus = newest base snapshot (or the caller's
            // baseDocs when none was folded yet) + the retained window,
            // anti-joined so a doc already folded into the snapshot — a
            // crash between snapshot and clear, or a replayed batch
            // re-writing its retained dir post-fold — never counts twice
            // (df and per-doc sizes are corpus-global: a duplicate would
            // corrupt every stored statistic)
            val retainSegs = graft.sources.Segments.segmentIds(spark, docsRetain)
            val baseCorpus = baseSnapshotIds(fs, docsRetain).lastOption match {
              case Some(g) => spark.read.parquet(s"$docsRetain/_base/gen=$g")
                .select(col("doc_id"), col("text"))
              case None => baseDocs.select(col("doc_id"), col("text"))
            }
            val corpus =
              if (retainSegs.isEmpty) baseCorpus
              else {
                val streamed = spark.read.option("basePath", docsRetain)
                  .parquet(retainSegs.map(id => s"$docsRetain/batch=$id"): _*)
                  .drop("batch").select(col("doc_id"), col("text"))
                baseCorpus.unionByName(
                  streamed.join(baseCorpus.select("doc_id"), Seq("doc_id"), "left_anti"))
              }
            val next = ShingleIndex.rebuildGeneration(spark, genRoot, corpus, cap)
            lastRebuiltBatch.put(genRoot, java.lang.Long.valueOf(batchId))
            // exact catch-up: everything the grown corpus's fixpoint holds
            // that no exact segment stored yet (the in-window blind spot,
            // plus any batch-vs-batch pair across earlier windows)
            val fixpoint = ShingleIndex.allPairs(
              spark, ShingleIndex.generationPath(genRoot, next), threshold)
            val missed = fixpoint.join(
              readPairsExact(spark, pairStorePath).select("id_a", "id_b"),
              Seq("id_a", "id_b"), "left_anti")
            PairStore.appendPairs(spark, pairStorePath, missed, rebuildSeg)
            catchUpPairs = spark.read
              .parquet(s"$pairStorePath/pairs/batch=$rebuildSeg").count()
            PairStore.refreshLabels(spark, pairStorePath)
            if (foldRetainedOnRebuild) {
              // publish the rebuilt corpus as the new base snapshot (temp →
              // _SUCCESS check → rename, the refreshLabels rule), then clear
              // the folded batch dirs and superseded snapshots. Only this
              // loop writes under _base, so orphaned temp debris from a
              // crashed fold is safe to sweep here.
              val baseRoot = new org.apache.hadoop.fs.Path(s"$docsRetain/_base")
              if (fs.exists(baseRoot))
                fs.listStatus(baseRoot).filter(_.getPath.getName.startsWith(".tmp_"))
                  .foreach(s => fs.delete(s.getPath, true))
              val tmp = new org.apache.hadoop.fs.Path(baseRoot,
                s".tmp_${next}_${java.util.UUID.randomUUID()}")
              corpus.write.mode("overwrite").parquet(tmp.toString)
              require(fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")),
                s"base-snapshot write left no _SUCCESS under $tmp")
              val target = new org.apache.hadoop.fs.Path(baseRoot, s"gen=$next")
              fs.delete(target, true) // only ever markerless crash debris
              require(fs.rename(tmp, target), s"failed to promote $tmp to $target")
              retainSegs.foreach(id =>
                fs.delete(new org.apache.hadoop.fs.Path(s"$docsRetain/batch=$id"), true))
              baseSnapshotIds(fs, docsRetain).filter(_ != next).foreach(g =>
                fs.delete(new org.apache.hadoop.fs.Path(s"$docsRetain/_base/gen=$g"), true))
            }
            if (pruneGenerationsKeep > 0)
              ShingleIndex.pruneGenerations(spark, genRoot, pruneGenerationsKeep)
            next
          }
        if (!rebuilt && batchId % refreshEvery == refreshEvery - 1) {
          PairStore.refreshLabels(spark, pairStorePath)
          ()
        }
        ledgerOut.foreach { out =>
          import spark.implicits._
          Seq((exactSeg, genBefore, nSh, unseenFrac, overcapFrac,
            stalenessThreshold.getOrElse(-1.0), rebuilt, genAfter, catchUpPairs,
            nDocs, nDrifted, trip, compacted, pairSegsBefore, pairSegsAfter))
            .toDF("segment", "gen", "n_batch_shingles", "unseen_frac",
              "overcap_frac", "threshold", "rebuilt", "gen_after", "catchup_pairs",
              "n_docs", "n_docs_drifted", "trip",
              "compacted_segments", "pair_segments_before", "pair_segments_after")
            .write.mode("overwrite").parquet(s"$out/batch=$exactSeg")
        }
      }
  }
}
