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
  * Scale shape: the per-batch cost is the exact probe (one store scan), the
  * staleness aggregate (one store column scan), the LSH band probe
  * (broadcast batch onto the band index), and the batch's own signing —
  * all O(store columns) reads and O(batch) work. The rebuild is the only
  * corpus-sized step and runs only on breach, like every other
  * whole-index rewrite in this engine.
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
    * root — the cooldown's driver-side state (bounded: one entry per root
    * this JVM streams into; a restart only costs one extra staleness CHECK,
    * never a rebuild — a healed signal always skips).
    */
  private val lastRebuiltBatch =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Start-point builder for the composed pipeline. `genRoot` must hold a
    * bootstrapped generational posting store
    * ([[ShingleIndex.initGenerations]] over `baseDocs`); `lshIndexPath`
    * starts empty and is owned by this pipeline; `docsRetain` accretes the
    * streamed documents (replay-idempotent segments) — they are the delta a
    * rebuild folds into the next generation.
    *
    * @param stalenessThreshold unseen-shingle fraction at/past which a
    *        rebuild fires (None = signal-only: the ledger still publishes
    *        staleness every batch, the generation never moves)
    * @param lshSimThreshold minhash-estimate floor for LSH-tier pair rows
    * @param pruneGenerationsKeep generations kept after a rebuild (the
    *        newest K complete — keeping ≥ 2 leaves the superseded one for
    *        in-flight readers, the deferred-eviction rule); 0 = never prune
    *
    * The LSH tier's `batch=` segments accrete one per micro-batch; a
    * long-running stream pairs this with [[LshIndex.compactSegments]] as an
    * operator step BETWEEN triggers (compaction inside the loop would
    * absorb a replayed batch's own segment and defeat the
    * exclude-own-segment replay determinism).
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
      rebuildCooldownBatches: Int = 5,
      ledgerOut: Option[String] = None,
      pruneGenerationsKeep: Int = 2)
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
        val genBefore = ShingleIndex.currentGeneration(spark, genRoot)
        val genPath = ShingleIndex.generationPath(genRoot, genBefore)

        // staleness signal FIRST (it describes the generation this batch is
        // about to probe), then the two tiers' pair segments
        val (nSh, unseenFrac, overcapFrac) =
          ShingleIndex.admissionStaleness(spark, genPath, docs)
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
          val last = lastRebuiltBatch.get(genRoot)
          last != null && batchId - last.longValue() < rebuildCooldownBatches
        }
        val breach = stalenessThreshold.exists(unseenFrac >= _) && nSh > 0
        val rebuilt = breach && !coolingDown
        var catchUpPairs = -1L
        val genAfter =
          if (!rebuilt) genBefore
          else {
            val streamed = spark.read.option("basePath", docsRetain)
              .parquet(docsRetain).drop("batch")
              .select(col("doc_id"), col("text"))
            val next = ShingleIndex.rebuildGeneration(
              spark, genRoot, baseDocs.unionByName(streamed), cap)
            lastRebuiltBatch.put(genRoot, batchId)
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
            stalenessThreshold.getOrElse(-1.0), rebuilt, genAfter, catchUpPairs))
            .toDF("segment", "gen", "n_batch_shingles", "unseen_frac",
              "overcap_frac", "threshold", "rebuilt", "gen_after", "catchup_pairs")
            .write.mode("overwrite").parquet(s"$out/batch=$exactSeg")
        }
      }
  }
}
