package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable shingle POSTING-LIST store — the stored corpus side the
  * incremental near-dup admission reads, closing the one path whose 100 TB
  * story was a code comment (VERDICT r13 #1): `ngramJaccardPairsIncremental`
  * re-derives the full corpus's shingles on BOTH join sides, so a 2% batch
  * measured 98% of a full-recompute's cost (`jaccard_pairs_incremental_batch`
  * speedup 0.98 in BENCH_r13). This is the [[LshIndex]]/[[PairStore]]
  * materialization discipline applied to the shingle relation itself, in the
  * classic inverted-index layout:
  *
  * {{{ one row per DISTINCT SHINGLE:
  *       s, sb (hash bucket — the partition column),
  *       postings: array<struct<doc_id, c, n_shingles>>  (df-capped) }}}
  *
  * The df cap ([[DedupOps.RawDfCap]]) is baked in AT BUILD TIME over the
  * whole corpus — exactly [[DedupOps.shinglesWithSize]]'s capped relation,
  * grouped — so `|postings| ≤ cap` BY CONSTRUCTION: every stored row is
  * bounded, no posting list can go hot, and every statistic a consumer
  * derives (intersection counts, per-doc sizes, Jaccard) is bit-identical to
  * the live derivation (one oracle gates both forms). The store answers "the
  * corpus's capped vocabulary as of this build" and rebuilds with the corpus
  * generation ([[ensure]] keys on the corpus fingerprint, the
  * [[PairStore.ensure]] staleness rule).
  *
  * Scale shape of [[incrementalPairs]] — why posting lists beat a join: the
  * pair-generation step needs, per shingle, (batch member × other members),
  * and the store already holds each shingle's members ADJACENT in one
  * bounded array. Admission is therefore ONE column-pruned scan of the
  * store — no self-join, no broadcast, no shuffle of corpus postings: each
  * task expands its shingles' batch-touching pairs locally (≤ cap² struct
  * pairs per row) and only the candidate pairs shuffle, into the per-pair
  * aggregation. Work is O(batch-touching postings), data read is
  * O(store columns), and the batch can be any size — nothing is collected
  * or broadcast. The live-derivation form pays tokenize → explode → df →
  * window over the corpus TWICE per admitted batch; this path replaces all
  * of it with a scan of ~(s, postings) — at 100 TB the difference between
  * re-running the corpus's heaviest pipeline per batch and reading a stored
  * index partition-pruned by shingle bucket.
  */
object ShingleIndex {

  /** Shingle-hash bucket count — the store's partition fanout. Coarse on
    * purpose: it bounds small-file count at test scale while still giving
    * partition pruning and layout-preserving compaction a key at corpus
    * scale.
    */
  val NumBuckets = 32

  /** Full build: the corpus's df-capped posting lists into segment 0
    * (replay-idempotent `batch=<id>` layout, partitioned by shingle bucket,
    * clustered so each bucket lands in one file instead of one sliver per
    * upstream task).
    */
  def materialize(
      spark: SparkSession, sfDir: String, indexPath: String,
      cap: Int = DedupOps.RawDfCap): Unit =
    materializeDocs(spark,
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      indexPath, cap)

  /** [[materialize]] over an arbitrary (doc_id, text) relation. Besides the
    * posting lists, the build persists the OVER-CAP shingle set under the
    * underscore-prefixed `_overcap` side relation (invisible to the
    * partitioned read): a shingle ABSENT from the postings is ambiguous —
    * never seen, or seen and dropped as boilerplate — and the admission
    * probe must treat the two differently (an unseen shingle counts toward a
    * new document's size; a dropped one is capped vocabulary on both sides).
    * The over-cap set is small by the same argument as every hot-key ledger
    * (≤ total occurrences / cap, and in practice the handful of boilerplate
    * keys), but it stays a parquet relation, never driver state.
    */
  def materializeDocs(
      spark: SparkSession, docs: DataFrame, indexPath: String,
      cap: Int = DedupOps.RawDfCap): Unit = {
    // Stores are PER-GENERATION (df caps and per-doc sizes are corpus-global
    // — see [[probePairs]]), so a rebuild targets a FRESH path, never an
    // in-place overwrite: refusing here means the zero-row check below can
    // never "refuse" by destroying a previous generation that was serving
    // probes (review r14), and it keeps the [[ensure]] discipline honest
    // (one directory per corpus fingerprint, stale generations evicted).
    require(!graft.sources.Segments.hasParquetData(spark, s"$indexPath/batch=0"),
      s"$indexPath already holds a posting store — stores rebuild into a " +
        "fresh path per corpus generation, never in place")
    // ONE derivation order: the over-cap set (tiny in practice, but bounded
    // only by occurrences/cap — no broadcast hint, Spark sizes the join;
    // review r14) writes first from the df aggregate, then the postings job
    // re-derives occurrences and drops over-cap shingles by anti-joining the
    // WRITTEN side relation — the second pass pays no df re-aggregate and
    // no df join (two write actions can never share an exchange, so the
    // heavy tokenize pipeline runs once per job either way; what this saves
    // is job 2's second full groupBy(s) + join, review r14)
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    DedupOps.shingleOccurrencesOf(docs)
      .groupBy("s").agg(sum("c").as("df"))
      .filter(col("df") > cap)
      .select("s")
      .write.mode("overwrite").parquet(s"$indexPath/_overcap")
    DedupOps.shingleOccurrencesOf(docs)
      .join(spark.read.parquet(s"$indexPath/_overcap"), Seq("s"), "left_anti")
      .withColumn("n_shingles", sum("c").over(wDoc))
      .groupBy("s")
      .agg(collect_list(struct(col("doc_id"), col("c"), col("n_shingles"))).as("postings"))
      .withColumn("sb", pmod(hash(col("s")), lit(NumBuckets)))
      .repartition(col("sb"))
      .write.mode("overwrite")
      .partitionBy("sb")
      .parquet(s"$indexPath/batch=0")
    // zero-row refusal, judged from the WRITTEN output (the shared
    // Segments.hasParquetData detector): a build whose every document is
    // under ShingleK tokens — or whose every shingle is over-cap — writes a
    // dataless partitioned dir every later read dies on with a
    // schema-inference error. Deletion targets ONLY this build's own
    // artifacts (batch=0 and _overcap), never the indexPath root: the
    // fresh-path guard above asserts batch=0 held no parquet data, not that
    // the directory was empty, so a root delete could destroy unrelated
    // content living beside the store — logs, a sibling store, a parent dir
    // passed by mistake (ADVICE r14).
    if (!graft.sources.Segments.hasParquetData(spark, s"$indexPath/batch=0")) {
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/batch=0"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/_overcap"), true)
      throw new IllegalArgumentException(
        s"materializeDocs: no capped postings to store (zero rows) — " +
          s"refusing to leave an empty (unreadable) store at $indexPath")
    }
  }

  def read(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.option("basePath", indexPath).parquet(indexPath).drop("batch")

  /** [[read]] for the PAIR-EXPANSION consumers (allPairs / containment /
    * incremental). r17: a size-gated fan-out on the store directory (r16
    * VERDICT #6 / "Not yet optimized" #1) was tried here and REVERTED on
    * measurement — interleaved A/B fan-on/off = 1.43 / 1.55 / 1.54 on the
    * three stored twins (min-of-4, sf0.1). Unlike the raw-corpus derivation
    * chains, a store row's expansion is bounded (≤ cap·(cap−1)/2 = 28
    * struct emissions) and carries no md5/tokenize work, so the added
    * exchange costs more than the idle cores are worth at ANY tiny-store
    * size; at cluster scale the bucket layout already carries parallelism.
    */
  private def readForExpand(spark: SparkSession, indexPath: String): DataFrame =
    read(spark, indexPath)

  /** EXACT incremental near-dup pairs against the STORED posting lists —
    * the same statistics, rows and column contract as
    * [[DedupOps.ngramJaccardPairsIncremental]] (one oracle gates both), from
    * a single scan: per stored shingle, expand (batch member × other
    * member) locally inside the bounded array, then aggregate per pair.
    * Orientation matches the live form: batch-internal pairs keep a < b,
    * batch-vs-rest pairs emit once with the batch side as `x` and re-orient
    * in the projection, so every unordered pair appears exactly once.
    */
  def incrementalPairs(
      spark: SparkSession,
      indexPath: String,
      batchPred: Column => Column,
      threshold: Double = 0.6): DataFrame = {
    // per-shingle pair expansion: both loops run over the SAME materialized
    // array column (≤ cap entries by construction), so the nested transform
    // is ≤ cap² struct emissions per row — bounded work, no join
    val pairsOf = flatten(transform(
      filter(col("postings"), a => batchPred(a.getField("doc_id"))),
      a => transform(
        filter(col("postings"), b =>
          a.getField("doc_id") < b.getField("doc_id") ||
            (b.getField("doc_id") < a.getField("doc_id") &&
              !batchPred(b.getField("doc_id")))),
        b => struct(a.as("a"), b.as("b")))))
    readForExpand(spark, indexPath)
      .select(explode(pairsOf).as("p"))
      .select(
        col("p.a.doc_id").as("x"), col("p.b.doc_id").as("y"),
        (col("p.a.c") * col("p.b.c")).as("cc"),
        col("p.a.n_shingles").as("nx"), col("p.b.n_shingles").as("ny"))
      .groupBy("x", "y")
      .agg(sum(col("cc")).as("inter"),
        first(col("nx")).as("n_x"), first(col("ny")).as("n_y"))
      .select(
        least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"),
        col("inter"),
        when(col("x") < col("y"), col("n_x")).otherwise(col("n_y")).as("n_a"),
        when(col("x") < col("y"), col("n_y")).otherwise(col("n_x")).as("n_b"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Near-dup ADMISSION PROBE for a batch of NEW documents (not yet in the
    * store) — the between-rebuild streaming path, [[graft.dedup.LshIndex]]'s
    * `candidates` contract in shingle space: the batch's postings derive
    * from the batch alone (small — one tokenize over the incoming docs), the
    * corpus side is the stored posting lists, and the VOCABULARY is the
    * store's — a batch shingle in the stored `_overcap` set is capped on
    * both sides (dropped from matching AND from the batch doc's size, the
    * same judgment the build applied to stored docs), while a genuinely
    * unseen shingle counts toward the size and matches nothing. The df
    * statistics are therefore STALE BY THE BATCH — exactly the trade every
    * probe-then-absorb index makes ("hot buckets are judged against the
    * STORED index") — and the store refreshes by REBUILD, not absorb: df
    * caps and per-doc sizes are corpus-GLOBAL functions (one batch pushing a
    * shingle over the cap retroactively shrinks every stored document's
    * size), so the posting store is a global-fixpoint artifact like
    * [[PairStore]]'s labels — never additive. Output: one row per
    * (probe_id, index_id) candidate pair above `threshold`, with the sizes
    * both engines computed under the stored vocabulary.
    *
    * Plan shape: batch postings broadcast onto ONE stored scan (match by
    * shingle), matched rows explode their bounded postings (≤ cap), and only
    * candidates shuffle into the per-pair aggregation — O(store columns)
    * read, O(batch-touching postings) work. The broadcast bounds the BATCH
    * (a micro-batch is small relative to the corpus — the
    * [[LshIndex.candidates]] assumption); a rebuild-catch-up batch too big
    * to broadcast passes `broadcastBatch = false` for a shuffled equi-join
    * already co-keyed with the store's (sb, s) layout.
    */
  def probePairs(
      spark: SparkSession,
      indexPath: String,
      batchDocs: DataFrame,
      threshold: Double = 0.6,
      broadcastBatch: Boolean = true): DataFrame = {
    val over = spark.read.parquet(s"$indexPath/_overcap")
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val batch0 = DedupOps.shingleOccurrencesOf(batchDocs)
      .join(over, Seq("s"), "left_anti")
      .withColumn("n_probe", sum("c").over(wDoc))
      .withColumn("sb", pmod(hash(col("s")), lit(NumBuckets)))
      .select(col("sb"), col("s"), col("doc_id").as("probe_id"),
        col("c").as("pc"), col("n_probe"))
    val batch = if (broadcastBatch) broadcast(batch0) else batch0
    read(spark, indexPath)
      .join(batch, Seq("sb", "s"))
      .select(col("probe_id"), col("pc"), col("n_probe"),
        explode(col("postings")).as("e"))
      .select(col("probe_id"), col("pc"), col("n_probe"),
        col("e.doc_id").as("index_id"), col("e.c").as("ic"),
        col("e.n_shingles").as("n_index"))
      // self-match exclusion by id (the LshIndex.candidates contract): a
      // probe doc whose id was already stored must not pair with itself
      .filter(col("probe_id") =!= col("index_id"))
      .groupBy("probe_id", "index_id")
      .agg(sum(col("pc") * col("ic")).as("inter"),
        first(col("n_probe")).as("n_probe"), first(col("n_index")).as("n_index"))
      .withColumn("jaccard",
        col("inter") / (col("n_probe") + col("n_index") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("probe_id", "index_id", "inter", "n_probe", "n_index", "jaccard")
      .orderBy("probe_id", "index_id")
  }

  /** The end-to-end STREAMING ADMISSION pipeline: each micro-batch of new
    * documents probes the stored posting lists ([[probePairs]] — stale-df
    * vocabulary, candidates only where the batch genuinely near-duplicates
    * the corpus) and absorbs the oriented pairs into a [[PairStore]] as a
    * replay-idempotent segment, with the store's cadenced label refresh.
    * The posting store itself stays fixed across the stream (it is a
    * global-fixpoint artifact — see [[probePairs]]); a rebuild at the next
    * corpus generation is the refresh step, exactly like
    * [[PairStore.refreshLabels]] recomputes its fixpoint.
    *
    * '''Guarantee — and its boundary (review r14)''': the probe answers the
    * admission question "does this new document near-duplicate the CORPUS?"
    * exactly. Pairs among STREAMED documents — same batch or across batches
    * within one rebuild window — are NOT generated here: the posting store
    * cannot absorb a batch (df caps are corpus-global), so unlike
    * [[LshIndex.streamingAbsorb]] (per-doc signatures, absorbable per
    * batch), a duplicate flood arriving within the window pairs up only at
    * the next rebuild, whose full/incremental pair set covers every
    * stream-vs-stream pair and reaches the same [[PairStore]] fixpoint. A
    * pipeline that must catch in-window floods runs the LSH index's
    * absorbable probe BESIDE this one (recall-bounded in-window, exact at
    * rebuild) — the standard two-tier admission.
    */
  def streamingAdmission(
      docsStream: DataFrame, indexPath: String, pairStorePath: String,
      checkpoint: String, threshold: Double = 0.6, refreshEvery: Int = 5)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(refreshEvery >= 1, "refreshEvery must be >= 1")
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pairs = orientProbePairs(probePairs(spark, indexPath, batch, threshold))
        PairStore.appendPairs(spark, pairStorePath, pairs,
          PairStore.StreamingSegmentBase + batchId)
        if (batchId % refreshEvery == refreshEvery - 1) {
          PairStore.refreshLabels(spark, pairStorePath)
          ()
        }
      }
  }

  /** The FULL corpus pair set from the stored posting lists — the same rows
    * as [[DedupOps.ngramJaccardPairs]] (one oracle gates both), join-free:
    * one scan, per-shingle (a < b) expansion inside the bounded array, per-
    * pair aggregation. Where the live derivation pays the corpus's heaviest
    * pipeline (tokenize → explode → df → window → shingle SELF-JOIN), the
    * served form reads ~(s, postings) once and shuffles only candidate
    * pairs — the serving path every downstream pair consumer (PairStore
    * builds, cluster refreshes) takes once the store exists.
    */
  def allPairs(
      spark: SparkSession, indexPath: String, threshold: Double = 0.6): DataFrame = {
    val pairsOf = flatten(transform(
      col("postings"),
      a => transform(
        filter(col("postings"), b => a.getField("doc_id") < b.getField("doc_id")),
        b => struct(a.as("a"), b.as("b")))))
    readForExpand(spark, indexPath)
      .select(explode(pairsOf).as("p"))
      .select(
        col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"),
        (col("p.a.c") * col("p.b.c")).as("cc"),
        col("p.a.n_shingles").as("na"), col("p.b.n_shingles").as("nb"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("cc")).as("inter"),
        first(col("na")).as("n_a"), first(col("nb")).as("n_b"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Directional CONTAINMENT pairs from the stored posting lists — the same
    * rows as [[DedupOps.containmentPairs]] (one oracle gates both): the
    * candidate statistics are identical to [[allPairs]]' (same store, same
    * bounded per-shingle expansion, same per-pair aggregation); only the
    * scoring tail differs (inter/|A| and inter/|B| against the asymmetric
    * threshold instead of Jaccard). Serving the short-page-quoted-inside-
    * long-page detector from the store costs one scan, like every other
    * consumer of the pair family.
    */
  def containmentPairsStored(
      spark: SparkSession, indexPath: String, threshold: Double = 0.8): DataFrame = {
    val pairsOf = flatten(transform(
      col("postings"),
      a => transform(
        filter(col("postings"), b => a.getField("doc_id") < b.getField("doc_id")),
        b => struct(a.as("a"), b.as("b")))))
    readForExpand(spark, indexPath)
      .select(explode(pairsOf).as("p"))
      .select(
        col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"),
        (col("p.a.c") * col("p.b.c")).as("cc"),
        col("p.a.n_shingles").as("na"), col("p.b.n_shingles").as("nb"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("cc")).as("inter"),
        first(col("na")).as("n_a"), first(col("nb")).as("n_b"))
      .withColumn("cont_a", col("inter") / col("n_a"))
      .withColumn("cont_b", col("inter") / col("n_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "cont_a", "cont_b")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------
  // Generational root (VERDICT r14 #2): posting stores are per-generation
  // global-fixpoint artifacts (df caps and per-doc sizes are corpus-global),
  // so a governed stream that REBUILDS needs a durable layout to flip —
  // `<root>/gen=<n>/` each holding one complete store. "Current" is derived,
  // never pointed at: the highest generation whose postings write committed
  // its `_SUCCESS` marker (the PairStore.completeLabelIds discipline), so a
  // crash mid-rebuild leaves readers on the old generation, a restart
  // numbers past the debris, and no pointer file can be torn.
  // ---------------------------------------------------------------------

  def generationPath(root: String, gen: Long): String = s"$root/gen=$gen"

  /** Every gen=<n> dir under the root, complete or not — rebuild numbering
    * must skip debris a crashed build left behind (its batch=0 would make
    * [[materializeDocs]]' fresh-path guard refuse forever).
    */
  private def allGenerationIds(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
  }

  /** Generations whose postings committed whole (batch=0/_SUCCESS). */
  private def completeGenerationIds(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    allGenerationIds(spark, root).filter(g => fs.exists(
      new org.apache.hadoop.fs.Path(s"${generationPath(root, g)}/batch=0/_SUCCESS")))
  }

  /** The serving generation: highest COMPLETE one. */
  def currentGeneration(spark: SparkSession, root: String): Long = {
    val ids = completeGenerationIds(spark, root)
    require(ids.nonEmpty, s"no complete posting-store generation under $root — " +
      "run initGenerations first")
    ids.max
  }

  def currentGenerationPath(spark: SparkSession, root: String): String =
    generationPath(root, currentGeneration(spark, root))

  /** Bootstrap a generational root: the corpus into gen=0. */
  def initGenerations(
      spark: SparkSession, root: String, docs: DataFrame,
      cap: Int = DedupOps.RawDfCap): Unit =
    materializeDocs(spark, docs, generationPath(root, 0L), cap)

  /** Build the NEXT generation from `docs` and make it current by
    * completion (the `_SUCCESS` rule above) — the old generation stays on
    * disk so concurrent readers finish on it; [[pruneGenerations]] reclaims
    * history. Returns the new generation id.
    */
  def rebuildGeneration(
      spark: SparkSession, root: String, docs: DataFrame,
      cap: Int = DedupOps.RawDfCap): Long = {
    val next = (allGenerationIds(spark, root) :+ -1L).max + 1
    materializeDocs(spark, docs, generationPath(root, next), cap)
    next
  }

  /** Keep the newest `keep` complete generations, delete the rest (and any
    * incomplete debris older than the newest complete one). Returns the
    * number of generation dirs deleted.
    */
  def pruneGenerations(spark: SparkSession, root: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the current generation")
    val complete = completeGenerationIds(spark, root).sorted
    val keepSet = complete.takeRight(keep).toSet
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val drop = allGenerationIds(spark, root)
      .filter(g => !keepSet.contains(g) && complete.nonEmpty && g < complete.max)
    drop.foreach(g =>
      fs.delete(new org.apache.hadoop.fs.Path(generationPath(root, g)), true))
    drop.length
  }

  /** Per-batch STALENESS SIGNAL of the admission path (VERDICT r14 #2) —
    * the shingle store's analogue of the IVF index's drift ratio, one
    * aggregate per batch: of the batch's distinct shingles,
    *
    *  - `unseen_frac`: the fraction in NEITHER the postings nor the stored
    *    `_overcap` set. Unseen shingles count toward probe sizes but can
    *    match nothing, so the exact tier's in-window blind spot grows
    *    exactly with this number — it is the signal a rebuild threshold
    *    watches.
    *  - `overcap_frac`: the fraction the stored vocabulary capped. High
    *    values mean the batch is mostly boilerplate the store already
    *    judged — NOT staleness (those shingles are correctly dropped on
    *    both sides), published so an operator can tell the two apart.
    *
    * Returns (n_batch_shingles, unseen_frac, overcap_frac).
    */
  def admissionStaleness(
      spark: SparkSession, indexPath: String, batchDocs: DataFrame): (Long, Double, Double) = {
    val row = admissionStalenessCounts(spark, indexPath, batchDocs).head()
    val n = row.getLong(0)
    if (n == 0L) (0L, 0.0, 0.0)
    else (n, row.getLong(1).toDouble / n, row.getLong(2).toDouble / n)
  }

  /** Column form of [[admissionStaleness]] — INTEGER-exact counts (one row:
    * n_shingles, n_unseen, n_overcap), so the governance signal itself is
    * oracle-gateable (a DuckDB twin restates the split from the raw tables;
    * fractions would hash-compare on float rendering).
    *
    * Plan shape is the [[probePairs]] rule: the BATCH broadcasts and the
    * store streams — the store relations are scanned once, column-pruned to
    * `s`, with the tiny batch set as the hash side, so no store bytes ever
    * shuffle (a left join keyed the other way would hash-or-shuffle the
    * corpus vocabulary per batch). The store's postings and `_overcap` sets
    * are DISJOINT by construction (df ≤ cap vs > cap), so unseen derives as
    * n − in_store − over from the one marked scan; the two 1-row aggregates
    * compose by the driver-less broadcast crossJoin pattern.
    */
  def admissionStalenessCounts(
      spark: SparkSession, indexPath: String, batchDocs: DataFrame): DataFrame = {
    val batchSh = DedupOps.shingleOccurrencesOf(batchDocs).select("s").distinct()
    val marked = read(spark, indexPath).select(col("s"), lit("store").as("src"))
      .unionByName(spark.read.parquet(s"$indexPath/_overcap")
        .select(col("s"), lit("over").as("src")))
      .join(broadcast(batchSh), Seq("s"))
      .agg(
        coalesce(sum(when(col("src") === "store", 1L).otherwise(0L)), lit(0L))
          .as("n_in_store"),
        coalesce(sum(when(col("src") === "over", 1L).otherwise(0L)), lit(0L))
          .as("n_overcap"))
    batchSh.agg(count(lit(1)).as("n_shingles"))
      .crossJoin(broadcast(marked))
      .select(
        col("n_shingles"),
        (col("n_shingles") - col("n_in_store") - col("n_overcap")).as("n_unseen"),
        col("n_overcap"))
  }

  /** Per-DOCUMENT staleness split (VERDICT r15 #2 — the dilution hole of the
    * per-batch aggregate): [[admissionStalenessCounts]] is one aggregate over
    * the batch's DISTINCT shingles, so a batch where 30% of documents carry
    * new vocabulary reads ≈ natural + 0.03 and never trips while the exact
    * tier's blind spot grows for exactly those documents. This is the same
    * split stated per document — one row per batch doc that produced
    * shingles: (doc_id, n_shingles, n_unseen, n_overcap), integer-exact so
    * the signal is oracle-gateable — and the doc-level policy input: a doc
    * whose OWN unseen fraction clears the drift band is drifted no matter
    * how its batch-mates dilute the aggregate.
    *
    * Plan shape is the [[probePairs]] rule: the batch's (doc_id, s) set
    * broadcasts onto ONE store scan (postings ∪ `_overcap`, column-pruned to
    * `s`), so no store bytes shuffle; the per-doc counts and the per-doc
    * totals are both batch-bounded aggregates and join broadcast.
    */
  def admissionStalenessByDoc(
      spark: SparkSession, indexPath: String, batchDocs: DataFrame): DataFrame = {
    val batchSh = DedupOps.shingleOccurrencesOf(batchDocs).select("doc_id", "s")
    val marked = read(spark, indexPath).select(col("s"), lit("store").as("src"))
      .unionByName(spark.read.parquet(s"$indexPath/_overcap")
        .select(col("s"), lit("over").as("src")))
      .join(broadcast(batchSh), Seq("s"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("src") === "store", 1L).otherwise(0L)).as("n_in_store"),
        sum(when(col("src") === "over", 1L).otherwise(0L)).as("n_over"))
    batchSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(broadcast(marked), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_shingles"),
        (col("n_shingles") - coalesce(col("n_in_store"), lit(0L))
          - coalesce(col("n_over"), lit(0L))).as("n_unseen"),
        coalesce(col("n_over"), lit(0L)).as("n_overcap"))
      .orderBy("doc_id")
  }

  /** Doc-level drift counter the governed pipeline trips on: of the batch
    * docs that produced shingles, how many have an own unseen fraction
    * ≥ `band`. Returns (n_docs, n_drifted) from one action over the
    * batch-bounded [[admissionStalenessByDoc]] frame.
    */
  def admissionDocDrift(
      spark: SparkSession, indexPath: String, batchDocs: DataFrame,
      band: Double): (Long, Long) = {
    val r = admissionStalenessByDoc(spark, indexPath, batchDocs)
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(when(
          col("n_unseen") >= col("n_shingles") * band, 1L).otherwise(0L)),
          lit(0L)).as("n_drifted"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Orient a [[probePairs]] result into the [[PairStore]] pair contract
    * (id_a < id_b, sizes re-labeled to match).
    */
  private[dedup] def orientProbePairs(pairs: DataFrame): DataFrame =
    pairs.select(
      least(col("probe_id"), col("index_id")).as("id_a"),
      greatest(col("probe_id"), col("index_id")).as("id_b"),
      col("inter"),
      when(col("probe_id") < col("index_id"), col("n_probe"))
        .otherwise(col("n_index")).as("n_a"),
      when(col("probe_id") < col("index_id"), col("n_index"))
        .otherwise(col("n_probe")).as("n_b"),
      col("jaccard"))

  // ---------------------------------------------------------------------
  // Memoized corpus store (the PairStore.ensure discipline): build once per
  // JVM per corpus CONTENT + cap, probe thereafter.
  // ---------------------------------------------------------------------

  private val ensured = scala.collection.mutable.Map.empty[(String, Int, String), String]

  /** Memo insert with SUPERSEDED-GENERATION eviction (the hotBucketCache
    * putHotRows rule, review r14): a corpus rewritten in place N times must
    * not leave N map entries and N orphaned full-corpus store directories —
    * on building a fresh generation for the same (label, cap), the stale
    * generations' entries are dropped and their temp dirs queued for
    * DEFERRED deletion at JVM exit (ADVICE r14: an eager delete raced a
    * concurrent thread's in-flight DataFrame over the old path — e.g. a
    * catalog query racing a corpus rewrite — into a mid-query
    * FileNotFoundException; deferred, such a reader completes on stale data,
    * the honest lagging-view failure mode, and the bytes are reclaimed when
    * the process ends). Bounded: one stale dir per superseded corpus
    * generation this JVM actually built. Callers hold the `ensured` lock.
    */
  private val staleDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val staleDirReaper: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var d = staleDirs.poll()
      while (d != null) {
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
        d = staleDirs.poll()
      }
    }))

  private def ensureEvicting(
      label: String, cap: Int, fingerprint: String)(build: => String): String =
    ensured.getOrElseUpdate((label, cap, fingerprint), {
      ensured.keys.filter(k => k._1 == label && k._2 == cap).toSeq.foreach { stale =>
        ensured.remove(stale).foreach { dir => staleDirReaper; staleDirs.add(dir) }
      }
      build
    })

  /** Build (once per JVM per corpus fingerprint + cap) the postings store
    * for `sfDir`'s documents and return its path. A corpus rewritten in
    * place fingerprints differently and triggers a fresh build instead of
    * serving postings of data that no longer exists (and evicts the stale
    * generation's store — see [[ensureEvicting]]).
    */
  def ensure(spark: SparkSession, sfDir: String, cap: Int = DedupOps.RawDfCap): String =
    ensured.synchronized {
      ensureEvicting(sfDir, cap, corpusFingerprint(spark, sfDir)) {
        val dir = java.nio.file.Files.createTempDirectory("graft_shingleidx").toString
        materialize(spark, sfDir, dir, cap)
        dir
      }
    }

  /** Fingerprint of the corpus a memoized store derives from. Per data file:
    * (name, length, mtime) PLUS a CRC32 of the file's tail — the parquet
    * FOOTER region, whose row-group metadata and column statistics change
    * with any content change. The tail checksum closes the mtime-granularity
    * hole (ADVICE r14): an in-place rewrite producing same-named same-length
    * files within the filesystem's timestamp granularity (1 s on some
    * filesystems) otherwise fingerprints identically and the memo keeps
    * serving postings of the vanished corpus. IO is bounded: ≤ 64 KiB read
    * per part file per call, against files the very next action scans whole.
    */
  private[dedup] def corpusFingerprint(spark: SparkSession, sfDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root)
      .filter(_.isFile)
      .map { s =>
        val crc = new java.util.zip.CRC32()
        val tail = math.min(s.getLen, 65536L)
        val buf = new Array[Byte](tail.toInt)
        val in = fs.open(s.getPath)
        try { in.readFully(s.getLen - tail, buf) } finally in.close()
        crc.update(buf)
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}:${crc.getValue}"
      }
      .sorted
    java.util.UUID.nameUUIDFromBytes(parts.mkString("\n").getBytes("UTF-8")).toString
  }

  /** Catalog form: the every-fifth-document batch admitted against the
    * stored postings — same rows as `q_jaccard_incremental` (one oracle
    * serves both; this row gates the STORED path).
    */
  def qJaccardIncrementalStored(spark: SparkSession, sfDir: String): DataFrame =
    incrementalPairs(spark, ensure(spark, sfDir), _ % 5 === 0)

  /** Catalog form of [[allPairs]] — same rows as `q_ngram_jaccard_pairs`
    * (one oracle serves both; this row gates the served full derivation).
    */
  def qNgramJaccardPairsStored(spark: SparkSession, sfDir: String): DataFrame =
    allPairs(spark, ensure(spark, sfDir))

  /** Catalog form of [[containmentPairsStored]] — same rows as
    * `q_containment_pairs` (one oracle serves both).
    */
  def qContainmentPairsStored(spark: SparkSession, sfDir: String): DataFrame =
    containmentPairsStored(spark, ensure(spark, sfDir))

  /** Catalog form of [[probePairs]]: the store holds the corpus as it stood
    * BEFORE the batch (doc_id % 5 ≠ 0), and the % 5 = 0 documents arrive as
    * the new batch probing it — the streaming-admission timeline under the
    * oracle gate, stale-vocabulary semantics and all (the oracle restates
    * the over-cap rule from the pre-batch corpus independently).
    */
  /** The pre-batch (doc_id % 5 ≠ 0) admission store, built once per corpus
    * generation — shared fixture of [[qJaccardAdmissionProbe]] and
    * [[qAdmissionStaleness]].
    */
  private def ensureAdmissionStore(spark: SparkSession, sfDir: String): String =
    ensured.synchronized {
      ensureEvicting(
        s"$sfDir#admission", DedupOps.RawDfCap, corpusFingerprint(spark, sfDir)) {
        val dir = java.nio.file.Files.createTempDirectory("graft_shingleidx_adm").toString
        materializeDocs(spark,
          graft.Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("text")),
          dir)
        dir
      }
    }

  /** The % 5 = 0 admission batch. NOT fanned (r16, measured): the batch
    * is a 20% slice, small enough that the fan-out exchange costs more than
    * the single-task explode it spreads — interleaved A/B on/off = 1.30
    * (q_admission_staleness) / 1.26 (by_doc); the probe's 0.96 is noise.
    */
  private def admissionBatch(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))

  def qJaccardAdmissionProbe(spark: SparkSession, sfDir: String): DataFrame =
    probePairs(spark, ensureAdmissionStore(spark, sfDir),
      admissionBatch(spark, sfDir))

  /** Catalog form of [[admissionStalenessCounts]] on the same pre-batch
    * split as [[qJaccardAdmissionProbe]]: the % 5 = 0 documents arrive as
    * the new batch, and the governance signal the two-tier pipeline watches
    * — the batch's distinct shingles partitioned into stored / over-cap /
    * unseen — is stated as integer counts the oracle restates independently
    * from the raw tables.
    */
  def qAdmissionStaleness(spark: SparkSession, sfDir: String): DataFrame =
    admissionStalenessCounts(spark, ensureAdmissionStore(spark, sfDir),
      admissionBatch(spark, sfDir))

  /** DuckDB twin of [[qAdmissionStaleness]]: the same split with its own df
    * cap — a batch shingle is unseen iff it appears in NO pre-batch doc,
    * over-cap iff its pre-batch doc frequency exceeds the cap.
    */
  def admissionStalenessSql(cap: Int = DedupOps.RawDfCap): String = {
    val k = DedupOps.ShingleK
    val sh = DedupOps.shinglesSql("text")
    s"""WITH corpus0 AS (
       |  SELECT doc_id, unnest($sh) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 <> 0),
       |cdf AS (SELECT s, count(*) AS df FROM corpus0 GROUP BY 1),
       |batch_sh AS (
       |  SELECT DISTINCT s FROM (
       |    SELECT unnest($sh) AS s
       |    FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 = 0))
       |SELECT count(*) AS n_shingles,
       |       CAST(coalesce(sum(CASE WHEN df IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unseen,
       |       CAST(coalesce(sum(CASE WHEN df > $cap THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_overcap
       |FROM batch_sh LEFT JOIN cdf USING (s)""".stripMargin
  }

  /** Catalog form of [[admissionStalenessByDoc]] on the same pre-batch split
    * as [[qAdmissionStaleness]] — the per-document signal the doc-level
    * drift policy reads, as an integer-exact relation the oracle restates
    * independently from the raw tables.
    */
  def qAdmissionStalenessByDoc(spark: SparkSession, sfDir: String): DataFrame =
    admissionStalenessByDoc(spark, ensureAdmissionStore(spark, sfDir),
      admissionBatch(spark, sfDir))

  /** DuckDB twin of [[qAdmissionStalenessByDoc]]: the per-doc restatement of
    * [[admissionStalenessSql]] — a batch doc's shingle is unseen iff it
    * appears in NO pre-batch doc, over-cap iff its pre-batch doc frequency
    * exceeds the cap; docs under ShingleK tokens produce no shingles and no
    * row, on both engines.
    */
  def admissionStalenessByDocSql(cap: Int = DedupOps.RawDfCap): String = {
    val k = DedupOps.ShingleK
    val sh = DedupOps.shinglesSql("text")
    s"""WITH corpus0 AS (
       |  SELECT doc_id, unnest($sh) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 <> 0),
       |cdf AS (SELECT s, count(*) AS df FROM corpus0 GROUP BY 1),
       |batch_sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest($sh) AS s
       |    FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 = 0))
       |SELECT doc_id, count(*) AS n_shingles,
       |       CAST(coalesce(sum(CASE WHEN df IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unseen,
       |       CAST(coalesce(sum(CASE WHEN df > $cap THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_overcap
       |FROM batch_sh LEFT JOIN cdf USING (s)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[qJaccardAdmissionProbe]]: an independent restatement
    * (no posting lists) of the same split — corpus = doc_id % 5 ≠ 0 with its
    * own df cap, batch = % 5 = 0 sized under the corpus's over-cap set.
    */
  def jaccardAdmissionProbeSql(
      threshold: Double = 0.6, cap: Int = DedupOps.RawDfCap): String = {
    val k = DedupOps.ShingleK
    val sh = DedupOps.shinglesSql("text")
    s"""WITH corpus0 AS (
       |  SELECT doc_id, unnest($sh) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 <> 0),
       |cdf AS (SELECT s, count(*) AS df FROM corpus0 GROUP BY 1),
       |kept_c AS (
       |  SELECT doc_id, s FROM corpus0
       |  WHERE s IN (SELECT s FROM cdf WHERE df <= $cap)),
       |sizes_c AS (SELECT doc_id, count(*) AS n_index FROM kept_c GROUP BY 1),
       |batch0 AS (
       |  SELECT doc_id, unnest($sh) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= $k AND doc_id % 5 = 0),
       |kept_b AS (
       |  SELECT doc_id, s FROM batch0
       |  WHERE s NOT IN (SELECT s FROM cdf WHERE df > $cap)),
       |sizes_b AS (SELECT doc_id, count(*) AS n_probe FROM kept_b GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS probe_id, b.doc_id AS index_id, count(*) AS inter
       |  FROM kept_b a JOIN kept_c b ON a.s = b.s GROUP BY 1, 2)
       |SELECT probe_id, index_id, inter, sb.n_probe AS n_probe,
       |       sc.n_index AS n_index,
       |       inter / (sb.n_probe + sc.n_index - inter) AS jaccard
       |FROM inter
       |JOIN sizes_b sb ON inter.probe_id = sb.doc_id
       |JOIN sizes_c sc ON inter.index_id = sc.doc_id
       |WHERE inter / (sb.n_probe + sc.n_index - inter) >= $threshold
       |ORDER BY probe_id, index_id""".stripMargin
  }
}
