package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shape of a hamming fingerprint: an ordered list of 32-bit word
  * columns plus the band width in bits. Bands tile the words low-to-high
  * (band j lives in word `j / bandsPerWord` at bit offset
  * `bandBits·(j % bandsPerWord)`), so [[Fp64]]'s layout is byte-identical to
  * the r7 fixed shape. Keeping words at 32 bits is deliberate: DuckDB's
  * signed BIGINT overflows assembling bit 63, so every engine-visible
  * fingerprint stays as sign-safe 32-bit values (STATE r8 gotcha).
  *
  * The band width is the multi-index-hashing occupancy knob: with B-bit
  * bands each band hashes into 2^B buckets, and the band self-join's
  * candidate volume is Σ occupancy² ≈ n²/2^B per band. 8-bit bands (256
  * buckets) go quadratic at a ~10⁵ corpus; 16-bit bands (65 536 buckets)
  * push the knee out 256×, which is why the wide image fingerprint uses
  * them.
  */
final case class FpShape(wordCols: Seq[String], bandBits: Int, activeBands: Int = 0) {
  require(bandBits > 0 && 32 % bandBits == 0, s"band width $bandBits must divide 32")
  val bandsPerWord: Int = 32 / bandBits
  private val fullBands: Int = wordCols.size * bandsPerWord
  require(activeBands >= 0 && activeBands <= fullBands,
    s"activeBands $activeBands must be in [0, $fullBands]")

  /** Number of bands that actually carry fingerprint bits. `activeBands = 0`
    * (the default) means every band of every word; a positive value keeps
    * only the LOW `activeBands` bands for a fingerprint narrower than its
    * word tiling (e.g. the 56-bit SimHash over two 32-bit words: 14 active
    * 4-bit bands, with fp_hi's top byte unused). CONTRACT: the bits beyond
    * the active bands must be CONSTANT across the relation (normally zero
    * padding) — they contribute nothing to any pair's hamming distance, so
    * the pigeonhole bound over the active bands still covers it. A varying
    * high bit would add distance no band can see and silently break the
    * ≤ maxDist guarantee.
    */
  val nBands: Int = if (activeBands == 0) fullBands else activeBands

  /** Pigeonhole-guaranteed distance bound: pairs within hamming distance
    * `nBands - 1` must agree exactly on ≥ 1 band.
    */
  val maxDist: Int = nBands - 1
  val mask: Int = (1 << bandBits) - 1

  /** Band j → (word column, bit offset). */
  def band(j: Int): (String, Int) =
    (wordCols(j / bandsPerWord), bandBits * (j % bandsPerWord))
}

object FpShape {
  /** 64-bit (fp_lo, fp_hi) with 8-bit bands — the r7 layout: bytes 0..3 of
    * fp_lo, then bytes 0..3 of fp_hi.
    */
  val Fp64: FpShape = FpShape(Seq("fp_lo", "fp_hi"), 8)

  /** 256-bit (fp_w0..fp_w7) with 16-bit bands (2^16 buckets per band) — the
    * corpus-scale shape for wide perceptual hashes.
    */
  val Fp256: FpShape = FpShape((0 until 8).map(i => s"fp_w$i"), 16)

  /** 56-bit SimHash (fp_lo = bits 0..31, fp_hi = bits 32..55) with 4-bit
    * bands, 14 active: the narrowest width whose pigeonhole bound (13)
    * covers the distance-9 text near-dup threshold. fp_hi's top byte is
    * zero by construction (the 56-bit hash keeps every engine-visible value
    * positive in a signed 64-bit lane), satisfying the activeBands
    * constant-padding contract.
    */
  val FpSim56: FpShape = FpShape(Seq("fp_lo", "fp_hi"), 4, activeBands = 14)
}

/** Durable hamming-space fingerprint index — [[LshIndex]]'s discipline
  * (materialize once, probe per batch, replay-idempotent `batch=<id>`
  * segments) applied to perceptual/semantic fingerprints: image hashes
  * ([[graft.multimodal.MediaOps.imageAHash]] /
  * [[graft.multimodal.MediaOps.imageWideHash]]), text SimHashes, or any
  * relation of 32-bit fingerprint words keyed by `id`.
  *
  * Candidates come from a pigeonhole band equi-join: the fingerprint splits
  * into `shape.nBands` disjoint bands, and any pair within hamming distance
  * `shape.maxDist` must agree exactly on ≥ 1 band — candidate volume scales
  * with rows × bands, never rows². A pair agreeing on k bands would surface
  * k times; keeping only the FIRST agreeing band (computable from the xor
  * words row-wise) emits each pair exactly once with NO distinct() — the
  * probe plan is scan → broadcast join → codegen'd filter, zero shuffles.
  *
  * Every operation takes the [[FpShape]]; the default is the 64-bit 8-bit-
  * band layout. One index path holds ONE shape — band tables of different
  * shapes must not share a directory.
  */
object FingerprintIndex {

  /** Compatibility aliases for the r7 fixed-64-bit surface. */
  val NBands: Int = FpShape.Fp64.nBands
  val MaxDist: Int = FpShape.Fp64.maxDist

  private def bandVal(word: Column, off: Int, mask: Int): Column =
    shiftright(word, off).bitwiseAND(mask).cast("int")

  /** One row per (id, band): id, <fingerprint words>, band_idx, band_val. */
  def bandTable(fps: DataFrame, shape: FpShape = FpShape.Fp64): DataFrame = {
    val words = shape.wordCols.map(col)
    fps.select(
      (col("id") +: words) :+
        explode(array((0 until shape.nBands).map { b =>
          val (word, off) = shape.band(b)
          struct(lit(b).as("band_idx"), bandVal(col(word), off, shape.mask).as("band_val"))
        }: _*)).as("b"): _*)
      .select((col("id") +: words) :+ col("b.band_idx") :+ col("b.band_val"): _*)
  }

  /** Keep exactly the row whose band_idx is the pair's first agreeing band.
    * `x<i>` are the xor words of the joined pair (in `shape.wordCols`
    * order), so "band j agrees" is a row-wise bit test — no lookup, no
    * distinct.
    */
  /** With a hot-bucket map, the emitting band is the first agreeing band
    * whose bucket SURVIVES the cap — agreeing bands dropped as hot cannot
    * emit (their rows are gone), so treating them as non-candidates keeps
    * exactly-once emission through the remaining bands. `wordOf` resolves a
    * fingerprint word column in the joined row (agreeing bands have equal
    * values on both sides, so either side decides hot-ness).
    */
  private def isFirstAgreeingBand(
      shape: FpShape,
      hot: Map[Int, Set[Int]] = Map.empty,
      wordOf: String => Column = col(_)): Column = {
    def agreesAt(j: Int): Column = {
      val (word, off) = shape.band(j)
      val x = col(s"x${shape.wordCols.indexOf(word)}")
      shiftright(x, off).bitwiseAND(shape.mask) === 0
    }
    // Linear form: build the bitmask of (surviving) agreeing bands — one
    // term per band — and keep the row whose band is its LOWEST set bit
    // (mask & -mask). The per-pair boolean "band b and no earlier surviving
    // agreeing band" expands to O(nBands²) terms (≈136 at 16 bands), big
    // enough to fall off whole-stage codegen and run interpreted per
    // candidate — measured 1.3 µs/candidate on the wide shape before this
    // rewrite. The joined row's own band always contributes a bit (it
    // agreed, and hot rows were filtered before the join), so mask ≥ 1.
    val agreeMask = (0 until shape.nBands).map { j =>
      when(agreesAt(j) && !hotAt(shape, hot, wordOf)(j), lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    call_function("shiftleft", lit(1), col("band_idx")) ===
      agreeMask.bitwiseAND(-agreeMask)
  }

  /** A band-table row sitting in a hot bucket (its own (band_idx, band_val)
    * is over the cap).
    */
  private def rowInHotBucket(hot: Map[Int, Set[Int]]): Column =
    hot.toSeq.sortBy(_._1).map { case (j, vals) =>
      col("band_idx") === j && col("band_val").isin(vals.toSeq.sorted: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))

  private def hammingOf(shape: FpShape): Column =
    shape.wordCols.indices.map(i => bit_count(col(s"x$i"))).reduce(_ + _).cast("int")

  /** Over-occupied (band_idx → band_vals) buckets of a band relation — the
    * hamming analogue of the shingle df table, collected to the driver as
    * bounded model state (a bucket is "hot" only past `occupancyCap`, so the
    * list is the handful of degenerate fingerprint regions — black frames,
    * silence, boilerplate — not data).
    */
  private def hotBucketsOf(bands: DataFrame, occupancyCap: Int): Map[Int, Set[Int]] =
    bands.groupBy("band_idx", "band_val").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > occupancyCap)
      .select("band_idx", "band_val").collect()
      .groupBy(_.getInt(0)).map { case (b, rows) => b -> rows.map(_.getInt(1)).toSet }

  /** Row-wise "band j's bucket is hot" test, evaluated from the fingerprint
    * words themselves (agreeing bands share their value on both sides, so
    * the index side's words decide) — hot-bucket suppression stays a
    * codegen'd filter, never a join or shuffle.
    */
  private def hotAt(shape: FpShape, hot: Map[Int, Set[Int]], wordOf: String => Column)(j: Int): Column =
    hot.get(j).filter(_.nonEmpty) match {
      case None => lit(false)
      case Some(vals) =>
        val (word, off) = shape.band(j)
        val v = shiftright(wordOf(word), off).bitwiseAND(shape.mask)
        // isin compiles to In/InSet (hash lookup under codegen) — an
        // OR-chain over a large hot set runs interpreted per candidate
        v.isin(vals.toSeq.sorted: _*)
    }

  /** One-shot near-dup pairs within a fingerprint relation: hamming ≤
    * maxDist, each unordered pair once as id_a < id_b. `maxDist = -1` (the
    * default sentinel) resolves to the shape's pigeonhole bound
    * ([[FpShape.maxDist]]); any other negative value fails loudly.
    */
  /** With `occupancyCap` set, buckets holding more than that many rows are
    * dropped BEFORE the self-join — the df-cap discipline applied to
    * fingerprint space. A degenerate region (black frames, silence,
    * boilerplate) costs occupancy²/2 join rows per hot bucket; capping drops
    * exactly those candidates while every pair with at least one surviving
    * agreeing band still surfaces exactly once. The trade is explicit:
    * pairs whose EVERY agreeing band is degenerate (e.g. two all-black
    * frames) are suppressed, the same judgment df-capped shingles make for
    * boilerplate-only matches. Hot buckets are bounded driver state (only
    * over-cap buckets), so the plan stays join + codegen'd filter.
    */
  def pairsWithin(
      fps: DataFrame,
      maxDist: Int = -1,
      shape: FpShape = FpShape.Fp64,
      occupancyCap: Option[Int] = None): DataFrame = {
    // -1 (the SENTINEL, and the default) resolves to the SHAPE's pigeonhole
    // bound — the r8 advisory gap: a fixed default of Fp64's 7 silently
    // narrowed Fp256 callers from distance-15 to distance-7 matching unless
    // they remembered to pass maxDist themselves. ONLY -1 means "shape
    // bound": any other negative value is a caller bug (e.g. a computed
    // x - y going negative) that must fail, not silently widen matching to
    // the bound (r9 advisory).
    require(maxDist == -1 || maxDist >= 0,
      s"maxDist must be -1 (resolve to the shape's pigeonhole bound " +
        s"${shape.maxDist}) or >= 0; got $maxDist")
    val dist = if (maxDist == -1) shape.maxDist else maxDist
    require(dist <= shape.maxDist,
      s"pigeonhole over ${shape.nBands} bands covers distance ≤ ${shape.maxDist}")
    val blocks1 = bandTable(fps, shape)
    val hot = occupancyCap.map(hotBucketsOf(blocks1, _)).getOrElse(Map.empty)
    val blocks0 = if (hot.isEmpty) blocks1 else blocks1.filter(!rowInHotBucket(hot))
    // Spread the self-join by BUCKET, explicitly: the band table is tiny in
    // bytes (rows × bands), so AQE coalesces it to one partition — or
    // broadcasts one side — and the join's candidate fanout (Σ occupancy²
    // per band, orders of magnitude larger than the input) then evaluates
    // on a single task. Candidate volume follows bucket structure, not
    // input bytes; partitioning by (band_idx, band_val) at the session's
    // shuffle width spreads it, and the join reuses the exchange (same key)
    // so no extra shuffle lands at any scale. Measured on the 14-band
    // SimHash shape at sf0.1: 5.1 s single-task → sub-second at 32 tasks.
    val shuffleWidth = fps.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val blocks = blocks0.repartition(shuffleWidth, col("band_idx"), col("band_val"))
    blocks.as("a").join(
        blocks.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.band_idx").as("band_idx")) ++
          shape.wordCols.map(w => col(s"a.$w").as(w)) ++
          shape.wordCols.zipWithIndex.map { case (w, i) => expr(s"a.$w ^ b.$w").as(s"x$i") }: _*)
      .withColumn("hamming", hammingOf(shape))
      .filter(col("hamming") <= dist && isFirstAgreeingBand(shape, hot))
      .select("id_a", "id_b", "hamming")
  }

  /** Full build: fingerprint relation into segment 0. */
  def materialize(
      spark: SparkSession, fps: DataFrame, indexPath: String,
      shape: FpShape = FpShape.Fp64): Unit =
    appendBatch(spark, indexPath, fps, batchId = 0L, shape)

  /** Absorb `fps` as the `batch=<id>` segment — overwritten whole, so a
    * checkpoint-replayed batch rewrites the same rows (ingest idempotency).
    * band_idx is the partition column: probe joins on it are DPP-prunable
    * and [[compactSegments]] keeps the layout.
    */
  def appendBatch(
      spark: SparkSession, indexPath: String, fps: DataFrame, batchId: Long,
      shape: FpShape = FpShape.Fp64): Unit =
    bandTable(fps, shape)
      .write.mode("overwrite")
      .partitionBy("band_idx")
      .parquet(s"$indexPath/batch=$batchId")

  def compactSegments(
      spark: SparkSession, indexPath: String, protectLatest: Boolean = true): Int =
    graft.sources.Segments.compact(spark, indexPath, Seq("band_idx"), protectLatest)

  def read(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.option("basePath", indexPath).parquet(indexPath).drop("batch")

  /** Snapshot read — the index exactly as of `maxBatch` (the reproducibility
    * pin, [[graft.sources.Segments.readAsOf]] contract).
    */
  def readAsOf(spark: SparkSession, indexPath: String, maxBatch: Long): DataFrame =
    graft.sources.Segments.readAsOf(spark, indexPath, maxBatch)

  /** Near-dup candidates of a probe fingerprint batch against the stored
    * index: (probe_id, index_id, hamming), each pair once (first-agreeing-
    * band emission — no distinct, so the probe plan has zero shuffles when
    * the batch broadcasts). `excludeSegment`/`asOf` compose as in
    * [[LshIndex.candidates]]: replay determinism and snapshot pinning, both
    * partition-pruned on `batch`. `maxDist = -1` (the default sentinel)
    * resolves to the shape's pigeonhole bound; any other negative value
    * fails loudly.
    */
  def candidates(
      spark: SparkSession,
      indexPath: String,
      probeFps: DataFrame,
      maxDist: Int = -1,
      broadcastQuery: Boolean = true,
      excludeSegment: Option[Long] = None,
      asOf: Option[Long] = None,
      shape: FpShape = FpShape.Fp64,
      occupancyCap: Option[Int] = None): DataFrame = {
    // -1 is the only sentinel: it resolves to the shape's bound; any other
    // negative maxDist fails loudly (see [[pairsWithin]])
    require(maxDist == -1 || maxDist >= 0,
      s"maxDist must be -1 (resolve to the shape's pigeonhole bound " +
        s"${shape.maxDist}) or >= 0; got $maxDist")
    val dist = if (maxDist == -1) shape.maxDist else maxDist
    require(dist <= shape.maxDist,
      s"pigeonhole over ${shape.nBands} bands covers distance ≤ ${shape.maxDist}")
    val index0 = (asOf, excludeSegment) match {
      case (None, None) => read(spark, indexPath)
      case _ =>
        val snap = asOf
          .map(graft.sources.Segments.readAsOf(spark, indexPath, _, dropBatch = false))
          .getOrElse(spark.read.option("basePath", indexPath).parquet(indexPath))
        excludeSegment.map(id => snap.filter(col("batch") =!= id)).getOrElse(snap)
          .drop("batch")
    }
    // hot buckets are judged against the STORED index (the side whose
    // occupancy the skew metric watches); the probe batch rides the same cap
    val hot = occupancyCap.map(hotBucketsOf(index0, _)).getOrElse(Map.empty)
    val index = if (hot.isEmpty) index0 else index0.filter(!rowInHotBucket(hot))
    val probe0a = bandTable(probeFps, shape).select(
      Seq(col("id").as("probe_id")) ++
        shape.wordCols.map(w => col(w).as(s"p_$w")) ++
        Seq(col("band_idx"), col("band_val")): _*)
    val probe0 = if (hot.isEmpty) probe0a else probe0a.filter(!rowInHotBucket(hot))
    val probe = if (broadcastQuery) broadcast(probe0) else probe0
    index
      .join(probe, Seq("band_idx", "band_val"))
      .filter(col("id") =!= col("probe_id"))
      .select(
        Seq(col("probe_id"), col("id").as("index_id"), col("band_idx")) ++
          shape.wordCols.map(w => col(w)) ++
          shape.wordCols.zipWithIndex.map { case (w, i) => expr(s"p_$w ^ $w").as(s"x$i") }: _*)
      .withColumn("hamming", hammingOf(shape))
      .filter(col("hamming") <= dist && isFirstAgreeingBand(shape, hot))
      .select("probe_id", "index_id", "hamming")
  }

  /** Over-occupancy LEDGER of a fingerprint relation — the hamming-space
    * sibling of the IVF family's clamp ledger (VERDICT r13 #5: the
    * fingerprint index published `occupancySkew` but its hot-bucket
    * suppression dropped candidates silently). One grouped count over the
    * band table; each over-cap bucket reads with its occupancy and the
    * candidate-pair volume the cap suppressed THROUGH THAT BAND
    * (occ·(occ−1)/2 — the join work avoided; a pair can still surface
    * through another, surviving agreeing band, so this quantifies suppressed
    * CANDIDATES, the cost driver, not necessarily lost pairs).
    *
    * Why suppression + ledger IS the complete governance here — unlike the
    * IVF side, where grow-K re-fits geometry: a hamming band bucket's
    * occupancy is VALUE multiplicity. Identical fingerprints agree on every
    * band under ANY banding, so no band rotation or re-shard can split a
    * degenerate value mass (black frames, silence, boilerplate) — the IVF
    * analogue of "grow K until cells balance" structurally does not exist.
    * The available levers are exactly: a WIDER shape ([[FpShape.Fp256]]),
    * which thins benign collisions but not value multiplicity, and the
    * occupancy cap, which drops the degenerate region outright. What
    * governance owes the operator is therefore VISIBILITY: this ledger (and
    * its oracle-gated catalog rows) makes every capped bucket and its
    * suppressed candidate volume a queryable fact instead of a silent drop.
    */
  def occupancyLedger(
      fps: DataFrame, occupancyCap: Int, shape: FpShape = FpShape.Fp64): DataFrame =
    ledgerOfBands(bandTable(fps, shape), occupancyCap)

  /** [[occupancyLedger]] over the STORED index — what a maintenance cadence
    * queries next to [[occupancySkew]]. The stored band table already
    * carries the shape it was built with (band_idx/band_val columns), so no
    * shape parameter exists here: passing one could silently disagree with
    * the store's banding.
    */
  def occupancyLedgerOf(
      spark: SparkSession, indexPath: String, occupancyCap: Int): DataFrame =
    ledgerOfBands(read(spark, indexPath), occupancyCap)

  /** Shared ledger derivation over any band-rows frame — one place for the
    * over-cap rule and the suppressed-candidate formula, so the relation and
    * stored-index forms can never drift.
    */
  private def ledgerOfBands(bands: DataFrame, occupancyCap: Int): DataFrame =
    bands
      .groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("occupancy"))
      .filter(col("occupancy") > occupancyCap)
      .withColumn("dropped_candidate_pairs",
        expr("occupancy * (occupancy - 1) DIV 2"))
      .select("band_idx", "band_val", "occupancy", "dropped_candidate_pairs")
      .orderBy("band_idx", "band_val")

  /** Band-occupancy skew of the stored index: max bucket occupancy ÷ mean
    * occupancy over all (band_idx, band_val) buckets. The hamming index's
    * drift analogue of [[graft.ann.IvfIndex.driftRatio]]: the band self-join
    * costs Σ occupancy² per band, so one hot bucket (a constant fingerprint
    * region — black frames, silence, boilerplate) quadratically inflates
    * probe cost long before it breaks correctness. ≈ 1 means uniform; the
    * remedy for a persistently hot index is a wider shape ([[FpShape.Fp256]])
    * or the `occupancyCap` option on [[pairsWithin]]/[[candidates]], which
    * drops the degenerate buckets the way df-capped shingles drop
    * boilerplate.
    */
  def occupancySkew(spark: SparkSession, indexPath: String): Double = {
    val occ = read(spark, indexPath)
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("occ"))
      .agg(max("occ").cast("double").as("mx"), avg("occ").as("mean"))
      .head()
    if (occ.isNullAt(0) || occ.getDouble(1) == 0.0) 1.0
    else occ.getDouble(0) / occ.getDouble(1)
  }

  /** Segment-id offset for streaming batches (see
    * [[LshIndex.StreamingSegmentBase]]).
    */
  val StreamingSegmentBase = 1000000000L

  /** Streaming ingest: each micro-batch of fingerprints is probed against
    * the stored index (candidates to `candOut/batch=<segment>`) then
    * absorbed as its own segment. Probe-before-absorb + own-segment
    * exclusion keep both writes deterministic under checkpoint replay.
    * With `healthMetricsOut` set, each batch also publishes the index's
    * [[occupancySkew]] — the health signal an operator alerts on before
    * probe cost goes quadratic (the [[graft.ann.IvfIndex.streamingAbsorb]]
    * drift-metric pattern).
    */
  def streamingAbsorb(
      fpStream: DataFrame, indexPath: String, candOut: String, checkpoint: String,
      shape: FpShape = FpShape.Fp64,
      healthMetricsOut: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    fpStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val segment = StreamingSegmentBase + batchId
        val cand =
          if (hasSegments(spark, indexPath))
            candidates(spark, indexPath, batch,
              excludeSegment = Some(segment), shape = shape)
          else
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("probe_id", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("index_id", org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("hamming", org.apache.spark.sql.types.IntegerType))))
        cand.write.mode("overwrite").parquet(s"$candOut/batch=$segment")
        appendBatch(spark, indexPath, batch, segment, shape)
        healthMetricsOut.foreach { metricsPath =>
          val skew = occupancySkew(spark, indexPath)
          import spark.implicits._
          Seq((segment, skew)).toDF("segment", "occupancy_skew")
            .write.mode("overwrite").parquet(s"$metricsPath/batch=$segment")
        }
      }

  private def hasSegments(spark: SparkSession, indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }
}
