package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim).
  *
  * Brute-force cosine top-k is the exact baseline: norms are precomputed once
  * per side before the join so the per-pair work is a single codegen'd dot
  * product (`zip_with` + `aggregate`, no UDF). The query side broadcasts, so
  * the candidate scan never shuffles. The LSH-bucketed variant
  * ([[lshBuckets]]) is the 100 TB path: random-hyperplane signs partition the
  * corpus into 2^b buckets and candidate generation becomes an equi-join on
  * the bucket key.
  *
  * Outputs are id/rank-only (no float columns) so oracle hash-comparison is
  * immune to last-ulp floating-point differences between engines; ranking
  * itself is robust because real cosine gaps (~1e-4) dwarf fp noise (~1e-15).
  */
object SimilarityOps {

  /** Embedding cast to double with its squared norm, computed once via the
    * codegen'd [[graft.functions.ArrayDotProduct]].
    */
  private[ann] def withNorm(df: DataFrame, idAs: String, vAs: String, nAs: String): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    df.select(col("vec_id").as(idAs), transform(col("embedding"), _.cast("double")).as(vAs))
      .withColumn(nAs, expr(s"dot_arrays($vAs, $vAs)"))
  }

  private[ann] def dot(a: String, b: String): Column = expr(s"dot_arrays($a, $b)")

  /** Literal double-array column as ONE `Literal(ArrayData)` node
    * (`typedLit`) instead of a `CreateArray` over Dim individual literals.
    *
    * r17 (guide §7.3 "very large plans — planning time itself becomes the
    * bottleneck"): the IVF/PQ family's codebook expressions built ~10⁴
    * literal NODES per query (16 centroids × 64 dims, 8×8 PQ codebooks ×
    * 8 dims, replicated across probe/LUT/encode stages), and every optimizer
    * rule walks every node — per-stage attribution (graft.ann.AdcProfile)
    * measured ~0.8 s of q_ivf_adc_topk's ~1.8 s warm cost as pure Catalyst
    * PLANNING. A typedLit array evaluates identically (same values, same
    * ArrayType(Double, containsNull=false) — CreateArray of foldable
    * literals constant-folds to exactly this) but costs one node. Conf
    * `spark.graft.ann.typedlit` (plan-time, default on) for interleaved A/B.
    */
  private[ann] def typedLitOn: Boolean =
    org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.ann.typedlit", "true").toBoolean

  private[ann] def litArr(xs: Seq[Double]): Column =
    if (typedLitOn) typedLit(xs.toSeq) else array(xs.map(lit(_)): _*)

  private[ann] def litMat(m: Seq[Seq[Double]]): Column =
    if (typedLitOn) typedLit(m.map(_.toSeq).toSeq)
    else array(m.map(r => array(r.map(lit(_)): _*)): _*)

  /** Grid size for [[gridPairs]]. 8×8 = 64 cells saturates local[32]; on a
    * real cluster B scales with √cores so per-task memory stays O(n/B).
    */
  val GridBlocks = 8

  /** Exact all-pairs comparison as a block-partitioned equi-join — the
    * "1-Bucket-Theta" pattern (Okcan & Riedewald, "Processing Theta-Joins
    * using MapReduce", SIGMOD '11). Each side hashes its id onto one of B
    * blocks and replicates B ways onto the (left-block, right-block) grid, so
    * the pair space becomes a shuffled hash join on the cell key: no corpus
    * broadcast, no cartesian/BroadcastNestedLoopJoin node, shuffle volume
    * O(n·B), per-task memory O(n/B). Exactness is structural (every id pair
    * lands in exactly one cell), so this is the 100 TB form of brute force —
    * unlike LSH candidates it never misses a low-similarity true neighbor.
    */
  private val GridLb = "__graft_grid_lb"
  private val GridRb = "__graft_grid_rb"

  /** Per-cell occupancy bound above which a within-cell self-join is
    * sub-partitioned on the [[gridPairs]] block grid (see
    * [[subPartitionedCellJoin]]). ~1k rows per side per sub-block bounds a
    * task's pair work at ~1M codegen'd dot products regardless of how
    * degenerate a cell gets.
    */
  val CellPairSubThreshold: Long = 1024L

  /** Replication bound for [[subPartitionedCellJoin]]: shuffle volume grows
    * linearly with the block count, so one degenerate cell may cost at most
    * 64× its own rows in shuffle (and splits into ≤64² tasks). A cell still
    * over-threshold at 64 blocks means the CENTROID COUNT is under-sized for
    * the corpus — the [[semDedup]] "grow K" discipline, which
    * [[IvfIndex.recluster]] exists to apply; the grid is the backstop that
    * keeps the plan executable (no single O(cell²) task) until it runs.
    */
  private val MaxCellBlocks = 64

  private val CellNbCol = "__graft_cell_nb"

  /** Per-cell sub-block counts for [[subPartitionedCellJoin]]: 1 below
    * [[CellPairSubThreshold]]-style `threshold` (the join degenerates to the
    * plain equi-join), growing with occupancy above it, capped at
    * [[MaxCellBlocks]]. One tiny grouped count over the assignment column —
    * map-side-combined to K rows, broadcastable at any corpus size.
    */
  private[graft] def cellBlockCounts(assigns: DataFrame, threshold: Long): DataFrame = {
    require(threshold >= 1, s"subCellThreshold must be >= 1, got $threshold")
    assigns.groupBy("centroid_id")
      .agg(count(lit(1)).as("n_cell"))
      .select(col("centroid_id"),
        least(lit(MaxCellBlocks),
          greatest(lit(1L), ceil(col("n_cell").cast("double") / threshold)))
          .cast("int").as(CellNbCol))
  }

  /** Within-cell pair join with a mega-cell guard — the embedding-space twin
    * of the MinHash band-bucket occupancy cap, but EXACT (sub-partition, not
    * drop): each side joins the broadcast per-cell block count `nb`, hashes
    * its own id onto one of the cell's nb blocks and replicates nb ways onto
    * the (left-block, right-block) grid, so a pair meets in exactly one
    * (cell, lb, rb) sub-block — [[gridPairs]] applied PER CELL with a
    * data-dependent block count. A boilerplate-heavy corpus slice whose
    * near-identical embeddings survive exact dedup lands in ONE IVF cell;
    * without the guard the `centroid_id` equi-join emits that cell's O(n²)
    * candidates from a single join key — AQE can split the exchange but every
    * pair of the hot key still multiplies through one task's build side.
    * Healthy cells pay one broadcast-join lookup and an nb=1 degenerate
    * explode — the plan is unchanged in shape and output everywhere.
    */
  private[graft] def subPartitionedCellJoin(
      a: DataFrame, aId: String,
      b: DataFrame, bId: String,
      blockCounts: DataFrame): DataFrame = {
    require(!(a.columns ++ b.columns).exists(c =>
      c == GridLb || c == GridRb || c == CellNbCol),
      s"subPartitionedCellJoin inputs must not carry $GridLb/$GridRb/$CellNbCol")
    // LEFT join + nb default 1 (ADVICE r12): an inner join would silently
    // DROP any row whose centroid_id is absent from the occupancy frame.
    // Today's callers recompute the identical argmin on both paths so the
    // cell sets always match, but exactness must be structural, not coupled
    // to that invariant — a future caller passing stale or differently-
    // sourced assignments degrades to the plain (nb = 1) join per unknown
    // cell instead of losing its pairs.
    val nbB = broadcast(blockCounts)
    def withNb(side: DataFrame): DataFrame = side
      .join(nbB, Seq("centroid_id"), "left")
      .withColumn(CellNbCol, coalesce(col(CellNbCol), lit(1)))
    val l = withNb(a)
      .withColumn(GridLb, pmod(hash(col(aId)), col(CellNbCol)))
      .withColumn(GridRb, explode(sequence(lit(0), col(CellNbCol) - 1)))
      .drop(CellNbCol)
    val r = withNb(b)
      .withColumn(GridRb, pmod(hash(col(bId)), col(CellNbCol)))
      .withColumn(GridLb, explode(sequence(lit(0), col(CellNbCol) - 1)))
      .drop(CellNbCol)
    l.join(r.hint("SHUFFLE_HASH"), Seq("centroid_id", GridLb, GridRb))
      .drop(GridLb, GridRb)
  }

  private def gridPairs(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      cond: Column): DataFrame = {
    require(!(left.columns ++ right.columns).exists(c => c == GridLb || c == GridRb),
      s"gridPairs inputs must not carry the internal $GridLb/$GridRb columns")
    val blocks = array((0 until GridBlocks).map(lit(_)): _*)
    val l = left
      .withColumn(GridLb, pmod(hash(col(leftId)), lit(GridBlocks)))
      .withColumn(GridRb, explode(blocks))
    val r = right
      .withColumn(GridRb, pmod(hash(col(rightId)), lit(GridBlocks)))
      .withColumn(GridLb, explode(blocks))
    l.join(r.hint("SHUFFLE_HASH"), Seq(GridLb, GridRb))
      .where(cond)
      .drop(GridLb, GridRb)
  }

  /** Exact cosine top-k for a fixed query set (vec_id < nQueries). */
  def annTopK(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = withNorm(e.filter(col("vec_id") < nQueries), "qid", "qv", "qn")
    val c = withNorm(e, "cid", "cv", "cn")
    val scored = c
      .join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  def annTopKSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS nn FROM e),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM n q JOIN n c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT qid, rank, cid FROM (
       |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  /** Exact 1-NN for every vector. Exact all-NN is inherently Ω(n²) compare
    * work, so the scale question is the JOIN SHAPE, not the pair count: the
    * pair space is laid out on the [[gridPairs]] block grid (shuffled
    * equi-join, no corpus broadcast), every cell computes a partial argmax
    * (map-side `max_by`), and the final argmax merges B partials per vector.
    * Approximate-but-cheap variants are [[ivfTopK]] / [[lshBuckets]].
    */
  def knn1(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = withNorm(e, "qid", "qv", "qn")
    val b = withNorm(e, "cid", "cv", "cn")
    val scored = gridPairs(a, "qid", b, "cid", col("qid") =!= col("cid"))
      .withColumn("cos", dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
    // argmax as a hash aggregate (max_by over a lexicographic struct) instead
    // of a rank window — no per-partition sort of the n² candidate rows. The
    // -cid component reproduces the window's (cos DESC, cid ASC) tie-break.
    scored
      .groupBy("qid")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("nn_id"))
      .select(col("qid").as("vec_id"), col("nn_id"))
      .orderBy("vec_id")
  }

  val knn1Sql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS nn FROM e),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS cid,
      |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
      |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
      |  FROM n q JOIN n c ON q.vec_id <> c.vec_id)
      |SELECT vec_id, nn_id FROM (
      |  SELECT qid AS vec_id, cid AS nn_id,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
      |  FROM scored)
      |WHERE rank = 1
      |ORDER BY vec_id""".stripMargin

  /** Embedding near-duplicate pairs: cosine above threshold, ids only.
    * Same [[gridPairs]] layout as [[knn1]] — a threshold join must also
    * consider every pair to be exact, and the grid keeps that distributed
    * (LSH candidates would trade recall below ~0.6 cosine for speed; that
    * path exists as [[lshBuckets]]).
    */
  def cosinePairs(spark: SparkSession, sfDir: String, threshold: Double = 0.45): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = withNorm(e, "id_a", "va", "na")
    val b = withNorm(e, "id_b", "vb", "nb")
    gridPairs(a, "id_a", b, "id_b", col("id_a") < col("id_b"))
      .withColumn("cos", dot("va", "vb") / (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  def cosinePairsSql(threshold: Double = 0.45): String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS nn FROM e)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
       |        / (sqrt(a.nn) * sqrt(b.nn)) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Random-hyperplane LSH bucket assignment — the scale path for candidate
    * generation. Hyperplane h_j's i-th coefficient is a deterministic
    * md5-derived value in [-0.5, 0.5); the bucket key packs the b sign bits.
    * Bucket population counts are the oracle-checked output (candidate
    * generation itself is exercised by joining on `bucket` in tests).
    */
  val NumHyperplanes = 8
  val Dim = 64

  /** Hyperplane coefficient h_j[i] = md5("j_i") first-8-hex / 2^32 − 0.5 —
    * computed once on the driver (the oracle recomputes the identical value
    * per row; here it's a literal array, so the per-row work is one codegen'd
    * dot product per hyperplane).
    */
  lazy val hyperplanes: IndexedSeq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumHyperplanes).map { j =>
      Array.tabulate(Dim) { i0 =>
        val i = i0 + 1 // 1-based, matching generate_series(1, len)
        md.reset()
        val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
      }
    }
  }

  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // one literal coef array column per hyperplane, then the packed bucket
    val withPlanes = (0 until NumHyperplanes).foldLeft(e) { (df, j) =>
      df.withColumn(s"h_$j", litArr(hyperplanes(j).toIndexedSeq))
    }
    val bits = (0 until NumHyperplanes).map { j =>
      when(expr(s"dot_arrays(v, h_$j)") >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    withPlanes
      .select(col("vec_id"), bits.reduce(_ + _).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec_id"))
      .orderBy("bucket")
  }

  val lshBucketsSql: String = {
    val bitTerms = (0 until NumHyperplanes).map { j =>
      s"""CASE WHEN list_sum(list_transform(generate_series(1, len(v)), i ->
         |  v[i] * ((CAST('0x' || substr(md5($j || '_' || i), 1, 8) AS BIGINT) / 4294967296.0) - 0.5)
         |  )) >= 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString(" +\n       ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings)
       |SELECT CAST($bitTerms AS BIGINT) AS bucket,
       |       count(*) AS n_vectors, min(vec_id) AS min_vec_id
       |FROM e
       |GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  // -------------------------------------------------------------------------
  // IVF-style partitioning — the second scale path besides LSH buckets
  // -------------------------------------------------------------------------

  val NumCentroids = 8

  /** Deterministic md5-seeded centroids (a stand-in for k-means training —
    * at scale these would come from a sampled k-means job; determinism keeps
    * the oracle exact). centroid k's coefficient i derives from
    * md5("ivf_k_i") exactly like the LSH hyperplanes.
    */
  lazy val centroids: IndexedSeq[Array[Double]] = seedCentroids(NumCentroids)

  /** md5-seeded centroid set of arbitrary size — the [[centroids]] formula
    * generalized: centroid k's coefficient i derives from md5("ivf_k_i"), so
    * any two engines (and any two K values sharing a prefix) agree
    * bit-for-bit. The Lloyd INIT for a grow-K re-fit
    * ([[IvfIndex.recluster]] with `k`): at 100 TB the centroid count must
    * grow with the corpus to keep cells O(n/K) — the SemDeDup discipline the
    * per-cell operators' scale story cites.
    */
  def seedCentroids(n: Int): IndexedSeq[Array[Double]] = {
    require(n >= 1, s"centroid count must be >= 1, got $n")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { k =>
      Array.tabulate(Dim) { i0 =>
        val i = i0 + 1
        md.reset()
        val hex = md.digest(s"ivf_${k}_$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
      }
    }
  }

  /** Left-to-right self dot — must mirror DuckDB's list_sum order. */
  private def selfDot(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    s
  }


  /** Assign every vector to its nearest centroid (argmin over the monotone
    * score |c|² − 2·v·c, identical formula both engines). The per-centroid
    * population is the oracle-checked output; the assignment column is the
    * candidate-pruning key for IVF search.
    */
  def ivfAssignments(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    withCentroidAssignment(e, "v").select(col("vec_id"), col("centroid_id"))
  }

  /** Adds `centroid_id` = argmin over the monotone score |c|² − 2·v·c to any
    * frame carrying a double-array column `vCol` (ties → lowest k, matching
    * the oracle's (distance, k) rank). The reusable core of
    * [[ivfAssignments]] — [[IvfIndex]] applies it to incoming batches, with
    * `cents` overridden after an [[IvfIndex.recluster]].
    */
  private[graft] def withCentroidAssignment(
      df0: DataFrame, vCol: String,
      cents: IndexedSeq[Array[Double]] = centroids,
      keepDistance: Option[String] = None): DataFrame = {
    val (assign, minD) = argminDist(col(vCol), cents)
    val assigned = df0.withColumn("centroid_id", assign)
    // the assigned cell's score is array_min(d) = |c|² − 2v·c of the chosen
    // centroid (add |v|² for the true squared distance) — kept only when a
    // caller (the drift statistic) asks, so assignment-only plans stay
    // unchanged
    keepDistance.fold(assigned)(n => assigned.withColumn(n, minD))
  }

  /** (argmin index, min value) over the distance vector of `vecCol` against
    * literal codebook `cb` — the shared shape of centroid assignment and PQ
    * encode. The distances form ONE `array(...)` expression and the winner
    * is `array_position(d, array_min(d)) − 1`, which picks the FIRST
    * (lowest-k) minimum — the tie rule every oracle pins via
    * `ORDER BY d, k`. No intermediate distance COLUMNS: the earlier
    * d_0…d_{K−1} / d_{m}_{k} attribute scaffolding made composed plans
    * (assignment × 64-entry PQ encode × probe joins in one tree) blow the
    * optimizer's memory once alias inlining and constraint propagation
    * multiplied the per-column expressions. dot_arrays stays the codegen'd
    * kernel, so the hot path remains whole-stage-compiled.
    */
  private def argminDist(
      vecCol: Column, cb: IndexedSeq[Array[Double]]): (Column, Column) = {
    val dists = array(cb.map { c =>
      lit(selfDot(c)) - lit(2.0) *
        call_function("dot_arrays", vecCol, litArr(c.toIndexedSeq))
    }: _*)
    ((array_position(dists, array_min(dists)) - 1).cast("int"), array_min(dists))
  }

  def ivfBuckets(spark: SparkSession, sfDir: String): DataFrame =
    ivfAssignments(spark, sfDir)
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec_id"))
      .orderBy("centroid_id")

  /** Shared oracle CTEs: derived centroids (one row per k, coefficients from
    * md5 exactly as [[centroids]]) and per-vector assignment via a rank-1
    * argmin ordered (distance, k) — ties resolve to the lowest k, matching
    * the Spark CASE chain.
    */
  private val assignCtes: String = assignCtesFrom(
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings""".stripMargin)

  /** [[assignCtes]] over a caller-supplied `e` CTE body (vec_id, v double
    * list) — the hot-slice oracle rows rewrite the corpus IN-QUERY and need
    * the same centroid/assignment pipeline over the rewritten vectors.
    */
  private def assignCtesFrom(eBody: String): String = {
    val kVals = (0 until NumCentroids).map(k => s"($k)").mkString(", ")
    s"""e AS (
       |  $eBody),
       |cents AS (
       |  SELECT t.k,
       |         list_transform(generate_series(1, ${Dim}), i ->
       |           (CAST('0x' || substr(md5('ivf_' || t.k || '_' || i), 1, 8) AS BIGINT) / 4294967296.0) - 0.5) AS c
       |  FROM (VALUES $kVals) AS t(k)),
       |cents2 AS (
       |  SELECT k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cents),
       |dists AS (
       |  SELECT e.vec_id, e.v, cc.k,
       |         cc.c2 - 2 * list_sum(list_transform(generate_series(1, ${Dim}), i -> e.v[i] * cc.c[i])) AS d
       |  FROM e CROSS JOIN cents2 cc),
       |assigned AS (
       |  SELECT vec_id, v, k AS centroid_id FROM (
       |    SELECT vec_id, v, k,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
       |    FROM dists)
       |  WHERE rn = 1)""".stripMargin
  }

  val ivfBucketsSql: String =
    s"""WITH $assignCtes
       |SELECT CAST(centroid_id AS INT) AS centroid_id,
       |       count(*) AS n_vectors, min(vec_id) AS min_vec_id
       |FROM assigned
       |GROUP BY 1 ORDER BY centroid_id""".stripMargin

  /** One k-means (Lloyd) training iteration over the embedding corpus: assign
    * every vector to its nearest centroid, then aggregate the per-cluster
    * update numerators — population and the component-wise vector sum (mean =
    * sum ÷ n). This is the job that TRAINS [[centroids]] at scale: each
    * iteration is one assignment map + one grouped sum with map-side combine,
    * shuffling 8 partial sum-vectors per partition — never the corpus. The
    * oracle-checked output carries the first 4 components per cluster,
    * decimal-summed so both engines agree bit-for-bit (float addition is
    * non-associative; Spark's partial-aggregate merge order isn't DuckDB's
    * sequential order — the [[graft.operators.Grid.dsum]] rule, at the 1e-6
    * scale centroid coordinates need).
    */
  val KmeansEmitDims = 4

  def kmeansStep(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val assigns = ivfAssignments(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
    val sums = (1 to KmeansEmitDims).map(i => dsum6(element_at(col("v"), i)).as(s"s_$i"))
    e.join(assigns, "vec_id")
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sums: _*)
      .orderBy("centroid_id")
  }

  val kmeansStepSql: String = {
    val sums = (1 to KmeansEmitDims)
      .map(i => s"CAST(SUM(CAST(v[$i] AS DECIMAL(18,6))) AS DOUBLE) AS s_$i")
      .mkString(",\n       ")
    s"""WITH $assignCtes
       |SELECT CAST(centroid_id AS INT) AS centroid_id, count(*) AS n,
       |       $sums
       |FROM assigned
       |GROUP BY 1 ORDER BY centroid_id""".stripMargin
  }

  /** Per-cell quota for [[clusterBalancedSample]]. */
  val ClusterCap = 40

  /** TOPIC-BALANCED SAMPLING: cap every k-means cell's contribution at
    * [[ClusterCap]] vectors, membership decided by a deterministic
    * md5-uniform draw — the embedding-space twin of the per-source quota
    * ([[graft.text.CurationOps.sourceCap]]): a corpus dominated by one
    * semantic cluster (SEO boilerplate, one template family) gets trimmed to
    * the quota while small clusters survive whole, flattening the topic
    * distribution a sampler would otherwise inherit. The kept subset comes
    * from a rank FILTER (not an aggregate over the full window), so Spark's
    * WindowGroupLimit prunes each cell's stream to the top `cap` before the
    * full per-cell sort; totals ride a separate grouped count and join back
    * on the cell id (k rows). Membership is pinned by an order-independent
    * fingerprint, never an id list.
    */
  def clusterBalancedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigns = ivfAssignments(spark, sfDir)
      .withColumn("u",
        conv(substring(md5(concat(lit("cbal_"), col("vec_id").cast("string"))), 1, 8), 16, 10)
          .cast("long"))
    val totals = assigns.groupBy("centroid_id").agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy("centroid_id").orderBy(col("u"), col("vec_id"))
    val kept = assigns
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ClusterCap)
      .groupBy("centroid_id")
      .agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(",", sort_array(collect_list(col("vec_id"))))).as("kept_fp"))
    totals.join(kept, "centroid_id")
      .select(col("centroid_id").cast("int").as("centroid_id"),
        col("n_members"), col("n_kept"), col("kept_fp"))
      .orderBy("centroid_id")
  }

  val clusterBalancedSampleSql: String =
    s"""WITH $assignCtes,
       |drawn AS (
       |  SELECT centroid_id, vec_id,
       |         CAST('0x' || substr(md5('cbal_' || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS u
       |  FROM assigned),
       |rk AS (
       |  SELECT centroid_id, vec_id,
       |         row_number() OVER (PARTITION BY centroid_id ORDER BY u, vec_id) AS rn
       |  FROM drawn)
       |SELECT CAST(t.centroid_id AS INT) AS centroid_id,
       |       t.n_members, k.n_kept, k.kept_fp
       |FROM (SELECT centroid_id, count(*) AS n_members FROM drawn GROUP BY 1) t
       |JOIN (SELECT centroid_id, count(*) AS n_kept,
       |             md5(array_to_string(list_sort(list(vec_id)), ',')) AS kept_fp
       |      FROM rk WHERE rn <= $ClusterCap GROUP BY 1) k
       |  ON t.centroid_id = k.centroid_id
       |ORDER BY centroid_id""".stripMargin

  /** Recentering rounds for the iterated trainer ([[kmeansIter]]). */
  val KmeansIters = 3

  /** K-MEANS TRAINING ITERATED — the loop [[kmeansStep]] is one round of and
    * [[IvfIndex.recluster]] runs over its sampled index rows, here as an
    * oracle-checked operator over the embedding corpus: `iters` full Lloyd
    * rounds (assign under the current centroids → per-cell decimal mean →
    * recenter; an emptied cell keeps its old centroid), then the
    * [[kmeansStep]]-shaped cell ledger under the TRAINED centroids.
    *
    * Every round is one assignment map plus one (cell, dim)-grouped decimal
    * sum with map-side combine — the shuffle carries k·dim partial sums per
    * partition, never vectors — and the driver holds exactly the k×dim mean
    * matrix per round (model state, same discipline as the BPE and PageRank
    * loops). Cross-engine exactness: per-row dot products fold dimensions in
    * ascending order in both engines, cell sums go through DECIMAL(18,6),
    * and the recentered coordinates are the IEEE quotient of that exact
    * decimal by the exact count — so three rounds of float geometry stay
    * bit-identical to the unrolled DuckDB restatement.
    */
  def kmeansIter(spark: SparkSession, sfDir: String, iters: Int = KmeansIters): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint() // scanned once per round + once for the ledger
    var cents: IndexedSeq[Array[Double]] = centroids
    (1 to iters).foreach { _ =>
      val stats = withCentroidAssignment(e, "v", cents)
        .select(col("centroid_id").cast("int").as("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(
          sum(col("x").cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      cents = cents.indices.map { cell =>
        val rows = stats.filter(_.getInt(0) == cell)
        if (rows.isEmpty) cents(cell)
        else rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toArray
      }
    }
    def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
    withCentroidAssignment(e, "v", cents)
      .select(col("centroid_id"), col("v"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"),
        (1 to KmeansEmitDims).map(i => dsum6(element_at(col("v"), i)).as(s"s_$i")): _*)
      .orderBy("centroid_id")
  }

  /** Unrolled Lloyd rounds in DuckDB: cents{r} re-derived from round r's
    * exact decimal cell means, empty cells falling back to the prior
    * coordinates, final ledger under cents{iters}.
    */
  def kmeansIterSql(iters: Int = KmeansIters): String = {
    val kVals = (0 until NumCentroids).map(k => s"($k)").mkString(", ")
    val cte = Seq.newBuilder[String]
    cte += s"""e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |dims AS (SELECT unnest(generate_series(1, $Dim)) AS i),
      |cents_0 AS (
      |  SELECT t.k,
      |         list_transform(generate_series(1, $Dim), i ->
      |           (CAST('0x' || substr(md5('ivf_' || t.k || '_' || i), 1, 8) AS BIGINT) / 4294967296.0) - 0.5) AS c
      |  FROM (VALUES $kVals) AS t(k)),
      |cc_0 AS (SELECT k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cents_0)""".stripMargin
    def assignCte(r: Int, from: String): String =
      s"""d_$r AS (
        |  SELECT e.vec_id, e.v, cc.k,
        |         cc.c2 - 2 * list_sum(list_transform(generate_series(1, $Dim), i -> e.v[i] * cc.c[i])) AS d
        |  FROM e CROSS JOIN $from cc),
        |a_$r AS (
        |  SELECT vec_id, v, k AS centroid_id FROM (
        |    SELECT vec_id, v, k, row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
        |    FROM d_$r)
        |  WHERE rn = 1)""".stripMargin
    (1 to iters).foreach { r =>
      cte += assignCte(r, s"cc_${r - 1}")
      cte += s"""m_$r AS (
        |  SELECT centroid_id AS k, dims.i AS pos,
        |         CAST(SUM(CAST(v[dims.i] AS DECIMAL(18,6))) AS DOUBLE) AS sx, count(*) AS n
        |  FROM a_$r CROSS JOIN dims GROUP BY 1, 2),
        |cx_$r AS (
        |  SELECT pk.k, dims.i AS pos, coalesce(m.sx / m.n, pk.c[dims.i]) AS x
        |  FROM cents_${r - 1} pk CROSS JOIN dims
        |  LEFT JOIN m_$r m ON m.k = pk.k AND m.pos = dims.i),
        |cents_$r AS (
        |  SELECT k, list(x ORDER BY pos) AS c FROM cx_$r GROUP BY k),
        |cc_$r AS (SELECT k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cents_$r)""".stripMargin
    }
    cte += assignCte(iters + 1, s"cc_$iters")
    val sums = (1 to KmeansEmitDims)
      .map(i => s"CAST(SUM(CAST(v[$i] AS DECIMAL(18,6))) AS DOUBLE) AS s_$i")
      .mkString(",\n       ")
    s"""WITH ${cte.result().mkString(",\n")}
       |SELECT CAST(centroid_id AS INT) AS centroid_id, count(*) AS n,
       |       $sums
       |FROM a_${iters + 1}
       |GROUP BY 1 ORDER BY centroid_id""".stripMargin
  }

  /** Per-cell embedding outliers: inside each IVF cell, the vectors farthest
    * from their assigned centroid — the embedding-space analog of the
    * distance-based pruning step in curation pipelines (mislabeled or
    * off-distribution points sit at cell edges). Squared distance decomposes
    * as |v|² + (|c|² − 2·v·c); the parenthesized term is exactly the
    * assignment score, so the whole query is the assignment plan plus one
    * windowed rank per cell — no join, no second corpus pass. At 100 TB the
    * window partitions by cell over the already-shuffled assignment, and the
    * per-cell top-k never materializes more than k rows per cell past the
    * rank filter.
    */
  def embedOutliers(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val withC = (0 until NumCentroids).foldLeft(e) { (df, c) =>
      df.withColumn(s"c_$c", litArr(centroids(c).toIndexedSeq))
    }
    val scored = (0 until NumCentroids).foldLeft(withC) { (df, c) =>
      df.withColumn(s"d_$c", lit(selfDot(centroids(c))) - lit(2.0) * expr(s"dot_arrays(v, c_$c)"))
    }
    val ks = 0 until NumCentroids
    val assign = ks.init.foldRight(lit(ks.last)) { case (c, elseCol) =>
      val leAll = ks.drop(c + 1).map(o => col(s"d_$c") <= col(s"d_$o")).reduce(_ && _)
      when(leAll, lit(c)).otherwise(elseCol)
    }
    val w = Window.partitionBy("centroid_id").orderBy(desc("sqdist"), asc("vec_id"))
    scored
      .select(
        col("vec_id"),
        assign.as("centroid_id"),
        (expr("dot_arrays(v, v)") + least(ks.map(c => col(s"d_$c")): _*)).as("sqdist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("centroid_id", "rank", "vec_id")
      .orderBy("centroid_id", "rank")
  }

  def embedOutliersSql(k: Int = 3): String =
    s"""WITH $assignCtes,
       |sq AS (
       |  SELECT a.vec_id, a.centroid_id,
       |         list_sum(list_transform(a.v, x -> x * x)) + d.d AS sqdist
       |  FROM assigned a JOIN dists d
       |    ON a.vec_id = d.vec_id AND a.centroid_id = d.k)
       |SELECT CAST(centroid_id AS INT) AS centroid_id,
       |       CAST(rank AS INT) AS rank, vec_id
       |FROM (
       |  SELECT vec_id, centroid_id,
       |         row_number() OVER (PARTITION BY centroid_id ORDER BY sqdist DESC, vec_id) AS rank
       |  FROM sq)
       |WHERE rank <= $k
       |ORDER BY centroid_id, rank""".stripMargin

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus (here: the deterministic IVF assignment), then inside
    * each cluster drop every vector that has a LOWER-id vector within cosine
    * `threshold` — pairwise comparison never crosses cluster boundaries, so
    * the quadratic term is bounded by the largest cell, not the corpus. At
    * 100 TB the centroid count grows with the corpus (the paper runs 50 k
    * clusters) keeping cells O(n/k); a skewed mega-cell sub-partitions
    * EXACTLY via [[subPartitionedCellJoin]] — enforced in-plan, not left to
    * a balance policy (r11 verdict #1). The output is the per-cluster
    * keep ledger with an md5 roll-up of the dropped-id set, which pins exact
    * membership cross-engine without a row per vector.
    */
  /** Within-cell cosine kNN GRAPH: every vector's top-k neighbors among the
    * members of its own IVF cell — the edge list graph-based dedup and
    * SemDeDup-style cluster pruning consume. Cell restriction is the scale
    * story: the corpus-wide quadratic becomes per-cell (n/K)² work whose
    * remedy at 100 TB is growing the centroid count with the corpus (the
    * [[semDedup]] discipline); the candidate join is
    * [[subPartitionedCellJoin]] — an equi-join on `centroid_id` whose
    * over-threshold cells sub-partition EXACTLY on the block grid, so a
    * degenerate mega-cell (near-identical embeddings surviving exact dedup)
    * can never route O(cell²) pair work through one task — and the
    * per-vector top-k is a WindowGroupLimit-prunable rank. Output
    * (src, rank, dst) — no float score column, the ADC-family rule for
    * hash-stable cross-engine compares; ties break on dst ascending.
    */
  def knnGraph(
      spark: SparkSession, sfDir: String, k: Int = 3,
      subCellThreshold: Long = CellPairSubThreshold): DataFrame = {
    VectorFunctions.register(spark)
    knnGraphFrom(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
      k, subCellThreshold)
  }

  /** [[knnGraph]] body over any (vec_id, v double array) frame — shared with
    * the hot-slice oracle row, which rewrites the corpus in-query.
    */
  private def knnGraphFrom(
      base: DataFrame, k: Int, subCellThreshold: Long): DataFrame = {
    // assignment computed INLINE in the scan (argmin is a narrow projection)
    // rather than a shuffle join against ivfAssignments — one exchange less
    // per side and no second corpus scan; bit-identical cell ids (same
    // argmin over the same vectors). The occupancy side below keeps the
    // narrow assignment plan (scan → argmin → K-row agg).
    val e = withCentroidAssignment(
      base.withColumn("nn", expr("dot_arrays(v, v)")), "v")
    val assigns = withCentroidAssignment(base, "v")
      .select(col("vec_id"), col("centroid_id"))
    val a = e.select(col("centroid_id"), col("vec_id").as("src"),
      col("v").as("va"), col("nn").as("na"))
    val b = e.select(col("centroid_id"), col("vec_id").as("dst"),
      col("v").as("vb"), col("nn").as("nb"))
    val w = Window.partitionBy("src").orderBy(desc("cos"), asc("dst"))
    subPartitionedCellJoin(a, "src", b, "dst",
      cellBlockCounts(assigns, subCellThreshold))
      .where(col("src") =!= col("dst"))
      .withColumn("cos", expr("dot_arrays(va, vb)") / (sqrt(col("na")) * sqrt(col("nb"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"))
      .orderBy("src", "rank")
  }

  def knnGraphSql(k: Int = 3): String = knnGraphSqlFrom(assignCtes, k)

  private def knnGraphSqlFrom(ctes: String, k: Int): String =
    s"""WITH $ctes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |edges AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |         list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
       |           / (sqrt(a.nn) * sqrt(b.nn)) AS cos
       |  FROM normed a JOIN normed b
       |    ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id)
       |SELECT src, CAST(rank AS INT) AS rank, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
       |  FROM edges)
       |WHERE rank <= $k
       |ORDER BY src, rank""".stripMargin

  // ---------------------------------------------------------------------
  // Mega-cell hot-slice rows (VERDICT r12 #3 + #2): the sub-partition guard
  // and the 64-block clamp ledger, both ENGAGED under the DuckDB gate.
  // ---------------------------------------------------------------------

  /** Fraction threshold for [[knnGraphHotSlice]]: low enough that the
    * planted mega-cell (30% of sf0.01's 500 vectors = 150 rows) splits onto
    * nb = ⌈150/64⌉ = 3 blocks — the guard's nb > 1 path runs under the
    * oracle gate, where q_knn_graph's natural cells stay below the default
    * 1024 threshold and only ever exercise the nb = 1 degenerate explode.
    */
  private[graft] val HotSliceSubThreshold = 64L

  /** Ledger threshold for [[knnClampLedger]], RELATIVE to the corpus (the
    * [[graft.dedup.DedupOps]] relative-cap idiom — a fixed literal cannot
    * discriminate at every gated SF: healthy-cell size grows with n, so any
    * constant that spares sf0.01's ~44-row median cells flags sf0.1's
    * ~120-row ones): t = max(1, ⌈0.15·n/64⌉), i.e. the clamp binds on cells
    * past 15% of the corpus. The planted hot slice (30%) and the corpus's
    * naturally-skewed hottest cell (~30% after the rewrite) land ON the
    * ledger at every SF; median cells (~9% of the corpus) stay off it.
    */
  private[graft] def hotSliceClampThreshold(nRows: Long): Long =
    math.max(1L, math.ceil(nRows * 0.15 / MaxCellBlocks).toLong)

  /** `embeddings` with 30% of vectors (vec_id % 10 < 3) rewritten IN-QUERY
    * to ONE constant vector — the embedding-space twin of
    * [[graft.dedup.DedupOps]]'s hot-slice documents corpus: near-identical
    * embeddings that survive exact dedup all land in one IVF cell. Derived
    * in-query so the DuckDB oracle sees the identical slice; the rewrite
    * happens at DOUBLE precision on both sides (same IEEE ops), so norms,
    * dots, and the argmin assignment are bit-identical cross-engine.
    */
  private[graft] def hotSliceEmb(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      when(pmod(col("vec_id"), lit(10L)) < 3,
        expr(s"transform(sequence(1, $Dim), i -> CAST(0.5 + (i % 7) / 100.0 AS DOUBLE))"))
        .otherwise(transform(col("embedding"), _.cast("double"))).as("v"))

  private val hotSliceAssignCtes: String = assignCtesFrom(
    s"""SELECT vec_id,
       |         CASE WHEN vec_id % 10 < 3
       |              THEN list_transform(generate_series(1, $Dim), i -> 0.5 + (i % 7) / 100.0)
       |              ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
       |  FROM embeddings""".stripMargin)

  /** [[knnGraph]] over the hot-slice corpus at a threshold that forces the
    * planted mega-cell onto nb = 3 sub-blocks: the guard's EXACTNESS at
    * nb > 1 is pinned by the DuckDB oracle (whose plain within-cell join
    * never sub-partitions), not just the suite's property specs. Identical
    * vectors tie at cos ≈ 1 computed by the same IEEE ops both engines, so
    * the (cos DESC, dst ASC) rank is deterministic cross-engine.
    */
  def knnGraphHotSlice(
      spark: SparkSession, sfDir: String, k: Int = 3,
      subCellThreshold: Long = HotSliceSubThreshold): DataFrame = {
    VectorFunctions.register(spark)
    knnGraphFrom(hotSliceEmb(spark, sfDir), k, subCellThreshold)
  }

  def knnGraphHotSliceSql(k: Int = 3): String =
    knnGraphSqlFrom(hotSliceAssignCtes, k)

  /** Cells past the [[MaxCellBlocks]] clamp — the loud-evidence ledger the
    * other capped paths already carry (VERDICT r12 #2: the clamp was the one
    * guard that saturated SILENTLY). A cell here is indivisible mass the
    * sub-partition grid can no longer bound: per-task pair work grows as
    * (n_cell/[[MaxCellBlocks]])² past the threshold's intended ceiling. The
    * remedy is growing K ([[IvfIndex.maintainCellBudget]]) for separable
    * mass, or upstream exact dedup for genuinely identical vectors; this
    * ledger is what tells an operator which cells need it. One grouped
    * count — broadcast-scale output, free at any corpus size.
    */
  private[graft] def overClampCells(assigns: DataFrame, threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    assigns.groupBy("centroid_id")
      .agg(count(lit(1)).as("n_cell"))
      .withColumn("nb_uncapped",
        ceil(col("n_cell").cast("double") / threshold).cast("long"))
      .filter(col("nb_uncapped") > MaxCellBlocks)
      .withColumn("block_rows",
        ceil(col("n_cell").cast("double") / MaxCellBlocks).cast("long"))
      .select("centroid_id", "n_cell", "nb_uncapped", "block_rows")
  }

  /** The over-clamp ledger over the hot-slice corpus at the corpus-relative
    * [[hotSliceClampThreshold]] (one count scalar to the driver, the
    * simhashBucketCap shape; the SQL twin derives the identical value via a
    * scalar subquery) — oracle-gated so both engines agree on exactly which
    * cells are past the clamp and how big their per-task blocks have grown.
    */
  def knnClampLedger(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val threshold =
      hotSliceClampThreshold(Tables.embeddings(spark, sfDir).count())
    val assigns = withCentroidAssignment(hotSliceEmb(spark, sfDir), "v")
      .select(col("vec_id"), col("centroid_id"))
    overClampCells(assigns, threshold).orderBy("centroid_id")
  }

  val knnClampLedgerSql: String =
    s"""WITH $hotSliceAssignCtes,
       |thr AS (
       |  SELECT GREATEST(1, CAST(ceil(count(*) * 0.15 / $MaxCellBlocks) AS BIGINT)) AS t
       |  FROM embeddings),
       |occ AS (
       |  SELECT CAST(centroid_id AS INT) AS centroid_id,
       |         CAST(count(*) AS BIGINT) AS n_cell
       |  FROM assigned GROUP BY 1)
       |SELECT centroid_id, n_cell,
       |       CAST(ceil(CAST(n_cell AS DOUBLE) / (SELECT t FROM thr)) AS BIGINT) AS nb_uncapped,
       |       CAST(ceil(n_cell / $MaxCellBlocks.0) AS BIGINT) AS block_rows
       |FROM occ
       |WHERE ceil(CAST(n_cell AS DOUBLE) / (SELECT t FROM thr)) > $MaxCellBlocks
       |ORDER BY centroid_id""".stripMargin

  def semDedup(
      spark: SparkSession, sfDir: String, threshold: Double = 0.45,
      subCellThreshold: Long = CellPairSubThreshold): DataFrame = {
    VectorFunctions.register(spark)
    semDedupFrom(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
      threshold, subCellThreshold)
  }

  /** [[semDedup]] over the hot-slice corpus (the [[knnGraphHotSlice]]
    * fixture) — the guard's SECOND consumer gets the same nb > 1 oracle
    * discipline through its different aggregation tail (distinct dropped-id
    * set + md5 roll-up instead of a per-vector rank window).
    */
  def semDedupHotSlice(
      spark: SparkSession, sfDir: String, threshold: Double = 0.45,
      subCellThreshold: Long = HotSliceSubThreshold): DataFrame = {
    VectorFunctions.register(spark)
    semDedupFrom(hotSliceEmb(spark, sfDir), threshold, subCellThreshold)
  }

  private def semDedupFrom(
      base: DataFrame, threshold: Double, subCellThreshold: Long): DataFrame = {
    val assigns = withCentroidAssignment(base, "v")
      .select(col("vec_id"), col("centroid_id"))
    // inline assignment, like [[knnGraph]]: no shuffle join per pair side
    val e = withCentroidAssignment(
      base.withColumn("nn", expr("dot_arrays(v, v)")), "v")
    val a = e.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nn").as("na"))
    val b = e.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nn").as("nb"))
    val drops = subPartitionedCellJoin(a, "id_a", b, "id_b",
      cellBlockCounts(assigns, subCellThreshold))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", expr("dot_arrays(va, vb)") / (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cos") >= threshold)
      .select(col("centroid_id"), col("id_b").as("dropped"))
      .distinct()
      .groupBy("centroid_id")
      .agg(
        count(lit(1)).as("n_dropped"),
        md5(concat_ws(",", sort_array(collect_list(col("dropped"))))).as("dropped_fp"))
    assigns
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_total"))
      .join(drops, Seq("centroid_id"), "left")
      .select(
        col("centroid_id"),
        col("n_total"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("dropped_fp"), md5(lit(""))).as("dropped_fp"))
      .orderBy("centroid_id")
  }

  def semDedupSql(threshold: Double = 0.45): String =
    semDedupSqlFrom(assignCtes, threshold)

  def semDedupHotSliceSql(threshold: Double = 0.45): String =
    semDedupSqlFrom(hotSliceAssignCtes, threshold)

  private def semDedupSqlFrom(ctes: String, threshold: Double): String =
    s"""WITH $ctes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |drops AS (
       |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_dropped,
       |         md5(array_to_string(list_sort(list(dropped)), ',')) AS dropped_fp
       |  FROM (
       |    SELECT DISTINCT a.centroid_id, b.vec_id AS dropped
       |    FROM normed a JOIN normed b
       |      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |    WHERE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
       |            / (sqrt(a.nn) * sqrt(b.nn)) >= $threshold)
       |  GROUP BY 1)
       |SELECT CAST(t.centroid_id AS INT) AS centroid_id,
       |       CAST(count(*) AS BIGINT) AS n_total,
       |       coalesce(any_value(d.n_dropped), 0) AS n_dropped,
       |       coalesce(any_value(d.dropped_fp), md5('')) AS dropped_fp
       |FROM assigned t LEFT JOIN drops d ON t.centroid_id = d.centroid_id
       |GROUP BY 1 ORDER BY centroid_id""".stripMargin

  /** Class-balance ledger over the labeled embedding corpus — the input a
    * supervised fine-tuning pipeline feeds its class-balanced sampler, plus
    * the per-class centroid numerators (class prototypes, the seed of
    * nearest-class-mean classifiers and per-class outlier pruning). Same
    * decimal-sum discipline as [[kmeansStep]]; one grouped aggregate with
    * map-side combine, shuffling one partial row per (partition, label).
    */
  def labelStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
    val sums = (1 to KmeansEmitDims).map(i =>
      dsum6(element_at(col("v"), i)).as(s"s_$i"))
    Tables.embeddings(spark, sfDir)
      .select(col("label"), transform(col("embedding"), _.cast("double")).as("v"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sums: _*)
      .orderBy("label")
  }

  val labelStatsSql: String = {
    val sums = (1 to KmeansEmitDims)
      .map(i => s"CAST(SUM(CAST(v[$i] AS DECIMAL(18,6))) AS DOUBLE) AS s_$i")
      .mkString(",\n       ")
    s"""SELECT label, count(*) AS n,
       |       $sums
       |FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM embeddings)
       |GROUP BY label ORDER BY label""".stripMargin
  }

  /** int8 scalar quantization (SQ8) of the embedding column — the storage
    * format a 100 TB vector corpus actually persists (4 bytes/dim float →
    * 1 byte/dim code + one scale, a 4× index shrink; PQ/SQ is standard in
    * FAISS-style serving). Per vector: symmetric scale = max |v_i| / 127,
    * codes = floor(v_i / scale) (floor, not round — round-half behavior
    * differs across engines, floor is identical), reconstruction error =
    * Σ (v_i − code_i·scale)², decimal-rendered. Pure column arithmetic, a
    * narrow map at any scale; the code vector is pinned cross-engine by an
    * md5 roll-up.
    */
  def quantizeSq8(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("scale",
        expr("aggregate(v, cast(0.0 as double), (m, x) -> greatest(m, abs(x)))") / 127.0)
      .withColumn("codes", expr("transform(v, x -> cast(floor(x / scale) as long))"))
    // error terms go through DECIMAL per element BEFORE summation: the two
    // engines' float-sum orders aren't pinned, decimal addition is exact
    e.select(
      col("vec_id"),
      md5(expr("array_join(transform(codes, c -> cast(c as string)), ',')")).as("codes_fp"),
      // no 6→4 rescale at the end: DuckDB truncates a decimal downscale
      // where Spark rounds half-up — the exact (18,6) sum renders to the
      // same double in both engines
      expr(
        """aggregate(zip_with(v, codes, (x, c) ->
          |    cast((x - c * scale) * (x - c * scale) as decimal(18,6))),
          |  cast(0 as decimal(18,6)),
          |  (acc, d) -> cast(acc + d as decimal(18,6)))""".stripMargin)
        .cast("double")
        .as("recon_err"))
      .orderBy("vec_id")
  }

  val quantizeSq8Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |scaled AS (
       |  SELECT vec_id, v,
       |         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       |  FROM e),
       |coded AS (
       |  SELECT vec_id, v, scale,
       |         list_transform(v, x -> CAST(floor(x / scale) AS BIGINT)) AS codes
       |  FROM scaled)
       |SELECT vec_id,
       |       md5(array_to_string(codes, ',')) AS codes_fp,
       |       CAST(list_sum(list_transform(generate_series(1, len(v)),
       |              i -> CAST((v[i] - codes[i] * scale) * (v[i] - codes[i] * scale) AS DECIMAL(18,6)))) AS DOUBLE) AS recon_err
       |FROM coded
       |ORDER BY vec_id""".stripMargin

  /** IVF search: top-3 cosine neighbors per query, candidates restricted to
    * the query's centroid cell (nprobe=1) — the approximate-but-bounded scale
    * path. Deterministic, so exactly reproducible in the oracle.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val assigns = ivfAssignments(spark, sfDir)
    val e = withNorm(Tables.embeddings(spark, sfDir), "vec_id", "v", "nn")
      .join(assigns, "vec_id")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"),
        col("centroid_id").as("qc"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"), col("nn").as("cn"),
      col("centroid_id").as("cc"))
    val scored = c
      .join(broadcast(q), col("qc") === col("cc") && col("qid") =!= col("cid"))
      .withColumn("cos", dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  def ivfTopKSql(nQueries: Int = 10, k: Int = 3): String =
    s"""WITH $assignCtes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |pairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM normed q JOIN normed c
       |    ON q.centroid_id = c.centroid_id AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT qid, rank, cid FROM (
       |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rank
       |  FROM pairs)
       |WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  /** Multi-probe IVF search (nprobe=2): each query searches its TWO nearest
    * cells instead of one — the standard recall/cost knob of an IVF index
    * (FAISS `nprobe`; Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011 use the same probe schedule). Candidates
    * still come from an equi-join on the cell key, so the scale shape is
    * unchanged — the probe list just carries `nprobe` rows per query instead
    * of one, multiplying candidate volume by ~nprobe while recall rises
    * toward exact (monotonically: a superset of candidates can only add
    * exact-top-k hits — pinned as a SimilaritySpec invariant). Probe ranking
    * is windowed over the bounded query set only; the corpus side is the
    * same single assignment pass [[ivfTopK]] uses.
    */
  /** Per-query nprobe nearest IVF cells: (qid, qv, qn) → one row per probed
    * cell (qid, qv, qn, probe), ties on distance resolving to the lowest k
    * — the shared query-side half of multi-probe search and [[IvfIndex]].
    */
  private[ann] def probeCells(
      q0: DataFrame, nprobe: Int,
      cents: IndexedSeq[Array[Double]] = centroids): DataFrame = {
    val withC = cents.indices.foldLeft(q0) { (df, c) =>
      df.withColumn(s"c_$c", litArr(cents(c).toIndexedSeq))
    }
    val qd = cents.indices.foldLeft(withC) { (df, c) =>
      df.withColumn(s"d_$c", lit(selfDot(cents(c))) - lit(2.0) * expr(s"dot_arrays(qv, c_$c)"))
    }
    val cells = qd
      .select(col("qid"), col("qv"), col("qn"),
        explode(array(cents.indices.map(c =>
          struct(lit(c).as("k"), col(s"d_$c").as("d"))): _*)).as("cd"))
      .select(col("qid"), col("qv"), col("qn"),
        col("cd.k").as("probe"), col("cd.d").as("d"))
    val wp = Window.partitionBy("qid").orderBy(asc("d"), asc("probe"))
    cells
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nprobe)
      .select("qid", "qv", "qn", "probe")
  }

  def ivfTopKMultiProbe(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2): DataFrame = {
    val assigns = ivfAssignments(spark, sfDir)
    val e = withNorm(Tables.embeddings(spark, sfDir), "vec_id", "v", "nn")
      .join(assigns, "vec_id")
    val probes = probeCells(withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < nQueries),
      "qid", "qv", "qn"), nprobe)
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"), col("nn").as("cn"),
      col("centroid_id").as("cc"))
    val scored = c
      .join(broadcast(probes), col("probe") === col("cc") && col("qid") =!= col("cid"))
      .withColumn("cos", dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  def ivfTopKMultiProbeSql(nQueries: Int = 10, k: Int = 3, nprobe: Int = 2): String =
    s"""WITH $assignCtes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |probes AS (
       |  SELECT vec_id AS qid, k AS probe FROM (
       |    SELECT vec_id, k,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS prn
       |    FROM dists WHERE vec_id < $nQueries)
       |  WHERE prn <= $nprobe),
       |pairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM probes p
       |  JOIN normed q ON q.vec_id = p.qid
       |  JOIN normed c ON c.centroid_id = p.probe AND c.vec_id <> q.vec_id)
       |SELECT qid, rank, cid FROM (
       |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rank
       |  FROM pairs)
       |WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------------------------
  // Product quantization (PQ) — the third FAISS-style scale path
  // -------------------------------------------------------------------------

  /** PQ geometry: 64 dims → 8 subspaces × 8 dims, 8 centroids per subspace
    * (3-bit codes; production uses 256/8-bit — the plan shape is identical).
    * Codebooks are md5-derived like [[centroids]] (a stand-in for the
    * per-subspace k-means training job; determinism keeps the oracle exact).
    */
  val PqM = 8
  val PqK = 8
  val PqSubDim: Int = Dim / PqM

  lazy val pqCodebook: IndexedSeq[IndexedSeq[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until PqM).map { m =>
      (0 until PqK).map { k =>
        Array.tabulate(PqSubDim) { i0 =>
          val i = i0 + 1
          md.reset()
          val hex = md.digest(s"pq_${m}_${k}_$i".getBytes("UTF-8"))
            .take(4).map(b => f"${b & 0xff}%02x").mkString
          java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
        }
      }
    }
  }

  /** Adds the [[PqM]] subvector columns (`v_0`…`v_7`) of double-array
    * column `vCol` — the slice step every PQ encode/LUT build starts from.
    */
  private[ann] def addSubvectors(df: DataFrame, vCol: String): DataFrame =
    // one Project, not PqM nested ones — withColumn-per-column chains make
    // Catalyst's constraint propagation quadratic in depth and (composed
    // with the 64 distance columns) overflow the planner stack
    df.select(col("*") +: (0 until PqM).map(m =>
      slice(col(vCol), m * PqSubDim + 1, PqSubDim).as(s"v_$m")): _*)

  /** Vectors with their 8 subvector columns materialized (`v_0`…`v_7`). */
  private def withSubvectors(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    addSubvectors(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
      "v")
  }

  /** Per-(vector, subspace) monotone distance columns `d_{m}_{k}` =
    * |c_mk|² − 2·v_m·c_mk (true squared distance minus the |v_m|² constant).
    */
  private def withPqDists(df: DataFrame): DataFrame = {
    val dCols = for { m <- 0 until PqM; k <- 0 until PqK } yield {
      val c = pqCodebook(m)(k)
      // literal array via lit() — an inline SQL `array(0.44, …)` would
      // parse its literals as DecimalType and fail dot_arrays' type check
      val cArr = litArr(c.toIndexedSeq)
      (lit(selfDot(c)) - lit(2.0) * call_function("dot_arrays", col(s"v_$m"), cArr))
        .as(s"d_${m}_$k")
    }
    // single Project for all 64 distance columns (see [[addSubvectors]])
    df.select(col("*") +: dCols: _*)
  }

  private def pqArgmin(m: Int): Column = {
    val ks = 0 until PqK
    ks.init.foldRight(lit(ks.last)) { case (k, elseCol) =>
      val leAll = ks.drop(k + 1).map(o => col(s"d_${m}_$k") <= col(s"d_${m}_$o")).reduce(_ && _)
      when(leAll, lit(k)).otherwise(elseCol)
    }
  }

  /** Adds `outCol` = the PQ code vector of double-array column `vCol`
    * (array<int>, one code per subspace, ties → lowest k like every argmin
    * here) — the per-row encode step [[IvfIndex.appendBatch]] runs at
    * absorb time, one self-contained [[argminDist]] expression per subspace
    * (no scaffolding columns). Codes depend only on the FIXED codebook,
    * never on the IVF centroid set, so a recluster carries them through
    * unchanged.
    */
  private[ann] def pqCodeCol(
      vCol: String,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): Column =
    array((0 until PqM).map { m =>
      argminDist(slice(col(vCol), m * PqSubDim + 1, PqSubDim), cb(m))._1
    }: _*)

  private[ann] def withPqCodes(
      df: DataFrame, vCol: String, outCol: String,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): DataFrame =
    df.withColumn(outCol, pqCodeCol(vCol, cb))

  /** PQ encoding of the corpus: the 3-bit-per-subspace code vector (8 codes
    * ≈ 3 bytes vs 256 float bytes — the compression that makes a 100 TB
    * vector corpus RAM-servable) plus the exact reconstruction error
    * Σ_m min_k |v_m − c_mk|², decimal-summed so both engines agree bitwise.
    * Pure column arithmetic over one scan — a narrow map at any scale, like
    * [[quantizeSq8]].
    */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val scored = withPqDists(withSubvectors(spark, sfDir))
    val codeCols = (0 until PqM).map(m => pqArgmin(m).as(s"code_$m"))
    val reconTerms = (0 until PqM).map { m =>
      (least((0 until PqK).map(k => col(s"d_${m}_$k")): _*) +
        expr(s"dot_arrays(v_$m, v_$m)")).cast(DecimalType(18, 6))
    }
    scored
      .select(col("vec_id") +: (codeCols :+
        reconTerms.reduce(_ + _).cast(DoubleType).as("recon_err")): _*)
      .select(
        col("vec_id"),
        md5(concat_ws(",", (0 until PqM).map(m => col(s"code_$m").cast("string")): _*))
          .as("codes_fp"),
        col("recon_err"))
      .orderBy("vec_id")
  }

  /** Shared oracle CTEs: the derived codebook (one row per (m, k)), each
    * vector's subvectors, and the per-(vector, m) distances + argmin code.
    * [[pqTailCtes]] assumes a CTE `e(vec_id, v)` is already in scope, so it
    * composes with [[assignCtes]] (which defines the identical `e`) for the
    * IVFADC oracle; [[pqCtes]] is the standalone form.
    */
  private def pqCodeCtes(rel: String, vcol: String): String = {
    val mkVals = (for (m <- 0 until PqM; k <- 0 until PqK) yield s"($m, $k)").mkString(", ")
    s"""sub AS (
       |  SELECT vec_id, t.m, $vcol[t.m * $PqSubDim + 1 : t.m * $PqSubDim + $PqSubDim] AS vm
       |  FROM $rel CROSS JOIN (VALUES ${(0 until PqM).map(m => s"($m)").mkString(", ")}) AS t(m)),
       |cb AS (
       |  SELECT t.m, t.k,
       |         list_transform(generate_series(1, $PqSubDim), i ->
       |           (CAST('0x' || substr(md5('pq_' || t.m || '_' || t.k || '_' || i), 1, 8) AS BIGINT)
       |              / 4294967296.0) - 0.5) AS c
       |  FROM (VALUES $mkVals) AS t(m, k)),
       |cb2 AS (SELECT m, k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cb),
       |pqd AS (
       |  SELECT s.vec_id, s.m, cb2.k,
       |         cb2.c2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |                                              i -> s.vm[i] * cb2.c[i])) AS d,
       |         list_sum(list_transform(s.vm, x -> x * x)) AS n2
       |  FROM sub s JOIN cb2 ON s.m = cb2.m),
       |coded AS (
       |  SELECT vec_id, m, k AS code, d, n2 FROM (
       |    SELECT vec_id, m, k, d, n2,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
       |    FROM pqd)
       |  WHERE rn = 1)""".stripMargin
  }

  private val pqTailCtes: String = pqCodeCtes("e", "v")

  private val pqCtes: String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |$pqTailCtes""".stripMargin

  val pqCodesSql: String =
    s"""WITH $pqCtes
       |SELECT vec_id,
       |       md5(array_to_string(list(code ORDER BY m), ',')) AS codes_fp,
       |       CAST(sum(CAST(d + n2 AS DECIMAL(18,6))) AS DOUBLE) AS recon_err
       |FROM coded
       |GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin

  /** Per-query ADC lookup table over double-array query column `vCol`:
    * one row per (query, subspace, codebook entry) — `(qid, m, k, l)` with
    * `l` the exact |c_mk|² − 2·q_m·c_mk distance, DECIMAL(18,6)-pinned so
    * the grouped ADC sum is bit-stable cross-engine. 64 rows per query —
    * always broadcastable.
    */
  private[ann] def adcLut(queries: DataFrame, idCol: String, vCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val lutRows = (for (m <- 0 until PqM; kk <- 0 until PqK) yield {
      val c = pqCodebook(m)(kk)
      val cArr = litArr(c.toIndexedSeq)
      struct(lit(m).as("m"), lit(kk).as("k"),
        (lit(selfDot(c)) - lit(2.0) * call_function("dot_arrays", col(s"v_$m"), cArr))
          .cast(DecimalType(18, 6)).as("l"))
    })
    addSubvectors(queries, vCol)
      .select(col(idCol).as("qid"), explode(array(lutRows: _*)).as("e"))
      .select(col("qid"), col("e.m").as("m"), col("e.k").as("k"), col("e.l").as("l"))
  }

  /** ARRAY form of the ADC lookup table — `(qid, lut)` with `lut[m·K + k + 1]`
    * the (subspace m, code k) entry as an exact PPM LONG: the DECIMAL(18,6)
    * value of [[adcLut]] times 10⁶ is an integer, so the long carries it
    * exactly and the long sum of 8 entries induces the SAME total order as
    * the oracle's grouped decimal sum (a monotone bijection — decimal adds
    * past (18,6) precision leave Spark's compact-long Decimal for
    * BigDecimal objects; longs stay primitive). One row per query, so
    * ranking a candidate is ONE broadcast join plus a flat 8-term
    * `element_at` sum over its stored codes — no 8-way row explode, no
    * (m, k) equi-join, and crucially NO per-(query, candidate) aggregation
    * shuffle: the ADC score is a scalar projection, fully inside
    * whole-stage codegen.
    */
  private[ann] def adcLutArr(
      queries: DataFrame, idCol: String, vCol: String,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): DataFrame =
    queries.select(col(idCol).as("qid"), adcLutCol(vCol, cb).as("lut"))

  /** The [[adcLutArr]] LUT as a bare COLUMN over any frame carrying the
    * query vector — so a serving path can attach the LUT to its probe
    * schedule as a projection (zero extra joins, zero extra broadcast
    * exchanges; the [[radcLutArr]] shape) instead of joining a separate
    * one-row-per-query LUT relation onto every candidate.
    */
  private[ann] def adcLutCol(
      vCol: String,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): Column = {
    import org.apache.spark.sql.types.DecimalType
    val entries = for (m <- 0 until PqM; kk <- 0 until PqK) yield {
      val c = cb(m)(kk)
      val cArr = litArr(c.toIndexedSeq)
      ((lit(selfDot(c)) - lit(2.0) * call_function(
        "dot_arrays", slice(col(vCol), m * PqSubDim + 1, PqSubDim), cArr))
        .cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")
    }
    array(entries: _*)
  }

  /** The ADC score of code column `pqCol` against LUT-array column `lutCol`:
    * Σ_m lut[m·K + pq[m] + 1], exact long ppm.
    */
  private[ann] def adcScore(pqCol: String, lutCol: String): Column =
    (0 until PqM).map(m =>
      element_at(col(lutCol), lit(m * PqK) + element_at(col(pqCol), m + 1) + lit(1)))
      .reduce(_ + _)

  /** Asymmetric-distance (ADC) top-k over the PQ codes — how a PQ index is
    * actually searched (Jégou et al. 2011): per query, ONE 8×8 lookup table
    * of exact query-subvector-to-centroid distances, then every candidate
    * scores as 8 table lookups over its stored codes — never a full-width
    * dot product per pair. Expressed relationally: the LUT is a (query × m
    * × k) relation (64 rows/query, broadcast), candidates explode to their
    * 8 (m, code) entries and equi-join the LUT, and a grouped decimal sum
    * rebuilds the ADC distance exactly — so the ranking is bit-stable
    * cross-engine. Scale shape: codes relation is ~1% of the corpus bytes,
    * the join is an equi-join on (m, k) against a broadcast LUT, and the
    * per-(query, candidate) state is one partial sum. (The IVFADC serving
    * path upgrades this shape to the array-form LUT — see [[adcLutArr]].)
    */
  def pqAdcTopK(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    // candidate codes, exploded to (cid, m, code)
    val codes = withPqDists(withSubvectors(spark, sfDir))
      .select(col("vec_id").as("cid"),
        explode(array((0 until PqM).map(m =>
          struct(lit(m).as("m"), pqArgmin(m).as("code"))): _*)).as("mc"))
      .select(col("cid"), col("mc.m").as("m"), col("mc.code").as("code"))
    // per-query LUT: exact subvector-to-centroid distances, decimal-pinned
    val lut = adcLut(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < nQueries)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
      "vec_id", "v")
    val w = Window.partitionBy("qid").orderBy(asc("adc"), asc("cid"))
    codes
      .join(broadcast(lut), codes("m") === lut("m") && codes("code") === lut("k") &&
        col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(sum("l").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  def pqAdcTopKSql(nQueries: Int = 10, k: Int = 3): String =
    s"""WITH $pqCtes,
       |lut AS (
       |  SELECT s.vec_id AS qid, cb2.m, cb2.k,
       |         CAST(cb2.c2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |                                                   i -> s.vm[i] * cb2.c[i])) AS DECIMAL(18,6)) AS l
       |  FROM sub s JOIN cb2 ON s.m = cb2.m
       |  WHERE s.vec_id < $nQueries),
       |adc AS (
       |  SELECT lut.qid, c.vec_id AS cid, sum(lut.l) AS adc
       |  FROM coded c JOIN lut ON lut.m = c.m AND lut.k = c.code AND lut.qid <> c.vec_id
       |  GROUP BY 1, 2)
       |SELECT qid, rank, cid FROM (
       |  SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS INT) AS rank
       |  FROM adc)
       |WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------------------------
  // IVFADC — IVF cell pruning × PQ asymmetric-distance ranking (Jégou et al.
  // 2011, the composition FAISS calls IndexIVFPQ): the billion-scale serving
  // shape. The probe stage prunes the corpus to nprobe cells per query
  // (partition pruning); the ADC stage ranks those candidates from their
  // ~3-byte PQ codes via the broadcast per-query LUT — never touching the
  // full float vectors; only the top `rerank` survivors per query pay an
  // exact full-width cosine. At 100 TB the candidate scan therefore reads
  // ~1% of the bytes the float probe reads, and the exact reads are bounded
  // by rerank × |queries|.
  // -------------------------------------------------------------------------

  /** ADC-pool size the exact rerank re-scores — FAISS' `k_factor × k` with
    * the usual k_factor ≈ 10 at k = 3. Widening 10 → 30 (r10) lifted ADC
    * recall ~2.7× at sf0.001 for 20 extra exact dot products per query —
    * with UNTRAINED stand-in codebooks the ADC ordering is noisy, so the
    * exact rerank pool is the cheap recall lever.
    */
  val AdcRerank = 30

  def ivfAdcTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2,
      rerank: Int = AdcRerank): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // corpus side at vector granularity: cell id + the 8-code PQ vector
    val coded = withPqCodes(withCentroidAssignment(e, "v"), "v", "pq")
      .select(col("vec_id").as("cid"), col("centroid_id").as("cc"), col("pq"))
    val q = withNorm(Tables.embeddings(spark, sfDir).filter(col("vec_id") < nQueries),
      "qid", "qv", "qn")
    val probes = probeCells(q, nprobe)
    val lut = adcLutArr(q.select(col("qid"), col("qv")), "qid", "qv")
    // candidates stay at vector granularity end to end: probe join, then
    // the per-query LUT array rides a one-row broadcast join and the ADC
    // score is a flat 8-lookup projection — no row explode, no grouped sum
    val adc = coded
      .join(broadcast(probes.select("qid", "probe")),
        col("probe") === col("cc") && col("qid") =!= col("cid"))
      .join(broadcast(lut), "qid")
      .select(col("qid"), col("cid"), adcScore("pq", "lut").as("adc"))
    val wAdc = Window.partitionBy("qid").orderBy(asc("adc"), asc("cid"))
    val pool = adc
      .withColumn("prn", row_number().over(wAdc))
      .filter(col("prn") <= rerank)
      .select(col("qid").as("pqid"), col("cid").as("pcid"))
    // exact rerank: full-width cosine for ONLY the pooled candidates
    val full = withNorm(Tables.embeddings(spark, sfDir), "vec_id", "v", "nn")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    full
      .join(broadcast(pool), col("vec_id") === col("pcid"))
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), col("qid") === col("pqid"))
      .withColumn("cos", dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("cid", col("pcid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  /** Oracle CTE chain ending in `adc_topk(qid, rank, cid)` — shared by the
    * top-k query and the recall ledger. Composes [[assignCtes]] (cells +
    * per-query probe distances) with [[pqTailCtes]] (codes) over the same
    * `e`.
    */
  private def ivfAdcCtes(nQueries: Int, k: Int, nprobe: Int, rerank: Int): String =
    s"""$assignCtes,
       |$pqTailCtes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |probes AS (
       |  SELECT vec_id AS qid, k AS probe FROM (
       |    SELECT vec_id, k,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS prn
       |    FROM dists WHERE vec_id < $nQueries)
       |  WHERE prn <= $nprobe),
       |lut AS (
       |  SELECT s.vec_id AS qid, cb2.m, cb2.k,
       |         CAST(cb2.c2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |                                                   i -> s.vm[i] * cb2.c[i])) AS DECIMAL(18,6)) AS l
       |  FROM sub s JOIN cb2 ON s.m = cb2.m
       |  WHERE s.vec_id < $nQueries),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS cid, sum(l.l) AS adc
       |  FROM probes p
       |  JOIN assigned a ON a.centroid_id = p.probe AND a.vec_id <> p.qid
       |  JOIN coded c ON c.vec_id = a.vec_id
       |  JOIN lut l ON l.qid = p.qid AND l.m = c.m AND l.k = c.code
       |  GROUP BY 1, 2),
       |pool AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS prn
       |    FROM adc)
       |  WHERE prn <= $rerank),
       |rer AS (
       |  SELECT p.qid, p.cid,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM pool p
       |  JOIN normed q ON q.vec_id = p.qid
       |  JOIN normed c ON c.vec_id = p.cid),
       |adc_topk AS (
       |  SELECT qid, rank, cid FROM (
       |    SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rank
       |    FROM rer)
       |  WHERE rank <= $k)""".stripMargin

  def ivfAdcTopKSql(
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2, rerank: Int = AdcRerank): String =
    s"""WITH ${ivfAdcCtes(nQueries, k, nprobe, rerank)}
       |SELECT qid, rank, cid FROM adc_topk ORDER BY qid, rank""".stripMargin

  /** Recall@k of the full IVFADC pipeline against exact brute force — the
    * acceptance gate for the compound approximation (cell pruning × PQ
    * ranking × bounded rerank). Same integer-exact hit ledger as
    * [[ivfRecall]].
    */
  def ivfAdcRecall(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = annTopK(spark, sfDir, nQueries, k).select(col("qid"), col("cid"))
    val approx = ivfAdcTopK(spark, sfDir, nQueries, k)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    exact
      .join(approx, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .groupBy("qid")
      .agg(
        count(lit(1)).as("k_exact"),
        count(col("acid")).as("hits"))
      .orderBy("qid")
  }

  def ivfAdcRecallSql(
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2, rerank: Int = AdcRerank): String =
    s"""WITH ${ivfAdcCtes(nQueries, k, nprobe, rerank)},
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |               / (sqrt(q.nn) * sqrt(c.nn)) DESC, c.vec_id) AS rank
       |    FROM normed q JOIN normed c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k)
       |SELECT e.qid AS qid, count(*) AS k_exact, count(a.cid) AS hits
       |FROM exact e LEFT JOIN adc_topk a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY e.qid""".stripMargin

  // -------------------------------------------------------------------------
  // Residual IVFADC — PQ over the residual v − centroid(v), the encoding
  // Jégou et al. 2011 actually specify for IndexIVFPQ (FAISS default): within
  // a cell, residuals concentrate near the origin, so a fixed codebook spends
  // its precision on the part of the vector the cell id doesn't already
  // encode. The ADC estimate becomes the full |q − v̂|² = |q − c|² −
  // 2(q−c)·r̂ + |r̂|²: the LUT gains a per-(query, probed-cell) dimension
  // (nprobe × 64 entries per query — still trivially broadcast) and the
  // |q − c|² constant must ride along, because with nprobe > 1 candidates
  // from DIFFERENT cells compete in one ranking. Unlike raw-vector codes,
  // residual codes depend on the centroid set: a recluster must RE-ENCODE
  // them ([[IvfIndex.recluster]] does; its raw `pq` codes carry through).
  // -------------------------------------------------------------------------

  private def centroidMatrix(cents: IndexedSeq[Array[Double]]): Column =
    litMat(cents.map(_.toIndexedSeq))

  /** `vCol − cents(centIdCol)`, elementwise — the residual a cell's PQ codes
    * quantize. One zip_with against a literal centroid matrix lookup, so the
    * encode stays a narrow codegen'd map at any scale.
    */
  private[ann] def residualCol(
      vCol: String, centIdCol: String, cents: IndexedSeq[Array[Double]]): Column =
    zip_with(col(vCol), element_at(centroidMatrix(cents), col(centIdCol) + 1),
      (x, c) => x - c)

  /** Per-(query, probed cell) residual-ADC lookup table: `lut[m·K + k + 1]` =
    * |cb_mk|² − 2(q−c)_m·cb_mk and `qc2` = |q−c|², both exact ppm longs (same
    * monotone-bijection argument as [[adcLutArr]]). nprobe rows per query —
    * the broadcast stays tiny; the candidate join below needs NO extra join
    * versus the raw-ADC path because the LUT row is keyed by the same
    * (qid, cell) pair the probe join already matches on.
    */
  private[ann] def radcLutArr(
      probes: DataFrame, cents: IndexedSeq[Array[Double]] = centroids,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val withR = probes.withColumn("qr", residualCol("qv", "probe", cents))
    val entries = for (m <- 0 until PqM; kk <- 0 until PqK) yield {
      val c = cb(m)(kk)
      val cArr = litArr(c.toIndexedSeq)
      ((lit(selfDot(c)) - lit(2.0) * call_function(
        "dot_arrays", slice(col("qr"), m * PqSubDim + 1, PqSubDim), cArr))
        .cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")
    }
    withR.select(col("qid"), col("probe"),
      array(entries: _*).as("lut"),
      (call_function("dot_arrays", col("qr"), col("qr"))
        .cast(DecimalType(18, 6)) * lit(1000000L)).cast("long").as("qc2"))
  }

  /** Residual-IVFADC top-k: probe → residual-ADC rank (flat 8-lookup + the
    * cell constant) → exact rerank of the top `rerank`. Identical plan shape
    * to [[ivfAdcTopK]] — the residual refinement costs nothing structural:
    * same single broadcast probe-join (the LUT rides it), same bounded
    * rerank. `cents` parameterizes the cell set so [[IvfIndex]]'s spec can
    * replay this one-shot under a post-recluster centroid set.
    */
  def ivfRadcTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2,
      rerank: Int = AdcRerank,
      cents: IndexedSeq[Array[Double]] = centroids,
      cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook): DataFrame = {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val coded = withCentroidAssignment(e, "v", cents)
      .withColumn("r", residualCol("v", "centroid_id", cents))
      .select(col("vec_id").as("cid"), col("centroid_id").as("cc"),
        pqCodeCol("r", cb).as("rpq"))
    val q = withNorm(Tables.embeddings(spark, sfDir).filter(col("vec_id") < nQueries),
      "qid", "qv", "qn")
    val plut = radcLutArr(probeCells(q, nprobe, cents), cents, cb)
    val adc = coded
      .join(broadcast(plut), col("probe") === col("cc") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (adcScore("rpq", "lut") + col("qc2")).as("adc"))
    val wAdc = Window.partitionBy("qid").orderBy(asc("adc"), asc("cid"))
    val pool = adc
      .withColumn("prn", row_number().over(wAdc))
      .filter(col("prn") <= rerank)
      .select(col("qid").as("pqid"), col("cid").as("pcid"))
    val full = withNorm(Tables.embeddings(spark, sfDir), "vec_id", "v", "nn")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    full
      .join(broadcast(pool), col("vec_id") === col("pcid"))
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), col("qid") === col("pqid"))
      .withColumn("cos", dot("qv", "v") / (sqrt(col("qn")) * sqrt(col("nn"))))
      .withColumn("cid", col("pcid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid")
      .orderBy("qid", "rank")
  }

  /** Oracle CTE chain ending in `radc_topk(qid, rank, cid)`: residuals from
    * the assigned cell, codes over residuals (pqCodeCtes re-instantiated on
    * `res.r`), the per-(query, probe) LUT + |q−c|² constant, decimal-exact
    * ADC sum, bounded rerank by exact cosine.
    */
  private def ivfRadcCtes(nQueries: Int, k: Int, nprobe: Int, rerank: Int): String =
    s"""$assignCtes,
       |res AS (
       |  SELECT a.vec_id, a.centroid_id,
       |         list_transform(generate_series(1, $Dim), i -> a.v[i] - cc.c[i]) AS r
       |  FROM assigned a JOIN cents2 cc ON cc.k = a.centroid_id),
       |${pqCodeCtes("res", "r")},
       |${radcServeCtes(nQueries, k, nprobe, rerank, cbRel = "cb2", codedRel = "coded")}""".stripMargin

  /** The SERVING half of the residual-ADC oracle — probes, residual LUT,
    * decimal ADC sum, bounded exact rerank — over whatever codebook relation
    * (`cbRel(m, k, c, c2)`) and corpus-code relation
    * (`codedRel(vec_id, m, code)`) the caller's CTEs produced: the md5 seed
    * ([[ivfRadcCtes]]) or a trained Lloyd trajectory
    * ([[ivfRadcTrainedTopKSql]]). Assumes [[assignCtes]]' e/cents2/dists/
    * assigned are in scope.
    */
  private def radcServeCtes(
      nQueries: Int, k: Int, nprobe: Int, rerank: Int,
      cbRel: String, codedRel: String): String =
    s"""normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |probes AS (
       |  SELECT vec_id AS qid, k AS probe FROM (
       |    SELECT vec_id, k,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS prn
       |    FROM dists WHERE vec_id < $nQueries)
       |  WHERE prn <= $nprobe),
       |qres AS (
       |  SELECT p.qid, p.probe,
       |         list_transform(generate_series(1, $Dim), i -> q.v[i] - cc.c[i]) AS qr
       |  FROM probes p
       |  JOIN e q ON q.vec_id = p.qid
       |  JOIN cents2 cc ON cc.k = p.probe),
       |qc AS (
       |  SELECT qid, probe,
       |         CAST(list_sum(list_transform(qr, x -> x * x)) AS DECIMAL(18,6)) AS qc2
       |  FROM qres),
       |lutr AS (
       |  SELECT s.qid, s.probe, cb2.m, cb2.k,
       |         CAST(cb2.c2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |                i -> s.qr[cb2.m * $PqSubDim + i] * cb2.c[i])) AS DECIMAL(18,6)) AS l
       |  FROM qres s CROSS JOIN $cbRel cb2),
       |adcr AS (
       |  SELECT p.qid, a.vec_id AS cid, min(qc.qc2) + sum(l.l) AS adc
       |  FROM probes p
       |  JOIN assigned a ON a.centroid_id = p.probe AND a.vec_id <> p.qid
       |  JOIN $codedRel c ON c.vec_id = a.vec_id
       |  JOIN lutr l ON l.qid = p.qid AND l.probe = p.probe AND l.m = c.m AND l.k = c.code
       |  JOIN qc ON qc.qid = p.qid AND qc.probe = p.probe
       |  GROUP BY 1, 2),
       |pool AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS prn
       |    FROM adcr)
       |  WHERE prn <= $rerank),
       |rer AS (
       |  SELECT p.qid, p.cid,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM pool p
       |  JOIN normed q ON q.vec_id = p.qid
       |  JOIN normed c ON c.vec_id = p.cid),
       |radc_topk AS (
       |  SELECT qid, rank, cid FROM (
       |    SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rank
       |    FROM rer)
       |  WHERE rank <= $k)""".stripMargin

  def ivfRadcTopKSql(
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2, rerank: Int = AdcRerank): String =
    s"""WITH ${ivfRadcCtes(nQueries, k, nprobe, rerank)}
       |SELECT qid, rank, cid FROM radc_topk ORDER BY qid, rank""".stripMargin

  /** Recall@k ledger of residual IVFADC vs exact brute force — read next to
    * [[ivfAdcRecall]]'s, it quantifies what residual encoding buys at the
    * same probe/rerank budget. Honest number, and with these md5 stand-in
    * codebooks it currently reads BELOW the raw-vector ADC ledger: a
    * uniform codebook matches raw coordinates' scale, while residuals v − c
    * are spread wider, so untrained codewords quantize them worse. The
    * residual layout wins only with codebooks TRAINED on residuals — which
    * [[pqTrainCodebooks]] provides (deterministic Lloyd from the md5 seed;
    * measured 3 → 6 → 9 hits of 30 at 0/2/4 rounds on sf0.001, overtaking
    * raw-ADC's 8, spec-pinned via the IvfIndex codebook manifest). This
    * UNTRAINED ledger stays as the oracle-checked baseline: the training
    * payoff is exactly the gap between the two.
    */
  def ivfRadcRecall(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = annTopK(spark, sfDir, nQueries, k).select(col("qid"), col("cid"))
    val approx = ivfRadcTopK(spark, sfDir, nQueries, k)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    exact
      .join(approx, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .groupBy("qid")
      .agg(
        count(lit(1)).as("k_exact"),
        count(col("acid")).as("hits"))
      .orderBy("qid")
  }

  def ivfRadcRecallSql(
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2, rerank: Int = AdcRerank): String =
    s"""WITH ${ivfRadcCtes(nQueries, k, nprobe, rerank)},
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |               / (sqrt(q.nn) * sqrt(c.nn)) DESC, c.vec_id) AS rank
       |    FROM normed q JOIN normed c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k)
       |SELECT e.qid AS qid, count(*) AS k_exact, count(a.cid) AS hits
       |FROM exact e LEFT JOIN radc_topk a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY e.qid""".stripMargin

  // -------------------------------------------------------------------------
  // PQ codebook TRAINING — the per-subspace k-means job FAISS runs before an
  // IndexIVFPQ serves (trained on residuals, Jégou et al. 2011 §III). The md5
  // codebook above is the untrained seed; this is the Lloyd loop that turns
  // it into codewords matched to the corpus. All 8 subspaces train in ONE
  // distributed job per round: subvectors explode to (vec_id, m, vm), the
  // assignment is a literal-matrix argmin keyed by m, and the update reduces
  // to a (m, code, pos) grouped decimal sum — 8×8×8 = 512 rows of model
  // state reach the driver per round, never the corpus (kmeansIter's shape,
  // one level down).
  // -------------------------------------------------------------------------

  /** (vec_id, m, vm): every vector's [[PqM]] subvectors — of the residual
    * v − centroid when `onResiduals` (what IVFPQ trains on), else of v.
    */
  private def pqSubvectors(
      spark: SparkSession, sfDir: String, onResiduals: Boolean,
      cents: IndexedSeq[Array[Double]]): DataFrame = {
    VectorFunctions.register(spark)
    pqSubvectorsOf(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
      onResiduals, cents)
  }

  /** [[pqSubvectors]] over an arbitrary `(vec_id, v double-array)` frame —
    * the form [[graft.ann.IvfIndex.recluster]] trains on (its Lloyd sample
    * of the STORED index, so codebook retraining needs no access to the
    * original embeddings table).
    */
  private[ann] def pqSubvectorsOf(
      e: DataFrame, onResiduals: Boolean,
      cents: IndexedSeq[Array[Double]]): DataFrame = {
    val base =
      if (onResiduals)
        withCentroidAssignment(e, "v", cents)
          .withColumn("b", residualCol("v", "centroid_id", cents))
      else e.withColumn("b", col("v"))
    base
      .select(col("vec_id"), explode(array((0 until PqM).map(m =>
        struct(lit(m).as("m"),
          slice(col("b"), m * PqSubDim + 1, PqSubDim).as("vm"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.vm").as("vm"))
  }

  /** The code of a (m, vm) row under codebook `cb`: argmin over the monotone
    * |c|² − 2·vm·c with the first-minimum (lowest-k) tie rule — the same
    * contract as [[argminDist]], but the codebook rides as a literal 3-D
    * matrix indexed by the ROW's m, so one expression serves all subspaces.
    */
  private def pqAssignCol(cb: IndexedSeq[IndexedSeq[Array[Double]]]): Column = {
    val c2Mat = array(cb.map(ks => array(ks.map(c => lit(selfDot(c))): _*)): _*)
    val cbMat = array(cb.map(ks => litMat(ks.map(_.toIndexedSeq))): _*)
    val dists = array((0 until PqK).map { k =>
      element_at(element_at(c2Mat, col("m") + 1), k + 1) -
        lit(2.0) * call_function("dot_arrays", col("vm"),
          element_at(element_at(cbMat, col("m") + 1), k + 1))
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train the [[PqM]]×[[PqK]] codebook: `rounds` Lloyd iterations per
    * subspace from the md5 seed, decimal cell means (bit-stable
    * cross-engine), empty codewords keeping their previous coordinates.
    * Returns driver-side model state (8×8×8 doubles); [[IvfIndex]] persists
    * it as an index manifest so every absorb and search uses the set the
    * stored codes were encoded under.
    */
  /** Driver-side memo of trained codebooks (r10 advisory): training is a
    * rounds×collect driver loop, and the registry builders that call it
    * ([[pqTrain]], [[ivfRadcTrainedTopK]]) construct their DataFrames
    * eagerly — without the memo, every plan INSPECTION of those frames (the
    * ScaleSpec sweep pattern) re-paid the whole training job. Keyed by the
    * full training recipe PLUS a corpus fingerprint of the embeddings data
    * files (name/length/mtime — the [[graft.dedup.PairStore]] staleness
    * rule): a corpus rewritten in place trains fresh instead of serving a
    * codebook fit to data that no longer exists. Only the default-centroid
    * runs are memoized (a caller-supplied `cents` has no stable identity to
    * key on).
    */
  private val trainedCbCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int, Boolean, String), IndexedSeq[IndexedSeq[Array[Double]]]]()

  /** Count of actual Lloyd training RUNS (memo misses) — the observable the
    * catalog-sweep spec pins: constructing every registry DataFrame must
    * train at most once per (corpus, recipe), never once per inspection.
    */
  private[graft] val trainingRuns = new java.util.concurrent.atomic.AtomicLong(0)

  private def embeddingsFingerprint(spark: SparkSession, sfDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) "absent"
    else fs.listStatus(root)
      .filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("\n")
  }

  def pqTrainCodebooks(
      spark: SparkSession, sfDir: String,
      rounds: Int = 2, onResiduals: Boolean = true,
      cents: IndexedSeq[Array[Double]] = centroids): IndexedSeq[IndexedSeq[Array[Double]]] = {
    def train(): IndexedSeq[IndexedSeq[Array[Double]]] = {
      trainingRuns.incrementAndGet()
      val subs = pqSubvectors(spark, sfDir, onResiduals, cents).localCheckpoint()
      try trainOnSubvectors(subs, rounds)
      finally { subs.unpersist(); () } // checkpoint blocks are per-training scratch, not session state
    }
    if (cents eq centroids)
      trainedCbCache.computeIfAbsent(
        (sfDir, rounds, onResiduals, embeddingsFingerprint(spark, sfDir)), _ => train())
    else train()
  }

  private[ann] def trainOnSubvectors(
      subs: DataFrame, rounds: Int): IndexedSeq[IndexedSeq[Array[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    var cb: IndexedSeq[IndexedSeq[Array[Double]]] = pqCodebook
    (1 to rounds).foreach { _ =>
      val stats = subs
        .select(col("m"), pqAssignCol(cb).as("code"), posexplode(col("vm")).as(Seq("pos", "x")))
        .groupBy("m", "code", "pos")
        .agg(
          sum(col("x").cast(DecimalType(18, 6))).cast(DoubleType).as("sx"),
          count(lit(1)).as("n"))
        .collect() // 8 × 8 × 8 model rows — bounded at any corpus size
      cb = (0 until PqM).map { m =>
        (0 until PqK).map { k =>
          val rows = stats.filter(r => r.getInt(0) == m && r.getInt(1) == k)
          if (rows.isEmpty) cb(m)(k)
          else rows.sortBy(_.getInt(2)).map(r => r.getDouble(3) / r.getLong(4)).toArray
        }
      }
    }
    cb
  }

  /** Training ledger: per (subspace, code) population + first-4-coordinate
    * decimal sums of the TRAINED assignment (the kmeansIter emit shape) —
    * the oracle-checked witness that both engines ran the identical Lloyd
    * trajectory from the identical seed.
    */
  def pqTrain(spark: SparkSession, sfDir: String, rounds: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // training goes through the memoized [[pqTrainCodebooks]] (which releases
    // its own checkpoint scratch — the r10 LEAKCHECK item); the ledger then
    // reads a LAZY subvector plan, so constructing this frame repeatedly
    // costs one training per (sfDir, rounds) per JVM and zero live blocks
    val cb = pqTrainCodebooks(spark, sfDir, rounds, onResiduals = true)
    def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
    pqSubvectors(spark, sfDir, onResiduals = true, centroids)
      .select(col("m"), pqAssignCol(cb).as("code"), col("vm"))
      .groupBy("m", "code")
      .agg(count(lit(1)).as("n"),
        (1 to 4).map(i => dsum6(element_at(col("vm"), i)).as(s"s_$i")): _*)
      .orderBy("m", "code")
  }

  /** Unrolled per-subspace Lloyd rounds in DuckDB — [[kmeansIterSql]]'s
    * structure with (m, k) in place of k, over residual subvectors. Returns
    * the CTE chain ending in the trained codebook `cc_<rounds>(m, k, c, c2)`
    * and the final corpus-code assignment `a_<rounds+1>(vec_id, m, vm,
    * code)` — [[pqTrainSql]] reads its ledger from the latter;
    * [[ivfRadcTrainedTopKSql]] serves from both.
    */
  private def pqTrainChain(rounds: Int): String = {
    val mkVals = (for (m <- 0 until PqM; k <- 0 until PqK) yield s"($m, $k)").mkString(", ")
    val cte = Seq.newBuilder[String]
    cte += s"""$assignCtes,
      |res AS (
      |  SELECT a.vec_id, a.centroid_id,
      |         list_transform(generate_series(1, $Dim), i -> a.v[i] - cc.c[i]) AS r
      |  FROM assigned a JOIN cents2 cc ON cc.k = a.centroid_id),
      |sub AS (
      |  SELECT vec_id, t.m, r[t.m * $PqSubDim + 1 : t.m * $PqSubDim + $PqSubDim] AS vm
      |  FROM res CROSS JOIN (VALUES ${(0 until PqM).map(m => s"($m)").mkString(", ")}) AS t(m)),
      |sdims AS (SELECT unnest(generate_series(1, $PqSubDim)) AS i),
      |cb_0 AS (
      |  SELECT t.m, t.k,
      |         list_transform(generate_series(1, $PqSubDim), i ->
      |           (CAST('0x' || substr(md5('pq_' || t.m || '_' || t.k || '_' || i), 1, 8) AS BIGINT)
      |              / 4294967296.0) - 0.5) AS c
      |  FROM (VALUES $mkVals) AS t(m, k)),
      |cc_0 AS (SELECT m, k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cb_0)""".stripMargin
    def assignCte(r: Int, from: String): String =
      s"""d_$r AS (
        |  SELECT s.vec_id, s.m, s.vm, cc.k,
        |         cc.c2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
        |                                             i -> s.vm[i] * cc.c[i])) AS d
        |  FROM sub s JOIN $from cc ON cc.m = s.m),
        |a_$r AS (
        |  SELECT vec_id, m, vm, k AS code FROM (
        |    SELECT vec_id, m, vm, k,
        |           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        |    FROM d_$r)
        |  WHERE rn = 1)""".stripMargin
    (1 to rounds).foreach { r =>
      cte += assignCte(r, s"cc_${r - 1}")
      cte += s"""m_$r AS (
        |  SELECT m, code AS k, sdims.i AS pos,
        |         CAST(SUM(CAST(vm[sdims.i] AS DECIMAL(18,6))) AS DOUBLE) AS sx, count(*) AS n
        |  FROM a_$r CROSS JOIN sdims GROUP BY 1, 2, 3),
        |cx_$r AS (
        |  SELECT pk.m, pk.k, sdims.i AS pos, coalesce(mm.sx / mm.n, pk.c[sdims.i]) AS x
        |  FROM cb_${r - 1} pk CROSS JOIN sdims
        |  LEFT JOIN m_$r mm ON mm.m = pk.m AND mm.k = pk.k AND mm.pos = sdims.i),
        |cb_$r AS (SELECT m, k, list(x ORDER BY pos) AS c FROM cx_$r GROUP BY m, k),
        |cc_$r AS (SELECT m, k, c, list_sum(list_transform(c, x -> x * x)) AS c2 FROM cb_$r)""".stripMargin
    }
    cte += assignCte(rounds + 1, s"cc_$rounds")
    cte.result().mkString(",\n")
  }

  def pqTrainSql(rounds: Int = 2): String = {
    val sums = (1 to 4)
      .map(i => s"CAST(SUM(CAST(vm[$i] AS DECIMAL(18,6))) AS DOUBLE) AS s_$i")
      .mkString(",\n       ")
    s"""WITH ${pqTrainChain(rounds)}
       |SELECT CAST(m AS INT) AS m, CAST(code AS INT) AS code, count(*) AS n,
       |       $sums
       |FROM a_${rounds + 1}
       |GROUP BY 1, 2 ORDER BY m, code""".stripMargin
  }

  /** The TRAINED end-to-end IVFPQ serving pipeline under the oracle hash
    * gate: train the residual codebook (unrolled Lloyd), encode the corpus
    * under it, probe, residual-ADC rank, exact-rerank — every stage of what
    * [[graft.ann.IvfIndex]] serves from a trained `_PQ_CODEBOOK` manifest,
    * replayed as one cross-engine-exact query. (The spec pins the INDEX
    * round-trip; this pins the MATH end-to-end against DuckDB.)
    */
  def ivfRadcTrainedTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2,
      rerank: Int = AdcRerank, rounds: Int = 2): DataFrame =
    ivfRadcTopK(spark, sfDir, nQueries, k, nprobe, rerank,
      cb = pqTrainCodebooks(spark, sfDir, rounds, onResiduals = true))

  def ivfRadcTrainedTopKSql(
      nQueries: Int = 10, k: Int = 3, nprobe: Int = 2,
      rerank: Int = AdcRerank, rounds: Int = 2): String =
    s"""WITH ${pqTrainChain(rounds)},
       |codedT AS (SELECT vec_id, m, code FROM a_${rounds + 1}),
       |${radcServeCtes(nQueries, k, nprobe, rerank,
      cbRel = s"cc_$rounds", codedRel = "codedT")}
       |SELECT qid, rank, cid FROM radc_topk ORDER BY qid, rank""".stripMargin

  /** Recall@k of the IVF (nprobe=1) search against the exact brute-force
    * baseline — the measurement every ANN deployment runs before trusting an
    * approximate index. Per query id: hits = |IVF top-k ∩ exact top-k|,
    * integer-exact in both engines (rank lists are deterministic), so the
    * oracle pins the recall ledger bit-for-bit. The join is per-(qid, cid)
    * over two k-row-per-query relations — negligible at any scale next to
    * the searches themselves.
    */
  def ivfRecall(spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = annTopK(spark, sfDir, nQueries, k).select(col("qid"), col("cid"))
    val approx = ivfTopK(spark, sfDir, nQueries, k)
      .select(col("qid").as("aqid"), col("cid").as("acid"))
    exact
      .join(approx, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .groupBy("qid")
      .agg(
        count(lit(1)).as("k_exact"),
        count(col("acid")).as("hits"))
      .orderBy("qid")
  }

  def ivfRecallSql(nQueries: Int = 10, k: Int = 3): String =
    s"""WITH $assignCtes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |               / (sqrt(q.nn) * sqrt(c.nn)) DESC, c.vec_id) AS rank
       |    FROM normed q JOIN normed c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k),
       |approx AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |               / (sqrt(q.nn) * sqrt(c.nn)) DESC, c.vec_id) AS rank
       |    FROM normed q JOIN normed c
       |      ON q.centroid_id = c.centroid_id AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k)
       |SELECT e.qid AS qid, count(*) AS k_exact, count(a.cid) AS hits
       |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
       |GROUP BY 1 ORDER BY e.qid""".stripMargin

  /** The recall/cost OPERATING CURVE of the IVF index: aggregate recall@k at
    * nprobe ∈ [[RecallSweepProbes]], one row per operating point — the table
    * an ANN deployment reads to pick its probe budget. Monotone by
    * construction (probing more cells only widens the candidate superset —
    * the SimilaritySpec invariant, here made a visible artifact). Cost shape:
    * the exact brute-force baseline is computed once per point over the SAME
    * bounded query set; at corpus scale the sweep is run on a sampled query
    * log, so every branch stays probe-bounded.
    */
  val RecallSweepProbes: Seq[Int] = Seq(1, 2, 4)

  def ivfRecallSweep(
      spark: SparkSession, sfDir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    // the exact baseline does not depend on nprobe — materialize it ONCE
    // (localCheckpoint, the kmeansIter discipline) instead of paying the
    // brute-force top-k per operating point
    val exact = annTopK(spark, sfDir, nQueries, k)
      .select(col("qid"), col("cid")).localCheckpoint()
    RecallSweepProbes.map { np =>
      val approx = ivfTopKMultiProbe(spark, sfDir, nQueries, k, nprobe = np)
        .select(col("qid").as("aqid"), col("cid").as("acid"))
      exact
        .join(approx, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
        .agg(count(lit(1)).as("k_exact_total"), count(col("acid")).as("hits_total"))
        .select(lit(np).as("nprobe"), col("k_exact_total"), col("hits_total"))
    }.reduce(_ union _).orderBy("nprobe")
  }

  /** One shared probe ranking (computed to max nprobe) serves every branch:
    * branch n keeps pairs whose probe rank ≤ n and re-ranks within it.
    */
  def ivfRecallSweepSql(nQueries: Int = 10, k: Int = 3): String = {
    val maxP = RecallSweepProbes.max
    val branches = RecallSweepProbes.map { np =>
      s"""SELECT $np AS nprobe, count(*) AS k_exact_total, count(a.cid) AS hits_total
         |FROM exact e LEFT JOIN (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
         |    FROM pairs WHERE prn <= $np)
         |  WHERE rank <= $k) a
         |ON e.qid = a.qid AND e.cid = a.cid""".stripMargin
    }
    s"""WITH $assignCtes,
       |normed AS (
       |  SELECT vec_id, v, centroid_id,
       |         list_sum(list_transform(v, x -> x * x)) AS nn
       |  FROM assigned),
       |probes AS (
       |  SELECT vec_id AS qid, k AS probe, prn FROM (
       |    SELECT vec_id, k,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS prn
       |    FROM dists WHERE vec_id < $nQueries)
       |  WHERE prn <= $maxP),
       |pairs AS (
       |  SELECT p.qid, c.vec_id AS cid, p.prn,
       |         list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |           / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |  FROM probes p
       |  JOIN normed q ON q.vec_id = p.qid
       |  JOIN normed c ON c.centroid_id = p.probe AND c.vec_id <> q.vec_id),
       |exact AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |               / (sqrt(q.nn) * sqrt(c.nn)) DESC, c.vec_id) AS rank
       |    FROM normed q JOIN normed c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k)
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY nprobe""".stripMargin
  }

  // -------------------------------------------------------------------------
  // Hybrid retrieval: reciprocal-rank fusion of a term ranker and a vector
  // ranker
  // -------------------------------------------------------------------------

  /** RRF constant (Cormack, Clarke & Büttcher, "Reciprocal Rank Fusion
    * outperforms Condorcet and individual rank learning methods", SIGIR '09
    * use k=60).
    */
  val RrfK = 60

  /** Per-ranker candidate pool depth. */
  val RrfPoolK = 50

  /** Hybrid search over the aligned corpora (doc_id ≡ vec_id): the term-match
    * ranker's top-[[RrfPoolK]] and the embedding-cosine ranker's
    * top-[[RrfPoolK]] (query = vector 0) fused by reciprocal-rank fusion,
    * `score = Σ 1/(60 + rank)`, emitted ppm-scaled so both engines agree
    * bit-for-bit. Scale shape: each ranker ends in a TakeOrdered (top-k
    * without a global sort); the fusion full-outer-joins two K-row frames —
    * constant-sized at any corpus scale. The single query vector broadcasts
    * (bounded, like q_ann_topk's fixed query set).
    */
  def hybridRrf(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import graft.text.TextOps
    // term ranker: THE engine's term ranker (one definition — q_term_match_rank
    // and the fused ranking can never drift), row-numbered within the pool
    val tPool = TextOps.termMatchRank(spark, sfDir, RrfPoolK)
      .withColumn("t_rank", row_number().over(
        Window.orderBy(desc("n_matched"), desc("total_tf"), asc("doc_id"))))
      .select(col("doc_id").as("tid"), col("t_rank"))
    // vector ranker: cosine to the fixed query vector (vec_id 0)
    val e = Tables.embeddings(spark, sfDir)
    val q = withNorm(e.filter(col("vec_id") === 0), "qid", "qv", "qn")
    val c = withNorm(e.filter(col("vec_id") =!= 0), "cid", "cv", "cn")
    val vPool = c
      .join(broadcast(q))
      .withColumn("cos", dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
      .orderBy(desc("cos"), asc("cid"))
      .limit(RrfPoolK)
      .withColumn("v_rank", row_number().over(Window.orderBy(desc("cos"), asc("cid"))))
      .select(col("cid").as("vid"), col("v_rank"))
    tPool
      .join(vPool, col("tid") === col("vid"), "full_outer")
      .select(
        coalesce(col("tid"), col("vid")).as("id"),
        (coalesce(expr(s"1000000 div ($RrfK + t_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + v_rank)"), lit(0L))).as("rrf_ppm"))
      .orderBy(desc("rrf_ppm"), asc("id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(desc("rrf_ppm"), asc("id"))))
      .select(col("rank"), col("id"), col("rrf_ppm"))
  }

  def hybridRrfSql(k: Int = 20): String = {
    val inList = graft.text.TextOps.QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tpool AS (
       |  SELECT doc_id AS tid,
       |         CAST(row_number() OVER (ORDER BY n_matched DESC, total_tf DESC, doc_id)
       |              AS INT) AS t_rank
       |  FROM (
       |    SELECT doc_id, count(DISTINCT t) AS n_matched, count(*) AS total_tf
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       |    WHERE t IN ($inList)
       |    GROUP BY doc_id
       |    ORDER BY n_matched DESC, total_tf DESC, doc_id
       |    LIMIT $RrfPoolK)),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS nn FROM e),
       |vpool AS (
       |  SELECT cid AS vid,
       |         CAST(row_number() OVER (ORDER BY cos DESC, cid) AS INT) AS v_rank
       |  FROM (
       |    SELECT c.vec_id AS cid,
       |           list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
       |             / (sqrt(q.nn) * sqrt(c.nn)) AS cos
       |    FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id <> 0
       |    ORDER BY cos DESC, cid
       |    LIMIT $RrfPoolK))
       |SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, id) AS INT) AS rank,
       |       id, rrf_ppm
       |FROM (
       |  SELECT coalesce(tid, vid) AS id,
       |         CAST(coalesce(1000000 // ($RrfK + t_rank), 0) +
       |              coalesce(1000000 // ($RrfK + v_rank), 0) AS BIGINT) AS rrf_ppm
       |  FROM tpool FULL OUTER JOIN vpool ON tid = vid
       |  ORDER BY rrf_ppm DESC, id
       |  LIMIT $k)
       |ORDER BY rank""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rrf" -> (hybridRrf(_, _)),
    "q_ivf_recall" -> (ivfRecall(_, _)),
    "q_ivf_buckets" -> (ivfBuckets(_, _)),
    "q_ivf_topk" -> (ivfTopK(_, _)),
    "q_ivf_probe2" -> (ivfTopKMultiProbe(_, _)),
    "q_pq_codes" -> (pqCodes(_, _)),
    "q_pq_adc_topk" -> (pqAdcTopK(_, _)),
    "q_ivf_adc_topk" -> (ivfAdcTopK(_, _)),
    "q_ivf_adc_recall" -> (ivfAdcRecall(_, _)),
    "q_ivf_radc_topk" -> ((s, d) => ivfRadcTopK(s, d)),
    "q_ivf_radc_recall" -> (ivfRadcRecall(_, _)),
    "q_ivf_recall_sweep" -> (ivfRecallSweep(_, _)),
    "q_pq_train" -> ((s, d) => pqTrain(s, d)),
    "q_ivf_radc_trained_topk" -> ((s, d) => ivfRadcTrainedTopK(s, d)),
    "q_kmeans_step" -> (kmeansStep(_, _)),
    "q_kmeans_iter" -> (kmeansIter(_, _)),
    "q_cluster_balanced_sample" -> (clusterBalancedSample(_, _)),
    "q_semdedup" -> (semDedup(_, _)),
    "q_knn_graph" -> (knnGraph(_, _)),
    "q_knn_graph_hotslice" -> (knnGraphHotSlice(_, _)),
    "q_semdedup_hotslice" -> (semDedupHotSlice(_, _)),
    "q_knn_clamp_ledger" -> (knnClampLedger(_, _)),
    "q_embed_outliers" -> (embedOutliers(_, _)),
    "q_quantize_sq8" -> (quantizeSq8(_, _)),
    "q_label_stats" -> (labelStats(_, _)),
    "q_ann_topk" -> (annTopK(_, _)),
    "q_knn_1nn" -> (knn1(_, _)),
    "q_cosine_pairs" -> (cosinePairs(_, _)),
    "q_lsh_buckets" -> (lshBuckets(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfSql(),
    "q_ivf_recall" -> ivfRecallSql(),
    "q_ivf_buckets" -> ivfBucketsSql,
    "q_ivf_topk" -> ivfTopKSql(),
    "q_ivf_probe2" -> ivfTopKMultiProbeSql(),
    "q_pq_codes" -> pqCodesSql,
    "q_pq_adc_topk" -> pqAdcTopKSql(),
    "q_ivf_adc_topk" -> ivfAdcTopKSql(),
    "q_ivf_adc_recall" -> ivfAdcRecallSql(),
    "q_ivf_radc_topk" -> ivfRadcTopKSql(),
    "q_ivf_radc_recall" -> ivfRadcRecallSql(),
    "q_ivf_recall_sweep" -> ivfRecallSweepSql(),
    "q_pq_train" -> pqTrainSql(),
    "q_ivf_radc_trained_topk" -> ivfRadcTrainedTopKSql(),
    "q_kmeans_step" -> kmeansStepSql,
    "q_kmeans_iter" -> kmeansIterSql(),
    "q_cluster_balanced_sample" -> clusterBalancedSampleSql,
    "q_semdedup" -> semDedupSql(),
    "q_knn_graph" -> knnGraphSql(),
    "q_knn_graph_hotslice" -> knnGraphHotSliceSql(),
    "q_semdedup_hotslice" -> semDedupHotSliceSql(),
    "q_knn_clamp_ledger" -> knnClampLedgerSql,
    "q_embed_outliers" -> embedOutliersSql(),
    "q_quantize_sq8" -> quantizeSq8Sql,
    "q_label_stats" -> labelStatsSql,
    "q_ann_topk" -> annTopKSql(),
    "q_knn_1nn" -> knn1Sql,
    "q_cosine_pairs" -> cosinePairsSql(),
    "q_lsh_buckets" -> lshBucketsSql
  )
}
