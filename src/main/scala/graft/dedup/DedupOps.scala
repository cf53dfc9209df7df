package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for the training-data pipeline: exact (hash
  * groupBy), shingle-based n-gram Jaccard, MinHash+LSH banding and SimHash.
  *
  * Scale posture: nothing here is O(n²) over the corpus — candidate pairs come
  * from equi-joins on shingles / LSH band keys, which Spark executes as
  * shuffled hash joins keyed by the band value. All hashes derive from md5 (a
  * fixed, engine-independent function) so the DuckDB oracle reproduces every
  * signature bit-for-bit.
  */
object DedupOps {

  val ShingleK = 5
  val P: Long = 2147483647L // 2^31 - 1, Mersenne prime for the minhash perms
  val NumPerms = 16
  val BandSize = 4 // 4 bands × 4 rows

  /** Deterministic (a, b) coefficients for the k minhash permutations —
    * embedded as literals in both the Spark plan and the oracle SQL.
    */
  val Perms: Seq[(Long, Long)] = (0 until NumPerms).map { i =>
    val a = ((2L * i + 1L) * 2654435761L) % P
    val b = (i * 40503L * 2654435789L + 1L) % P
    (a, b)
  }

  private def toks(c: Column): Column = split(c, " ")

  /** Distinct k-token shingles from a *materialized* token-array column.
    * Callers must project the split() into its own column first — passing
    * `split(text)` directly here would re-tokenize once per shingle position
    * inside the `slice` lambda.
    */
  def shinglesFromToks(tokens: Column, k: Int = ShingleK): Column =
    array_distinct(
      transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(k)))))

  /** Documents with ≥ k tokens, tokens materialized: (doc_id, toks).
    * Fanned out on doc_id when the scan cannot fill the cores (r16,
    * size-gated — see [[graft.Tables.deriveFanOut]]): the hash-on-doc_id
    * exchange doubles as the distribution for the per-doc aggregate every
    * consumer ends in, so no second shuffle appears (the simhash precedent).
    */
  private def tokenized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.deriveFanOut(spark, sfDir, "documents",
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        Seq(col("doc_id")))
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleK)

  /** DuckDB twin of [[shingles]] given a `text` column reference. */
  def shinglesSql(text: String): String =
    s"list_distinct(list_transform(generate_series(1, len(string_split($text, ' ')) - ${ShingleK - 1}), " +
      s"i -> array_to_string(string_split($text, ' ')[i:i+${ShingleK - 1}], ' ')))"

  /** 48-bit md5-derived shingle hash reduced mod P — engine-independent. */
  private def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long") % P

  private val shingleHashSql: String =
    s"CAST('0x' || substr(md5(s), 1, 12) AS BIGINT) % $P"

  // -------------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------------

  /** Exact dedup: group by content hash, keep the min doc_id as canonical. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
      .orderBy("keep_id")

  val exactDedupSql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  // -------------------------------------------------------------------------
  // N-gram Jaccard near-dup (exact, shingle-join candidate generation)
  // -------------------------------------------------------------------------

  /** Document-frequency cap for the RAW-corpus shingle/window joins
    * ([[ngramJaccardPairs]], [[substrDupPairs]] and everything built on them).
    * A shingle shared by d documents costs d²/2 candidate rows in the
    * self-join, so an uncapped hot shingle (one web-wide copyright line) is a
    * quadratic hot key at 100 TB; dropping keys with df > cap bounds every
    * join key's fanout at cap². The cap must exceed the largest REAL duplicate
    * group the pass is meant to find — exact-dup group size + near-dup
    * cluster size, since these operators run on the raw (not exact-deduped)
    * corpus: a cluster of k copies carries its shingles at df ≈ k, and a cap
    * below k hides the whole cluster (see [[HotShingleCap]]'s margin note).
    * TESTDATA's planted groups top out at df = 4 across all SFs, so 8 leaves
    * 2× headroom and filters nothing at test scale (results are identical to
    * the uncapped form there — pinned by the oracle, which applies the same
    * cap); production corpora set this orders of magnitude higher (10³–10⁴),
    * still negligible next to corpus size.
    */
  val RawDfCap = 8

  /** Near-duplicate pairs by exact Jaccard over 5-gram shingles, candidates
    * generated by the shingle equi-join (no all-pairs comparison). At 100 TB
    * the join key (shingle) is high-cardinality so the shuffle distributes
    * evenly; hot boilerplate shingles (df > [[RawDfCap]]) are dropped from
    * every document's set before the join AND the similarity — the same
    * capped-vocabulary discipline as [[jaccardCappedPairs]], at the raw-corpus
    * margin.
    */
  /** Shingle relation with the df cap applied and the per-doc CAPPED set size
    * attached. Occurrences are compressed to (doc_id, s, c) FIRST — a doc's
    * shingles sit in one input partition, so within-doc repeats collapse in
    * the map-side partial agg — then df is a two-stage grouped sum joined
    * back on s. Never `count().over(Window.partitionBy(s))`: the window form
    * routes EVERY posting of a hot key into ONE task and sorts them there
    * before the cap can drop them, so a boilerplate shingle present in 30%
    * of the corpus serializes 30% of the exploded data through a single
    * straggler task at 100 TB (a window partition can never split; VERDICT
    * r4 #1). The grouped sum partial-aggregates map-side (one bounded scalar
    * per key per partition — never a per-shingle id list), hot keys vanish
    * at the join (the df side is pre-filtered to df ≤ cap), and the join
    * itself is AQE skew-splittable while the hot postings drain. The
    * self-join sides downstream remain identical subplans, so their
    * shuffles still dedup via ReuseExchange — same discipline as
    * [[graft.text.CurationOps.sharedShingles]], measured 28% faster under a
    * planted 30%-hot shingle. Multiplicities ride along as `c`, keeping the
    * occurrence-level semantics (df, n_shingles, downstream intersection
    * counts) bit-identical to the uncompressed form.
    *
    * Negative result (r7, measured): replacing this inner join with a
    * broadcast ANTI-join against the over-cap key set — so hot postings drop
    * map-side and never shuffle — is 20-40% SLOWER end-to-end under the
    * planted 30%-hot 10× probe (substr_dup 15.2→18.3 s, ngram_jaccard
    * 14.1→20.4 s). The anti output no longer shares an exchange with the df
    * aggregation, so the explode — the engine's largest intermediate — is
    * computed twice, which outweighs skipping the ~3%-of-volume hot
    * postings. Same ReuseExchange lesson as the r2-era hash-agg rework:
    * keep every consumer on the ONE s-partitioned exchange.
    */
  private[dedup] def shinglesWithSize(spark: SparkSession, sfDir: String, cap: Int): DataFrame =
    // size-gated fan-out (r16, guide §2.5/§6): the tokenize→shingle explode
    // below otherwise runs in the scan's task count — ONE task on a small
    // single-row-group file. Round-robin (no key): every downstream exchange
    // — (doc_id, s) compression, df join, self-join — keeps its measured
    // shape, the fan-out only parallelizes the explode stage feeding it.
    shinglesWithSizeOf(Tables.documentsDerive(spark, sfDir), cap,
      key = if (shingleHashKeyOn(spark)) Some(xxhash64(_)) else None)

  /** Shuffle-key narrowing for the LIVE shingle family (guide §2.3): when on,
    * every exchange/aggregation of the live pair queries keys on
    * `xxhash64(shingle)` (8 bytes) instead of the ~30-byte 5-gram string —
    * the shingle only ever serves as a grouping/join key, never an output
    * column. Results are identical up to a 64-bit hash collision
    * (~n²/2⁶⁵ — the same accepted trade as the substr family's truncated-md5
    * window keys and the minhash chain's 48-bit shingle hash; the oracle,
    * which keeps the string form, pins equality at every test SF). The
    * STORED posting index keeps string keys: its `_overcap` set and probe
    * path match batch shingles textually across generations.
    */
  private[graft] def shingleHashKeyOn(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.shingle.hashkey", "true").toBoolean

  /** [[shinglesWithSize]] over an arbitrary (doc_id, text) relation — the
    * form [[ShingleIndex]] builds stores from (possibly a corpus subset:
    * the admission-probe fixture's "corpus before the batch arrived").
    */
  private[dedup] def shinglesWithSizeOf(
      docs: DataFrame, cap: Int, key: Option[Column => Column] = None): DataFrame = {
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val perDoc = shingleOccurrencesOf(docs, key)
    val dfRel = perDoc.groupBy("s").agg(sum("c").as("df")).filter(col("df") <= cap)
    perDoc.join(dfRel, "s")
      .withColumn("n_shingles", sum("c").over(wDoc))
  }

  /** Per-(doc, shingle) occurrence groups of a (doc_id, text) relation —
    * compressed map-side (see [[shinglesWithSize]]'s discipline note).
    * `key`, when given, transforms the shingle BEFORE the first exchange
    * (the (doc_id, s) compression), so a narrowing key (see
    * [[shingleHashKeyOn]]) shrinks every downstream shuffle byte; `None`
    * keeps the string — the stored-index contract, plan-identical to the
    * pre-r16 form.
    */
  private[dedup] def shingleOccurrencesOf(
      docs: DataFrame, key: Option[Column => Column] = None): DataFrame = {
    val toked = docs.select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleK)
    val occ = key match {
      case Some(k) =>
        toked.select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s0"))
          .select(col("doc_id"), k(col("s0")).as("s"))
      case None =>
        toked.select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s"))
    }
    occ.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
  }

  /** Pair-candidate statistics `(id_a < id_b, inter, n_a, n_b)` from a capped
    * shingle relation `(s, doc_id, c, n_shingles)`. Two plan shapes, chosen
    * by `spark.graft.shingle.postings` (plan-time, default on):
    *
    *   - '''postings''' (r16, guide §2.4): group the relation into
    *     per-shingle posting arrays — bounded at `cap` entries by the df
    *     filter already applied — and expand ordered pairs IN-ROW, exactly
    *     the [[ShingleIndex.allPairs]] serving shape, storeless. The shingle
    *     relation crosses ONE exchange (the groupBy(s), reusing the df
    *     join's s-distribution) and is read once; the self-join's second
    *     read, both SMJ sorts, and the join operator vanish. The in-row
    *     expansion is ≤ cap² bounded struct emissions per shingle — the same
    *     bound the join's per-key fanout had.
    *   - '''self-join''' (the pre-r16 form, kept as the A/B off-arm): the
    *     aliased equi-join on s; sides are identical subplans so their
    *     exchange dedups via ReuseExchange, but each SMJ side still sorts.
    *
    * Both shapes aggregate the identical multiset of (a-posting, b-posting)
    * matches — the occurrence-pair count Σ c_a·c_b and first(n) per side —
    * so rows are bit-identical (one oracle gates all callers).
    */
  private def pairStats(docs: DataFrame): DataFrame =
    if (docs.sparkSession.conf.get("spark.graft.shingle.postings", "true").toBoolean) {
      val pairsOf = flatten(transform(
        col("postings"),
        a => transform(
          filter(col("postings"), b => a.getField("doc_id") < b.getField("doc_id")),
          b => struct(a.as("a"), b.as("b")))))
      docs
        .groupBy("s")
        .agg(collect_list(struct(col("doc_id"), col("c"), col("n_shingles"))).as("postings"))
        .select(explode(pairsOf).as("p"))
        .select(
          col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"),
          (col("p.a.c") * col("p.b.c")).as("cc"),
          col("p.a.n_shingles").as("na"), col("p.b.n_shingles").as("nb"))
        .groupBy("id_a", "id_b")
        .agg(sum(col("cc")).as("inter"),
          first(col("na")).as("n_a"), first(col("nb")).as("n_b"))
    } else {
      val a = docs.as("a")
      val b = docs.as("b")
      a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(
          // occurrence-pair count over the compressed relation: each side
          // carries its within-doc multiplicity, so Σ c_a·c_b equals the
          // uncompressed join's count(*) exactly
          sum(col("a.c") * col("b.c")).as("inter"),
          first(col("a.n_shingles")).as("n_a"),
          first(col("b.n_shingles")).as("n_b"))
    }

  def ngramJaccardPairs(
      spark: SparkSession,
      sfDir: String,
      threshold: Double = 0.6,
      cap: Int = RawDfCap): DataFrame =
    pairStats(shinglesWithSize(spark, sfDir, cap))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** Shared oracle CTEs up to the candidate intersection: exploded capped
    * shingles, per-doc sizes, and `inter(id_a, id_b, inter)` — reused by the
    * Jaccard family and the containment query.
    */
  private def candidateCtes(cap: Int): String =
    s"""sh0 AS (
       |  SELECT doc_id, unnest(${shinglesSql("text")}) AS s
       |  FROM documents WHERE len(string_split(text, ' ')) >= $ShingleK),
       |sh AS (
       |  SELECT doc_id, s FROM sh0
       |  QUALIFY count(*) OVER (PARTITION BY s) <= $cap),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** [[candidateCtes]] plus the above-threshold pair relation `pairs(id_a,
    * id_b, inter, n_a, n_b, jaccard)` — reused by the pair query and the
    * cluster closure.
    */
  private[graft] def jaccardCtes(threshold: Double, cap: Int = RawDfCap): String =
    s"""${candidateCtes(cap)},
       |pairs AS (
       |  SELECT id_a, id_b, inter, na.n_shingles AS n_a, nb.n_shingles AS n_b,
       |         inter / (na.n_shingles + nb.n_shingles - inter) AS jaccard
       |  FROM inter
       |  JOIN sizes na ON inter.id_a = na.doc_id
       |  JOIN sizes nb ON inter.id_b = nb.doc_id
       |  WHERE inter / (na.n_shingles + nb.n_shingles - inter) >= $threshold)""".stripMargin

  def ngramJaccardPairsSql(threshold: Double = 0.6): String =
    s"""WITH ${jaccardCtes(threshold)}
       |SELECT id_a, id_b, inter, n_a, n_b, jaccard
       |FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  /** EXACT incremental near-dup pairs: only pairs with at least one
    * endpoint in the batch (`batchPred` over doc_id), every statistic
    * identical to the full [[ngramJaccardPairs]] — the pair-generation step
    * a [[PairStore.appendPairs]] absorb consumes. Join work scales with the
    * BATCH's postings (the corpus side is the probe target), so absorbing a
    * 1% batch costs ~1% of the one-shot pair join; the union of every
    * batch's incremental pairs IS the full pair set, so
    * [[PairStore.refreshLabels]] over absorbed segments reaches the same
    * CC fixpoint as a one-shot build — incremental dedup without
    * approximation (where the LSH-probe path trades recall for speed, this
    * trades nothing). Corpus-side shingles are recomputed here (one corpus
    * scan per absorb); at 100 TB that side is the stored [[LshIndex]]-style
    * relation, not a rescan — the join shape is unchanged.
    *
    * Orientation: batch-internal pairs keep `a < b`; batch-vs-rest pairs
    * join in one direction (batch side as `a`) and re-orient afterwards, so
    * every unordered pair appears exactly once.
    */
  def ngramJaccardPairsIncremental(
      spark: SparkSession,
      sfDir: String,
      batchPred: Column => Column,
      threshold: Double = 0.6,
      cap: Int = RawDfCap): DataFrame = {
    val docs = shinglesWithSize(spark, sfDir, cap)
    val stats =
      if (spark.conf.get("spark.graft.shingle.postings", "true").toBoolean) {
        // postings shape (r16 — see [[pairStats]]): ONE derivation serves
        // both sides of the incremental join — the batch filter runs inside
        // the bounded posting array (the [[ShingleIndex.incrementalPairs]]
        // lambda, storeless), where the self-join form paid the whole
        // tokenize→shingle→df pipeline TWICE because the batch filter on
        // side a broke subtree identity with side b (and materializing the
        // shared relation was measured slower at sf0.1 — r15 negative
        // result, superseded by this shape rather than retried).
        val pairsOf = flatten(transform(
          filter(col("postings"), a => batchPred(a.getField("doc_id"))),
          a => transform(
            filter(col("postings"), b =>
              a.getField("doc_id") < b.getField("doc_id") ||
                (b.getField("doc_id") < a.getField("doc_id") &&
                  !batchPred(b.getField("doc_id")))),
            b => struct(a.as("a"), b.as("b")))))
        docs
          .groupBy("s")
          .agg(collect_list(struct(col("doc_id"), col("c"), col("n_shingles"))).as("postings"))
          .select(explode(pairsOf).as("p"))
          .select(
            col("p.a.doc_id").as("x"), col("p.b.doc_id").as("y"),
            (col("p.a.c") * col("p.b.c")).as("cc"),
            col("p.a.n_shingles").as("nx"), col("p.b.n_shingles").as("ny"))
          .groupBy("x", "y")
          .agg(sum(col("cc")).as("inter"),
            first(col("nx")).as("n_x"), first(col("ny")).as("n_y"))
      } else {
        val a = docs.filter(batchPred(col("doc_id"))).as("a")
        val b = docs.as("b")
        a.join(b, col("a.s") === col("b.s") &&
            (col("a.doc_id") < col("b.doc_id") || !batchPred(col("b.doc_id"))))
          .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
          .agg(
            sum(col("a.c") * col("b.c")).as("inter"),
            first(col("a.n_shingles")).as("n_x"),
            first(col("b.n_shingles")).as("n_y"))
      }
    stats
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

  /** Catalog form: the batch is every fifth document. */
  def qJaccardIncremental(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccardPairsIncremental(spark, sfDir, _ % 5 === 0)

  /** Oracle: the full pair set restricted to batch-touching pairs — an
    * independent derivation (no incremental join) of the identical rows.
    */
  def jaccardIncrementalSql(threshold: Double = 0.6): String =
    s"""WITH ${jaccardCtes(threshold)}
       |SELECT id_a, id_b, inter, n_a, n_b, jaccard
       |FROM pairs
       |WHERE id_a % 5 = 0 OR id_b % 5 = 0
       |ORDER BY id_a, id_b""".stripMargin

  /** Directional near-dup pairs by shingle CONTAINMENT (Broder 1997's
    * asymmetric companion to resemblance): `inter/|A|` reads "how much of A
    * sits inside B", which Jaccard structurally cannot flag — a short page
    * fully quoted inside a long aggregator page has containment 1.0 but a
    * tiny Jaccard, so symmetric dedup keeps both and the training set learns
    * the quote twice. Both directions are emitted per pair; the filter keeps
    * pairs where either side is mostly contained in the other. Same
    * df-capped shingle equi-join as [[ngramJaccardPairs]] — candidates from
    * a high-cardinality key join, hot boilerplate capped, no all-pairs — and
    * `shinglesFromToks` is distinct per doc, so the multiplicity-weighted
    * intersection IS the set intersection.
    */
  def containmentPairs(
      spark: SparkSession,
      sfDir: String,
      threshold: Double = 0.8,
      cap: Int = RawDfCap): DataFrame =
    pairStats(shinglesWithSize(spark, sfDir, cap))
      .withColumn("cont_a", col("inter") / col("n_a"))
      .withColumn("cont_b", col("inter") / col("n_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "cont_a", "cont_b")
      .orderBy("id_a", "id_b")

  def containmentPairsSql(threshold: Double = 0.8, cap: Int = RawDfCap): String =
    s"""WITH ${candidateCtes(cap)}
       |SELECT id_a, id_b, inter, na.n_shingles AS n_a, nb.n_shingles AS n_b,
       |       inter / na.n_shingles AS cont_a, inter / nb.n_shingles AS cont_b
       |FROM inter
       |JOIN sizes na ON inter.id_a = na.doc_id
       |JOIN sizes nb ON inter.id_b = nb.doc_id
       |WHERE greatest(inter / na.n_shingles, inter / nb.n_shingles) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Exact edit-distance verification over the candidate pairs — the
    * expensive O(len²) Levenshtein runs ONLY on pairs the shingle join
    * already surfaced (the candidate-generate-then-verify-exact discipline
    * every fuzzy-dedup pipeline uses; running it all-pairs would be Ω(n²)
    * string DP at corpus scale). Output carries the absolute distance and a
    * length-normalized ratio, the thresholds dedup policies are written in.
    */
  def editDistancePairs(
      spark: SparkSession, sfDir: String, threshold: Double = 0.6): DataFrame = {
    val texts = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    ngramJaccardPairs(spark, sfDir, threshold)
      .select("id_a", "id_b")
      .join(texts.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      // one levenshtein projection; rel_dist derives from the materialized
      // column instead of restating the O(len²) expression (r16 VERDICT #4 —
      // don't lean on codegen subexpression elimination for the most
      // expensive expression in the dedup family)
      .select(
        col("id_a"),
        col("id_b"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        greatest(length(col("text_a")), length(col("text_b"))).as("max_len"))
      .select(
        col("id_a"),
        col("id_b"),
        col("edit_dist"),
        (col("edit_dist").cast("double") / col("max_len").cast("double"))
          .as("rel_dist"))
      .orderBy("id_a", "id_b")
  }

  def editDistancePairsSql(threshold: Double = 0.6): String =
    s"""WITH ${jaccardCtes(threshold)}
       |SELECT id_a, id_b,
       |       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist,
       |       CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |         / greatest(length(a.text), length(b.text)) AS rel_dist
       |FROM pairs
       |JOIN documents a ON pairs.id_a = a.doc_id
       |JOIN documents b ON pairs.id_b = b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------------
  // Near-dup cluster canonicalization (connected components over pair edges)
  // -------------------------------------------------------------------------

  /** Connected components over the near-dup pair graph, emitted as a cluster
    * ledger: (cluster_id = min doc_id in the component, n_members, md5 of the
    * sorted member list). Pair detection finds EDGES; deduplication needs the
    * transitive CLUSTERS (doc A ~ B ~ C must collapse to one representative
    * even if A ≁ C directly).
    *
    * Spark side: min-label propagation — lbl(v) ← min(lbl(v), min lbl over
    * neighbors), iterated to fixpoint. Each round is one shuffled join + one
    * grouped min (all distributed; the driver sees only the converged-yet?
    * count), and the round count is the cluster diameter, not the corpus
    * size — near-dup clusters are shallow (pairwise-similar variants of one
    * base), so this is O(few) rounds at any corpus scale, the standard
    * map-reduce CC recipe (Hash-to-Min, Rastogi et al., ICDE '13).
    * `localCheckpoint` truncates each round's lineage so the plan doesn't
    * grow exponentially across iterations.
    *
    * Oracle side: small graphs afford the closure form — a recursive CTE
    * walks reachability and takes min(reachable id) per doc. Both forms
    * compute the same fixpoint; only the Spark one scales.
    */
  /** Min-label propagation over the near-dup pair graph: (doc_id, lbl) for
    * every doc that appears in at least one pair, lbl = the smallest doc id
    * reachable through the pair graph (= connected-component id).
    */
  private[graft] def nearDupLabels(
      spark: SparkSession, sfDir: String, threshold: Double = 0.6): DataFrame =
    labelPropagation(spark, ngramJaccardPairs(spark, sfDir, threshold))

  /** The propagation fixpoint over an arbitrary (id_a, id_b) edge relation —
    * [[nearDupLabels]] decoupled from its pair generator so the durable
    * [[PairStore]] can run it over stored pair segments.
    */
  private[graft] def labelPropagation(spark: SparkSession, edges0: DataFrame): DataFrame = {
    val edges = edges0
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val sym = edges.union(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val members = sym.select(col("id_a").as("doc_id")).distinct()
    var labels = members.select(col("doc_id"), col("doc_id").as("lbl")).localCheckpoint()
    val maxRounds = 20 // diameter bound; fixpoint reached far earlier
    var round = 0
    var converged = false
    // Convergence detection rides the propagation pass itself: each round's
    // aggregate carries the previous label alongside the new min (every doc
    // has exactly one self row, so max(old) recovers it), and a tiny
    // mapPartitions counts label changes into an accumulator WHILE the eager
    // localCheckpoint materializes the round — one distributed job per round
    // instead of two (the former separate isEmpty job re-joined old vs new
    // labels). Task retries can only overcount the accumulator, and the test
    // is changed == 0, so a retry never fakes convergence.
    val changedAcc = spark.sparkContext.longAccumulator("neardup_label_changes")
    import spark.implicits._
    while (!converged && round < maxRounds) {
      changedAcc.reset()
      val fromNbrs = sym
        .join(labels, sym("id_a") === labels("doc_id"))
        .select(col("id_b").as("doc_id"), col("lbl"), lit(null).cast("long").as("old"))
      val next = labels.select(col("doc_id"), col("lbl"), col("lbl").as("old"))
        .union(fromNbrs)
        .groupBy("doc_id")
        .agg(min("lbl").as("lbl"), max("old").as("old"))
        .as[(Long, Long, Long)]
        .mapPartitions(_.map { case (d, l, o) =>
          if (l != o) changedAcc.add(1L)
          (d, l)
        })
        .toDF("doc_id", "lbl")
        .localCheckpoint()
      converged = changedAcc.value == 0L
      labels = next
      round += 1
    }
    // emitting partially-propagated labels would silently split clusters; a
    // pair graph with diameter > maxRounds must fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"near-dup label propagation did not converge in $maxRounds rounds " +
          "(pair-graph diameter exceeds the bound); raise maxRounds")
    labels
  }

  def nearDupClusters(spark: SparkSession, sfDir: String, threshold: Double = 0.6): DataFrame =
    PairStore.labelsFor(spark, sfDir, threshold)
      .groupBy(col("lbl").as("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        md5(concat_ws(",", sort_array(collect_list(col("doc_id"))))).as("members_fp"))
      .filter(col("n_members") >= 2)
      .orderBy("cluster_id")

  /** The recursive closure that mirrors [[nearDupLabels]]: CTE `labels` =
    * (doc_id, lbl). Callers prepend `WITH RECURSIVE ` and append their
    * SELECT.
    */
  private[graft] def nearDupLabelCtes(threshold: Double): String =
    s"""${jaccardCtes(threshold)},
       |sym AS (
       |  SELECT id_a, id_b FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT DISTINCT id_a, id_a FROM sym
       |  UNION
       |  SELECT r.src, e.id_b FROM reach r JOIN sym e ON r.dst = e.id_a),
       |labels AS (
       |  SELECT src AS doc_id, min(dst) AS lbl FROM reach GROUP BY 1)""".stripMargin

  def nearDupClustersSql(threshold: Double = 0.6): String =
    s"""WITH RECURSIVE ${nearDupLabelCtes(threshold)}
       |SELECT lbl AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       md5(array_to_string(list_sort(list(doc_id)), ',')) AS members_fp
       |FROM labels
       |GROUP BY 1
       |HAVING count(*) >= 2
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------------------
  // Quality-aware cluster canonicalization
  // -------------------------------------------------------------------------

  /** Near-dup cluster representative selection: instead of keeping the
    * member with the smallest id (what plain dedup does implicitly), keep the
    * HIGHEST-QUALITY member of each cluster — the curation-pipeline policy
    * when near-dups differ in boilerplate or truncation. Built from
    * [[nearDupLabels]] plus the shared quality formula
    * ([[graft.text.TextOps.qualityCol]]); the per-cluster argmax is a window
    * row_number partitioned by cluster id (clusters are tiny; no skew), with
    * ties broken to the smaller doc id.
    */
  def clusterBest(spark: SparkSession, sfDir: String, threshold: Double = 0.6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.TextOps.qualityCol(col("text")).as("quality"))
    val w = Window.partitionBy("lbl").orderBy(desc("quality"), asc("doc_id"))
    PairStore.labelsFor(spark, sfDir, threshold)
      .join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("lbl").as("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("doc_id"))).as("rep_doc_id"))
      .filter(col("n_members") >= 2)
      .orderBy("cluster_id")
  }

  def clusterBestSql(threshold: Double = 0.6): String =
    s"""WITH RECURSIVE ${nearDupLabelCtes(threshold)},
       |q AS (
       |  SELECT doc_id,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |           / len(string_split(text, ' ')) * 0.7 +
       |         (1.0 - CAST(len(list_filter(string_split(text, ' '),
       |                                     t -> t = 'the' OR t = 'a')) AS DOUBLE)
       |           / len(string_split(text, ' '))) * 0.3 AS quality
       |  FROM documents),
       |ranked AS (
       |  SELECT l.doc_id, l.lbl,
       |         row_number() OVER (PARTITION BY l.lbl ORDER BY q.quality DESC, l.doc_id) AS rn
       |  FROM labels l JOIN q ON l.doc_id = q.doc_id)
       |SELECT lbl AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id
       |FROM ranked
       |GROUP BY 1
       |HAVING count(*) >= 2
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------------------
  // Bloom-filter pre-dedup (approximate membership against the seen corpus)
  // -------------------------------------------------------------------------

  /** Corpus/new-batch split point for the Bloom pre-dedup. */
  val BloomSplitId = 400L

  /** Approximate-membership pre-dedup (Bloom, 1970), geometry k=3 12-bit
    * positions straight from the md5 hex, m=4096 bits — sized so the filter
    * load (and thus a measurable false-positive count) is non-trivial at
    * bench scale. The seen corpus (doc_id < split) is folded into the
    * filter — here the DISTINCT set of its occupied positions, ≤ 4096 rows
    * however large the corpus, always broadcastable — and each new-batch
    * document is flagged when all
    * three of its positions are occupied. This is the constant-memory
    * pre-filter a 100 TB ingest runs BEFORE exact dedup: no false negatives
    * ever (flagged ⊇ true duplicates — pinned by spec and by the ledger's
    * n_false_neg = 0), false positives bounded by filter load. Output is the
    * confusion ledger against exact content-hash membership.
    */
  def bloomDedup(spark: SparkSession, sfDir: String, split: Long = BloomSplitId): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    def posAt(i: Int) = conv(substring(col("h"), i, 3), 16, 10).cast("int")
    val pos = docs.select(col("doc_id"),
      explode(array(posAt(1), posAt(4), posAt(7))).as("p"))
    val occupied = pos.filter(col("doc_id") < split)
      .select("p").distinct().withColumn("hit", lit(1))
    val seenHashes = docs.filter(col("doc_id") < split)
      .select(col("h").as("ch")).distinct().withColumn("dup", lit(1))
    val flagged = pos.filter(col("doc_id") >= split).distinct()
      .join(broadcast(occupied), Seq("p"), "left")
      .groupBy("doc_id")
      .agg((count(lit(1)) === count(col("hit"))).as("flagged"))
    docs.filter(col("doc_id") >= split)
      .join(broadcast(seenHashes), col("h") === col("ch"), "left")
      .select(col("doc_id"), col("dup").isNotNull.as("is_dup"))
      .join(flagged, "doc_id")
      .agg(
        count(lit(1)).as("n_delta"),
        count(when(col("flagged"), 1)).as("n_flagged"),
        count(when(col("is_dup"), 1)).as("n_true_dup"),
        count(when(col("flagged") && !col("is_dup"), 1)).as("n_false_pos"),
        count(when(!col("flagged") && col("is_dup"), 1)).as("n_false_neg"))
  }

  def bloomDedupSql(split: Long = BloomSplitId): String =
    s"""WITH docs AS (
       |  SELECT doc_id, md5(text) AS h FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest([
       |    CAST('0x' || substr(h, 1, 3) AS INT),
       |    CAST('0x' || substr(h, 4, 3) AS INT),
       |    CAST('0x' || substr(h, 7, 3) AS INT)]) AS p
       |  FROM docs),
       |occupied AS (
       |  SELECT DISTINCT p FROM pos WHERE doc_id < $split),
       |flagged AS (
       |  SELECT dp.doc_id,
       |         count(*) = count(o.p) AS flagged
       |  FROM (SELECT DISTINCT doc_id, p FROM pos WHERE doc_id >= $split) dp
       |  LEFT JOIN occupied o ON dp.p = o.p
       |  GROUP BY 1),
       |truth AS (
       |  SELECT d.doc_id,
       |         s.ch IS NOT NULL AS is_dup
       |  FROM docs d
       |  LEFT JOIN (SELECT DISTINCT h AS ch FROM docs WHERE doc_id < $split) s
       |    ON d.h = s.ch
       |  WHERE d.doc_id >= $split)
       |SELECT count(*) AS n_delta,
       |       count(CASE WHEN f.flagged THEN 1 END) AS n_flagged,
       |       count(CASE WHEN t.is_dup THEN 1 END) AS n_true_dup,
       |       count(CASE WHEN f.flagged AND NOT t.is_dup THEN 1 END) AS n_false_pos,
       |       count(CASE WHEN NOT f.flagged AND t.is_dup THEN 1 END) AS n_false_neg
       |FROM truth t JOIN flagged f ON t.doc_id = f.doc_id""".stripMargin

  // -------------------------------------------------------------------------
  // Hot-shingle-capped Jaccard (the 100 TB form of the shingle join)
  // -------------------------------------------------------------------------

  /** Default df cap. Must exceed the expected near-dup CLUSTER size: the
    * shingles shared by a cluster of k near-identical docs carry df ≈ k, so a
    * cap below k hides the cluster from the candidate join (observed on the
    * planted triple in the sf0.001 fixture at cap=2). Production caps are
    * orders of magnitude above cluster sizes (10³–10⁴); 3 is the same margin
    * scaled to this corpus, and still prunes real boilerplate shingles at
    * sf0.1 (df reaches 4).
    */
  val HotShingleCap = 3

  /** [[ngramJaccardPairs]] with an idf-style document-frequency cap: shingles
    * present in more than `cap` documents are removed from EVERY document's
    * shingle set before candidate generation AND similarity — the CCNet-style
    * capped vocabulary. This is the form that survives 100 TB: a boilerplate
    * shingle shared by d documents costs d² join rows in the uncapped plan
    * (one web-wide copyright line ⇒ a quadratic hot key), while here its
    * bucket is dropped before the self-join, bounding every join key's fanout
    * at cap². Semantics shift from raw Jaccard to Jaccard over the
    * discriminative vocabulary — the trade every production near-dup pipeline
    * makes, and an exactly-specified one (the oracle applies the same cap),
    * not a sampling heuristic. The df computation itself is one linear
    * grouped count reusing the exploded shingle relation.
    *
    * Runs on the exact-deduped corpus (min-doc_id representative per content
    * hash) — the pipeline order every near-dup system uses, and a semantic
    * necessity here: an exact-duplicate cluster of size > cap would push all
    * its shingles over the cap and hide the cluster from the near-dup pass.
    */
  def jaccardCappedPairs(
      spark: SparkSession,
      sfDir: String,
      threshold: Double = 0.6,
      cap: Int = HotShingleCap): DataFrame = {
    // r17: tried and REVERTED (measured) — replacing this canon window
    // (exchange of full text by md5(text) + per-hash sort) with a narrow
    // groupBy(md5(text)).min(doc_id) winner set + left-semi join back
    // (value-identical tie rule). A/B on/off = 1.04 (min-of-5, sf0.1): the
    // winner broadcast build adds a job locally, and at scale the semi join
    // degenerates to an SMJ that exchanges AND sorts the text by doc_id
    // anyway — strictly more work than the window's one exchange + sort.
    // The window form IS the right payload-moves-once shape here.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy("doc_id")
    val canon = Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleK)
    // Same two-stage df discipline as [[shinglesWithSize]]: compress to
    // (doc_id, s, c) map-side, df as a grouped sum joined back (AQE
    // skew-splittable; a hot key's postings never funnel through one window
    // task), n_shingles over doc_id — a key no corpus makes hot (bounded by
    // doc length). The self-join sides stay identical subplans, so their
    // shuffles dedup via ReuseExchange. (The r2-era hash-agg variant that
    // was measured 1.7× slower joined SIZES after pair aggregation without
    // compressing first — the aliased self-join re-ran the scan+explode
    // lineage per consumer; compression is what changes the verdict, per
    // the sharedShingles measurement.)
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    // size-gated fan-out (r16): the canon window's exchange is AQE-coalesced
    // back to ~1 partition at small scale (its payload is the raw text), so
    // the explode below would still run single-task without this.
    val fanned = Tables.deriveFanOut(spark, sfDir, "documents", canon)
    val exploded =
      if (shingleHashKeyOn(spark))
        // key narrowing (guide §2.3, see [[shingleHashKeyOn]]): hash before
        // the first exchange so every shuffle carries 8 bytes, not the string
        fanned.select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s0"))
          .select(col("doc_id"), xxhash64(col("s0")).as("s"))
      else
        fanned.select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s"))
    val perDoc = exploded.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
    val dfRel = perDoc.groupBy("s").agg(sum("c").as("df")).filter(col("df") <= cap)
    val coldDocs = perDoc.join(dfRel, "s")
      .withColumn("n_shingles", sum("c").over(wDoc))
    pairStats(coldDocs)
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  def jaccardCappedPairsSql(threshold: Double = 0.6, cap: Int = HotShingleCap): String =
    s"""WITH canon AS (
       |  SELECT doc_id, text FROM documents
       |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
       |sh AS (
       |  SELECT doc_id, unnest(${shinglesSql("text")}) AS s
       |  FROM canon WHERE len(string_split(text, ' ')) >= $ShingleK),
       |cold AS (
       |  SELECT s, doc_id
       |  FROM sh QUALIFY count(*) OVER (PARTITION BY s) <= $cap),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM cold GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, inter, na.n_shingles AS n_a, nb.n_shingles AS n_b,
       |       inter / (na.n_shingles + nb.n_shingles - inter) AS jaccard
       |FROM inter
       |JOIN sizes na ON inter.id_a = na.doc_id
       |JOIN sizes nb ON inter.id_b = nb.doc_id
       |WHERE inter / (na.n_shingles + nb.n_shingles - inter) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------------
  // Exact-substring duplication (character windows)
  // -------------------------------------------------------------------------

  val SubstrLen = 40
  val SubstrStride = 10

  /** Document pairs sharing an exact character span — the signal behind
    * suffix-array substring dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al., ACL '22), re-expressed as a
    * distributed join: every STRIDE-aligned window of SUBSTR_LEN characters
    * is hashed, and a pair of documents sharing any window surfaces from the
    * equi-join on the window hash. Stride-aligned windows on both sides
    * detect shared spans of length ≥ SUBSTR_LEN + STRIDE − 1 when the spans
    * start at equal offsets mod STRIDE (the planted dups append tokens, so
    * shared prefixes align at 0); per-position windows on one side would
    * detect arbitrary alignment at STRIDE× the row count — same plan shape,
    * denser keys. Character windows catch duplication that token shingles
    * miss (token-boundary shifts, whitespace variants) and vice versa; a
    * production pipeline runs both. The shuffle key is the 128-bit window
    * hash (high cardinality, evenly distributed), rows carry (hash, doc_id)
    * only, and distinct-per-doc windows bound the per-key fanout at the dup
    * count — join-shaped at 100 TB like every candidate generator here.
    * Boilerplate windows (license headers, shared footers) are the hot-key
    * hazard of this family — a span present in d documents costs d²/2 join
    * rows — so windows with document frequency > [[RawDfCap]] are dropped
    * before the self-join, same discipline (and same margin rationale) as the
    * shingle joins.
    */
  def substrDupPairs(spark: SparkSession, sfDir: String, cap: Int = RawDfCap): DataFrame = {
    // df as a grouped count joined back, not count().over(Window
    // .partitionBy(w)) — the window form would drain every posting of a hot
    // boilerplate window through one task before the cap dropped it (VERDICT
    // r4 #1; see shinglesWithSize). The window key is the md5 REDUCED to a
    // 60-bit bigint (same truncated-md5 discipline as shingleHash, identical
    // in DuckDB): the exploded relation is the largest intermediate in the
    // engine, and an 8-byte key vs a 32-char string is ~3× less shuffle
    // payload plus long-vs-string hashing/sort in the join. Both engines
    // truncate the same md5, so any collision (a ~W²/2⁶¹ event that merges
    // two windows) is reproduced bit-identically on the oracle side.
    //
    // Within-doc dedup rides a groupBy(doc_id, w) — the shinglesWithSize
    // compression shape — NOT a per-row array_distinct before the explode.
    // Measured under the planted-30%-boilerplate 10× probe (r8): the
    // compressed form runs the skew leg in 8.0 s vs 12.6–15 s for the
    // array_distinct form at equal base-scale cost, dropping the planted-
    // skew ratio to ~5 — below the uniform core-saturation ratio for the
    // first time. The first exchange is on the COMPOSITE (doc_id, w) key, so
    // a hot boilerplate window spreads over every partition and partial
    // aggs compress it map-side; every downstream consumer (the df branch
    // and both self-join sides) then reuses the one compact exchange.
    // size-gated fan-out (r16): the stride-window md5 explode is the
    // dominant CPU and otherwise runs in the scan's single local task
    substrDupPairsFrom(substrWindows(Tables.documentsDerive(spark, sfDir)), cap)
  }

  /** Compressed (doc_id, w, c) window relation over any (doc_id, text)
    * frame — the shared head of [[substrDupPairs]], its hot-slice twin, and
    * the [[substrDropped]] cap ledger.
    */
  private def substrWindows(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) >= SubstrLen)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, (length(text) - $SubstrLen) div $SubstrStride),
           |          i -> cast(conv(substring(md5(substring(text, i * $SubstrStride + 1, $SubstrLen)), 1, 15), 16, 10) AS long))""".stripMargin)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))

  private def substrDupPairsFrom(wins0: DataFrame, cap: Int): DataFrame = {
    val dfRel = wins0.groupBy("w").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
    val wins = wins0.join(dfRel, "w").drop("df", "c")
    val a = wins.as("a")
    val b = wins.as("b")
    a.join(b, col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_windows"))
      .orderBy("id_a", "id_b")
  }

  /** What the window df-cap SUPPRESSED — the substring family's drop ledger,
    * the q_minhash_lsh_dropped discipline applied to the one remaining
    * capped candidate generator that reported nothing: over-cap windows are
    * boilerplate spans (license headers, shared footers) whose d²/2 join
    * rows the cap exists to avoid, and this one-row ledger (cap,
    * n_hot_windows, dropped postings) is what an operator reads to size the
    * recall cost before raising the cap.
    */
  def substrDropped(spark: SparkSession, sfDir: String, cap: Int = RawDfCap): DataFrame =
    substrDroppedFrom(substrWindows(Tables.documentsDerive(spark, sfDir)), cap)

  private def substrDroppedFrom(wins0: DataFrame, cap: Int): DataFrame =
    wins0.groupBy("w").agg(count(lit(1)).as("df"))
      .agg(
        count(when(col("df") > cap, true)).as("n_hot_windows"),
        coalesce(sum(when(col("df") > cap, col("df"))), lit(0L)).as("dropped_postings"))
      .select(lit(cap.toLong).as("cap"), col("n_hot_windows"), col("dropped_postings"))

  /** [[hotSliceDocs]] with the boilerplate REPEATED past [[SubstrLen]]: the
    * 39-char LSH hot-slice text is invisible to 40-char windows, so the
    * substring family's engaged-cap rows plant a 3× repeat (119 chars → 8
    * stride-aligned windows per hot doc, each with df = 150 ≫ cap).
    */
  // lazy: HotSliceText is declared later in the file — an eager val here
  // would read it mid-object-init as null
  private lazy val HotSliceLongText: String = Seq.fill(3)(HotSliceText).mkString(" ")

  private def hotSliceLongDocs(spark: SparkSession, sfDir: String): DataFrame =
    // fan-out (r16): same dominant window-md5 chain as substrDupPairs
    Tables.deriveFanOut(spark, sfDir, "documents",
      Tables.documents(spark, sfDir).select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(10L)) < 3, lit(HotSliceLongText))
          .otherwise(col("text")).as("text")))

  private def hotSliceLongDocsSql: String =
    s"""(SELECT doc_id,
       |        CASE WHEN doc_id % 10 < 3 THEN '$HotSliceLongText' ELSE text END AS text
       | FROM documents)""".stripMargin

  /** [[substrDupPairs]] over the hot-slice corpus: every hot window's
    * df = 150 busts the cap, so the planted boilerplate contributes ZERO
    * pairs and the survivors are exactly the natural dups — both engines
    * must drop the same windows and emit the same pairs (the
    * q_minhash_lsh_pairs_hotslice discipline for this family).
    */
  def substrDupPairsHotSlice(spark: SparkSession, sfDir: String): DataFrame =
    substrDupPairsFrom(substrWindows(hotSliceLongDocs(spark, sfDir)), RawDfCap)

  /** [[substrDropped]] over the hot-slice corpus — the ledger ENGAGED:
    * nonzero hot windows, nonzero dropped postings, hash-matched.
    */
  def substrDroppedHotSlice(spark: SparkSession, sfDir: String): DataFrame =
    substrDroppedFrom(substrWindows(hotSliceLongDocs(spark, sfDir)), RawDfCap)

  private def substrWinsCte(docsSrc: String): String =
    s"""wins0 AS (
       |  SELECT DISTINCT doc_id,
       |         CAST('0x' || substr(md5(substr(text, i * $SubstrStride + 1, $SubstrLen)), 1, 15) AS BIGINT) AS w
       |  FROM $docsSrc AS docs_src,
       |       unnest(generate_series(0, (len(text) - $SubstrLen) // $SubstrStride)) AS t(i)
       |  WHERE len(text) >= $SubstrLen)""".stripMargin

  private def substrDupPairsSqlFrom(docsSrc: String): String =
    s"""WITH ${substrWinsCte(docsSrc)},
       |wins AS (
       |  SELECT doc_id, w FROM wins0
       |  QUALIFY count(*) OVER (PARTITION BY w) <= $RawDfCap)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_windows
       |FROM wins a JOIN wins b ON a.w = b.w AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |ORDER BY id_a, id_b""".stripMargin

  lazy val substrDupPairsSql: String = substrDupPairsSqlFrom("documents")

  lazy val substrDupPairsHotSliceSql: String = substrDupPairsSqlFrom(hotSliceLongDocsSql)

  private def substrDroppedSqlFrom(docsSrc: String): String =
    s"""WITH ${substrWinsCte(docsSrc)}
       |SELECT CAST($RawDfCap AS BIGINT) AS cap,
       |       CAST(coalesce(SUM(CASE WHEN df > $RawDfCap THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hot_windows,
       |       CAST(coalesce(SUM(CASE WHEN df > $RawDfCap THEN df ELSE 0 END), 0) AS BIGINT) AS dropped_postings
       |FROM (SELECT w, count(*) AS df FROM wins0 GROUP BY 1)""".stripMargin

  lazy val substrDroppedSql: String = substrDroppedSqlFrom("documents")

  lazy val substrDroppedHotSliceSql: String = substrDroppedSqlFrom(hotSliceLongDocsSql)

  // -------------------------------------------------------------------------
  // MinHash + LSH banding
  // -------------------------------------------------------------------------

  /** Per-document minhash signatures: k=16 permutations over md5 shingle
    * hashes. Returns (doc_id, sig_0..sig_15). Shaped as explode → hash →
    * grouped min so every permutation evaluates inside whole-stage codegen
    * over flat rows (higher-order array lambdas are interpreted per element —
    * 16 of them over the hash array cost more than the map-side-combined
    * shuffle this uses, and the shuffle carries one 16-min row per doc per
    * partition, not shingles).
    */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    // size-gated doc_id fan-out (r16): the explode→md5→16-perm-min chain is
    // the dominant CPU and otherwise runs in the scan's single local task;
    // hashing on doc_id lets the groupBy(doc_id) reuse the exchange.
    minhashSignaturesOf(Tables.documentsDerive(spark, sfDir, Seq(col("doc_id"))))

  /** [[minhashSignatures]]' corpus read shared with [[lshBands]]. */
  private def docsForSigning(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsDerive(spark, sfDir, Seq(col("doc_id")))

  /** [[minhashSignatures]] over an arbitrary (doc_id, text) frame — the form
    * [[LshIndex]] uses to sign an incoming batch without touching the corpus
    * table. Signature semantics are identical (same Perms/P literals), so
    * signatures computed at different times compare bit-for-bit.
    */
  def minhashSignaturesOf(docs: DataFrame): DataFrame = {
    val sigCols = Perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % lit(P)).as(s"sig_$i")
    }
    docs
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleK)
      .select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s"))
      .select(col("doc_id"), shingleHash(col("s")).as("h"))
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** Exploded (doc, band) relation shared by [[minhashLshPairs]] and its
    * drop ledger: one row per document per LSH band, carrying the full
    * signature and the band's 4-minhash struct key (the band key is internal
    * to candidate generation — any injective key yields the same buckets, so
    * the raw struct beats hashing it).
    */
  private def lshBands(spark: SparkSession, sfDir: String): DataFrame =
    // size-gated doc_id fan-out (r16) — same rationale as minhashSignatures
    lshBandsOf(docsForSigning(spark, sfDir))

  private def lshBandsOf(docs: DataFrame): DataFrame = {
    // explicit doc_id null-filter: the candidate self-join infers
    // isnotnull(doc_id) on ITS sides only, which otherwise makes the
    // occupancy/cap subtrees canonically different from the join subtrees
    // and costs a SECOND evaluation of the dominant minhash chain (AQE stage
    // reuse keys on canonical plan equality)
    val sigs = minhashSignaturesOf(docs)
      .filter(col("doc_id").isNotNull)
    val sigArr = array((0 until NumPerms).map(i => col(s"sig_$i")): _*)
    val nBands = NumPerms / BandSize
    sigs
      .select(
        col("doc_id"),
        sigArr.as("sig"),
        explode(array((0 until nBands).map(bi =>
          struct(
            lit(bi).as("band_idx"),
            struct((0 until BandSize).map(r =>
              element_at(sigArr, bi * BandSize + r + 1).as(s"k$r")): _*).as("band_key"))): _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band_idx"), col("b.band_key"))
  }

  /** Relative occupancy threshold for an LSH band bucket: a bucket is
    * degenerate past `ceil(nDocs / 64)` members, floored at 8
    * ([[RawDfCap]]'s margin — TESTDATA's planted dup groups top out at 4, so
    * the cap filters nothing at test scale and the oracle applies the same
    * rule). Same relative form as [[graft.multimodal.MediaOps.imageBucketCap]]:
    * a fixed cap cannot survive corpus growth, a relative one keeps "hot"
    * meaning OUTLIER at every scale. The scalar form is what
    * [[LshIndex.candidates]] callers pass as their `occupancyCap`.
    */
  def lshBucketCap(nDocs: Long): Int =
    math.max(8, math.ceil(nDocs / 64.0).toInt)

  /** [[lshBucketCap]] in-plan, derived from the band-0 occupancy sums (every
    * signed doc contributes exactly one band-0 row) so the capped pair query
    * needs no extra scan or driver action.
    */
  private def lshBucketCapDf(occ: DataFrame): DataFrame =
    occ.agg(greatest(lit(8),
      ceil(sum(when(col("band_idx") === 0, col("occ"))) / 64.0).cast("int")).as("cap"))

  /** MinHash-LSH near-dup candidate pairs with their signature agreement: LSH
    * bands (4×4) generate candidates by an equi-SELF-JOIN on the band key —
    * the [[LshIndex.candidates]] shape, which AQE can skew-split, unlike the
    * former per-bucket `collect_list` + in-row pair explode whose degenerate
    * bucket (a boilerplate-heavy corpus slice surviving exact dedup)
    * collected into ONE task's aggregation buffer and emitted O(b²) pairs
    * from it. Buckets past [[lshBucketCapDf]]'s relative occupancy cap are
    * dropped BEFORE the join (the df-cap discipline in signature space —
    * same judgment as [[graft.dedup.FingerprintIndex.pairsWithin]]'s
    * occupancy cap): a pair surfaces iff at least one of its agreeing bands
    * sits in a surviving bucket, and [[minhashLshDropped]] is the loud
    * ledger of what the cap suppressed. The explicit repartition on the
    * band key spreads residual in-cap buckets across the session's shuffle
    * width, and every consumer (occupancy count, both join sides) reuses
    * that ONE exchange, so the dominant tokenize→shingle→md5→minhash chain
    * still runs once. Linear in corpus size + candidate count — never
    * all-pairs, and never more than cap² candidates per bucket.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshPairsFrom(spark, lshBands(spark, sfDir))

  private def minhashLshPairsFrom(spark: SparkSession, bands0: DataFrame): DataFrame = {
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bands = bands0
      .repartition(width, col("band_idx"), col("band_key"))
    val occ = bands.groupBy("band_idx", "band_key").agg(count(lit(1)).as("occ"))
    val hot = occ.crossJoin(broadcast(lshBucketCapDf(occ)))
      .filter(col("occ") > col("cap"))
      .select("band_idx", "band_key")
    val kept = bands.join(broadcast(hot), Seq("band_idx", "band_key"), "left_anti")
    // n_eq/est_sim are computed ON the join output, BEFORE the multi-band
    // de-collision: the distinct's exchange then carries (long, long, int,
    // double) rows instead of two 16-minhash arrays per candidate — ~10×
    // less shuffle volume for the same result (n_eq is a pure function of
    // the pair, so collapsing duplicates after is identical). A
    // first-agreeing-band emission (the FingerprintIndex trick) is UNSOUND
    // under the cap: a pair's lowest agreeing band may be a hot-DROPPED
    // bucket, which the surviving band's row cannot see from sig values.
    kept.as("a")
      .join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        // straight-line 16-term agreement count: a zip_with/filter HOF here
        // runs its lambda INTERPRETED per element, and this projection now
        // evaluates per candidate row (pre-dedup), not per distinct pair
        (1 to NumPerms).map(i =>
          when(element_at(col("a.sig"), i) === element_at(col("b.sig"), i), 1)
            .otherwise(0)).reduce(_ + _).as("n_eq"))
      .withColumn("est_sim", col("n_eq") / lit(NumPerms.toDouble))
      .distinct() // the same pair can collide in several bands
      .orderBy("id_a", "id_b")
  }

  /** The loud side of [[minhashLshPairs]]'s occupancy cap: one row with the
    * effective cap, how many band buckets it suppressed, and how many (doc,
    * band) rows those buckets held — the drop ledger an operator reads
    * before trusting a capped near-dup pass (all zeros at TESTDATA scale,
    * where no bucket approaches the cap; pinned cross-engine so the cap
    * RULE, not just its null effect, is oracle-checked).
    */
  def minhashLshDropped(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshDroppedFrom(lshBands(spark, sfDir))

  private def minhashLshDroppedFrom(bands: DataFrame): DataFrame = {
    val occ = bands
      .groupBy("band_idx", "band_key").agg(count(lit(1)).as("occ"))
    // coalesce every aggregate (like the SQL twin): on a corpus with NO
    // signable docs the occ relation is empty and an ungrouped agg yields
    // one all-NULL row — the ledger must read (8, 0, 0) there, matching the
    // cap rule's floor and never NPE-ing a typed reader
    occ.crossJoin(broadcast(lshBucketCapDf(occ)))
      .agg(
        coalesce(max(col("cap")), lit(8)).as("cap"),
        coalesce(sum(when(col("occ") > col("cap"), 1L).otherwise(0L)), lit(0L))
          .as("n_hot_buckets"),
        coalesce(sum(when(col("occ") > col("cap"), col("occ")).otherwise(0L)), lit(0L))
          .as("dropped_rows"))
  }

  /** Shared CTE chain for the capped LSH oracle twins: documents →
    * signatures → exploded (doc, band) rows with the band's 4 minhashes as
    * columns → per-bucket occupancy → the relative cap (the
    * [[lshBucketCapDf]] rule verbatim: GREATEST(8, ceil(nDocs / 64))).
    */
  private def lshBandCtes(docsSrc: String = "documents"): String = {
    val permList = Perms.zipWithIndex
      .map { case ((a, b), _) => s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))" }
      .mkString(",\n    ")
    val nBands = NumPerms / BandSize
    val bandVals = (0 until nBands)
      .map(bi => s"($bi, ${bi * BandSize + 1})")
      .mkString(", ")
    s"""docs AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS shingles
       |  FROM $docsSrc WHERE len(string_split(text, ' ')) >= $ShingleK),
       |hashed AS (
       |  SELECT doc_id, list_transform(shingles, s -> $shingleHashSql) AS hs FROM docs),
       |sigs AS (
       |  SELECT doc_id, [
       |    $permList
       |  ] AS sig FROM hashed),
       |bands AS (
       |  SELECT doc_id, sig, b.band_idx,
       |         sig[b.lo] AS k0, sig[b.lo + 1] AS k1, sig[b.lo + 2] AS k2, sig[b.lo + 3] AS k3
       |  FROM sigs, (VALUES $bandVals) AS b(band_idx, lo)),
       |occ AS (
       |  SELECT band_idx, k0, k1, k2, k3, count(*) AS occ
       |  FROM bands GROUP BY 1, 2, 3, 4, 5),
       |cap AS (
       |  SELECT GREATEST(8, CAST(ceil(count(*) / 64.0) AS INT)) AS c FROM sigs)""".stripMargin
  }

  val minhashLshPairsSql: String =
    s"""WITH ${lshBandCtes()},
       |hot AS (
       |  SELECT band_idx, k0, k1, k2, k3 FROM occ WHERE occ > (SELECT c FROM cap)),
       |kept AS (
       |  SELECT * FROM bands bd
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.band_idx = bd.band_idx AND h.k0 = bd.k0
       |                      AND h.k1 = bd.k1 AND h.k2 = bd.k2 AND h.k3 = bd.k3)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sig AS sig_a, b2.sig AS sig_b
       |  FROM kept a
       |  JOIN kept b2 ON a.band_idx = b2.band_idx
       |                AND a.k0 = b2.k0 AND a.k1 = b2.k1 AND a.k2 = b2.k2 AND a.k3 = b2.k3
       |                AND a.doc_id < b2.doc_id)
       |SELECT id_a, id_b,
       |       CAST(len(list_filter(generate_series(1, $NumPerms), i -> sig_a[i] = sig_b[i])) AS INT) AS n_eq,
       |       CAST(len(list_filter(generate_series(1, $NumPerms), i -> sig_a[i] = sig_b[i])) AS INT) / ${NumPerms.toDouble} AS est_sim
       |FROM cand
       |ORDER BY id_a, id_b""".stripMargin

  val minhashLshDroppedSql: String =
    s"""WITH ${lshBandCtes()}
       |SELECT (SELECT c FROM cap) AS cap,
       |       CAST(coalesce(SUM(CASE WHEN occ > (SELECT c FROM cap) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hot_buckets,
       |       CAST(coalesce(SUM(CASE WHEN occ > (SELECT c FROM cap) THEN occ ELSE 0 END), 0) AS BIGINT) AS dropped_rows
       |FROM occ""".stripMargin

  // -------------------------------------------------------------------------
  // Hot-slice twins: the occupancy cap ENGAGED, oracle-gated end-to-end
  // -------------------------------------------------------------------------

  /** The boilerplate text planted on the hot slice (10 tokens ≥ ShingleK, so
    * every planted doc signs; identical text ⇒ identical signature ⇒ all its
    * band buckets hold the whole slice). Shared with the bench's
    * hot-bucket probe fixture.
    */
  private val HotSliceText = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9"

  /** `documents` with 30% of docs (doc_id % 10 < 3) rewritten to ONE
    * boilerplate text — the degenerate-bucket corpus derived IN-QUERY so the
    * DuckDB twin sees the identical slice. At sf0.01 (500 docs) the planted
    * bucket holds 150 rows against cap = GREATEST(8, ceil(500/64)) = 8, so
    * the cap genuinely fires: [[minhashLshDroppedHotSlice]]'s ledger is
    * NONZERO under the oracle gate (r11 verdict #6 — q_minhash_lsh_dropped
    * oracles the cap RULE but its all-zero effect at TESTDATA scale left the
    * nonzero path bench-only), and [[minhashLshPairsHotSlice]] pins that
    * both engines drop the SAME buckets and emit the SAME surviving pairs.
    */
  private def hotSliceDocs(spark: SparkSession, sfDir: String): DataFrame =
    // doc_id fan-out (r16): the hot-slice twins run the same dominant
    // signing chain as their base queries — same size gate, same key
    Tables.deriveFanOut(spark, sfDir, "documents",
      Tables.documents(spark, sfDir).select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(10L)) < 3, lit(HotSliceText))
          .otherwise(col("text")).as("text")),
      Seq(col("doc_id")))

  private def hotSliceDocsSql: String =
    s"""(SELECT doc_id,
       |        CASE WHEN doc_id % 10 < 3 THEN '$HotSliceText' ELSE text END AS text
       | FROM documents)""".stripMargin

  def minhashLshPairsHotSlice(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshPairsFrom(spark, lshBandsOf(hotSliceDocs(spark, sfDir)))

  def minhashLshDroppedHotSlice(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshDroppedFrom(lshBandsOf(hotSliceDocs(spark, sfDir)))

  val minhashLshPairsHotSliceSql: String =
    s"""WITH ${lshBandCtes(hotSliceDocsSql)},
       |hot AS (
       |  SELECT band_idx, k0, k1, k2, k3 FROM occ WHERE occ > (SELECT c FROM cap)),
       |kept AS (
       |  SELECT * FROM bands bd
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.band_idx = bd.band_idx AND h.k0 = bd.k0
       |                      AND h.k1 = bd.k1 AND h.k2 = bd.k2 AND h.k3 = bd.k3)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sig AS sig_a, b2.sig AS sig_b
       |  FROM kept a
       |  JOIN kept b2 ON a.band_idx = b2.band_idx
       |                AND a.k0 = b2.k0 AND a.k1 = b2.k1 AND a.k2 = b2.k2 AND a.k3 = b2.k3
       |                AND a.doc_id < b2.doc_id)
       |SELECT id_a, id_b,
       |       CAST(len(list_filter(generate_series(1, $NumPerms), i -> sig_a[i] = sig_b[i])) AS INT) AS n_eq,
       |       CAST(len(list_filter(generate_series(1, $NumPerms), i -> sig_a[i] = sig_b[i])) AS INT) / ${NumPerms.toDouble} AS est_sim
       |FROM cand
       |ORDER BY id_a, id_b""".stripMargin

  val minhashLshDroppedHotSliceSql: String =
    s"""WITH ${lshBandCtes(hotSliceDocsSql)}
       |SELECT (SELECT c FROM cap) AS cap,
       |       CAST(coalesce(SUM(CASE WHEN occ > (SELECT c FROM cap) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hot_buckets,
       |       CAST(coalesce(SUM(CASE WHEN occ > (SELECT c FROM cap) THEN occ ELSE 0 END), 0) AS BIGINT) AS dropped_rows
       |FROM occ""".stripMargin

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  val SimHashBits = 56 // 14 md5 hex chars — stays positive in a signed long

  /** 56-bit SimHash over shingle features: bit j of the fingerprint is set
    * when more than half the document's shingle hashes have bit j set. All
    * bit arithmetic on md5-derived longs — oracle-reproducible.
    * On the planted TESTDATA near-dups this separates cleanly: dup pairs sit
    * at hamming ≤ 7, random pairs ≥ 12.
    *
    * Shaped like [[minhashSignatures]]: explode → hash → grouped bit-count
    * sums, so the 56 shift-and-mask terms and the partial aggregation all run
    * inside whole-stage codegen over flat rows. The previous form (56
    * higher-order `filter` lambdas over a per-doc hash array) evaluated
    * interpreted, re-scanning the array 56 times — ~2.5× slower end-to-end
    * (VERDICT r1 #7). The shuffle carries one 57-column partial row per doc
    * per partition, not shingles.
    */
  private def simhashFp(spark: SparkSession, sfDir: String): DataFrame = {
    val bitCounts = (0 until SimHashBits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"c_$j")
    }
    val aggCols = count(lit(1)).as("n") +: bitCounts
    val fpTerms = (0 until SimHashBits).map { j =>
      when(col(s"c_$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }
    // the shingle explode + 57-column aggregate spread comes from
    // [[tokenized]]'s size-gated doc_id fan-out (r16): hash on doc_id so the
    // groupBy below REUSES the exchange — each doc aggregates wholly in its
    // own partition, no second shuffle. The former unconditional
    // repartition(width) here would have been a full corpus shuffle at
    // cluster scale; the gate makes it a no-op exactly there.
    tokenized(spark, sfDir)
      .select(col("doc_id"), explode(shinglesFromToks(col("toks"))).as("s"))
      .select(col("doc_id"), conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("h"))
      .groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("doc_id"), fpTerms.reduce(_ + _).as("simhash"))
  }

  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    simhashFp(spark, sfDir).orderBy("doc_id")

  val simhashFingerprintsSql: String = {
    val bitTerms = (0 until SimHashBits).map { j =>
      s"CASE WHEN 2 * len(list_filter(hs, h -> (h >> $j) & 1 = 1)) > len(hs) THEN ${1L << j} ELSE 0 END"
    }.mkString(" +\n       ")
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |         list_transform(${shinglesSql("text")}, s -> CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)) AS hs
       |  FROM documents WHERE len(string_split(text, ' ')) >= $ShingleK)
       |SELECT doc_id,
       |       $bitTerms AS simhash
       |FROM hashed ORDER BY doc_id""".stripMargin
  }

  /** [[simhashFingerprints]] split into the (id, fp_lo, fp_hi) 32-bit-word
    * relation the fingerprint index family consumes (fp_hi carries bits
    * 32..55; its top byte is zero, the [[FpShape.FpSim56]] padding
    * contract).
    */
  def simhashWords(spark: SparkSession, sfDir: String): DataFrame =
    simhashFp(spark, sfDir).select(
      col("doc_id").as("id"),
      col("simhash").bitwiseAND(lit(0xFFFFFFFFL)).as("fp_lo"),
      shiftright(col("simhash"), 32).as("fp_hi"))

  /** Relative hot-bucket cap for [[simhashPairs]]: 4× the mean per-bucket
    * occupancy (n/16 per 4-bit band), floored at 4 — the
    * [[graft.multimodal.MediaOps.imageBucketCap]] formula at this band
    * alphabet (a FIXED cap sits below the mean at corpus scale and
    * declares everything hot, the r8 pathology).
    */
  def simhashBucketCap(nDocs: Long): Int =
    math.max(4, math.ceil(nDocs / 4.0).toInt)

  /** SimHash near-dup pairs: hamming distance ≤ 9 of the 56-bit
    * fingerprints, candidate generation UNIFIED onto the shared hamming
    * machinery ([[FingerprintIndex.pairsWithin]] under [[FpShape.FpSim56]]:
    * 14 active 4-bit bands, pigeonhole bound 13 ≥ 9) with the relative
    * hot-bucket occupancy cap — retiring the r1 local block code, whose
    * "first agreeing block" boolean was the O(nBands²) expression shape
    * that falls off whole-stage codegen (the r9 STATE gotcha; the shared
    * core emits via the linear agree-bitmask instead). SimHash near-dup
    * thereby also inherits the durable-index surface: a
    * [[FingerprintIndex.materialize]] over [[simhashWords]] serves
    * streaming probes and asOf pins like any other fingerprint family.
    */
  def simhashPairs(spark: SparkSession, sfDir: String, maxDist: Int = 9): DataFrame = {
    // the words relation is corpus-compressed (one 3-column row per doc) but
    // feeds FOUR consumers (the cap count, the hot-bucket scan, both self-
    // join sides) — materialize the fingerprint computation once instead of
    // re-running the shingle explode + 57-column aggregate per consumer
    val fps = simhashWords(spark, sfDir).localCheckpoint()
    val cap = simhashBucketCap(fps.count()) // one scalar to the driver
    FingerprintIndex
      .pairsWithin(fps, maxDist, FpShape.FpSim56, occupancyCap = Some(cap))
      .orderBy("id_a", "id_b")
  }

  def simhashPairsSql(maxDist: Int = 9): String = {
    val bitTerms = (0 until SimHashBits).map { j =>
      s"CASE WHEN 2 * len(list_filter(hs, h -> (h >> $j) & 1 = 1)) > len(hs) THEN ${1L << j} ELSE 0 END"
    }.mkString(" +\n       ")
    def bandVal(side: String) = s"($side.simhash >> (bj.j * 4)) & 15"
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |         list_transform(${shinglesSql("text")}, s -> CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)) AS hs
       |  FROM documents WHERE len(string_split(text, ' ')) >= $ShingleK),
       |fp AS (
       |  SELECT doc_id,
       |       $bitTerms AS simhash
       |  FROM hashed),
       |cap AS (
       |  SELECT GREATEST(4, CAST(ceil(count(*) / 4.0) AS INT)) AS c FROM fp),
       |bandrows AS (
       |  SELECT doc_id, b.j AS band_idx, (simhash >> (b.j * 4)) & 15 AS band_val
       |  FROM fp, (SELECT unnest(generate_series(0, 13)) AS j) b),
       |hot AS (
       |  SELECT band_idx, band_val FROM bandrows
       |  GROUP BY 1, 2 HAVING count(*) > (SELECT c FROM cap))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |  AND EXISTS (
       |    SELECT 1 FROM (SELECT unnest(generate_series(0, 13)) AS j) bj
       |    WHERE (${bandVal("a")}) = (${bandVal("b")})
       |      AND NOT EXISTS (SELECT 1 FROM hot h
       |                      WHERE h.band_idx = bj.j
       |                        AND h.band_val = (${bandVal("a")})))
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The [[LshIndex]] band-table schema as an oracle-checked query: one row
    * per (doc, band) with the band minhashes flattened to k0..k3 — the exact
    * rows [[LshIndex.appendBatch]] persists (minus the sig array, which the
    * cross-engine compare cannot hash).
    */
  def qLshBandIndex(spark: SparkSession, sfDir: String): DataFrame =
    // doc_id fan-out (r16): bandTable runs the minhash signing chain
    LshIndex.bandTable(Tables.documentsDerive(spark, sfDir, Seq(col("doc_id"))))
      .select("doc_id", "band_idx", "k0", "k1", "k2", "k3")
      .orderBy("doc_id", "band_idx")

  val lshBandIndexSql: String = {
    val permList = Perms.zipWithIndex
      .map { case ((a, b), _) => s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))" }
      .mkString(",\n    ")
    val nBands = NumPerms / BandSize
    val bandVals = (0 until nBands)
      .map(bi => s"($bi, ${bi * BandSize + 1})")
      .mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, ${shinglesSql("text")} AS shingles
       |  FROM documents WHERE len(string_split(text, ' ')) >= $ShingleK),
       |hashed AS (
       |  SELECT doc_id, list_transform(shingles, s -> $shingleHashSql) AS hs FROM docs),
       |sigs AS (
       |  SELECT doc_id, [
       |    $permList
       |  ] AS sig FROM hashed)
       |SELECT doc_id, b.band_idx,
       |       sig[b.lo] AS k0, sig[b.lo + 1] AS k1, sig[b.lo + 2] AS k2, sig[b.lo + 3] AS k3
       |FROM sigs, (VALUES $bandVals) AS b(band_idx, lo)
       |ORDER BY doc_id, band_idx""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (exactDedup(_, _)),
    "q_lsh_band_index" -> (qLshBandIndex(_, _)),
    "q_ngram_jaccard_pairs" -> (ngramJaccardPairs(_, _)),
    "q_jaccard_incremental" -> (qJaccardIncremental(_, _)),
    "q_jaccard_incremental_stored" -> (ShingleIndex.qJaccardIncrementalStored(_, _)),
    "q_ngram_jaccard_pairs_stored" -> (ShingleIndex.qNgramJaccardPairsStored(_, _)),
    "q_jaccard_admission_probe" -> (ShingleIndex.qJaccardAdmissionProbe(_, _)),
    "q_admission_staleness" -> (ShingleIndex.qAdmissionStaleness(_, _)),
    "q_admission_staleness_by_doc" -> (ShingleIndex.qAdmissionStalenessByDoc(_, _)),
    "q_containment_pairs_stored" -> (ShingleIndex.qContainmentPairsStored(_, _)),
    "q_containment_pairs" -> (containmentPairs(_, _)),
    "q_edit_distance" -> (editDistancePairs(_, _)),
    "q_jaccard_capped" -> (jaccardCappedPairs(_, _)),
    "q_neardup_clusters" -> (nearDupClusters(_, _)),
    "q_cluster_best" -> (clusterBest(_, _)),
    "q_bloom_dedup" -> (bloomDedup(_, _)),
    "q_substr_dup" -> (substrDupPairs(_, _)),
    "q_substr_dup_hotslice" -> (substrDupPairsHotSlice(_, _)),
    "q_substr_dropped" -> (substrDropped(_, _)),
    "q_substr_dropped_hotslice" -> (substrDroppedHotSlice(_, _)),
    "q_minhash_lsh_pairs" -> (minhashLshPairs(_, _)),
    "q_minhash_lsh_dropped" -> (minhashLshDropped(_, _)),
    "q_minhash_lsh_pairs_hotslice" -> (minhashLshPairsHotSlice(_, _)),
    "q_minhash_lsh_dropped_hotslice" -> (minhashLshDroppedHotSlice(_, _)),
    "q_simhash_fp" -> (simhashFingerprints(_, _)),
    "q_simhash_pairs" -> (simhashPairs(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" -> exactDedupSql,
    "q_lsh_band_index" -> lshBandIndexSql,
    "q_ngram_jaccard_pairs" -> ngramJaccardPairsSql(),
    "q_jaccard_incremental" -> jaccardIncrementalSql(),
    "q_jaccard_incremental_stored" -> jaccardIncrementalSql(),
    "q_ngram_jaccard_pairs_stored" -> ngramJaccardPairsSql(),
    "q_jaccard_admission_probe" -> ShingleIndex.jaccardAdmissionProbeSql(),
    "q_admission_staleness" -> ShingleIndex.admissionStalenessSql(),
    "q_admission_staleness_by_doc" -> ShingleIndex.admissionStalenessByDocSql(),
    "q_containment_pairs_stored" -> containmentPairsSql(),
    "q_containment_pairs" -> containmentPairsSql(),
    "q_edit_distance" -> editDistancePairsSql(),
    "q_jaccard_capped" -> jaccardCappedPairsSql(),
    "q_neardup_clusters" -> nearDupClustersSql(),
    "q_cluster_best" -> clusterBestSql(),
    "q_bloom_dedup" -> bloomDedupSql(),
    "q_substr_dup" -> substrDupPairsSql,
    "q_substr_dup_hotslice" -> substrDupPairsHotSliceSql,
    "q_substr_dropped" -> substrDroppedSql,
    "q_substr_dropped_hotslice" -> substrDroppedHotSliceSql,
    "q_minhash_lsh_pairs" -> minhashLshPairsSql,
    "q_minhash_lsh_dropped" -> minhashLshDroppedSql,
    "q_minhash_lsh_pairs_hotslice" -> minhashLshPairsHotSliceSql,
    "q_minhash_lsh_dropped_hotslice" -> minhashLshDroppedHotSliceSql,
    "q_simhash_fp" -> simhashFingerprintsSql,
    "q_simhash_pairs" -> simhashPairsSql()
  )
}
