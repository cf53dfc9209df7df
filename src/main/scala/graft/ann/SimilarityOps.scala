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
  private def withNorm(df: DataFrame, idAs: String, vAs: String, nAs: String): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    df.select(col("vec_id").as(idAs), transform(col("embedding"), _.cast("double")).as(vAs))
      .withColumn(nAs, expr(s"dot_arrays($vAs, $vAs)"))
  }

  private def dot(a: String, b: String): Column = expr(s"dot_arrays($a, $b)")

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

  /** Exact 1-NN for every vector (brute force; the corpus is small enough at
    * every SF that the full O(n²) candidate join is the fastest exact plan —
    * at real scale this switches to [[lshBuckets]] candidates).
    */
  def knn1(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = withNorm(e, "qid", "qv", "qn")
    val b = withNorm(e, "cid", "cv", "cn")
    val scored = a
      .join(broadcast(b), col("qid") =!= col("cid"))
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

  /** Embedding near-duplicate pairs: cosine above threshold, ids only. */
  def cosinePairs(spark: SparkSession, sfDir: String, threshold: Double = 0.45): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = withNorm(e, "id_a", "va", "na")
    val b = withNorm(e, "id_b", "vb", "nb")
    a.join(broadcast(b), col("id_a") < col("id_b"))
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
      df.withColumn(s"h_$j", array(hyperplanes(j).map(lit(_)): _*))
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_topk" -> (annTopK(_, _)),
    "q_knn_1nn" -> (knn1(_, _)),
    "q_cosine_pairs" -> (cosinePairs(_, _)),
    "q_lsh_buckets" -> (lshBuckets(_, _))
  )

  def oracle: Map[String, String] = Map(
    "q_ann_topk" -> annTopKSql(),
    "q_knn_1nn" -> knn1Sql,
    "q_cosine_pairs" -> cosinePairsSql(),
    "q_lsh_buckets" -> lshBucketsSql
  )
}
