package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.SimilarityOps

class SimilaritySpec extends AnyFunSuite with SharedSpark {

  test("ann top-k returns exactly k ranked neighbors per query") {
    val rows = SimilarityOps.annTopK(spark, sfDir, nQueries = 4, k = 3).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)))
    }
  }

  test("1-NN of the top-1 ANN result agrees with brute force on query vectors") {
    val ann = SimilarityOps.annTopK(spark, sfDir, nQueries = 5, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val knn = SimilarityOps.knn1(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(q => assert(ann(q) == knn(q)))
  }

  test("lsh buckets partition the corpus completely") {
    val total = Tables.embeddings(spark, sfDir).count()
    val bucketed = SimilarityOps.lshBuckets(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_vectors")).first().getLong(0)
    assert(bucketed == total)
  }

  test("cosine pairs are symmetric-free (a < b) and deduplicated") {
    val rows = SimilarityOps.cosinePairs(spark, sfDir, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b })
    assert(rows.distinct.length == rows.length)
  }
}
