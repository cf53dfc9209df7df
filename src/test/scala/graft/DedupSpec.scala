package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps

class DedupSpec extends AnyFunSuite with SharedSpark {

  // TESTDATA plants near-duplicates: a doc whose text is another doc's text
  // with " dup" token noise appended. Recover the expected pairs directly.
  lazy val plantedPairs: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byText = docs.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    docs.flatMap { case (id, t) =>
      val base = t.split(" ").filter(_ != "dup").mkString(" ")
      if (base != t) byText.get(base).map(o => (math.min(id, o), math.max(id, o)))
      else None
    }.toSet
  }

  test("testdata has planted near-dup pairs") {
    assert(plantedPairs.nonEmpty)
  }

  test("exact dedup groups by content hash without losing docs") {
    val n = Tables.documents(spark, sfDir).count()
    val agg = DedupOps.exactDedup(spark, sfDir).agg(sum("n_copies")).first().getLong(0)
    assert(agg == n)
  }

  test("ngram jaccard finds every planted pair with high similarity") {
    val found = DedupOps.ngramJaccardPairs(spark, sfDir)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    plantedPairs.foreach { p =>
      assert(found.contains(p), s"planted pair $p not found by shingle jaccard")
      assert(found(p) > 0.6)
    }
  }

  test("minhash LSH recovers the planted pairs with high estimated similarity") {
    val found = DedupOps.minhashLshPairs(spark, sfDir)
      .select("id_a", "id_b", "est_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    plantedPairs.foreach { p =>
      assert(found.contains(p), s"planted pair $p not found by minhash LSH")
      assert(found(p) >= 0.5)
    }
  }

  test("minhash signature agreement tracks true jaccard on planted pairs") {
    val jac = DedupOps.ngramJaccardPairs(spark, sfDir, threshold = 0.0)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = DedupOps.minhashLshPairs(spark, sfDir)
      .select("id_a", "id_b", "est_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val common = est.keySet.intersect(jac.keySet)
    assert(common.nonEmpty)
    // 16 perms: loose agreement bound, just catches systematic skew
    common.foreach(p => assert(math.abs(est(p) - jac(p)) < 0.45, s"pair $p est=${est(p)} jac=${jac(p)}"))
  }

  test("simhash puts planted pairs within the hamming threshold") {
    val found = DedupOps.simhashPairs(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    plantedPairs.foreach(p => assert(found.contains(p), s"planted pair $p not found by simhash"))
  }

  test("simhash fingerprints fit in 56 bits and are deterministic") {
    val fp1 = DedupOps.simhashFingerprints(spark, sfDir).collect()
    val fp2 = DedupOps.simhashFingerprints(spark, sfDir).collect()
    assert(fp1.sameElements(fp2))
    fp1.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 56)))
  }
}
