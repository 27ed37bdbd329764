package graft

import graft.vector.VectorSearch

/** SemDeDup: deterministic spherical k-means + in-cluster near-dup marking,
  * hand-computed on a 2-cluster fixture.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated directions in R^4; id 5 is a scaled copy of id 1
  // (cosine exactly 1.0 — scale-invariance pin)
  private val emb = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.1f, 0.9f, 0.0f)),
    (5L, Seq(2.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("k-means separates the two directions; only the scaled copy is a dup at 0.999") {
    // init: c0 = v1, c1 = v2 → {1,3,5} vs {2,4} and Lloyd keeps it;
    // cos(1,3) = 0.9/0.90554 ≈ 0.9939 < 0.999, cos(1,5) = 1.0 → dup(5)
    val out = VectorSearch.semDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, tau = 0.999)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 5)
    assert(out(1L)._2 == out(3L)._2 && out(3L)._2 == out(5L)._2,
      "group A must share a cluster")
    assert(out(2L)._2 == out(4L)._2, "group B must share a cluster")
    assert(out(1L)._2 != out(2L)._2, "groups must separate")
    assert(out.values.map(_._3).toSeq.count(identity) == 1 && out(5L)._3,
      s"only the scaled copy may be flagged: $out")
  }

  test("lower threshold flags every same-direction smaller-id match, keep-first") {
    // tau = 0.95: in cluster A, 3 has smaller-id 1 at 0.9939 and 5 has 1 at
    // 1.0 → both dups; 1 keeps (no smaller id). Cluster B: 4 vs 2 at 0.9939.
    val out = VectorSearch.semDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, tau = 0.95)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true,
      5L -> true), s"got $out")
  }
}
