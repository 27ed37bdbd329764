package graft

import graft.algo.Algorithms
import org.apache.spark.sql.functions._

/** Algorithm kernels validated on tiny graphs with hand-computed answers
  * (the reference validates against LDBC Graphalytics outputs,
  * benches/graphalytics_common/mod.rs:98-135 — same spirit, smaller). */
class AlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  test("wcc: two components get min-id labels") {
    // comp A: 1-2-3 ; comp B: 10-11
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = Algorithms.wcc(e).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("bfs distances on a chain with a shortcut") {
    // 1->2->3->4 and 1->3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val got = Algorithms.bfs(e, 1L, 10).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("sssp takes the cheaper weighted path") {
    // 1->2 (w1), 2->3 (w1), 1->3 (w5) : dist(3) = 2
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0)).toDF("src", "dst", "weight")
    val got = Algorithms.sssp(e, 1L, 10).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
  }

  test("triangleCount counts each triangle once") {
    // triangle 1-2-3 plus pendant 3-4
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Algorithms.triangleCount(und).as[Long].head() == 1L)
  }

  test("lcc: triangle vertices 1.0, pendant 0.0") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Algorithms.lcc(und).select("id", "lcc").as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0 && got(4L) == 0.0)
    assert(math.abs(got(3L) - 1.0 / 3.0) < 1e-9) // deg 3, 1 triangle: 2/(3*2)=1/3
  }

  test("pageRank ranks the sink of a star highest and sums to ~1") {
    // 1->4, 2->4, 3->4
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = Algorithms.pageRank(e, 15).as[(Long, Double)].collect().toMap
    assert(got(4L) > got(1L))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("cdlp converges to per-component labels on two cliques") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val got = Algorithms.cdlp(e, 5).as[(Long, Long)].collect().toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
    assert(got(1L) != got(10L))
  }

  test("scc: cycle forms one component, tail is its own") {
    // cycle 1->2->3->1, tail 3->4
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Algorithms.scc(e, 10).as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) != got(1L))
  }
}
