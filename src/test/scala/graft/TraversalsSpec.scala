package graft

import org.apache.spark.sql.functions.col

/** AsOfJoin: inclusive boundary, tie-break, and no-match semantics. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("most recent right at-or-before left; inclusive ties; null when none") {
    val left = Seq((10L, 1L, 100L), (11L, 1L, 205L), (12L, 2L, 50L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 1L, 100L),  // exactly at left ts 100 -> inclusive match
      (91L, 1L, 200L),  // before 205
      (92L, 1L, 200L),  // same ts as 91: tie-break -> larger tie id wins
      (93L, 1L, 300L))  // after everything: never matched
      .toDF("event_id", "user_id", "ts")
    val got = graft.operators.AsOfJoin
      .asOf(left, right, "user_id", "ts", Seq("event_id"), "event_id")
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(10L).contains(90L))  // inclusive at equal ts
    assert(got(11L).contains(92L))  // last under (ts, tie) ordering
    assert(got(12L).isEmpty)        // user 2 has no signups
  }
}

import graft.model.PropertyGraph
import graft.operators.{Direction, Traversals}
import org.apache.spark.sql.functions._

/** Mirrors the reference's traversal semantics tests
  * (ExpandOperator / VarLengthExpandOperator visited-set dedup,
  * reference operator.rs:2744-3224): tiny diamond + cycle graphs. */
class TraversalsSpec extends SparkSpec {
  import spark.implicits._

  //   1 -> 2 -> 4
  //   1 -> 3 -> 4 ; 4 -> 1 (cycle back)
  private lazy val g = {
    val nodes = Seq((1L, Seq("N")), (2L, Seq("N")), (3L, Seq("N")), (4L, Seq("N")))
      .toDF("id", "labels")
    val edges = Seq(
      (10L, 1L, 2L, "E"), (11L, 1L, 3L, "E"), (12L, 2L, 4L, "E"),
      (13L, 3L, 4L, "E"), (14L, 4L, 1L, "E"))
      .toDF("id", "src", "dst", "relationship")
    PropertyGraph(nodes, edges)
  }

  test("expand out: one hop fan-out") {
    val bound = Seq(1L).toDF("nid")
    val out = Traversals.expand(g, bound, "nid", Seq("E"), Direction.Out)
    assert(out.select("_nbr").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("expand in and both directions") {
    val bound = Seq(4L).toDF("nid")
    val in = Traversals.expand(g, bound, "nid", Nil, Direction.In)
    assert(in.select("_nbr").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val both = Traversals.expand(g, bound, "nid", Nil, Direction.Both)
    assert(both.select("_nbr").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("expandInto keeps only connected pairs") {
    val pairs = Seq((1L, 2L), (1L, 4L), (2L, 4L)).toDF("a", "b")
    val kept = Traversals.expandInto(g, pairs, "a", "b", Seq("E"))
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (2L, 4L)))
  }

  test("varLengthExpand dedups via BFS-visited (min hops) and handles cycles") {
    val starts = Seq(1L).toDF("s")
    val r = Traversals.varLengthExpand(g.edges, starts, "s", 1, 3)
      .as[(Long, Long, Int)].collect().toSet
    // hop1: 2,3 ; hop2: 4 (via both paths, deduped) ; hop3: only 1 (cycle) but
    // 1 is the start (visited at hop 0) -> excluded
    assert(r == Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 2)))
  }

  test("varLengthExpand respects minHops") {
    val starts = Seq(1L).toDF("s")
    val r = Traversals.varLengthExpand(g.edges, starts, "s", 2, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(r == Set((1L, 4L, 2)))
  }
}
