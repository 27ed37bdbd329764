package graft

import graft.cypher.QueryEngine
import graft.model.PropertyGraph

/** Chained write statements must grow the graph's plan LINEARLY, not
  * multiplicatively. Regression pin for the round-10 fix: an unpinned
  * DELETE id-set is embedded by up to three anti-joins (nodes + edge src +
  * edge dst for DETACH), so statement k re-embeds statement k-1's whole
  * plan ~3x — a 16-statement chain reached 80M-char plans and never
  * finished. With the matched-set pinned (localCheckpoint) each statement
  * layers O(1) plan text over a stable base. */
class WriteChainSpec extends SparkSpec {
  import spark.implicits._

  private def fresh: PropertyGraph = {
    val nodes = (1L to 40L).map(i => (i, Seq("P"), s"n$i"))
      .toDF("id", "labels", "name")
    val edges = (1L to 39L).map(i => (100L + i, i, i + 1, "R"))
      .toDF("id", "src", "dst", "relationship")
    PropertyGraph(nodes, edges)
  }

  test("chained CREATE/DELETE statements keep plan growth linear") {
    // interleave the shapes that historically multiplied: per-statement
    // MATCH...CREATE edge (embeds the match), then DETACH DELETE (embeds
    // the id-set three times)
    var g = fresh
    val planSizes = (0 until 8).map { i =>
      val a = i * 2 + 1; val b = i * 2 + 2
      g = QueryEngine.executeWrite(
        s"MATCH (x:P {id: $a}), (y:P {id: $b}) CREATE (x)-[:L]->(y)", g)._1
      g = QueryEngine.executeWrite(
        s"MATCH (x:P {id: ${40 - i}}) DETACH DELETE x", g)._1
      g.edges.queryExecution.logical.numberedTreeString.length +
        g.nodes.queryExecution.logical.numberedTreeString.length
    }
    // linear layering: the per-statement increment must be flat, not
    // compounding — allow generous slack over the mean early increment
    val deltas = planSizes.sliding(2).map(p => p(1) - p(0)).toSeq
    val early = deltas.take(3).max.toDouble
    assert(deltas.last <= early * 3,
      s"plan growth is compounding: deltas=$deltas sizes=$planSizes")
    // and the final result is correct: 8 edges created, 8 nodes deleted
    assert(g.nodes.count() == 32L)
    assert(g.edges.filter($"relationship" === "L").count() > 0L)
  }

  test("chained mergeNodes stays linear and keeps split semantics") {
    import org.apache.spark.sql.functions._
    import graft.model.GraphMutations
    var g = fresh
    val sizes = (0 until 6).map { i =>
      // half the batch matches (ids 1..3), half is new (100+i..)
      val incoming = Seq((1L, Seq("P"), "upd"), (2L, Seq("P"), "upd"),
        (100L + i, Seq("Q"), s"new$i"))
        .toDF("id", "labels", "name")
      g = GraphMutations.mergeNodes(g, incoming,
        onCreateSet = Map("name" -> lit(s"created$i")),
        onMatchSet = Map("name" -> concat(col("name"), lit("+"))))
      g.nodes.queryExecution.logical.numberedTreeString.length
    }
    val deltas = sizes.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(deltas.last <= math.max(deltas.head, 2000) * 3,
      s"merge plan growth is compounding: $deltas")
    // matched node 1 got "+" appended 6 times over its original name
    assert(g.nodes.filter($"id" === 1L).select("name").as[String].head() == "n1++++++")
    // each round's new node carries its ON CREATE value
    assert(g.nodes.filter($"id" === 103L).select("name").as[String].head() == "created3")
    assert(g.nodes.count() == 40L + 6L)
  }

  test("per-label index stays exactly consistent across append/delete chains") {
    import graft.model.GraphMutations
    import org.apache.spark.sql.functions._
    def idx(g: PropertyGraph): PropertyGraph = g.copy(byLabel = Map(
      "P" -> g.nodes.filter(array_contains($"labels", "P")),
      "Q" -> g.nodes.filter(array_contains($"labels", "Q"))))
    def assertConsistent(g: PropertyGraph): Unit =
      Seq("P", "Q", "Z").foreach { l =>
        val viaIndex = g.nodesWithLabel(l).select("id").as[Long].collect().sorted
        val viaScan = g.nodes.filter(array_contains($"labels", l))
          .select("id").as[Long].collect().sorted
        assert(viaIndex.sameElements(viaScan), s"label $l: index diverged from scan")
      }
    var g = idx(fresh)
    // append: multi-label rows land in BOTH tables, unseen label Z falls back
    g = GraphMutations.createNodes(g, Seq(
      (200L, Seq("P"), "p200"), (201L, Seq("Q"), "q201"),
      (202L, Seq("P", "Q"), "pq202"), (203L, Seq("Z"), "z203"))
      .toDF("id", "labels", "name"))
    assert(g.byLabel.nonEmpty, "createNodes must carry the label index")
    assertConsistent(g)
    // edge create/delete leave the node index untouched
    g = GraphMutations.createEdges(g, Seq((900L, 200L, 201L, "R"))
      .toDF("id", "src", "dst", "relationship"))
    assert(g.byLabel.nonEmpty)
    g = GraphMutations.deleteEdges(g, Seq(900L).toDF("id"))
    assert(g.byLabel.nonEmpty)
    assertConsistent(g)
    // delete: anti-join applies to every label table
    g = GraphMutations.deleteNodes(g, Seq(202L, 1L).toDF("id"))
    assert(g.byLabel.nonEmpty, "deleteNodes must carry the label index")
    assertConsistent(g)
    // a labels-less batch appends label-free nodes: index untouched, still exact
    g = GraphMutations.createNodes(g, Seq((300L, "bare")).toDF("id", "name"))
    assert(g.byLabel.nonEmpty)
    assertConsistent(g)
    // SET-style mutations rewrite rows in place: the index must be DROPPED
    g = GraphMutations.setNodePropsByIds(g, Seq(200L).toDF("id"),
      Map("name" -> lit("renamed")))
    assert(g.byLabel.isEmpty, "SET must drop the label index (stale rows)")
    assertConsistent(g)
  }

  test("DETACH DELETE cascade + empty-match DELETE (the SNB DEL order)") {
    var g = fresh
    g = QueryEngine.executeWrite("CREATE (z:P {id: 999, name: 'z'})", g)._1
    g = QueryEngine.executeWrite(
      "MATCH (x:P {id: 1}), (z:P {id: 999}) CREATE (x)-[:L]->(z)", g)._1
    // DETACH DELETE removes the node and cascades the L edge
    g = QueryEngine.executeWrite("MATCH (z:P {id: 999}) DETACH DELETE z", g)._1
    assert(g.nodes.filter($"id" === 999L).count() == 0L)
    assert(g.edges.filter($"relationship" === "L").count() == 0L)
    // deleting the already-cascaded edge binds zero rows and succeeds
    val (g2, summary) = QueryEngine.executeWrite(
      "MATCH (x:P {id: 1})-[l:L]->(z:P {id: 999}) DELETE l", g)
    assert(summary.select("relationships_deleted").as[Long].head() == 0L)
    assert(g2.edges.count() == g.edges.count())
  }

  test("no codegen fallback: CODEGEN_ONLY survives coercion + constrained write chain") {
    // r11 verdict #3: the coerced-equality predicate used typeof(), whose
    // doGenCode in Spark 4.1.2 splices the type name into the generated
    // Java UNQUOTED; ConvertToLocalRelation compiles filter predicates
    // before constant folding, so every such predicate silently dropped to
    // interpreter mode ("WARN Predicate: Expr codegen error"). CODEGEN_ONLY
    // turns that silent fallback into a hard error — this test fails if
    // the defect class returns anywhere in the read or write chain.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val nodes = Seq((1L, Seq("P"), "a", true), (2L, Seq("P"), "b", false))
        .toDF("id", "labels", "name", "active")
      val g0 = PropertyGraph(nodes,
        Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "relationship"))
      val got = QueryEngine.execute(
        "MATCH (n:P) WHERE n.active = 'true' RETURN n.name AS nm", g0)
        .as[String].collect().toSet
      assert(got == Set("a"))
      val flipped = QueryEngine.execute(
        "MATCH (n:P) WHERE 'FALSE' = n.active RETURN n.name AS nm", g0)
        .as[String].collect().toSet
      assert(flipped == Set("b"))
      // constrained write chain: register, insert distinct, reject duplicate
      var g = QueryEngine.executeWrite(
        "CREATE CONSTRAINT ON (n:P) ASSERT n.name IS UNIQUE", g0)._1
      g = QueryEngine.executeWrite("CREATE (n:P {id: 3, name: 'c'})", g)._1
      assert(g.nodes.count() == 3L)
      intercept[IllegalStateException] {
        QueryEngine.executeWrite("CREATE (n:P {id: 4, name: 'a'})", g)
      }
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
