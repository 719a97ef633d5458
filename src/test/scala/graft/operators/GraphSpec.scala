package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: 200-node chain converges inside maxIter") {
    // a path graph is the worst case for one-hop min-label propagation
    // (O(diameter) rounds); pointer jumping must close it in O(log n) —
    // without jumping this would exhaust maxIter=20 and throw
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = ConnectedComponents.run(edges).as[(Long, Long)].collect()
    assert(labels.length === 200)
    assert(labels.forall(_._2 == 0L),
      s"chain is one component labeled by its min id: ${labels.take(5).toSeq}")
  }

  test("connected components: unconverged labels throw, never return") {
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(edges, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("pageRank on a known graph matches the hand-computed fixpoint") {
    // Classic 3-node example: A→B, A→C, B→C, C→A. Converged ranks
    // (d=0.85): A≈0.388, B≈0.215, C≈0.397 (normalized to sum 1).
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"))
      .toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 40)
      .as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6, s"ranks must sum to 1: $ranks")
    assert(math.abs(ranks("A") - 0.3878) < 0.001, s"A: ${ranks("A")}")
    assert(math.abs(ranks("B") - 0.2148) < 0.001, s"B: ${ranks("B")}")
    assert(math.abs(ranks("C") - 0.3974) < 0.001, s"C: ${ranks("C")}")
  }

  test("pageRank: dangling mass is redistributed — sinks don't leak rank") {
    // star: everyone points at 'hub'; 'hub' points nowhere (sink)
    val edges = Seq(("u1", "hub"), ("u2", "hub"), ("u3", "hub"))
      .toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 40)
      .as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"ranks must sum to 1 even with sinks: $ranks")
    assert(ranks("hub") > ranks("u1") * 3, s"hub must dominate: $ranks")
    assert(ranks("u1") === ranks("u2")) // symmetric spokes tie exactly
  }

  test("pageRank is deterministic across runs and partitionings") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    // user-interaction graph: consecutive events of the same type link users
    val edges = ev.select($"user_id".as("src"),
        (($"user_id" + $"event_id") % 50).as("dst"))
      .filter($"src" =!= $"dst")
    val r1 = Graph.pageRank(edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    val r2 = Graph.pageRank(edges.repartition(13), iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(r1.keySet === r2.keySet)
    r1.foreach { case (k, v) =>
      assert(math.abs(v - r2(k)) < 1e-12, s"vertex $k: $v vs ${r2(k)}")
    }
  }
}
