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

  test("bfsDepth assigns exact hop distances and stops at maxDepth") {
    // chain 0-1-2-3-4-5 plus a shortcut 0-3: depth(3) must be 1 (via the
    // shortcut, not 3 via the chain), and 5 (chain distance 3) is cut off
    // by maxDepth=2
    val chain = (0L until 5L).map(i => (i, i + 1)) :+ (0L, 3L)
    val edges = chain.toDF("src", "dst")
    val sym = edges.union(edges.select($"dst", $"src"))
    val seeds = Seq(0L).toDF("id")
    val got = Graph.bfsDepth(sym, seeds, maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2),
      s"shortest-hop map wrong: $got")
  }

  test("bfsDepth early-exits on a drained frontier and is " +
    "partitioning-invariant") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    // component {3,4} unreachable; maxDepth generous — loop must drain
    val r1 = Graph.bfsDepth(edges, seeds, maxDepth = 10)
      .as[(Long, Int)].collect().toMap
    assert(r1 === Map(1L -> 0, 2L -> 1), s"unreachable leaked in: $r1")
    val r2 = Graph.bfsDepth(edges.repartition(7), seeds, maxDepth = 10)
      .as[(Long, Int)].collect().toMap
    assert(r1 === r2)
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
