package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int = 3): Map[Long, Double] =
    Graph.pageRank(nodes.toDF("id"), edges.toDF("src", "dst"),
        "id", "src", "dst", iters = iters)
      .as[(Long, Double)].collect().toMap

  test("pageRank: directed ring stays uniform at 1/N") {
    val n = 6L
    val r = ranks(0L until n, (0L until n).map(i => i -> ((i + 1) % n)))
    assert(r.size == n)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-9, r))
  }

  test("pageRank: star center outranks leaves, isolated vertex holds teleport only") {
    // leaves 1..4 all point at 0; 0 points back at 1; 9 is isolated
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 0L -> 1L)
    val r = ranks(Seq(0L, 1L, 2L, 3L, 4L, 9L), edges)
    assert(r(0L) > r(1L) && r(1L) > r(2L))
    assert(r(2L) == r(3L) && r(3L) == r(4L)) // symmetric leaves tie exactly
    assert(math.abs(r(9L) - 0.15 / 6) < 1e-9) // no in-edges: teleport term
  }

  test("pageRank: total mass stays <= 1 and decreases only via dangling leak") {
    // 0->1, 1->2, 2 dangling: its mass is dropped by convention (a chain
    // ending in a dangling vertex sheds most of its mass in 3 rounds)
    val r = ranks(Seq(0L, 1L, 2L), Seq(0L -> 1L, 1L -> 2L))
    val total = r.values.sum
    assert(total <= 1.0 + 1e-12 && total > 0.0, total)
    // no dangling vertices -> mass conserved at exactly ~1
    val ring = ranks(0L until 4L, (0L until 4L).map(i => i -> ((i + 1) % 4)))
    assert(math.abs(ring.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: deep iteration counts (checkpointed lineage) still exact") {
    // 12 iterations crosses two localCheckpoint snapshots; a ring's
    // stationary distribution is uniform at every depth
    val n = 5L
    val r = ranks(0L until n, (0L until n).map(i => i -> ((i + 1) % n)),
      iters = 12)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-9, r))
  }

  test("pageRank observeDeltas: per-round max|delta| metrics fire, equal " +
      "the brute-force round-to-round diff, shrink toward convergence, " +
      "and leave the scores unchanged") {
    val nodes = Seq(0L, 1L, 2L, 3L, 4L)
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 0L -> 1L)
    val iters = 4
    val obs = (0 until iters).map(i =>
      org.apache.spark.sql.Observation(s"pr_round_$i"))
    val observed = Graph.pageRank(nodes.toDF("id"),
        edges.toDF("src", "dst"), "id", "src", "dst", iters = iters,
        observeDeltas = obs)
      .as[(Long, Double)].collect().toMap
    // observation never changes arithmetic
    val plain = ranks(nodes, edges, iters = iters)
    assert(observed === plain, "observe mode changed the scores")
    val deltas = obs.map(_.get("max_delta").asInstanceOf[Double])
    // brute force: max|r_i - r_{i-1}| from independent fixed-iter runs
    // (identical DECIMAL-exact chains, so equality is exact)
    val byIter = (0 to iters).map(i =>
      if (i == 0)
        nodes.map(_ -> 1.0 / nodes.size).toMap
      else ranks(nodes, edges, iters = i))
    val want = (1 to iters).map(i =>
      nodes.map(v => math.abs(byIter(i)(v) - byIter(i - 1)(v))).max)
    assert(deltas === want, s"observed $deltas, brute-force $want")
    assert(deltas.last < deltas.head,
      s"deltas must shrink toward convergence: $deltas")
  }

  test("knnHubness: in-degrees, hub and antihub flags") {
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L)
    val out = Graph.knnHubness(Seq(0L, 1L, 2L, 3L).toDF("id"),
        edges.toDF("src", "dst"), "id", "src", "dst", hubThreshold = 3)
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((3L, true, false)))
    assert(out(1L) == ((1L, false, false)))
    assert(out(2L) == ((0L, false, true)))
    assert(out(3L) == ((0L, false, true)))
  }

  test("personalizedPageRank: teleport mass lands only on seeds, a " +
      "component unreachable from the seeds scores zero, and uniform " +
      "seeds over ALL vertices reduce to plain pageRank") {
    import spark.implicits._
    // chain 0 -> 1 -> 2, plus an isolated pair 10 -> 11 (seed-free)
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L).toDF("id")
    val got = Graph.personalizedPageRank(nodes, edges, "id", "src", "dst",
        seeds = Seq(0L), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(got(10L) === 0.0 && got(11L) === 0.0,
      "seed-unreachable vertices must hold zero mass")
    assert(got(0L) > 0.0 && got(1L) > 0.0 && got(2L) > 0.0)
    assert(got(0L) > got(2L), "mass decays along the chain from the seed")
    val all = Seq(0L, 1L, 2L, 10L, 11L)
    val ppr = Graph.personalizedPageRank(nodes, edges, "id", "src", "dst",
        seeds = all, iters = 3)
      .as[(Long, Double)].collect().toMap
    val pr = Graph.pageRank(nodes, edges, "id", "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    all.foreach(v => assert(math.abs(ppr(v) - pr(v)) < 1e-12,
      s"uniform seeds must equal plain pageRank at v=$v"))
  }

  test("labelPropagation: two cliques over a thin bridge stay separate " +
      "communities, isolated vertices keep their own label") {
    import spark.implicits._
    // cliques {0,1,2} and {10,11,12}, bridge 2-10, isolated 99
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L).toDF("id")
    val got = Graph.labelPropagation(nodes, edges, "id", "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(got(99L) === 99L, "isolated keeps its own label")
    val a = Set(0L, 1L, 2L).map(got)
    val b = Set(10L, 11L, 12L).map(got)
    assert(a.size === 1 && b.size === 1, s"cliques must be uniform: $got")
    assert(a != b, s"the bridge must not merge the cliques: $got")
  }

  test("labelPropagation equals a synchronous driver-side replay with the " +
      "(count DESC, label ASC) rule on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val n = 40
    val und = (0 until 70).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val dir = und ++ und.map(_.swap)
    val nodes = (0 until n).map(_.toLong)
    val got = Graph.labelPropagation(nodes.toDF("id"), dir.toDF("src", "dst"),
        "id", "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    var labels = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val next = nodes.map { v =>
        val nb = dir.filter(_._2 == v).map(e => labels(e._1))
        if (nb.isEmpty) v -> labels(v)
        else {
          val counts = nb.groupBy(identity).map { case (l, o) => (l, o.size) }
          v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }.toMap
      labels = next
    }
    assert(got === labels)
  }

  test("localClustering: clique vertices score 1.0, path vertices 0, " +
      "direction/duplicates/self-loops collapse, isolated vertices report") {
    import spark.implicits._
    val vertices = (1L to 8L).toDF("id")
    // 4-clique {1,2,3,4}, path 5-6-7, isolated 8; noise: dup, reverse, loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (1L, 2L), (3L, 3L), // reverse dup, dup, self-loop
      (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val got = Graph.localClustering(vertices, edges, "id", "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    (1L to 4L).foreach { v =>
      assert(got(v) === ((3L, 3L, 1.0)), s"clique vertex $v")
    }
    assert(got(5L) === ((1L, 0L, 0.0)))
    assert(got(6L) === ((2L, 0L, 0.0)), "degree-2 path center has no triangle")
    assert(got(8L) === ((0L, 0L, 0.0)), "isolated vertex still reports")
  }

  test("localClustering equals brute force on a random graph; plan has no " +
      "window and no cartesian") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 14
    val und = (for {
      a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
    } yield (a.toLong, b.toLong)).toSet
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def wantTri(v: Long): Long = {
      val nb = adj.getOrElse(v, Set.empty).toSeq
      (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if und.contains((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
      } yield 1).size.toLong
    }
    val df = Graph.localClustering((1L to n.toLong).toDF("id"),
      und.toSeq.toDF("src", "dst"), "id", "src", "dst")
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to n.toLong).foreach { v =>
      val d = adj.getOrElse(v, Set.empty).size.toLong
      assert(got(v) === ((d, wantTri(v))), s"vertex $v")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
  }

  test("kCore: tail peels off a triangle, a chain cascades to empty, " +
      "direction/duplicates collapse, overrun fails loudly") {
    import spark.implicits._
    // triangle {1,2,3} + tail 4-1; duplicate and reversed edges planted
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id") // 5 is isolated
    val core = Graph.kCore(nodes, tri, "id", "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "tail vertex 4 and isolate 5 peel; triangle keeps degree 2")
    // chain a-b-c at k=2: ends peel, then the middle cascades
    val chain = Seq((10L, 11L), (11L, 12L)).toDF("src", "dst")
    val chainNodes = Seq(10L, 11L, 12L).toDF("id")
    assert(Graph.kCore(chainNodes, chain, "id", "src", "dst", k = 2)
      .count() === 0L)
    // an 8-path needs 4 peeling rounds at k=2 — a 2-round bound throws
    val path = (0L until 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val pathNodes = (0L until 8L).toDF("id")
    val err = intercept[IllegalStateException] {
      Graph.kCore(pathNodes, path, "id", "src", "dst", k = 2, maxRounds = 2)
    }
    assert(err.getMessage.contains("did not converge"), err.getMessage)
  }

  test("neighborhoodFunction: exact counts on a hand path graph (linear " +
      "counting is exact for balls far below 2^p) and convergence once " +
      "every ball is the component") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val got = Graph.neighborhoodFunction(nodes, edges, "id", "src", "dst",
        rounds = 3, p = 12)
      .as[(Int, Long)].collect().sortBy(_._1)
    // balls: t=1 -> {1,2},{1,2,3},{2,3} = 7; t>=2 -> 3x3 = 9
    assert(got === Array((0, 3L), (1, 7L), (2, 9L), (3, 9L)))
  }

  test("neighborhoodFunction: tracks true BFS reachable-pair counts on a " +
      "random sparse graph (monotone, N(0)=|V|, small-ball exactness " +
      "regime within 15%)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val n = 25
    val edges = (0 until 40).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val nodes = (0L until n.toLong).toDF("id")
    val got = Graph.neighborhoodFunction(nodes, edges.toDF("src", "dst"),
        "id", "src", "dst", rounds = 3, p = 12)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.head === n.toLong, "N(0) must be |V|")
    assert(got.sliding(2).forall(w => w(0) <= w(1)), "N(t) must be monotone")
    // true reachable-pair counts by BFS
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def truth(rounds: Int): Long = (0L until n.toLong).map { v =>
      var ball = Set(v)
      (1 to rounds).foreach { _ =>
        ball = ball ++ ball.flatMap(w => adj.getOrElse(w, Set.empty))
      }
      ball.size.toLong
    }.sum
    (0 to 3).foreach { t =>
      val tv = truth(t)
      assert(math.abs(got(t) - tv) <= math.max(1L, (0.15 * tv).toLong),
        s"round $t: estimate ${got(t)} vs true $tv")
    }
  }

  test("kTruss: triangle survives / pendant drops, shared-edge supports, " +
      "cascade to empty, k=2 keeps 0-support edges, dup/direction collapse, " +
      "overrun throws") {
    import spark.implicits._
    // two triangles sharing edge (2,3), plus a pendant (3,5); duplicates
    // and reversed copies must collapse
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L), (2L, 4L), (3L, 4L),
      (3L, 5L), (5L, 3L), (2L, 2L))
      .toDF("src", "dst")
    val t3 = Graph.kTruss(edges, "src", "dst", k = 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(t3 === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L,
      (2L, 4L) -> 1L, (3L, 4L) -> 1L), s"3-truss: $t3")
    // 4-truss: only (2,3) has support 2, but alone it closes nothing —
    // the peel cascades to empty
    assert(Graph.kTruss(edges, "src", "dst", k = 4).count() === 0L)
    // k=2 (support >= 0): every simple edge survives, pendant at 0
    val t2 = Graph.kTruss(edges, "src", "dst", k = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(t2((3L, 5L)) === 0L && t2.size === 6)
    intercept[IllegalStateException] {
      Graph.kTruss(edges, "src", "dst", k = 3, maxRounds = 1)
    }
  }

  test("effectiveDiameter: internally consistent with the neighborhood " +
      "function it reads (discrete alpha-quantile)") {
    // path a-b-c-d: NF grows 4 -> 10 -> 14 -> 16 over 3 rounds
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val nf = Graph.neighborhoodFunction(nodes, edges, "id", "src", "dst",
        rounds = 3)
      .as[(Int, Long)].collect().toMap
    val fin = nf(3)
    for (alpha <- Seq(0.5, 0.8, 0.9, 1.0)) {
      val got = Graph.effectiveDiameter(nodes, edges, "id", "src", "dst",
          rounds = 3, alpha = alpha)
        .as[(Int, Long, Double)].head()
      val want = (0 to 3).filter(t => nf(t).toDouble >= alpha * fin).min
      assert(got === ((want, fin, alpha)), s"alpha=$alpha nf=$nf")
    }
    // NF is monotone and the sketch is effectively exact on 4 nodes
    assert(nf(0) === 4L && nf(3) > nf(0))
  }
}
