package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Graph analytics over edge lists the engine itself produces (the
 * [[Similarity.knnGraph]] neighbor structure, duplicate-cluster adjacency):
 * centrality for corpus curation — "which documents/vectors sit in the
 * dense core of the similarity graph" is a standard data-selection and
 * embedding-QA signal (PageRank: Page et al. 1999; hubness: Radovanović
 * et al. 2010, see PAPERS.md).
 *
 * Scale posture:
 *  - Everything is edge-list relational — equi-joins and hash aggregates
 *    keyed on vertex id, never adjacency matrices or per-vertex windows.
 *  - One rank iteration = one join of the (skinny) rank frame with the
 *    degree-annotated edge list + one hash aggregate on the destination —
 *    the same shuffle shape GraphX's Pregel uses, expressed as DataFrames
 *    so Catalyst/AQE handle skew and partial aggregation.
 *  - The degree-annotated edge list is reused by every iteration, so it is
 *    materialized ONCE instead of recomputed per round (the d06/d08
 *    lesson: multiply-referenced lazy subtrees re-execute). Every loop
 *    here materializes through [[graft.pipeline.RoundSnapshots]]:
 *    `localCheckpoint` by default; pass `checkpointDir` for durable
 *    parquet rounds that survive executor loss on a real cluster (the
 *    [[Dedup.clusterAssignments]] contract — superseded rounds are
 *    deleted as the loop advances; consume the result, then remove the
 *    directory).
 */
object Graph {

  /** Damped PageRank over an explicit vertex + edge list, fixed iteration
    * count, EXACT-replayable arithmetic.
    *
    * r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u)
    *
    * Summation over in-edges routes through DECIMAL(28,10) (order-free,
    * exact) so an oracle replays bit-for-bit; every other step is a
    * deterministic IEEE double op. Conventions an oracle must mirror:
    * vertices with no in-edges hold only the teleport term; mass flowing
    * out of dangling vertices (no out-edges) is NOT redistributed — scores
    * are comparative weights, not a normalized distribution. N is the
    * vertex count, collected once at plan time (a single bounded scalar,
    * the sanctioned model-fitting collect).
    *
    * Output: (idCol, score) — one row per vertex in `nodes`.
    */
  def pageRank(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None,
      observeDeltas: Seq[org.apache.spark.sql.Observation] = Nil): DataFrame = {
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one vertex")
    rankLoop(nodes, edges, idCol, srcCol, dstCol, iters, damping,
      initScore = lit(1.0 / n.toDouble),
      teleportScore = lit((1.0 - damping) / n.toDouble),
      checkpointDir = checkpointDir, observeDeltas = observeDeltas)
  }

  /** Personalized PageRank: the teleport mass lands ONLY on the `seeds`
    * (uniformly) instead of uniformly on all vertices — "similar to
    * THESE documents via the graph", the random-walk-with-restart
    * relevance diffusion used for seed-based corpus expansion. Same
    * arithmetic conventions as [[pageRank]] (DECIMAL in-edge summation,
    * dangling mass not redistributed); `seeds` is plan-time literal
    * state, bounded by contract (it becomes an `isin` predicate).
    * Output: (idCol, score).
    */
  def personalizedPageRank(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String, seeds: Seq[Long],
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    require(seeds.distinct.size == seeds.size, "seeds must be distinct")
    val isSeed = col(idCol).isin(seeds: _*)
    rankLoop(nodes, edges, idCol, srcCol, dstCol, iters, damping,
      initScore = when(isSeed, lit(1.0 / seeds.size)).otherwise(lit(0.0)),
      teleportScore =
        when(isSeed, lit((1.0 - damping) / seeds.size)).otherwise(lit(0.0)),
      checkpointDir = checkpointDir)
  }

  /** Convergence observability (the round-justifies-`iters` readout): a
    * caller passing one [[org.apache.spark.sql.Observation]] per round
    * (`observeDeltas.length >= iters`) gets, after consuming the
    * result, each round's `max_delta` = max_v |r_t(v) − r_{t−1}(v)| —
    * free metrics riding the round's own materialization, no extra
    * aggregation job. In observe mode every round snaps eagerly (the
    * action the metric needs; it also makes the carried previous-score
    * frame cheap to reference twice) — values are unchanged, the
    * default no-observation plan is untouched.
    */
  private def rankLoop(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iters: Int, damping: Double,
      initScore: Column, teleportScore: Column,
      checkpointDir: Option[String],
      observeDeltas: Seq[org.apache.spark.sql.Observation] = Nil): DataFrame = {
    require(observeDeltas.isEmpty || observeDeltas.length >= iters,
      s"need one Observation per round: got ${observeDeltas.length} for " +
        s"$iters iterations")
    // per-round materialization through the shared RoundSnapshots:
    // localCheckpoint by default, durable parquet rounds (executor-loss
    // safe) when checkpointDir is set — see [[graft.pipeline.RoundSnapshots]]
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val deg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("__deg"))
    // degree-annotated edges: referenced once per iteration — materialize
    // (skinny: src, dst, deg) so iterations don't recompute the join; the
    // RESULT frame reads it (the last iteration is lazy), so it stays
    val contrib = snaps.snap(edges.select(col(srcCol), col(dstCol))
      .join(deg, srcCol), "contrib").df

    var ranks = nodes.select(col(idCol), initScore.as("score"))
    val rankRoll = snaps.roll("ranks")
    for (i <- 0 until iters) {
      val inflow = contrib
        .join(ranks.select(col(idCol).as(srcCol), col("score")), srcCol)
        .select(col(dstCol).as(idCol),
          (col("score") / col("__deg")).cast(DecimalType(28, 10)).as("__c"))
        .groupBy(col(idCol)).agg(sum(col("__c")).as("__m"))
      val newScore =
        (teleportScore +
          lit(damping) * coalesce(col("__m").cast("double"), lit(0.0)))
          .as("score")
      if (observeDeltas.isEmpty) {
        ranks = nodes.select(col(idCol))
          .join(inflow, Seq(idCol), "left")
          .select(col(idCol), newScore)
        // deep runs: snap the (skinny) rank frame every few rounds so the
        // lineage stays shallow — an unbroken chain of N join+agg layers
        // overwhelms the planner the same way the d06 label frames did.
        // Values are unchanged; materialization is not arithmetic. Once the
        // next snapshot is eagerly materialized the previous one is dead —
        // the roll frees it (the covarianceModel rule: superseded snapshots
        // must not sit in storage for the driver's lifetime)
        if ((i + 1) % 5 == 0 && i != iters - 1)
          ranks = rankRoll.advance(ranks)
      } else {
        // observe mode: the round's frame carries the previous score so
        // max|Δ| computes inside the round's own materialization; using
        // ranks (a per-round snapshot here) as the left side keeps the
        // vertex set identical to `nodes`
        val withDelta = ranks
          .select(col(idCol), col("score").as("__prev"))
          .join(inflow, Seq(idCol), "left")
          .select(col(idCol), newScore, col("__prev"))
          .observe(observeDeltas(i),
            max(abs(col("score") - col("__prev"))).as("max_delta"))
        ranks = rankRoll.advance(withDelta.select(col(idCol), col("score")))
      }
    }
    ranks
  }

  /** In-degree / hubness profile of a directed kNN graph: per vertex, how
    * many OTHER vertices chose it as a neighbor. In high dimensions the
    * in-degree distribution skews — a few "hub" vectors appear in
    * everyone's neighbor list (and drag retrieval quality), while
    * "antihubs" appear in nobody's. Integer-exact, one hash aggregate +
    * one left join; no floats cross the output boundary.
    *
    * Output: (idCol, in_degree, is_hub, is_antihub).
    */
  def knnHubness(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      hubThreshold: Int): DataFrame = {
    val indeg = edges.groupBy(col(dstCol).as(idCol))
      .agg(count(lit(1)).as("in_degree"))
    nodes.select(col(idCol))
      .join(indeg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .select(col(idCol), col("in_degree"),
        (col("in_degree") >= hubThreshold).as("is_hub"),
        (col("in_degree") === 0L).as("is_antihub"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007, see PAPERS.md) with a DETERMINISTIC update rule — the classic
    * randomized tie-break would never replay: every vertex starts
    * labeled with its own id; each round, simultaneously, a vertex
    * adopts the most frequent label among its in-neighbors (`src → dst`
    * messages — pass a symmetrized edge list for undirected semantics),
    * ties broken by SMALLEST label; isolated vertices keep their label.
    * Fixed `iters` rounds (no convergence test — replayable and
    * bounded); unlike the connected-components closure
    * ([[Dedup.clusterAssignments]]) LPA keeps densely-linked groups
    * apart even when thin bridges join them.
    *
    * Scale posture: one round = ONE equi-join of the skinny label frame
    * with the edge list + ONE (vertex, label) count aggregate + ONE
    * per-vertex argmax (`max(struct(count, -label))` — a hash aggregate,
    * never a per-vertex window), all map-side combined. Labels are
    * checkpointed per round so lineage stays flat (the d06 lesson).
    * Integer-exact throughout — engines cannot disagree.
    *
    * Output: (idCol, label).
    */
  def labelPropagation(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iters: Int = 3, checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "need at least one round")
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val eSnap = snaps.snap(edges.select(col(srcCol), col(dstCol)), "edges")
    val e = eSnap.df
    val labelRoll = snaps.roll("labels")
    var labels = labelRoll.advance(
      nodes.select(col(idCol), col(idCol).cast("long").as("label")))
    for (_ <- 1 to iters) {
      val msgs = e.join(
          labels.select(col(idCol).as(srcCol), col("label")), srcCol)
        .select(col(dstCol), col("label"))
      val counts = msgs.groupBy(col(dstCol), col("label"))
        .agg(count(lit(1)).as("__c"))
      val best = counts.groupBy(col(dstCol))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__b"))
        .select(col(dstCol).as(idCol), (-col("__b.__nl")).as("__new"))
      labels = labelRoll.advance(labels.join(best, Seq(idCol), "left")
        .select(col(idCol), coalesce(col("__new"), col("label")).as("label")))
    }
    // the result IS the final label snapshot — the edge frame is dead
    snaps.free(eSnap)
    labels
  }

  /** k-core decomposition membership (Seidman 1983): the maximal
    * subgraph in which every vertex keeps degree ≥ `k` of the
    * UNDIRECTED simple graph induced by `edges` (direction, duplicate
    * edges and self-loops collapse). On a kNN similarity graph the
    * k-core is the "dense interior" — the data-selection region where
    * every member is mutually embedded in a tight neighborhood, and its
    * complement is the noise/outlier shell the curriculum samples last.
    * Computed by the standard peeling fixpoint: repeatedly delete
    * vertices whose remaining degree is < k until a round deletes
    * nothing. Output: (idCol, core_degree) — the members with their
    * within-core degree; non-members are absent.
    *
    * Plan shape (100 TB posture): per round TWO left-semi joins
    * (restrict the edge list to live endpoints — skinny vertex ids
    * move, never payloads) + ONE hash aggregate (degrees, map-side
    * combined) + one count action; the live set checkpoints per round
    * so lineage stays flat (the Pregel shape every iterative operator
    * here uses). Peeling converges in at most the graph's degeneracy
    * ordering depth; `maxRounds` bounds the walk and the operator FAILS
    * LOUDLY if the fixpoint has not landed by then (an oracle replaying
    * a fixed unroll depth would silently diverge otherwise — and at
    * corpus scale an unconverged peel means the graph is pathological,
    * which the caller must hear about, not average over).
    */
  def kCore(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 30,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, "need at least one peeling round")
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).cast("long").as("__a"),
        col(dstCol).cast("long").as("__b"))
    val sym = snaps.snap(und
      .unionByName(und.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct(), "edges").df
    // keep = 1: the RESULT joins the final live set against the last
    // round's degree frame, which lazily reads the round-START live set —
    // the previous snapshot must outlive the loop
    val aliveRoll = snaps.roll("alive", keep = 1)
    var alive = aliveRoll.advance(
      nodes.select(col(idCol).cast("long").as("__v")).distinct())
    var aliveCount = alive.count()
    var rounds = 0
    var degrees: DataFrame = null
    var converged = false
    while (!converged) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"k-core peeling did not converge within $maxRounds rounds " +
            s"($aliveCount vertices still live) — raise maxRounds")
      val liveEdges = sym
        .join(alive.select(col("__v").as("__a")), Seq("__a"), "left_semi")
        .join(alive.select(col("__v").as("__b")), Seq("__b"), "left_semi")
      degrees = liveEdges.groupBy(col("__a"))
        .agg(count(lit(1)).as("__d"))
      val next = aliveRoll.advance(degrees.filter(col("__d") >= k)
        .select(col("__a").as("__v")))
      val n = next.count()
      converged = n == aliveCount
      alive = next
      aliveCount = n
      rounds += 1
    }
    alive.join(degrees.select(col("__a").as("__v"), col("__d")),
        Seq("__v"), "left")
      .select(col("__v").as(idCol),
        coalesce(col("__d"), lit(0L)).as("core_degree"))
  }

  /** Per-vertex triangle count and local clustering coefficient
    * C(v) = 2·T(v) / (deg(v)·(deg(v)−1)) over the UNDIRECTED simple
    * graph induced by `edges` (direction and duplicate edges collapse;
    * self-loops drop). The embedding-QA reading on a kNN graph: high
    * coefficient = tight cluster neighborhoods, low = hub-like or noisy
    * regions. Every vertex of `vertices` reports (degree 0 ⇒ 0
    * triangles, coefficient 0.0 — also when degree is 1, where the
    * coefficient is undefined and conventionally 0).
    *
    * Plan shape (100 TB posture): the degree-ORDERED orientation
    * (Schank–Wagner forward algorithm, see PAPERS.md) — each undirected
    * edge points from its (degree, id)-smaller endpoint to the larger —
    * bounds every vertex's out-degree by O(√m) on arbitrary graphs, so
    * the wedge self-join (the only super-linear step) is
    * Σ outdeg(v)² = O(m^1.5) worst-case instead of the Σ deg(v)² a hot
    * hub would cost unoriented; each triangle materializes exactly once
    * (its orientation-minimal wedge), closed by ONE left-semi equi-join,
    * and per-vertex counts are one explode + hash aggregate. No window,
    * no cartesian.
    */
  def localClustering(vertices: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String, dstCol: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .distinct()
    val deg = und.select(col("__a").as("__v"))
      .unionAll(und.select(col("__b").as("__v")))
      .groupBy("__v").agg(count(lit(1)).as("__d"))
    val keyed = und
      .join(deg.select(col("__v").as("__a"), col("__d").as("__da")), "__a")
      .join(deg.select(col("__v").as("__b"), col("__d").as("__db")), "__b")
    val aFirst = struct(col("__da"), col("__a")) <
      struct(col("__db"), col("__b"))
    // oriented edge u -> v with v's orientation key carried for wedge
    // dedup; materialized — reused 3x below (the d06/d08 lesson), durable
    // under checkpointDir like every other loop/scratch snapshot
    val o = snaps.snap(keyed.select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("__u"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("__v"),
        when(aFirst,
            struct(col("__db").as("d"), col("__b").as("v")))
          .otherwise(struct(col("__da").as("d"), col("__a").as("v")))
          .as("__kv")), "oriented").df
    val wedges = o.select(col("__u"), col("__v").as("__x"), col("__kv").as("__kx"))
      .join(o.select(col("__u"), col("__v").as("__y"), col("__kv").as("__ky")),
        Seq("__u"))
      .filter(col("__kx") < col("__ky"))
      .select("__u", "__x", "__y")
    val tri = wedges.join(
      o.select(col("__v").as("__y"), col("__u").as("__x")),
      Seq("__x", "__y"), "left_semi")
    val perNode = tri
      .select(explode(array(col("__u"), col("__x"), col("__y"))).as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__t"))
    vertices.select(col(idCol))
      .join(deg.select(col("__v").as(idCol), col("__d")), Seq(idCol), "left")
      .join(perNode.select(col("__v").as(idCol), col("__t")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__d"), lit(0L)).as("degree"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"),
        when(coalesce(col("__d"), lit(0L)) >= 2,
          round(lit(2.0) * coalesce(col("__t"), lit(0L)) /
            (col("__d") * (col("__d") - lit(1L))), 6) + lit(0.0))
          .otherwise(lit(0.0)).as("clustering_coef"))
  }

  /** HyperBall neighborhood function (Boldi & Vigna, 2013 — the method
    * behind the published web/social-graph distance distributions): per
    * round t, every vertex's HLL sketch absorbs its neighbors' round
    * t−1 sketches, so sketch(v, t) approximates |ball(v, t)| — the
    * vertices within t hops — and N(t) = Σ_v |ball(v, t)| is the
    * reachable-pair count whose growth curve yields the effective
    * diameter. THE example of a computation that is only feasible at
    * scale as a sketch: exact balls are quadratic state, a 2^p-byte
    * register array per vertex is constant.
    *
    * Determinism/oracle: sketches are Mix64-register HLLs
    * ([[graft.functions.HllOps]]) — register-wise max is order-free, the
    * estimate's register fold is integer-exact, and its one `ln` +
    * divisions follow the shared libm convention, so an oracle that
    * recomputes the TRUE ball member sets relationally and replays the
    * register/estimate arithmetic reproduces every count bit-for-bit
    * (`s37`). For balls far smaller than √(2^p·…) the estimate rounds to
    * the EXACT count (linear counting), spec-pinned on hand graphs.
    *
    * Plan shape (100 TB posture): the Pregel shape — per round ONE
    * equi-join of the symmetrized skinny edge list with the (v, sketch)
    * frame + ONE map-side-combined hll_merge aggregate, checkpointed per
    * round (flat lineage); per-round totals are single scalar aggregates
    * of LONG per-vertex estimates (no double summation anywhere). State
    * per round: one 2^p-byte sketch per vertex.
    *
    * Output: (round, n_pairs) for t = 0..rounds — N(0) = |V|.
    */
  def neighborhoodFunction(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      rounds: Int, p: Int = 12,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, "need at least one expansion round")
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).cast("long").as("__a"),
        col(dstCol).cast("long").as("__b"))
    val symSnap = snaps.snap(und
      .unionByName(und.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct(), "edges")
    val sym = symSnap.df
    val curRoll = snaps.roll("sketches")
    var cur = curRoll.advance(
      nodes.select(col(idCol).cast("long").as("__v")).distinct()
        .select(col("__v"),
          GraftFunctions.hll_init(col("__v"), p).as("__sk")))
    def total(t: Int): DataFrame =
      cur.agg(sum(GraftFunctions.hll_card(col("__sk"), p)).as("n_pairs"))
        .select(lit(t).cast("int").as("round"), col("n_pairs"))
    // the growing (round, n_pairs) frame snapshots per round too — tiny,
    // but it lazily reads the round's sketch frame, and materializing it
    // is what lets the SUPERSEDED sketch rounds be freed as the loop
    // advances instead of all being pinned until the caller consumes
    val outRoll = snaps.roll("totals")
    var out = outRoll.advance(total(0))
    var t = 1
    while (t <= rounds) {
      val contrib = sym
        .join(cur.select(col("__v").as("__b2"), col("__sk")),
          col("__b") === col("__b2"))
        .select(col("__a").as("__v"), col("__sk"))
      cur = curRoll.advance(cur.unionByName(contrib)
        .groupBy(col("__v"))
        .agg(GraftFunctions.hll_merge(col("__sk"), p).as("__sk")))
      out = outRoll.advance(out.unionByName(total(t)))
      t += 1
    }
    // the result IS the final totals snapshot — sketches and edges are dead
    curRoll.close()
    snaps.free(symSnap)
    out
  }

  /** Per-edge triangle support over a canonical (`__a` < `__b`) distinct
    * edge frame — every live edge with the number of triangles it closes
    * inside the frame (edges in no triangle report 0). The
    * [[localClustering]] machinery re-targeted at edges: degree-ordered
    * orientation (Schank–Wagner) bounds the wedge self-join by O(m^1.5),
    * each triangle materializes once, then explodes into its three
    * canonical edges for ONE hash-aggregated count, left-joined back so
    * zero-support edges stay visible.
    */
  private def edgeSupport(live: DataFrame,
      snap: DataFrame => DataFrame): DataFrame = {
    val deg = live.select(col("__a").as("__v"))
      .unionAll(live.select(col("__b").as("__v")))
      .groupBy("__v").agg(count(lit(1)).as("__d"))
    val keyed = live
      .join(deg.select(col("__v").as("__a"), col("__d").as("__da")), "__a")
      .join(deg.select(col("__v").as("__b"), col("__d").as("__db")), "__b")
    val aFirst = struct(col("__da"), col("__a")) <
      struct(col("__db"), col("__b"))
    val o = snap(keyed.select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("__u"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("__v"),
        when(aFirst, struct(col("__db").as("d"), col("__b").as("v")))
          .otherwise(struct(col("__da").as("d"), col("__a").as("v")))
          .as("__kv"))) // reused 3x (wedges twice + closure)
    val wedges = o.select(col("__u"), col("__v").as("__x"),
        col("__kv").as("__kx"))
      .join(o.select(col("__u"), col("__v").as("__y"),
        col("__kv").as("__ky")), "__u")
      .filter(col("__kx") < col("__ky"))
    // kx < ky ⇒ the closing edge (if present) is oriented x → y
    val tris = wedges.join(
      o.select(col("__u").as("__x"), col("__v").as("__y")),
      Seq("__x", "__y"), "left_semi")
    val counts = tris.select(explode(array(
        struct(least(col("__u"), col("__x")).as("a"),
          greatest(col("__u"), col("__x")).as("b")),
        struct(least(col("__u"), col("__y")).as("a"),
          greatest(col("__u"), col("__y")).as("b")),
        struct(least(col("__x"), col("__y")).as("a"),
          greatest(col("__x"), col("__y")).as("b")))).as("__e"))
      .select(col("__e.a").as("__a"), col("__e.b").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    live.join(counts, Seq("__a", "__b"), "left")
      .select(col("__a"), col("__b"), coalesce(col("__c"), lit(0L)).as("__s"))
  }

  /** k-truss decomposition (Cohen 2008): the maximal subgraph in which
    * every edge closes at least k−2 triangles WITHIN the subgraph — the
    * edge-strength analogue of [[kCore]] (a k-truss is a subgraph of the
    * (k−1)-core, but strictly tighter: it prunes bridge edges between
    * dense regions that degree alone keeps). On a kNN graph this is the
    * community-backbone extractor: surviving edges connect vectors whose
    * neighborhoods genuinely interlock.
    *
    * Peeling: rounds of [[edgeSupport]] + drop-below-(k−2) until the edge
    * set is a fixpoint; FAILS LOUDLY past `maxRounds` (the s36
    * convention — silent divergence from the oracle is the one
    * unacceptable outcome). Per round the only super-linear step is the
    * degree-ordered wedge join (O(m^1.5) worst case); edges live as
    * skinny (long, long) rows, checkpointed per round to truncate
    * lineage. Direction and duplicate edges collapse; self-loops drop.
    *
    * Output: (srcCol, dstCol, support) for surviving canonical
    * (src < dst) edges with their converged support.
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxRounds >= 1, "need at least one peeling round")
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    // keep = 1 on both rolls: the RESULT joins the final live set against
    // the last round's support frame, which lazily reads that round's
    // INPUT live set and its oriented-edge scratch frame
    val liveRoll = snaps.roll("live", keep = 1)
    val orientRoll = snaps.roll("oriented", keep = 1)
    var live = liveRoll.advance(edges.filter(col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("__a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("__b"))
      .distinct())
    var liveCount = live.count()
    var support: DataFrame = null
    var converged = false
    var rounds = 0
    while (!converged) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"k-truss peeling did not converge within $maxRounds rounds " +
            s"($liveCount edges still live) — raise maxRounds")
      support = edgeSupport(live, orientRoll.advance)
      val next = liveRoll.advance(support.filter(col("__s") >= k - 2)
        .select("__a", "__b"))
      val n = next.count()
      converged = n == liveCount
      live = next
      liveCount = n
      rounds += 1
    }
    live.join(support, Seq("__a", "__b"))
      .select(col("__a").as(srcCol), col("__b").as(dstCol),
        col("__s").as("support"))
  }

  /** Effective diameter at quantile `alpha` (Boldi & Vigna's HyperBall
    * readout, see PAPERS.md): the smallest round t whose neighborhood
    * function reaches alpha × N(rounds) — "within how many hops are
    * alpha of all reachable pairs". DISCRETE variant (no inter-round
    * interpolation): the readout is an integer hop count, replayable
    * exactly; the continuous interpolation adds nothing a threshold
    * consumer uses. Cost: [[neighborhoodFunction]]'s rounds + a
    * (rounds+1)-row readout — one broadcast scalar attach, one filter,
    * one min. Output: ONE row (eff_diameter, nf_final, alpha).
    */
  def effectiveDiameter(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      rounds: Int, p: Int = 12, alpha: Double = 0.9,
      checkpointDir: Option[String] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val nf = neighborhoodFunction(nodes, edges, idCol, srcCol, dstCol,
      rounds, p, checkpointDir)
    val fin = nf.filter(col("round") === rounds)
      .select(col("n_pairs").as("__final"))
    nf.crossJoin(broadcast(fin))
      .filter(col("n_pairs").cast("double") >=
        lit(alpha) * col("__final").cast("double"))
      .agg(min(col("round")).as("eff_diameter"),
        max(col("__final")).as("nf_final"))
      .select(col("eff_diameter"), col("nf_final"),
        lit(alpha).as("alpha"))
  }
}
