package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`) — brute-force
 * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
 * variant as the 100 TB scale path (Charikar 2002 / Indyk-Motwani; see
 * PAPERS.md).
 *
 * Scale posture:
 *  - Brute force broadcasts the (small) query set and scans the corpus ONCE
 *    — a map-side cross product with no corpus shuffle, then a per-query
 *    top-k. Right answer when |queries| is small; cost is O(|corpus|·|Q|).
 *  - LSH path buckets corpus AND queries by hyperplane-sign signatures so
 *    each query only scores vectors in its (multi-probe) buckets — the join
 *    is keyed on signatures, degree bounded by bucket size, never n².
 *  - The dot-product kernel is [[graft.functions.DotProduct]] — a codegen'd
 *    Catalyst expression, no UDF, no per-row boxing.
 */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplanes: component j of plane
    * i derives from Mix64 — reproducible across runs/executors, no RNG
    * state. Values in [-1, 1).
    */
  private[graft] def hyperplane(i: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      val h = graft.functions.Mix64.mix((i.toLong << 32) ^ j.toLong ^ 0x9E3779B97F4A7C15L)
      (h.toDouble / Long.MaxValue.toDouble).toFloat
    }

  def cosine(a: Column, b: Column): Column = {
    val dot = GraftFunctions.dot_product(a, b)
    val na = sqrt(GraftFunctions.dot_product(a, a))
    val nb = sqrt(GraftFunctions.dot_product(b, b))
    dot / (na * nb)
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` MUST be small (it is broadcast).
    * Output: (queryId, vecId, cosine, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame =
    broadcastCosineTopK(corpus,
      queries.select(col(queryId), col(queryVec).as("__qv")),
      corpusId, corpusVec, queryId, k, pairFilter = None)

  /** Shared broadcast-scan shape of [[bruteForceTopK]] and
    * [[hardNegatives]]: one corpus scan against a broadcast query set
    * (`__qv` = query vector, plus any columns `pairFilter` needs), the
    * optional pre-rank pair predicate, the null-cosine guard
    * (mismatched-dim vectors excluded — a truncated dot product would be
    * a silent-wrong cosine), then the bounded top-k heap.
    */
  private def broadcastCosineTopK(
      corpus: DataFrame, preparedQueries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, k: Int,
      pairFilter: Option[Column]): DataFrame = {
    val joined = corpus.crossJoin(broadcast(preparedQueries))
    val filtered = pairFilter.map(joined.filter).getOrElse(joined)
    val scored = filtered.select(
      col(queryId), col(corpusId),
      cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, queryId, corpusId, k)
  }

  /** Hard-negative mining for contrastive training: per query, the k MOST
    * similar corpus vectors whose label differs from the query's — the
    * negatives that actually move an InfoNCE-style loss. Same broadcast +
    * bounded-heap shape as [[bruteForceTopK]], with the label-mismatch
    * filter applied BEFORE ranking (so negatives never crowd out of the
    * heap). At banked-corpus scale, swap the broadcast cross product for
    * the [[lshTopK]]/[[ivfTopK]] candidate generation and keep the same
    * filter + heap.
    * Output: (queryId, corpusId, cosine, rank).
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, corpusLabel: String,
      queryId: String, queryVec: String, queryLabel: String,
      k: Int): DataFrame =
    broadcastCosineTopK(corpus,
      queries.select(col(queryId), col(queryVec).as("__qv"),
        col(queryLabel).as("__ql")),
      corpusId, corpusVec, queryId, k,
      pairFilter = Some(col(corpusLabel) =!= col("__ql")))

  /** [[hardNegatives]] at banked-corpus scale: the same label-mismatch
    * contract over IVF candidate generation instead of the broadcast
    * cross product — per query only the probed lists' vectors are scored,
    * so cost is O(|corpus|·nprobe/numCentroids·|Q|) and the corpus never
    * broadcasts. The mismatch filter applies INSIDE the probed lists,
    * before the heap (negatives never crowd out — the [[hardNegatives]]
    * posture). At full probe (nprobe = numCentroids) the candidate set is
    * the whole corpus and the result is EXACTLY [[hardNegatives]]
    * (s40 gates this against s17's brute-force oracle verbatim); partial
    * probe trades recall for scan fraction like every IVF read.
    * Output: (queryId, corpusId, cosine, rank).
    */
  def hardNegativesIvf(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, corpusLabel: String,
      queryId: String, queryVec: String, queryLabel: String,
      k: Int, numCentroids: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 3): DataFrame =
    filteredIvfTopK(corpus,
      queries.select(col(queryId), col(queryVec), col(queryLabel).as("__ql")),
      corpusId, corpusVec, queryId, queryVec, k,
      pairFilter = col(corpusLabel) =!= col("__ql"),
      numCentroids, nprobe, kmeansIters)

  /** Filtered vector search (metadata-predicate ANN), brute-force form:
    * per query, the top-k corpus vectors among those satisfying
    * `pairFilter` — the "top matches in MY language / category / date
    * range" retrieval every curation pipeline runs. This is PRE-filter
    * semantics (the predicate restricts candidates BEFORE ranking, the
    * [[hardNegatives]] posture): the result is exactly the top-k of the
    * filtered corpus, never a post-filtered shortlist that can starve
    * below k. `queries` may carry any extra columns the predicate needs
    * (they ride the broadcast); `pairFilter` sees corpus columns and
    * those carried columns — give sides distinct names.
    */
  def filteredBruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      pairFilter: Column): DataFrame =
    broadcastCosineTopK(corpus,
      queries.withColumnRenamed(queryVec, "__qv"),
      corpusId, corpusVec, queryId, k, Some(pairFilter))

  /** Filtered vector search, IVF form — the corpus-scale path: the
    * predicate is applied INSIDE the probed inverted lists, before the
    * bounded heap (candidates failing the filter never crowd true
    * matches out). Recall caveat (standard for filtered IVF — the
    * Faiss/vector-DB pre-filter trade): a highly selective predicate
    * thins each probed list, so at fixed `nprobe` recall degrades as
    * selectivity drops; widen `nprobe` with selectivity, or fall back
    * to [[filteredBruteForceTopK]] over the filtered corpus when the
    * predicate is selective enough to make it cheap (at that point the
    * filtered corpus IS small). `nprobe = numCentroids` degenerates to
    * exact filtered search with IVF's plan shape.
    */
  def filteredIvfTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      pairFilter: Column,
      numCentroids: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 3): DataFrame = {
    val (_, centroids) = trainedCoarse(corpus, corpusId, corpusVec,
      numCentroids, kmeansIters, dimFilter = None)
    // corpus keeps its metadata columns (the predicate's left side)
    val assigned = corpus.withColumn("__list",
      nearestCentroidCol(centroids)(col(corpusVec)))
    val probed = queries.withColumnRenamed(queryVec, "__qv")
      .withColumn("__list",
        explode(probeListsCol(centroids, nprobe)(col("__qv"))))
    val scored = assigned.join(broadcast(probed), "__list")
      .filter(pairFilter)
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, queryId, corpusId, k)
  }

  /** Diversified top-k via Maximal Marginal Relevance (Carbonell &
    * Goldstein, SIGIR 1998; see PAPERS.md) — the retrieval-time
    * near-dup guard: instead of the k most similar vectors (often k
    * copies of the same document), greedily pick
    * `argmax λ·cos(q,c) − (1−λ)·max_{s∈S} cos(c,s)` — each round's
    * winner must be relevant AND far from everything already selected.
    * The selection every few-shot/example-retrieval pipeline wants once
    * its corpus contains near-duplicates.
    *
    * Plan shape: stage 1 pools the top-`poolSize` candidates per query
    * by relevance (the [[bruteForceTopK]] broadcast-scan + bounded heap
    * — at corpus scale swap in [[ivfTopK]] candidates, same contract)
    * and re-attaches their vectors by a skinny id equi-join; stage 2
    * runs k greedy rounds over that BOUNDED |Q|·poolSize frame — each
    * round ONE per-query `max_by` argmax (ties by id, the rankTopK
    * order) and ONE map-only running-max update of each survivor's
    * similarity-to-selected (`ms`, seeded at cosine's −1 floor). No
    * window over the corpus, no driver-side loops over rows — the k
    * rounds are k tiny aggregates, checkpointed to keep plans shallow.
    *
    * Output: (queryId, corpusId, round 1..k, mmr) — `round` is the
    * selection order, `mmr` the winning score. Queries whose filtered
    * pool runs dry stop early with fewer than k rows.
    */
  def mmrTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      lambda: Double = 0.7, poolSize: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val snaps = new graft.pipeline.RoundSnapshots(checkpointDir)
    val pool = bruteForceTopK(corpus, queries, corpusId, corpusVec,
        queryId, queryVec, poolSize)
      .select(col(queryId), col(corpusId), col("cosine").as("__rel"))
      .join(corpus.select(col(corpusId), col(corpusVec).as("__vec")),
        corpusId)
    val remainingRoll = snaps.roll("remaining")
    var remaining = remainingRoll.advance(
      pool.withColumn("__ms", lit(-1.0d)))
    val picks = Seq.newBuilder[DataFrame]
    for (r <- 1 to k) {
      val scored = remaining.withColumn("__mmr",
        lit(lambda) * col("__rel") - lit(1.0 - lambda) * col("__ms"))
      // every round's pick backs the RESULT (the final union) — plain
      // snaps, never freed here; in durable mode the caller consumes the
      // result, then removes the directory
      val pick = snaps.snap(scored.groupBy(col(queryId))
        .agg(max_by(
          struct(col(corpusId).as("__pid"), col("__vec").as("__pvec"),
            col("__mmr")),
          struct(col("__mmr"), (-col(corpusId)).as("__tie"))).as("__p"))
        .select(col(queryId), col("__p.__pid").as("__pid"),
          col("__p.__pvec").as("__pvec"), col("__p.__mmr").as("__mmr")),
        "pick").df
      picks += pick.select(col(queryId), col("__pid").as(corpusId),
        lit(r).cast("int").as("round"), col("__mmr").as("mmr"))
      if (r < k)
        remaining = remainingRoll.advance(remaining
          .join(pick.select(col(queryId), col("__pid"), col("__pvec")),
            Seq(queryId))
          .filter(col(corpusId) =!= col("__pid"))
          .withColumn("__ms",
            greatest(col("__ms"), cosine(col("__vec"), col("__pvec"))))
          .drop("__pid", "__pvec"))
    }
    // the survivor frame is dead once the last pick landed
    remainingRoll.close()
    picks.result().reduce(_.unionByName(_))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * N ranked retrieval legs — the standard hybrid-retrieval combiner
    * (BM25 leg + dense leg, or any mix of rankers). Each leg is a
    * `(queryIdCol, itemIdCol, rankCol)` frame with 1-based ranks bounded
    * by that leg's own k; `score(q, d) = Σ_legs 1/(k0 + rank_leg(q, d))`
    * with absent legs contributing nothing (RRF needs no score
    * calibration across legs — only ranks — which is why it fuses a
    * text ranker with a vector ranker safely).
    *
    * Determinism: each term is rounded to 9 decimals and summed as
    * DECIMAL(28,9) so the fused score is exact under any addend order
    * (Spark's partial aggregation order is nondeterministic for doubles
    * with 3+ legs; the DuckDB oracle replays the identical
    * round-then-decimal-sum arithmetic).
    *
    * Scale shape: the unioned candidate frame is bounded by Σ legs' k
    * rows per query (candidates, not corpus), one hash aggregate on
    * (query, item), then the same bounded top-k heap every retrieval
    * operator here ends with — no window, no shuffle wider than the
    * candidate frame, so fusion cost is independent of corpus size.
    * Output: (queryIdCol, itemIdCol, rrf, rank) with rank in 1..k.
    */
  def rrfFuse(legs: Seq[DataFrame], queryIdCol: String, itemIdCol: String,
      rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k > 0, "k must be positive")
    require(k0 >= 0, "k0 must be non-negative")
    val candidates = legs
      .map(_.select(col(queryIdCol), col(itemIdCol),
        col(rankCol).cast("int").as("__r")))
      .reduce(_ unionByName _)
    val fused = candidates
      .groupBy(col(queryIdCol), col(itemIdCol))
      .agg(sum(round(lit(1.0) / (lit(k0.toDouble) + col("__r")), 9)
        .cast("decimal(28,9)")).cast("double").as("cosine"))
    rankTopK(fused, queryIdCol, itemIdCol, k)
      .withColumnRenamed("cosine", "rrf")
  }

  /** Rank candidate scores per query with the bounded top-k aggregate
    * ([[graft.functions.TopKByScore]]) — shuffles k entries per query per
    * map partition. A per-query `row_number` window here would ship EVERY
    * candidate score to one task per query (for brute force, the whole
    * corpus); the heap aggregate caps state at O(k) map-side. Ordering is
    * identical to `row_number() OVER (ORDER BY cosine DESC, id ASC)`.
    * Output: (queryId, idCol, cosine, rank) with rank in 1..k.
    */
  private[operators] def rankTopK(
      scored: DataFrame, queryId: String, idCol: String, k: Int): DataFrame =
    scored.groupBy(col(queryId))
      .agg(GraftFunctions.top_k_by(col("cosine"), col(idCol), k).as("__topk"))
      .select(col(queryId), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(col(queryId), col("__e.id").as(idCol),
        col("__e.score").as("cosine"),
        (col("__pos") + 1).cast("int").as("rank"))

  /** Sign-bit LSH signature of a vector: bit i = sign(v · plane_i). The
    * planes are generated deterministically and shipped as literals; each
    * dot product is the codegen'd [[graft.functions.DotProduct]].
    */
  def signSignature(vec: Column, numPlanes: Int, dim: Int): Column = {
    val planes = (0 until numPlanes).map { i =>
      typedLit(hyperplane(i, dim))
    }
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(GraftFunctions.dot_product(vec, p) >= 0d,
        lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k. Corpus and queries are both signed
    * with `numPlanes` hyperplanes; a query probes its own bucket plus all
    * buckets at Hamming distance 1 (multi-probe: numPlanes+1 probes), then
    * exact-cosine-scores only those vectors. Recall rises with fewer planes
    * / more probes; cost falls with more planes.
    * Output: (queryId, vecId, cosine, rank).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, dim: Int, numPlanes: Int = 12): DataFrame = {
    val sigCorpus = corpus.select(
      col(corpusId), col(corpusVec),
      signSignature(col(corpusVec), numPlanes, dim).as("__bucket"))
    // multi-probe: original signature + flip each bit once (signature is
    // computed once, probes are cheap xors of it)
    val probes = (0 until numPlanes).map(i => lit(1L << i)) :+ lit(0L)
    val sigQueries = queries
      .select(col(queryId), col(queryVec).as("__qv"),
        signSignature(col(queryVec), numPlanes, dim).as("__sig0"))
      .withColumn("__mask", explode(array(probes: _*)))
      .select(col(queryId), col("__qv"),
        col("__sig0").bitwiseXOR(col("__mask")).as("__bucket"))
    val candidates = sigCorpus.join(sigQueries, "__bucket")
    val scored = candidates.select(
      col(queryId), col(corpusId),
      cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    // multi-probe can surface the same (query, vector) via several buckets —
    // dedup before ranking so a duplicate never occupies two top-k slots
    val deduped = scored.groupBy(queryId, corpusId).agg(first("cosine").as("cosine"))
    rankTopK(deduped, queryId, corpusId, k)
  }

  /** Embedding-cosine near-duplicate pairs within LSH buckets: pairs of
    * corpus vectors with identical sign-signature and cosine ≥ threshold.
    * The all-pairs comparison happens only WITHIN buckets, and the bucket
    * self-join is SKINNY — only (bucket, id) rows shuffle, never the
    * vectors. Candidate pairs then re-join the embeddings BY ID for
    * scoring, so payload vectors cross the wire once per side instead of
    * once per candidate-pair membership. Buckets above `maxBucketSize`
    * are dropped (skew guard, on by default — see
    * [[graft.operators.Dedup.capBuckets]]).
    */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, numPlanes: Int = 12,
      maxBucketSize: Int = 1000): DataFrame = {
    val sig = corpus.select(
      col(idCol),
      signSignature(col(vecCol), numPlanes, dim).as("__bucket"))
    val capped = Dedup.capBuckets(sig, Seq("__bucket"),
      maxBucketSize, "cosine_skew_guard")
    val a = capped.select(col("__bucket"), col(idCol).as("idA"))
    val b = capped.select(col("__bucket"), col(idCol).as("idB"))
    val candidates = a.join(b, Seq("__bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
    val vecs = corpus.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.select(col(idCol).as("idA"), col(vecCol).as("__va")), "idA")
      .join(vecs.select(col(idCol).as("idB"), col(vecCol).as("__vb")), "idB")
      .select(col("idA"), col("idB"), cosine(col("__va"), col("__vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Bucketed kNN graph: every vector's `k` nearest neighbors by cosine
    * among the vectors sharing its sign-LSH bucket — the corpus-wide
    * neighbor structure behind diversity sampling, duplicate-cluster
    * seeding and graph-based quality propagation. The bucket restriction
    * IS the contract (a global exact kNN graph is inherently O(n²)):
    * recall rises with fewer planes, identical vectors always co-bucket,
    * and the planes are deterministic ([[hyperplane]]), so the graph is
    * reproducible run to run — an oracle can replay the exact bucketing
    * by inlining the plane values.
    *
    * Scale shape: the bucket self-join is SKINNY ((bucket, id) rows only;
    * vectors re-join BY ID afterwards, so payloads cross the wire once
    * per side, never once per candidate pair); over-cap buckets drop via
    * [[graft.operators.Dedup.capBuckets]] (observe-reported skew guard);
    * the per-source ranking is the bounded top-k heap aggregate
    * ([[rankTopK]]), never a per-source row_number window — a hot bucket
    * must not ship all its pairs to one task.
    * Output: (idCol, neighbor_id, cosine, rank) with rank in 1..k;
    * vectors whose bucket holds no other vector are absent.
    */
  def knnGraph(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, numPlanes: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    val sig = corpus.select(
      col(idCol),
      signSignature(col(vecCol), numPlanes, dim).as("__bucket"))
    val capped = Dedup.capBuckets(sig, Seq("__bucket"),
      maxBucketSize, "knn_skew_guard")
    val a = capped.select(col("__bucket"), col(idCol).as("__src"))
    val b = capped.select(col("__bucket"), col(idCol).as("__dst"))
    val candidates = a.join(b, Seq("__bucket"))
      .filter(col("__src") =!= col("__dst"))
      .select("__src", "__dst")
    val vecs = corpus.select(col(idCol), col(vecCol))
    val scored = candidates
      .join(vecs.select(col(idCol).as("__src"), col(vecCol).as("__va")), "__src")
      .join(vecs.select(col(idCol).as("__dst"), col(vecCol).as("__vb")), "__dst")
      .select(col("__src").as(idCol), col("__dst").as("neighbor_id"),
        cosine(col("__va"), col("__vb")).as("cosine"))
    rankTopK(scored, idCol, "neighbor_id", k)
  }

  /** IVF (inverted-file) approximate top-k. A tiny centroid model (C
    * vectors, deterministically sampled) is collected driver-side and
    * shipped as literals — corpus vectors are assigned to their nearest
    * centroid with a MAP-ONLY expression (no shuffle, no crossjoin), and
    * each query probes its `nprobe` nearest centroid lists. The join is
    * keyed on the list id; scoring touches only probed lists.
    * Output: (queryId, vecId, cosine, rank).
    */
  /** Deterministic coarse-quantizer model shared by [[ivfTopK]] and
    * [[ivfPqTopK]]: a bounded id-ordered sample (model fitting is the one
    * sanctioned driver-side collect) refined with a few cosine-Lloyd
    * iterations — init = first C sample vectors by id. `dimFilter` drops
    * sample vectors of the wrong width (PQ slices sub-vectors by offset,
    * so a short vector in the INIT set would seed a malformed codebook;
    * plain IVF tolerates them — kmeans skips mismatches in updates).
    * Returns (sample, indexed centroids).
    */
  private def trainedCoarse(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      numCentroids: Int, kmeansIters: Int,
      dimFilter: Option[Int]): (Array[Array[Float]], Array[(Int, Array[Float])]) = {
    val sampleSize = math.max(numCentroids * 32, 512)
    val raw: Array[Array[Float]] = corpus
      .orderBy(col(corpusId)).limit(sampleSize)
      .select(col(corpusVec)).collect()
      .map(_.getSeq[Float](0).toArray)
    val sample = dimFilter.map(d => raw.filter(_.length == d)).getOrElse(raw)
    (sample, kmeans(sample, numCentroids, kmeansIters).zipWithIndex.map(_.swap))
  }

  /** Map-only inverted-list assignment: argmax centroid cosine, ties to
    * the larger struct (same lexicographic contract as every ranking
    * here).
    */
  private def nearestCentroidCol(
      centroids: Array[(Int, Array[Float])])(vec: Column): Column = {
    val scored = centroids.map { case (i, c) =>
      struct(cosine(vec, typedLit(c)).as("sim"), lit(i).as("cid"))
    }
    greatest(scored.toIndexedSeq: _*).getField("cid")
  }

  /** The query's `nprobe` nearest inverted lists, best first. */
  private def probeListsCol(centroids: Array[(Int, Array[Float])],
      nprobe: Int)(vec: Column): Column = {
    val scored = centroids.map { case (i, c) =>
      // negate sim so ascending sort ranks best first
      struct((-cosine(vec, typedLit(c))).as("negsim"), lit(i).as("cid"))
    }
    slice(transform(array_sort(array(scored.toIndexedSeq: _*)),
      s => s.getField("cid")), 1, nprobe)
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, numCentroids: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 3): DataFrame = {
    val (_, centroids) = trainedCoarse(corpus, corpusId, corpusVec,
      numCentroids, kmeansIters, dimFilter = None)

    val assigned = corpus.select(
      col(corpusId), col(corpusVec),
      nearestCentroidCol(centroids)(col(corpusVec)).as("__list"))
    val probed = queries.select(
      col(queryId), col(queryVec).as("__qv"),
      explode(probeListsCol(centroids, nprobe)(col(queryVec))).as("__list"))
    // broadcast the probed queries: a shuffle join here would hash on
    // __list — numCentroids distinct keys, so at cluster scale at most
    // that many tasks would do ALL the candidate scoring. Broadcasting
    // keeps the corpus un-shuffled and the scan fully parallel (queries
    // are small by contract, same as bruteForceTopK).
    val scored = assigned.join(broadcast(probed), "__list")
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, queryId, corpusId, k)
  }

  /** IVF probe-count tuning curve — the d19-style sensitivity sweep for
    * vector search: for each candidate `nprobe`, the TRUE recall@k of
    * the IVF index against the exact brute-force top-k, next to the
    * candidate-scan cost that probe level pays. The report that answers
    * "is nprobe=4 enough, and what does nprobe=8 actually buy" BEFORE a
    * retrieval deployment fixes the knob. Centroids are caller-supplied
    * (sweep against YOUR index's model, not a fresh training run);
    * centroid id = array position.
    *
    * Output: one row per probe level —
    * (nprobe, n_queries, hits, recall, n_candidates), where recall =
    * hits / |exact top-k| — the baseline's ACTUAL row count, which is
    * n_queries · k only when every query has k scoreable corpus
    * neighbors (a small corpus or null-cosine rows shrink it; dividing
    * by the ideal count would deflate recall and break the
    * "full probe reads 1.0" property) — and n_candidates is the total
    * scored candidate count at that probe level (the cost axis).
    *
    * Plan shape (100 TB posture): the corpus is scanned TWICE total —
    * once for the exact baseline, once for list assignment — regardless
    * of how many probe levels are swept: candidates are scored ONCE at
    * the LARGEST probe with each candidate tagged by the probe rank of
    * its list, and every smaller level's ranking re-derives from that
    * skinny (query, id, rank, cosine) frame by a rank filter + bounded
    * heap — vectors never touch the per-level work. Queries broadcast
    * (the ivfTopK contract); the checkpointed candidate frame is
    * bounded by |queries| · maxprobe · mean-list-size.
    */
  def ivfProbeCurve(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, centroids: Array[Array[Float]],
      probes: Seq[Int]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(probes.nonEmpty && probes.distinct.size == probes.size,
      "probe levels must be non-empty and distinct")
    require(probes.forall(p => p >= 1 && p <= centroids.length),
      s"probe levels must lie in [1, ${centroids.length}]")
    val cent = centroids.zipWithIndex.map(_.swap)
    val maxP = probes.max
    val exact = bruteForceTopK(corpus, queries, corpusId, corpusVec,
        queryId, queryVec, k)
      .select(col(queryId), col(corpusId))
      .localCheckpoint(eager = true)
    val nQueries = queries.select(col(queryId)).distinct().count()
    val nExact = exact.count()
    require(nExact > 0, "ivfProbeCurve: exact baseline is empty " +
      "(no query has a scoreable corpus neighbor)")
    val assigned = corpus.select(col(corpusId), col(corpusVec),
      nearestCentroidCol(cent)(col(corpusVec)).as("__list"))
    val probed = queries.select(col(queryId), col(queryVec).as("__qv"),
        posexplode(probeListsCol(cent, maxP)(col(queryVec)))
          .as(Seq("__pos", "__list")))
      .select(col(queryId), col("__qv"), col("__list"),
        (col("__pos") + 1).cast("int").as("__pr"))
    val scoredOnce = assigned.join(broadcast(probed), "__list")
      .select(col(queryId), col(corpusId), col("__pr"),
        cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
      .localCheckpoint(eager = true)
    val rows = probes.sorted.map { p =>
      val cand = scoredOnce.filter(col("__pr") <= p)
      val approx = rankTopK(cand, queryId, corpusId, k)
        .select(col(queryId), col(corpusId))
      val hits = exact.join(approx, Seq(queryId, corpusId), "left_semi")
        .agg(count(lit(1)).as("hits"))
      val cost = cand.agg(count(lit(1)).as("n_candidates"))
      hits.crossJoin(cost).select(
        lit(p).cast("int").as("nprobe"),
        lit(nQueries).cast("long").as("n_queries"),
        col("hits").cast("long").as("hits"),
        (round(col("hits").cast("double") /
          lit(nExact.toDouble), 6) + lit(0.0)).as("recall"),
        col("n_candidates").cast("long").as("n_candidates"))
    }
    rows.reduce(_.unionByName(_))
  }

  /** Bipartite ANN JOIN — both sides CORPUS-scale (unlike [[ivfTopK]],
    * whose probed queries broadcast by contract): every `left` vector
    * finds its approximate top-`k` `right` neighbors, the
    * new-crawl-against-reference-set join. Coarse centroids train on the
    * right (bounded driver model); the right assigns map-only to its
    * nearest list, the left probes its `nprobe` nearest lists, and the
    * candidate join is a SHUFFLE equi-join on `(list, salt)`:
    *
    *  - `numCentroids` must scale with the corpus (Faiss's ~√N rule) —
    *    list cardinality IS the join parallelism, and
    *  - `salts` sub-splits every list (right rows hash onto a salt, left
    *    probes replicate across all salts — the classic replicated join
    *    for bounded-cardinality keys), so even a modest centroid count
    *    or a hot list cannot collapse onto one task.
    *
    * Vectors cross the exchange once each (left side ×nprobe·salts
    * replication, the tunable cost of approximate recall); ranking is
    * the bounded per-left heap — no window, no cartesian. `nprobe =
    * numCentroids` degenerates to the exact join (the gate
    * configuration).
    * Output: (leftId, rightId, cosine, rank), rank 1..k.
    */
  def annJoin(
      left: DataFrame, right: DataFrame,
      leftId: String, leftVec: String,
      rightId: String, rightVec: String,
      k: Int, numCentroids: Int = 16, nprobe: Int = 4, salts: Int = 4,
      kmeansIters: Int = 3): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val (_, centroids) = trainedCoarse(right, rightId, rightVec,
      numCentroids, kmeansIters, dimFilter = None)
    val assigned = right.select(
      col(rightId), col(rightVec),
      nearestCentroidCol(centroids)(col(rightVec)).as("__list"),
      pmod(hash(col(rightId)), lit(salts)).cast("int").as("__salt"))
    val probes = left.select(
        col(leftId), col(leftVec).as("__qv"),
        explode(probeListsCol(centroids, nprobe)(col(leftVec))).as("__list"))
      .withColumn("__salt",
        explode(typedLit((0 until salts).toArray)))
    val scored = probes.join(assigned, Seq("__list", "__salt"))
      .select(col(leftId), col(rightId),
        cosine(col(rightVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, leftId, rightId, k)
  }

  /** IVF-PQ approximate top-k with asymmetric distance computation (ADC)
    * and exact re-rank — the standard billion-vector ANN layout (Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011;
    * the Faiss `IVFxx,PQyy` index family).
    *
    * Model (driver-side, the one sanctioned bounded collect — same
    * convention as [[ivfTopK]]): a deterministic sample trains
    *  - the coarse quantizer: `numCentroids` cosine-kmeans centroids
    *    (inverted lists), and
    *  - `m` per-subspace PQ codebooks of `codesPerSub` L2-kmeans codes
    *    over `dim/m`-wide sub-vectors.
    *
    * Corpus pass (map-only): each vector is assigned to its inverted list
    * and ENCODED once into `m` codes — at dim=64 float32 that is 256
    * bytes → 8 bytes (32×), which is the point at 100 TB: the candidate
    * join and ADC scan move codes, never raw floats.
    *
    * Query pass: queries probe their `nprobe` nearest lists; candidate
    * scoring is ADC — approx inner product = Σ_j q_subj · codebook_j[code_j]
    * — pure builtin `zip_with`/`aggregate` arithmetic (codegen) over the
    * codebooks shipped as literals. The top `rerank` candidates per query
    * (bounded heap, same no-window shape as every ranking here) are then
    * re-ranked EXACTLY: candidate ids join back to the corpus vectors
    * (skinny id-keyed equi-join — |Q|·rerank rows, never the corpus) and
    * the final top-k is true cosine, so PQ distortion costs recall only,
    * never returns a wrong-distance result.
    *
    * Output: (queryId, corpusId, cosine, rank), rank in 1..k by exact
    * cosine among the surviving candidates.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, dim: Int, numCentroids: Int = 16, nprobe: Int = 4,
      m: Int = 8, codesPerSub: Int = 16, rerank: Int = 32,
      kmeansIters: Int = 3): DataFrame = {
    require(k <= rerank,
      s"k=$k > rerank=$rerank — the exact stage can only rank the re-rank pool")
    val model = trainIvfPqModel(corpus, corpusId, corpusVec, dim,
      numCentroids, m, codesPerSub, kmeansIters)
    val encoded = pqEncodeRows(corpus, corpusId, corpusVec, model)
    searchIvfPqEncoded(model, encoded, corpus, queries,
      corpusId, corpusVec, queryId, queryVec, k, nprobe, rerank)
  }

  /** Trained IVF-PQ model: bounded plan-time state — `numCentroids · dim`
    * + `m · codesPerSub · (dim/m)` floats (the IVF-centroid sanction),
    * never corpus-proportional.
    */
  private[operators] case class IvfPqModel(
      centroids: Array[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]]) {
    def dim: Int = centroids.head._2.length
    def m: Int = codebooks.length
    def sd: Int = dim / m
  }

  private def trainIvfPqModel(corpus: DataFrame, corpusId: String,
      corpusVec: String, dim: Int, numCentroids: Int, m: Int,
      codesPerSub: Int, kmeansIters: Int): IvfPqModel = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val sd = dim / m
    val (sample, centroids) = trainedCoarse(corpus, corpusId, corpusVec,
      numCentroids, kmeansIters, dimFilter = Some(dim))
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      kmeansL2(sample.map(_.slice(j * sd, (j + 1) * sd)), codesPerSub, kmeansIters)
    }
    IvfPqModel(centroids, codebooks)
  }

  /** PQ encode: per subspace, the L2-nearest code — ties break to the
    * smaller code via lexicographic struct comparison.
    */
  private def pqEncodeCol(model: IvfPqModel)(vec: Column): Column =
    array((0 until model.m).map { j =>
      val sub = slice(vec, j * model.sd + 1, model.sd)
      val scored = model.codebooks(j).zipWithIndex.map { case (c, ci) =>
        struct(
          aggregate(
            zip_with(sub, typedLit(c.toSeq), (a, b) => (a - b).cast("double") * (a - b)),
            lit(0.0d), (acc, x) => acc + x).as("d"),
          lit(ci).as("code"))
      }
      least(scored.toIndexedSeq: _*).getField("code")
    }: _*)

  /** ADC: approx inner product from the codes + the query's sub-vectors. */
  private def adcCol(model: IvfPqModel)(codes: Column, qv: Column): Column =
    (0 until model.m).map { j =>
      val cbLit = typedLit(model.codebooks(j).map(_.toSeq).toSeq)
      val cvec = element_at(cbLit, codes.getItem(j) + 1)
      aggregate(
        zip_with(slice(qv, j * model.sd + 1, model.sd), cvec,
          (a, b) => a.cast("double") * b),
        lit(0.0d), (acc, x) => acc + x)
    }.reduce(_ + _)

  /** The skinny code table: one `(id, __list, __codes)` row per
    * right-dimensioned corpus vector — map-only; this is everything the
    * ADC candidate stage ever reads (codes move, floats don't).
    */
  private def pqEncodeRows(df: DataFrame, idCol: String, vecCol: String,
      model: IvfPqModel): DataFrame =
    df.filter(size(col(vecCol)) === model.dim).select(
      col(idCol), nearestCentroidCol(model.centroids)(col(vecCol)).as("__list"),
      pqEncodeCol(model)(col(vecCol)).as("__codes"))

  /** The shared search back half of [[ivfPqTopK]] and
    * [[ivfPqTopKFromIndex]]: ADC candidate generation over the encoded
    * table, exact cosine re-rank against the original vectors.
    */
  private def searchIvfPqEncoded(model: IvfPqModel, encoded: DataFrame,
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int, nprobe: Int, rerank: Int): DataFrame =
    searchIvfPqEncoded(model, encoded, (_: DataFrame) => corpus, queries,
      corpusId, corpusVec, queryId, queryVec, k, nprobe, rerank,
      materializeCandidates = false)

  /** Variant taking the re-rank corpus as a FUNCTION of the ADC
    * candidate set: `corpusFor(cands)` receives the `(queryId,
    * corpusId)` candidate pairs — the only corpus rows the exact re-rank
    * will ever read — and returns the `(corpusId, corpusVec)` frame,
    * restricted however the caller's storage can (a persisted vector
    * store partitioned by an id prefix collects the candidates' bounded
    * prefix set and prunes statically — the
    * [[graft.streaming.StreamingSemanticScreen]] posture). A plain
    * frame caller passes a constant callback. `materializeCandidates`
    * localCheckpoints the candidate frame first so a callback that runs
    * jobs over it (prefix collects) does not re-execute the ADC scan —
    * the in-query paths keep it false and stay fully lazy (the plan
    * audits depend on that).
    */
  private def searchIvfPqEncoded(model: IvfPqModel, encoded: DataFrame,
      corpusFor: DataFrame => DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int, nprobe: Int, rerank: Int,
      materializeCandidates: Boolean): DataFrame = {
    val probed = queries.filter(size(col(queryVec)) === model.dim).select(
      col(queryId), col(queryVec).as("__qv"),
      explode(probeListsCol(model.centroids, nprobe)(col(queryVec))).as("__list"))
    // broadcast, not shuffle: __list has only numCentroids distinct
    // values — a hash join on it would funnel the whole ADC scan through
    // that many tasks. Broadcasting the (small) probed queries keeps the
    // code scan map-side and fully parallel.
    val adcScored = encoded.join(broadcast(probed), "__list")
      .select(col(queryId), col(corpusId),
        adcCol(model)(col("__codes"), col("__qv")).as("cosine"))
    val ranked = rankTopK(adcScored, queryId, corpusId, rerank)
      .select(col(queryId), col(corpusId))
    val cands =
      if (materializeCandidates) ranked.localCheckpoint(eager = true)
      else ranked
    val sized = corpusFor(cands).filter(size(col(corpusVec)) === model.dim)
    // candidates are |Q|·rerank rows — broadcast them at the corpus too
    val rer = broadcast(cands)
      .join(sized.select(col(corpusId), col(corpusVec)), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec).as("__qv"))), queryId)
      .select(col(queryId), col(corpusId),
        cosine(col(corpusVec), col("__qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
    rankTopK(rer, queryId, corpusId, k)
  }

  /** Train an IVF-PQ index and PERSIST it: `<dir>/model` holds the
    * centroids and codebooks (a few KB — one row per centroid/code
    * vector), `<dir>/codes` the skinny per-vector code table. The d08
    * separation applied to ANN: train once, reuse across query runs, and
    * grow the corpus incrementally with [[encodeIntoIvfPqIndex]] —
    * nothing downstream ever re-reads the training vectors.
    * `trainOn` optionally restricts TRAINING to a sub-frame (e.g. a
    * curated sample) while the code table still covers all of `corpus`.
    */
  def buildIvfPqIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
      indexDir: String, dim: Int, numCentroids: Int = 16,
      m: Int = 8, codesPerSub: Int = 16, kmeansIters: Int = 3,
      trainOn: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = trainIvfPqModel(trainOn.getOrElse(corpus), corpusId, corpusVec,
      dim, numCentroids, m, codesPerSub, kmeansIters)
    val rows =
      model.centroids.toSeq.map { case (i, c) =>
        ("centroid", -1, i, c.toSeq) } ++
      (for (j <- 0 until model.m; ci <- model.codebooks(j).indices)
        yield ("code", j, ci, model.codebooks(j)(ci).toSeq))
    rows.toDF("kind", "sub", "idx", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/model")
    // codes PARTITIONED by inverted list: a search probes nprobe of
    // numCentroids lists, so the probed-list predicate becomes a
    // PartitionFilter and candidate scan I/O is proportional to probed
    // lists, not the whole code table. No repartition first — each write
    // task fans out into at most numCentroids (small) directories, and a
    // pre-shuffle keyed on numCentroids values would cap write
    // parallelism at that many tasks
    pqEncodeRows(corpus, corpusId, corpusVec, model)
      .write.mode("overwrite").partitionBy("__list")
      .parquet(s"$indexDir/codes")
  }

  /** Bounded model load: `numCentroids + m · codesPerSub` skinny rows. */
  private def loadIvfPqModel(spark: SparkSession, indexDir: String): IvfPqModel = {
    val rows = spark.read.parquet(s"$indexDir/model")
      .select(col("kind"), col("sub"), col("idx"), col("vec")).collect()
    val centroids = rows.filter(_.getString(0) == "centroid")
      .map(r => (r.getInt(2), r.getSeq[Float](3).toArray)).sortBy(_._1)
    require(centroids.nonEmpty, s"$indexDir/model holds no centroids")
    val bySub = rows.filter(_.getString(0) == "code").groupBy(_.getInt(1))
    require(bySub.nonEmpty, s"$indexDir/model holds no codebooks")
    val m = bySub.keys.max + 1
    val codebooks = Array.tabulate(m)(j =>
      bySub(j).sortBy(_.getInt(2)).map(_.getSeq[Float](3).toArray))
    IvfPqModel(centroids, codebooks)
  }

  /** Incremental growth: encode NEW vectors under the persisted model
    * (same centroids/codebooks — results are identical to having built
    * the whole index at once with this model, spec-pinned) and append
    * their code rows. One map-only pass over the delta.
    */
  def encodeIntoIvfPqIndex(delta: DataFrame, corpusId: String,
      corpusVec: String, indexDir: String): Unit = {
    val model = loadIvfPqModel(delta.sparkSession, indexDir)
    val rows = pqEncodeRows(delta, corpusId, corpusVec, model)
    // match the stored layout: partitioned append on a __list-partitioned
    // code table, flat append on a LEGACY flat one — mixing layouts in
    // one directory breaks partition discovery for every later read
    if (codesArePartitioned(delta.sparkSession, indexDir))
      rows.write.mode("append").partitionBy("__list")
        .parquet(s"$indexDir/codes")
    else rows.write.mode("append").parquet(s"$indexDir/codes")
  }

  /** Whether `<dir>/codes` uses the `__list`-partitioned layout (any
    * `__list=` subdirectory) — pre-partitioning indexes were flat.
    */
  private def codesArePartitioned(spark: SparkSession,
      indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("__list="))
  }

  /** Query a PERSISTED IVF-PQ index: loads the (bounded) model, reads the
    * code table, and runs the exact same ADC + exact-re-rank plan as the
    * in-query [[ivfPqTopK]]. `corpus` supplies the original vectors for
    * the exact re-rank only — candidate generation never touches floats.
    */
  def ivfPqTopKFromIndex(indexDir: String, corpus: DataFrame,
      queries: DataFrame, corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, nprobe: Int = 4, rerank: Int = 32): DataFrame =
    ivfPqTopKFromIndex(indexDir, (_: DataFrame) => corpus, queries,
      corpusId, corpusVec, queryId, queryVec, k, nprobe, rerank,
      materializeCandidates = false)

  /** Variant taking the re-rank corpus as a function of the candidate
    * set (see the [[searchIvfPqEncoded]] callback contract) — for
    * callers whose original-vector store can prune its read to the
    * candidates, e.g. an id-prefix-partitioned persisted vector store.
    * `materializeCandidates = true` when the callback runs jobs over
    * the candidate frame (prefix collects).
    */
  def ivfPqTopKFromIndex(indexDir: String,
      corpusFor: DataFrame => DataFrame,
      queries: DataFrame, corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, nprobe: Int, rerank: Int,
      materializeCandidates: Boolean): DataFrame = {
    require(k <= rerank,
      s"k=$k > rerank=$rerank — the exact stage can only rank the re-rank pool")
    val spark = queries.sparkSession
    val model = loadIvfPqModel(spark, indexDir)
    // bounded driver collect (<= numCentroids ints, whatever |Q| is):
    // the union of every query's probed lists. On the __list-partitioned
    // layout the isin classifies as a PartitionFilter — unprobed lists'
    // files are never opened (plan-pinned); on a legacy flat code table
    // it degrades to a pushed row filter over all files, still correct
    val probedLists = queries.filter(size(col(queryVec)) === model.dim)
      .select(explode(probeListsCol(model.centroids, nprobe)(col(queryVec)))
        .as("__list"))
      .distinct().collect().map(_.getInt(0))
    val encoded = spark.read.parquet(s"$indexDir/codes")
      .filter(col("__list").isin(probedLists.toSeq: _*))
    searchIvfPqEncoded(model, encoded, corpusFor, queries,
      corpusId, corpusVec, queryId, queryVec, k, nprobe, rerank,
      materializeCandidates)
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× storage/shuffle compression for embedding tables at corpus scale.
    * Per-vector scale = max|x|/127; q_i = round(x_i / scale) in [-127,127].
    * Map-only, pure column expressions (codegen'd); cosine on dequantized
    * vectors differs from the original by O(1/127) per component, which
    * downstream ANN tolerates by construction.
    * Adds (`<vec>_q8` array<tinyint>, `<vec>_scale` float).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val mx = array_max(transform(col(vecCol), x => abs(x)))
    val scale = (mx / lit(127.0d)).cast("float")
    df.withColumn(s"${vecCol}_scale", scale)
      .withColumn(s"${vecCol}_q8",
        when(col(s"${vecCol}_scale") > 0f,
          transform(col(vecCol),
            x => round(x.cast("double") / col(s"${vecCol}_scale").cast("double"))
              .cast("tinyint")))
          .otherwise(transform(col(vecCol), x => lit(0).cast("tinyint"))))
  }

  /** Inverse of [[quantizeInt8]]: reconstruct float vectors. */
  def dequantizeInt8(df: DataFrame, qCol: String, scaleCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol,
      transform(col(qCol), q => (q.cast("float") * col(scaleCol)).cast("float")))

  /** Per-dimension standardization (z-score) of an embedding column —
    * the feature-normalization step clustering/ANN pipelines run before
    * distance computations so no dimension dominates by scale. Adds
    * `<vec>_z` with `z_i = (v_i − mean_i) / std_i` (0 where a dimension
    * is constant).
    *
    * Determinism contract: moments accumulate in DECIMAL(28,10) (the
    * [[labelCentroids]] routing — float addition is partition-order
    * dependent, decimal truncation is mirrored by the oracle), and the
    * mean/std/z formulas are fixed double expressions both engines
    * evaluate identically.
    *
    * Scale shape: ONE positional-explode hash aggregate (shuffle unit =
    * `dim` rows of partial sums); the dim-bounded stats collect to
    * literal arrays (the IVF-centroid sanction) so the apply pass is a
    * MAP-ONLY indexed transform — no join, no second shuffle.
    */
  def standardizeDims(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val stats = df
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy("__pos")
      .agg(count(lit(1)).as("__n"),
        sum(col("__v").cast("double").cast(dec)).cast("double").as("__sm"),
        sum((col("__v").cast("double") * col("__v").cast("double")).cast(dec))
          .cast("double").as("__sq"))
      .collect()
    require(stats.nonEmpty, "empty corpus has no dimension statistics")
    val dim = stats.map(_.getInt(0)).max + 1
    val means = new Array[Double](dim)
    val stds = new Array[Double](dim)
    stats.foreach { r =>
      val (n, sm, sq) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      means(r.getInt(0)) = sm / n
      stds(r.getInt(0)) = math.sqrt((sq - sm * sm / n) / n)
    }
    applyDimScaling(df, vecCol, s"${vecCol}_z", means, stds)
  }

  /** Map-only `(x − center[pos]) / scale[pos]` apply with the model as
    * literal arrays; `scale <= 0` dims map to 0 (the s10 convention).
    * Shared by the z-score and robust scalers — the ONLY thing they
    * differ on is how center/scale are estimated.
    */
  private def applyDimScaling(df: DataFrame, vecCol: String, outCol: String,
      centers: Array[Double], scales: Array[Double]): DataFrame = {
    val dim = centers.length
    val cArr = typedLit(centers.toSeq)
    val sArr = typedLit(scales.toSeq)
    df.withColumn(outCol,
      zip_with(col(vecCol),
        sequence(lit(0), lit(dim - 1)),
        (x, i) => {
          val sc = element_at(sArr, i + 1)
          when(sc > 0d,
            (x.cast("double") - element_at(cArr, i + 1)) / sc)
            .otherwise(lit(0.0d))
        }))
  }

  /** Farthest-point sampling (greedy k-center / max-min coreset
    * selection): seed with the smallest id, then repeatedly take the
    * pool vector whose MINIMUM cosine-dissimilarity to everything
    * selected so far is LARGEST — the classic 2-approximation of the
    * k-center objective and the standard diversity-selection step when a
    * small, spread-out subset must represent an embedding pool (eval-set
    * seeding, prototype picking, dedup-cluster exemplars).
    *
    * Scale shape: the selected set is MODEL STATE (k vectors, collected
    * one per round — the IVF-centroid sanction), so each round is ONE
    * map-only pool scan scoring `least(1 − cos(v, litᵢ))` against the
    * selected literals plus a `max_by` argmax aggregate: no joins below
    * the cutover, no window, nothing shuffles but one row per partition
    * per round. Expression growth is bounded: the per-round `least` is a
    * BALANCED 32-ary tree (depth log₃₂ k, not a k-deep left fold that
    * overflows codegen/analysis stacks), and past `antiJoinFrom` selected
    * ids the `NOT isin` predicate switches to a broadcast left-anti join
    * against the (k-row, driver-local) selected-ids frame — the pool
    * still never shuffles. The selected VECTORS still ride the scan as
    * literals, O(k·dim) per round — right for coreset-sized k (≲ a few
    * thousand), and enforced by the hard `maxK` bound below; past it,
    * pre-cluster and sample per cluster instead of
    * raising k. Pools are bounded by construction (feed an ANN/cluster
    * pre-selection for corpus-scale inputs — k rounds over 100 TB would
    * be k full scans).
    * Ties break to the smaller id. The pool must be non-empty; if it
    * holds fewer than k rows the walk stops there and returns one row
    * per pool vector. Output: (sel_rank 0..k−1, idCol, score — the
    * max-min dissimilarity at selection time, null for the seed).
    *
    * `maxK` is the HARD bound on the walk (default 2048): each round
    * ships the selected vectors as O(k·dim) expression literals, so past
    * coreset-scale k the per-round plan itself becomes the payload —
    * thousands of cosine kernels per row, megabytes of literal floats
    * re-shipped every round, k full pool scans. Rather than degrade
    * silently, the walk refuses and the caller pre-clusters (IVF/k-means
    * assignment, [[ivfTopK]] machinery) and FPS-samples per cluster —
    * the composition every published corpus-scale coreset pipeline uses
    * at that size anyway.
    */
  def farthestPointSample(pool: DataFrame, idCol: String, vecCol: String,
      k: Int, antiJoinFrom: Int = 100, maxK: Int = 2048): DataFrame = {
    require(k >= 1, "need at least one selection")
    require(k <= maxK,
      s"farthestPointSample: k=$k exceeds maxK=$maxK — the per-round plan " +
        "carries the selected vectors as O(k*dim) literals, so past " +
        "coreset-scale k pre-cluster the pool and sample per cluster " +
        "instead of raising k (raise maxK explicitly to override)")
    val spark = pool.sparkSession
    import spark.implicits._
    val seedRows = pool.orderBy(col(idCol)).limit(1)
      .select(col(idCol), col(vecCol)).collect()
    require(seedRows.nonEmpty, "farthestPointSample: empty pool")
    val seedRow = seedRows(0)
    var selected = Vector[(Long, Array[Float], Option[Double])](
      (seedRow.getLong(0), seedRow.getSeq[Float](1).toArray, None))
    var exhausted = false
    while (selected.size < k && !exhausted) {
      val chosen = fpsRound(pool, idCol, vecCol,
        selected.map { case (i, v, _) => (i, v) }, antiJoinFrom)
        .head()
      if (chosen.isNullAt(0)) {
        // aggregate over an empty remainder: k exceeds the pool size —
        // stop at the full pool instead of NPEing on the null struct
        exhausted = true
      } else {
        val w = chosen.getStruct(0)
        val id = w.getLong(0)
        val vec = w.getSeq[Float](1).toArray
        // the winning score replays from the literals (exact — same
        // arithmetic the scan used)
        val sc = selected.map { case (_, sv, _) =>
          1.0d - { // cosine on doubles, same fold order as the kernel
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var i = 0
            while (i < vec.length) {
              dot += vec(i).toDouble * sv(i).toDouble
              na += vec(i).toDouble * vec(i).toDouble
              nb += sv(i).toDouble * sv(i).toDouble
              i += 1
            }
            dot / (math.sqrt(na) * math.sqrt(nb))
          }
        }.min
        selected = selected :+ ((id, vec, Some(sc)))
      }
    }
    selected.zipWithIndex.map { case ((id, _, sc), r) =>
      (r, id, sc)
    }.toDF("sel_rank", idCol, "score")
  }

  /** One FPS round's argmax frame over the remainder — the exact frame
    * the walk executes, split out so the plan spec can pin the two
    * postures (join-free `isin` filter below `antiJoinFrom`, broadcast
    * left-anti at/above it) on production code.
    */
  private[graft] def fpsRound(pool: DataFrame, idCol: String,
      vecCol: String, selected: Seq[(Long, Array[Float])],
      antiJoinFrom: Int): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    val minDis = leastTree(selected.map { case (_, v) =>
      lit(1.0d) - cosine(col(vecCol), typedLit(v))
    })
    val rest =
      if (selected.size < antiJoinFrom)
        pool.filter(!col(idCol).isin(selected.map(_._1): _*))
      else pool.join(broadcast(selected.map(_._1).toDF(idCol)),
        Seq(idCol), "left_anti")
    rest.select(max_by(
      struct(col(idCol), col(vecCol)),
      struct(minDis, -col(idCol))).as("__w"),
      lit(1).as("__one"))
  }

  /** Balanced 32-ary `least` reduction: a plain `reduce(least(_, _))`
    * nests k-deep and blows analysis/codegen stacks at large k; grouping
    * 32-wide keeps the expression tree at depth log₃₂ k with identical
    * semantics (least is associative and commutative, null-skipping
    * either way).
    */
  private def leastTree(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head
    else leastTree(cols.grouped(32).map { g =>
      if (g.size == 1) g.head else least(g: _*)
    }.toSeq)

  /** Robust per-dimension scaling — the median/IQR sibling of
    * [[standardizeDims]] (sklearn's RobustScaler): r = (x − median) / IQR
    * per dimension, so heavy-tailed or outlier-contaminated embedding
    * dims (exactly the rows an outlier PRUNE wants to keep visible) don't
    * blow up the scale the way a variance-based z-score does. Same shape
    * as s10 — one positional explode, one per-dim aggregate, a 64-row
    * plan-time collect, map-only literal apply — with one honest cost
    * difference: Spark's exact `percentile` buffers the VALUES per dim
    * (each post-shuffle dim task holds O(rows/dim-distinct) entries),
    * unlike s10's constant-size moment sums. That is the price of an
    * oracle-replayable exact quantile; for a corpus whose per-dim value
    * sets outgrow executor memory, swap the aggregate for
    * `approx_percentile` (constant-memory sketch, same downstream apply)
    * and accept rank error instead. Constant dims (IQR 0) map to 0.
    */
  def robustScaleDims(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = df
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy("__pos")
      .agg(expr("percentile(CAST(__v AS DOUBLE), array(0.25D, 0.5D, 0.75D))").as("__q"))
      .collect()
    require(stats.nonEmpty, "empty corpus has no dimension statistics")
    val dim = stats.map(_.getInt(0)).max + 1
    val meds = new Array[Double](dim)
    val iqrs = new Array[Double](dim)
    stats.foreach { r =>
      val q = r.getSeq[Double](1)
      meds(r.getInt(0)) = q(1)
      iqrs(r.getInt(0)) = q(2) - q(0)
    }
    applyDimScaling(df, vecCol, s"${vecCol}_r", meds, iqrs)
  }

  /** Top principal component of a mean-centered embedding corpus — the
    * classic quality/outlier axis for training-data curation (project
    * every embedding onto the dominant variance direction, then prune or
    * stratify on the score).
    *
    * Scale shape: ONE scan of the corpus (the vector column is cached
    * after the scan, so the first-moment and second-moment aggregations
    * read it once) — the outer products are generated map-side inside
    * each row (no self-join) and partially aggregated on the (i, j)
    * key, so the shuffle is O(partitions · dim²), never O(rows). The dim×dim covariance is
    * plan-time model state (the IVF-centroid / z-order-bounds sanction:
    * a few thousand cells collect to the driver), where `iters` rounds
    * of power iteration run on it.
    *
    * Determinism contract: moment sums accumulate in DECIMAL(28,10) (the
    * [[standardizeDims]] routing — double addition is partition-order
    * dependent, decimal addition is exact and order-free); every
    * driver-side sum (mat-vec rows, the norm) folds LEFT-TO-RIGHT over
    * ascending indices from a 0.0 accumulator, which an oracle replays
    * bit-for-bit with an ordered-list fold. The start vector is the
    * constant 1/sqrt(dim); sqrt/division are single IEEE ops. No RNG
    * anywhere, so the model is reproducible run to run.
    *
    * Returns (count, means, component) — component has unit L2 norm.
    */
  def topPrincipalComponent(
      df: DataFrame, vecCol: String, iters: Int = 10)
      : (Long, Array[Double], Array[Double]) = {
    val (n, means, cov) = covarianceModel(df, vecCol)
    (n, means, powerIterate(cov, iters))
  }

  /** The distributed moment pass behind [[topPrincipalComponent]]:
    * (count, per-dim means, dim×dim covariance). See that method for the
    * shuffle accounting and determinism contract.
    */
  private[operators] def covarianceModel(df: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    // two chained Generate (posexplode) operators — codegen-friendly,
    // unlike a nested zip_with lambda building dim² structs per row:
    // row → (i, xi, vec) → (i, j, xi·xj)
    val src0 = df.select(col(vecCol).as("__v"))
    // the dim² explosion multiplies per-row work by ~4096, and the DECIMAL
    // partial aggregation is the expensive part — a small input (one
    // parquet row group) would run it in ONE task. Widen to the session's
    // shuffle parallelism when the scan is narrower; at real scale the
    // input already has more partitions than this and no shuffle is added
    // (measured 15.9 s → 4.6 s at sf0.1, where embeddings is a single
    // row group; the remainder is per-query codegen + the inherent
    // decimal aggregation)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // cache the (skinny) vector column: both moment aggregations read it,
    // and an uncached lineage would re-run the scan and the repartition
    // exchange for the second-moment job
    val src = {
      val widened =
        if (src0.rdd.getNumPartitions < parts) src0.repartition(parts) else src0
      widened.localCheckpoint(eager = true)
    }
    try {
      val v = col("__v")
      val first = src.select(posexplode(v).as(Seq("__i", "__xi")), v.as("__v"))
      val firstStats = first
        .groupBy(col("__i").as("i"))
        .agg(count(lit(1)).as("n"),
          sum(col("__xi").cast("double").cast(dec)).cast("double").as("s"))
        .collect()
      require(firstStats.nonEmpty, "empty corpus has no principal component")
      val dim = firstStats.iterator.map(_.getInt(0)).max + 1
      val n = firstStats.iterator
        .collectFirst { case r if r.getInt(0) == 0 => r.getLong(1) }.getOrElse(0L)
      require(n > 0 && firstStats.forall(_.getLong(1) == n),
        "ragged vectors — every row must carry the same dimension count " +
          "for the moment divisions to be meaningful")
      val cells = first
        .select(col("__i"), col("__xi"), posexplode(col("__v")).as(Seq("__j", "__xj")))
        .groupBy(col("__i").as("i"), col("__j").as("j"))
        .agg(sum((col("__xi").cast("double") * col("__xj").cast("double")).cast(dec))
          .cast("double").as("s"))
        .collect()
      val means = new Array[Double](dim)
      val mom = Array.ofDim[Double](dim, dim)
      firstStats.foreach { r => means(r.getInt(0)) = r.getDouble(2) / n }
      cells.foreach { r => mom(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / n }
      (n, means,
        Array.tabulate(dim, dim)((i, j) => mom(i)(j) - means(i) * means(j)))
    } finally {
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(src)
    }
  }

  /** Fixed-order mat-vec: w_i = fold_j cov(i)(j)·v(j), ascending j from
    * 0.0 — the replayable summation order everything PCA-shaped shares.
    */
  private def matVec(cov: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(v.length) { i =>
      var acc = 0.0; var j = 0
      while (j < v.length) { acc += cov(i)(j) * v(j); j += 1 }
      acc
    }

  private def powerIterate(cov: Array[Array[Double]], iters: Int): Array[Double] = {
    val dim = cov.length
    var pc = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    (0 until iters).foreach { _ =>
      val w = matVec(cov, pc)
      var nrm = 0.0
      var i = 0
      while (i < dim) { nrm += w(i) * w(i); i += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 0, "power iteration collapsed — zero-variance corpus")
      pc = w.map(_ / nrm)
    }
    pc
  }

  /** Explained-variance summary of the top principal component:
    * (eigenvalue λ = pc·(C·pc), total variance = trace(C), ratio λ/trace)
    * — the number that decides whether top-PC projection pruning is
    * meaningful for this corpus at all. Same model pass and fold-order
    * determinism as [[topPrincipalComponent]]; all three values are plain
    * driver doubles an oracle replays exactly.
    */
  def pcaVarianceSummary(df: DataFrame, vecCol: String, iters: Int = 10)
      : (Double, Double, Double) = {
    val (_, _, cov) = covarianceModel(df, vecCol)
    val pc = powerIterate(cov, iters)
    val w = matVec(cov, pc)
    var lambda = 0.0
    var i = 0
    while (i < pc.length) { lambda += pc(i) * w(i); i += 1 }
    var trace = 0.0
    i = 0
    while (i < cov.length) { trace += cov(i)(i); i += 1 }
    (lambda, trace, lambda / trace)
  }

  /** Projects every vector onto the corpus's top principal component
    * (mean-centered): adds `pc1_proj = Σ_j (v_j − mean_j) · pc_j`. The
    * apply pass is MAP-ONLY — the model (means + component, 2·dim
    * doubles) rides along as literal arrays, and the per-row dot product
    * folds left-to-right via `aggregate` (sequential array-order
    * semantics), so the emitted doubles replay exactly.
    */
  def pcaProject(
      df: DataFrame, idCol: String, vecCol: String, iters: Int = 10)
      : DataFrame = {
    val (_, means, pc) = topPrincipalComponent(df, vecCol, iters)
    val dim = means.length
    val mArr = typedLit(means.toSeq)
    val pArr = typedLit(pc.toSeq)
    df.withColumn("pc1_proj",
      aggregate(
        zip_with(col(vecCol), sequence(lit(0), lit(dim - 1)), (x, i) =>
          (x.cast("double") - element_at(mArr, i + 1)) * element_at(pArr, i + 1)),
        lit(0.0), (acc, z) => acc + z))
  }

  /** Tiny deterministic Lloyd's k-means over a driver-side sample (cosine
    * assignment, mean update). Input order fixes initialization, so the
    * model is reproducible run to run.
    */
  /** Lloyd scaffolding shared by the cosine and L2 variants: deterministic
    * first-k init, dimension-mismatched vectors excluded from updates
    * (they would corrupt the mean), empty clusters keep their old
    * centroid. `bestOf(v, cents)` picks the winning cluster index — the
    * ONLY thing the two metrics differ on.
    */
  private def lloyd(sample: Array[Array[Float]], k: Int, iters: Int)(
      bestOf: (Array[Float], Array[Array[Float]]) => Int): Array[Array[Float]] = {
    if (sample.isEmpty) return Array.empty
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        if (v.length == dim) {
          val best = bestOf(v, cents)
          counts(best) += 1
          var i = 0
          while (i < dim) { sums(best)(i) += v(i); i += 1 }
        }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    cents
  }

  private[operators] def kmeans(
      sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] =
    lloyd(sample, k, iters) { (v, cents) =>
      val dim = v.length
      def cos(b: Array[Float]): Double = {
        if (b.length != dim) return -1.0 // mismatched dims never win
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < dim) { dot += v(i) * b(i); na += v(i) * v(i); nb += b(i) * b(i); i += 1 }
        if (na == 0 || nb == 0) -1.0 else dot / math.sqrt(na * nb)
      }
      var best = 0; var bestSim = -2.0
      var c = 0
      while (c < cents.length) {
        val s = cos(cents(c)); if (s > bestSim) { bestSim = s; best = c }; c += 1
      }
      best
    }

  /** Lloyd iterations under squared-L2 — the PQ codebook objective (code
    * assignment minimizes reconstruction error, not angle; sub-vector
    * norms carry signal that cosine would discard). Shares [[lloyd]]'s
    * init and empty-cluster handling with [[kmeans]] by construction.
    */
  private[operators] def kmeansL2(
      sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] =
    lloyd(sample, k, iters) { (v, cents) =>
      val dim = v.length
      def d2(b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < dim) { val d = v(i).toDouble - b(i); s += d * d; i += 1 }
        s
      }
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val s = d2(cents(c)); if (s < bestD) { bestD = s; best = c }; c += 1
      }
      best
    }

  /** Per-label mean embedding (class prototypes — the distributed step of
    * prototype classifiers and of IVF coarse-quantizer refresh). Shape:
    * positional explode → ONE hash aggregate keyed `(label, pos)`,
    * map-side combined, so the shuffle carries `labels × dim` partial
    * sums, not vectors. Sums route through DECIMAL — float addition is
    * order-dependent and partition order is not deterministic, so a
    * double sum here would make the centroid itself nondeterministic run
    * to run.
    *
    * Output: one row per (label, pos): (labelCol, pos, n, centroid).
    */
  def labelCentroids(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"),
        (sum(col("__v").cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))).cast("double") /
          count(lit(1))).as("centroid"))

  /** DISTRIBUTED Lloyd k-means refinement (squared-L2) — the corpus-scale
    * counterpart of the driver-side [[kmeans]] sample fit: every
    * iteration is ONE map-only assignment pass against the centroid
    * LITERALS plus ONE `(cluster, pos)` hash aggregate whose shuffle
    * carries `k·dim` partial sums (map-side combined) — vectors never
    * shuffle, and the model state collected per round is `k·dim` doubles
    * (the IVF-centroid sanction). The exact shape MLlib's KMeans runs,
    * re-expressed relationally so every arithmetic step replays outside
    * the engine:
    *   - init: the `k` smallest-id vectors (deterministic, no RNG);
    *   - assignment: per-dim squared differences rounded onto a 1e-9
    *     integer grid and summed as LONGS — integer addition is
    *     order-independent, so the argmin compares EXACT values and
    *     engines cannot disagree on membership (ties break to the lower
    *     cluster index); the 1e-9 quantization is documented semantics,
    *     far below any clustering-relevant distance scale;
    *   - update: per-(cluster, pos) DECIMAL-routed mean, the
    *     [[labelCentroids]] arithmetic verbatim; a cluster that loses all
    *     members keeps its previous centroid.
    * Output: one row per input vector under the FINAL centroids:
    * `(idCol, cluster, dist)` — dist the squared-L2 to the winning
    * centroid, rounded at emission.
    */
  def kmeansRefine(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0: k=$k $iters")
    val spark = df.sparkSession
    import spark.implicits._
    def assigned(cents: Seq[Array[Double]]): DataFrame =
      assignedFrame(df, idCol, vecCol, cents)
    var centroids: Seq[Array[Double]] = seedCentroids(df, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      val upd = assigned(centroids)
        .select(col("__w.c").as("__c"),
          posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy(col("__c"), col("__pos"))
        .agg((sum(col("__v").cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))).cast("double") /
          count(lit(1))).as("__m"))
        .collect().groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1)
            .map(_._2)
        }
      centroids = centroids.zipWithIndex.map { case (prev, i) =>
        upd.getOrElse(i, prev) // empty cluster keeps its previous centroid
      }
    }
    assigned(centroids)
      .select(col(idCol), col("__w.c").as("cluster"),
        round(col("__w.d").cast("double") / lit(1e9), 6).as("dist"))
  }

  /** The `k` smallest-id vectors as double centroids — the deterministic
    * model both engines can replay (the [[kmeansRefine]] init and the
    * fixed shared quantizer of the drift report). Bounded k-row collect.
    */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Array[Double]] = {
    require(k >= 1, s"need k >= 1: $k")
    val rows = df.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect()
    require(rows.nonEmpty, "seedCentroids: empty pool")
    rows.map(_.getSeq[Float](0).toArray.map(_.toDouble)).toSeq
  }

  /** Map-only assignment of every vector to its nearest FIXED centroid
    * (the s23 1e-9-integer-grid squared-L2, ties to the lower index) —
    * `(idCol, cluster, dist)`. The quantization step of the drift
    * report and of any shared-codebook comparison: centroids ride as
    * literals, nothing shuffles.
    */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame =
    assignedFrame(df, idCol, vecCol, centroids)
      .select(col(idCol), col("__w.c").as("cluster"),
        round(col("__w.d").cast("double") / lit(1e9), 6).as("dist"))

  /** The shared argmin frame: `(idCol, vecCol, __w = (d, c))`. */
  private def assignedFrame(df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Array[Double]]): DataFrame = {
    def distTo(c: Array[Double]): Column =
      aggregate(
        zip_with(col(vecCol), typedLit(c),
          (a, b) => {
            val d = a.cast("double") - b
            round(d * d * lit(1e9)).cast("long")
          }),
        lit(0L), (acc, x) => acc + x)
    df.select(col(idCol), col(vecCol),
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        struct(distTo(c).as("d"), lit(i).as("c"))
      }: _*)).as("__w"))
  }

  /** k-means++ seeding (Arthur & Vassilvitskii 2007, "k-means++: The
    * Advantages of Careful Seeding"; see PAPERS.md) as a DETERMINISTIC,
    * fully replayable D²-weighted walk: center 0 is the smallest-id
    * vector; each later round samples the next center with probability
    * ∝ min-squared-distance to the selected set — realized as the t28
    * exponential race (`key = ln(u)/w`, u a mix64-derived per-id
    * uniform, argmax key) instead of engine RNG, so the whole seeding
    * replays bit-for-bit outside Spark. Feeding these centers to
    * [[kmeansRefine]] keeps its O(log k)-competitive guarantee without
    * giving up gate-exactness (the reason [[semanticDedup]] documents
    * smallest-id centroids as its replayable compromise).
    *
    * Scale shape per round (the FPS sanction): ONE map-only pool scan
    * scoring quantized min-d² against the selected literals (the s23
    * 1e-9 integer grid — order-proof and engine-exact) + one `max_by`
    * argmax aggregate; model state is k vectors. `maxK` bounds the
    * literal payload exactly as [[farthestPointSample]]'s does.
    * Duplicates of already-selected centers carry weight 0 and are
    * never picked (the ++ semantics).
    *
    * Output: (sel_rank 0..k−1, idCol, key — the winning race key, null
    * for the seed).
    */
  def kmeansPlusPlusSeed(df: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 9L, maxK: Int = 256): DataFrame = {
    require(k >= 1, "need at least one center")
    require(k <= maxK,
      s"kmeansPlusPlusSeed: k=$k exceeds maxK=$maxK — per-round literals " +
        "are O(k*dim); past coreset-scale k sample a pool first")
    val spark = df.sparkSession
    import spark.implicits._
    val h = graft.functions.GraftFunctions.mix64(col(idCol).cast("long"), seed)
    val u = (shiftrightunsigned(h, 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0d) // 2^53, the t28 uniform
    val seedRows = df.orderBy(col(idCol)).limit(1)
      .select(col(idCol), col(vecCol)).collect()
    require(seedRows.nonEmpty, "kmeansPlusPlusSeed: empty pool")
    var selected = Vector[(Long, Array[Float], Option[Double])](
      (seedRows(0).getLong(0), seedRows(0).getSeq[Float](1).toArray, None))
    var exhausted = false
    while (selected.size < k && !exhausted) {
      val dists = selected.map { case (_, c, _) =>
        aggregate(
          zip_with(col(vecCol), typedLit(c.map(_.toDouble)),
            (a, b) => {
              val d = a.cast("double") - b
              round(d * d * lit(1e9)).cast("long")
            }),
          lit(0L), (acc, x) => acc + x)
      }
      val minD = leastTree(dists)
      val key = round(log(u) / (minD.cast("double") / lit(1e9)), 9)
      val chosen = df
        .filter(!col(idCol).isin(selected.map(_._1): _*))
        .filter(minD > 0)
        .select(max_by(
          struct(col(idCol), col(vecCol), key.as("__key")),
          struct(key, -col(idCol))).as("__w"), lit(1).as("__one"))
        .head()
      if (chosen.isNullAt(0)) exhausted = true
      else {
        val w = chosen.getStruct(0)
        selected = selected :+ ((w.getLong(0), w.getSeq[Float](1).toArray,
          Some(w.getDouble(2))))
      }
    }
    selected.zipWithIndex.map { case ((id, _, sc), r) => (r, id, sc) }
      .toDF("sel_rank", idCol, "key")
  }

  /** Johnson–Lindenstrauss SIGN random projection (Achlioptas 2003,
    * "Database-friendly random projections"; see PAPERS.md):
    * `y_k = (1/√outDim) · Σⱼ sⱼₖ·vⱼ` with `s ∈ {±1}` — the cheap,
    * data-independent dimension reduction that preserves pairwise
    * distances within (1±ε) and needs no training pass (the contrast to
    * [[topPrincipalComponent]]: no moment shuffle, no model fit — right
    * for a first-pass shrink before ANN indexing).
    *
    * Scale shape: the sign matrix is `outDim·dim` ±1s derived from
    * fmix64 of `(seed ^ (k·dim + j))` — RNG-free plan-time literals
    * (KBs), so the whole operator is ONE map-only pass: no shuffle, no
    * join, nothing collected but the input dim probe. Per-component sums
    * accumulate on the 1e-9 integer grid (the s23 convention): term
    * rounding makes the fold order-independent, so both engines agree
    * bit-for-bit and the oracle can replay the mix64 sign derivation in
    * HUGEINT SQL.
    *
    * Output: one row per (vector, output dim): (idCol, k, proj).
    */
  def signRandomProjection(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: Long = 0L): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1: $outDim")
    val inDim = df.select(size(col(vecCol))).head().getInt(0)
    val invScale = 1.0 / math.sqrt(outDim.toDouble)
    val comps = (0 until outDim).map { k =>
      val signs = Array.tabulate(inDim) { j =>
        if ((graft.functions.Mix64.mix(seed ^ (k.toLong * inDim + j)) & 1L) == 0L)
          1.0 else -1.0
      }
      aggregate(
        zip_with(col(vecCol), typedLit(signs),
          (a, b) => round(a.cast("double") * b * lit(1e9)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    }
    df.select(col(idCol), posexplode(array(comps: _*)).as(Seq("k", "__s")))
      .select(col(idCol), col("k"),
        round(col("__s").cast("double") / lit(1e9) * lit(invScale), 6)
          .as("proj"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space, compare vectors only WITHIN a cluster,
    * and drop every vector that has a smaller-id cluster-mate with cosine
    * ≥ `threshold`. Exact/near copies whose text differs (paraphrases,
    * boilerplate variants) collapse to one representative — the smallest
    * id, so the choice is deterministic and idempotent.
    *
    * Centroids are the `numClusters` smallest-id corpus vectors — a
    * bounded driver-side collect (same sanction as the IVF centroid
    * sample) that makes the whole operator reproducible run-to-run and
    * oracle-checkable end to end (a k-means model would be better
    * centroids but is not exactly replayable outside the engine; swap in
    * [[kmeans]] output when gate-exactness is not required).
    *
    * Scale shape: assignment is a MAP-ONLY expression over centroid
    * literals (no shuffle, no crossjoin); the within-cluster self-join is
    * SKINNY — only (cluster, id) rows shuffle, vectors re-join BY ID so
    * payloads cross the wire once per side, not per pair; clusters above
    * `maxClusterSize` are exempted from pairing by the standard skew
    * guard ([[Dedup.capBuckets]], observe-reported) — their members are
    * conservatively KEPT, never silently dropped.
    *
    * Output: one row per input vector: (idCol, cluster, dup_of, keep)
    * where `dup_of` = smallest qualifying cluster-mate id (null ⇔ keep).
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      numClusters: Int = 16, threshold: Double = 0.95,
      maxClusterSize: Int = 10000): DataFrame = {
    require(numClusters >= 1, "need at least one cluster")
    val centroids: Array[(Int, Array[Float])] = corpus
      .orderBy(col(idCol)).limit(numClusters)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap)
    // argmax of cosine with smallest-cid tie-break: greatest() over
    // (sim, -cid) structs picks max sim then max(-cid) = min cid
    def nearestCentroid(vec: Column): Column =
      if (centroids.length <= 1) lit(0)
      else {
        val scored = centroids.map { case (i, c) =>
          struct(cosine(vec, typedLit(c)).as("sim"), lit(-i).as("negcid"))
        }
        (-greatest(scored.toIndexedSeq: _*).getField("negcid")).cast("int")
      }
    val assigned = corpus.select(
      col(idCol), nearestCentroid(col(vecCol)).as("cluster"))
    val capped = Dedup.capBuckets(assigned, Seq("cluster"),
      maxClusterSize, "semdedup_skew_guard")
    val a = capped.select(col("cluster"), col(idCol).as("idA"))
    val b = capped.select(col("cluster"), col(idCol).as("idB"))
    val candidates = a.join(b, Seq("cluster"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
    val vecs = corpus.select(col(idCol), col(vecCol))
    val dups = candidates
      .join(vecs.select(col(idCol).as("idA"), col(vecCol).as("__va")), "idA")
      .join(vecs.select(col(idCol).as("idB"), col(vecCol).as("__vb")), "idB")
      .select(col("idA"), col("idB"), cosine(col("__va"), col("__vb")).as("__cos"))
      .filter(col("__cos") >= threshold)
      .groupBy(col("idB").as(idCol))
      .agg(min(col("idA")).as("dup_of"))
    assigned.join(dups, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }

  /** k-nearest-neighbor majority-vote classification of `queries` against
    * a labeled corpus: top-k by cosine (bounded-heap ranked, same engine
    * as [[bruteForceTopK]]), then one vote per neighbor, winner = most
    * votes with deterministic smallest-label tie-break. The neighbor list
    * (|queries| × k rows) is broadcast back against the corpus labels, so
    * the only corpus-sized work is the scoring scan itself.
    *
    * Output: one row per query: (queryId, labelCol, votes).
    */
  def knnClassify(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(corpus, queries, corpusId, corpusVec,
      queryId, queryVec, k)
    corpus.select(col(corpusId), col(labelCol))
      .join(broadcast(nn.select(col(queryId), col(corpusId))), Seq(corpusId))
      .groupBy(col(queryId), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col(queryId))
      .agg(
        min_by(col(labelCol),
          struct((-col("votes")).as("__nv"), col(labelCol))).as(labelCol),
        max(col("votes")).as("votes"))
  }

  /** Linear-kernel maximum mean discrepancy between two embedding
    * corpora: MMD² = ‖μ_A − μ_B‖² (Gretton et al. 2012, the linear
    * kernel's closed form — kernel mean embeddings reduce to the
    * per-dimension mean vectors). The two-sample drift headline between
    * e.g. last month's corpus and this month's, complementing the
    * binned PSI view ([[embeddingDrift]]) with a single
    * metric-space-faithful number. Both sides must share `vecCol`'s
    * dimensionality (enforced: dimension sets must match).
    *
    * Exactness: per-dim sums route float→double→DECIMAL(28,10) (order-
    * free), means divide once in IEEE double, per-dim squared diffs cast
    * back to DECIMAL before the cross-dim sum — engines agree
    * bit-for-bit. Output one row: (n_a, n_b, n_dims, mmd2).
    *
    * Plan shape (100 TB posture): one posexplode per side into SKINNY
    * (pos, value) rows, one dim-bounded hash aggregate each (map-side
    * combined — the shuffle carries dim·partitions partials, vectors
    * never move), a dim-sized equi-join, and a 1-row finish. Map-only +
    * bounded everywhere.
    */
  def linearMmd(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    def dimMeans(df: DataFrame, side: String) = df
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy("__pos")
      .agg((sum(col("__v").cast("double").cast(dec)).cast("double") /
          count(lit(1))).as(s"__m_$side"),
        count(lit(1)).as(s"__n_$side"))
    val joined = dimMeans(a, "a").join(dimMeans(b, "b"), Seq("__pos"), "full")
    joined
      .select(
        ((col("__m_a") - col("__m_b")) * (col("__m_a") - col("__m_b")))
          .cast(dec).as("__t"),
        col("__n_a"), col("__n_b"), col("__m_a"), col("__m_b"))
      .agg(sum(col("__t")).cast("double").as("__mmd2"),
        max(col("__n_a")).as("n_a"), max(col("__n_b")).as("n_b"),
        count(lit(1)).as("n_dims"),
        sum(when(col("__m_a").isNull || col("__m_b").isNull, 1L)
          .otherwise(0L)).as("__mismatched"))
      .select(col("n_a"), col("n_b"), col("n_dims"),
        when(col("__mismatched") === 0, round(col("__mmd2"), 8) + lit(0.0))
          .otherwise(raise_error(concat(lit("linearMmd: sides disagree on "),
            col("__mismatched").cast("string"), lit(" dimension(s)"))))
          .as("mmd2"))
  }

  /** Centroid-based silhouette score per cluster (the simplified
    * silhouette of Hruschka et al. 2004, the same formulation Spark
    * ML's ClusteringEvaluator uses): for each point, a = distance to
    * its own cluster's centroid, b = distance to the NEAREST other
    * centroid, s = (b − a)/max(a, b); the exact Rousseeuw silhouette's
    * O(n²) pairwise distances collapse to O(n·k) centroid distances —
    * the only variant that exists at corpus scale. The number a
    * clustering pipeline (s23 k-means, s07 label centroids) watches to
    * decide whether k is right: near 1 = tight/separated, near 0 =
    * touching, negative = misassigned.
    *
    * Conventions: points with a NULL cluster are dropped; s = 0 when
    * a = b = 0 (point sits on two coincident centroids); a cluster's
    * silhouette is NULL when no other cluster exists (b undefined,
    * k = 1). Callers pass feature columns on a ROUNDED grid (the
    * quality-signal contract): centroid sums route through
    * DECIMAL(28,9) so means are order-free, per-point s rounds to 9 dp
    * and DECIMAL-sums per cluster — engines agree bit-for-bit.
    *
    * Plan shape (100 TB posture): ONE hash aggregate builds the
    * k-bounded centroid table, which BROADCASTS back across the points
    * (k rows — the k-means literal-model sanction); per-point a/b is
    * one k-wide aggregate keyed on the point id, and the report is one
    * cluster-bounded aggregate. No corpus-scale join, no window.
    *
    * Output: (cluster, n_points, silhouette), cluster as string.
    */
  def silhouetteScore(df: DataFrame, idCol: String, clusterCol: String,
      featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val fs = featureCols.indices.map(i => s"__f$i")
    val pts = df.filter(col(clusterCol).isNotNull)
      .select(col(idCol).as("__id") +: col(clusterCol).cast("string").as("__c") +:
        featureCols.zipWithIndex.map { case (f, i) =>
          col(f).cast("double").as(s"__f$i") }: _*)
    val cents = pts.groupBy("__c")
      .agg(count(lit(1)).as("__n"),
        featureCols.indices.map(i =>
          (sum(col(s"__f$i").cast(dec)).cast("double") /
            count(lit(1)).cast("double")).as(s"__m$i")): _*)
      .select(col("__c").as("__oc") +:
        featureCols.indices.map(i => col(s"__m$i")): _*)
    val dist = sqrt(featureCols.indices.map(i =>
      (col(s"__f$i") - col(s"__m$i")) * (col(s"__f$i") - col(s"__m$i")))
      .reduce(_ + _))
    val ab = pts.crossJoin(broadcast(cents))
      .select(col("__id"), col("__c"), col("__oc"), dist.as("__d"))
      .groupBy("__id", "__c")
      .agg(max(when(col("__oc") === col("__c"), col("__d"))).as("__a"),
        min(when(col("__oc") =!= col("__c"), col("__d"))).as("__b"))
    val s = ab.select(col("__c"),
      when(col("__b").isNull, lit(null).cast("double"))
        .when(greatest(col("__a"), col("__b")) === 0, lit(0.0))
        .otherwise(round((col("__b") - col("__a")) /
          greatest(col("__a"), col("__b")), 9)).as("__s"))
    s.groupBy(col("__c").as("cluster"))
      .agg(count(lit(1)).as("n_points"),
        (round(sum(col("__s").cast(dec)).cast("double") /
          count(col("__s")).cast("double"), 6) + lit(0.0)).as("silhouette"))
  }
}
