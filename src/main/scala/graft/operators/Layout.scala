package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout for write clustering — the Z-order
 * (Morton) curve over two columns, as used by lakehouse OPTIMIZE/ZORDER
 * commands to make file-level min/max statistics selective on BOTH
 * columns at once. A table range-partitioned and sorted by `zkey` stores
 * rows of a 2-D box in a handful of contiguous key ranges, so a scan
 * with predicates on either (or both) dimensions prunes most files;
 * a plain lexicographic sort only ever prunes on the leading column.
 *
 * Scale shape: scaling bounds come from ONE bounded aggregate (4 longs
 * collected at plan time — same sanctioned pattern as the IVF centroid
 * sample); the key itself is a codegen'd bit-interleave expression, and
 * the layout is `repartitionByRange` + `sortWithinPartitions` — exactly
 * one range shuffle, no global sort on the driver.
 */
object Layout {

  /** Exact integer scaling of `[lo, hi]` onto `[0, 2^bits)`:
    * `((v - lo) * mask) div (hi - lo)` — all-BIGINT arithmetic, no
    * doubles (a double formulation misplaces cells past 2^53, silently
    * breaking locality for snowflake-id axes).
    */
  private def scaledExpr(name: String, lo: Long, hi: Long, bits: Int) = {
    val mask = (1L << bits) - 1
    // guard in BigInt: hi - lo itself overflows Long for ranges wider
    // than 2^63 (signed ids spanning both halves), which would slip a
    // wrapped-negative span past a Long-arithmetic check
    val span = BigInt(hi) - BigInt(lo)
    require(span == 0 || span <= Long.MaxValue / mask,
      s"column $name range $span overflows the $bits-bit scaler; " +
        "use fewer bits or pre-scale")
    if (span == 0) expr("0L")
    else expr(s"((CAST(`$name` AS BIGINT) - ${lo}L) * ${mask}L) div ${span.toLong}L")
  }

  /** ONE plan-time bounds aggregate for a 2-axis curve key (the z-order
    * sanction: 4 longs of driver state). Shared by [[zorderKey]] and
    * [[hilbertKey]].
    */
  private def bounds2(df: DataFrame, a: String, b: String): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Adds column `zkey`: the Morton interleave of `a` and `b` min-max
    * scaled to `bits` bits each. Inputs must be integral and non-null.
    */
  def zorderKey(df: DataFrame, a: String, b: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val (la, ha, lb, hb) = bounds2(df, a, b)
    df.withColumn("zkey",
      GraftFunctions.interleave_bits(
        scaledExpr(a, la, ha, bits), scaledExpr(b, lb, hb, bits), bits))
  }

  /** Adds column `hkey`: the 2-D Hilbert index of `a` and `b` min-max
    * scaled to `bits` bits each — same plan-time bounds collect and
    * map-only codegen shape as [[zorderKey]], but consecutive keys are
    * always grid-ADJACENT cells (Morton jumps diagonally at every power
    * of two), so files sorted by `hkey` cover strictly tighter boxes and
    * min/max stats prune better on box queries. The standard layout
    * upgrade when both query dimensions matter equally.
    */
  def hilbertKey(df: DataFrame, a: String, b: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val (la, ha, lb, hb) = bounds2(df, a, b)
    df.withColumn("hkey",
      GraftFunctions.hilbert_index(
        scaledExpr(a, la, ha, bits), scaledExpr(b, lb, hb, bits), bits))
  }

  /** N-dimensional Morton key — the general form of [[zorderKey]]
    * (lakehouse OPTIMIZE ZORDER takes any column count): output bit
    * `j·n + k` is bit `j` of scaled column `k`, so `zorderKeyN(a, b)`
    * equals the 2-D kernel bit-for-bit (spec-pinned). The interleave is
    * plain shift/mask arithmetic — `n·bits` codegen'd terms, no UDF —
    * and the scaling bounds come from ONE plan-time aggregate (2n longs,
    * the z-order sanction). Requires `n·bits <= 63`.
    */
  def zorderKeyN(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val n = cols.size
    val scaled = scaledN(df, cols, bits)
    val key = (0 until bits).flatMap { j =>
      scaled.zipWithIndex.map { case (s, k) =>
        shiftleft(shiftrightunsigned(s, j).bitwiseAND(lit(1L)), j * n + k)
      }
    }.reduce(_ + _)
    df.withColumn("zkey", key)
  }

  /** N-dimensional Hilbert key — the general form of [[hilbertKey]]
    * (Skilling's transform, the standard public n-axis formulation; for
    * two columns it walks the exact same curve as the 2-D kernel,
    * spec-pinned exhaustively). Same ONE plan-time bounds aggregate (2n
    * longs) and exact-integer scaling as [[zorderKeyN]]; the key is a
    * single codegen'd kernel call over the scaled coordinate array —
    * map-only, no UDF, no shuffle. Requires `n·bits <= 63`.
    */
  def hilbertKeyN(df: DataFrame, cols: Seq[String], bits: Int): DataFrame =
    df.withColumn("hkey",
      GraftFunctions.hilbert_index_n(array(scaledN(df, cols, bits): _*), bits))

  /** Shared front half of the N-D curve keys: ONE bounds aggregate over
    * all axes (2n longs of plan-time driver state), then the exact
    * integer scaling of each axis onto `[0, 2^bits)`.
    */
  private def scaledN(df: DataFrame, cols: Seq[String], bits: Int) = {
    require(cols.size >= 2, "need at least two layout columns")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, k) =>
      scaledExpr(c, bounds.getLong(2 * k), bounds.getLong(2 * k + 1), bits)
    }
  }

  /** Full layout: key, one range shuffle on it, in-partition sort — the
    * shape a clustered parquet write wants (each output file covers a
    * compact z-range, i.e. a compact 2-D box).
    */
  def zorderBy(df: DataFrame, a: String, b: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val keyed = zorderKey(df, a, b, bits)
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("zkey"))
      else keyed.repartitionByRange(col("zkey"))
    parted.sortWithinPartitions("zkey")
  }

  /** Deterministic training-shard layout — the "global shuffle + shard"
    * step that turns a curated corpus into training files: every row gets
    * a `shard` in [0, numShards) and a dense `pos_in_shard` rank, both
    * pure functions of the row's `shardKey` (pass a content hash, e.g.
    * [[TextAnalysis.fingerprint]]). A hash order is statistically
    * indistinguishable from a uniform random permutation but reproducible
    * across runs, retries, and cluster layouts — the property a training
    * run needs to resume mid-epoch or re-derive any shard independently
    * (`rand()`-based shuffles lose it on every retry). Hash sharding
    * balances shards to O(√(n/shards)) deviation without the global
    * total-order pass an exactly-equal split would force.
    *
    * Scale shape: ONE shuffle keyed on `shard`, then a per-shard sort for
    * the rank — shards sort in parallel, there is no global window. Each
    * shard must fit a task's sort budget (spillable), so size `numShards`
    * to the corpus: at 100 TB pick thousands of shards, which is what
    * training-data layouts do anyway. Writing follows the same key:
    * `.write.partitionBy("shard")` emits one directory per shard already
    * in `pos_in_shard` order.
    *
    * Ties on `shardKey` (duplicate texts) break by `idCol`, so the
    * layout is total and deterministic.
    */
  def shardBy(df: DataFrame, idCol: String, shardKey: org.apache.spark.sql.Column,
      numShards: Int): DataFrame = {
    require(numShards >= 1, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__skey", shardKey)
      .withColumn("shard", pmod(col("__skey"), lit(numShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__skey"), col(idCol))
    keyed.withColumn("pos_in_shard", (row_number().over(w) - 1).cast("long"))
      .drop("__skey")
  }

  /** Deterministic training-epoch shuffle: epoch `e`'s global order is
    * the [[graft.functions.Mix64]] avalanche of `id ^ e` — a different,
    * reproducible corpus permutation per epoch with no RNG state,
    * realized as the [[shardBy]] layout (shard = key mod `numShards`,
    * `pos_in_shard` = rank of the key within its shard). A reader streams
    * shards in index order concatenating `pos_in_shard` runs — a full
    * permutation with NO global sort; each shard sorts independently.
    * Rows added between epochs land at their key's position without
    * perturbing the rest of the order.
    */
  def epochShuffle(df: DataFrame, idCol: String,
      epoch: Int, numShards: Int): DataFrame =
    shardBy(df, idCol,
      GraftFunctions.mix64(col(idCol).cast("long"), epoch.toLong), numShards)

  /** Compaction planning for small-file tables — the grouping step of a
    * lakehouse OPTIMIZE: given per-file statistics, assign every file a
    * `bin` so each bin's bytes land near `targetBytes` and a rewrite job
    * can compact bin-by-bin. Files are taken LARGEST-FIRST within their
    * table partition and binned by running total (`(cum − bytes) div
    * target`) — the deterministic one-pass cousin of first-fit-decreasing:
    * bins fill to at least the target minus one file, a file larger than
    * the target isolates into its own bin, and the assignment replays
    * bit-identically (ties break on the path).
    *
    * Scale shape: one window per table partition — partitions plan in
    * parallel, there is no global sort; file-stat rows are tiny (path,
    * bytes), so even a million-file table is a few tens of MB through the
    * shuffle. With `partitionCols` empty the whole table is one planning
    * group (correct, but serial — partitioned tables should pass their
    * partition columns).
    *
    * Output: input columns + `bin` (0-based within the partition group).
    */
  def compactionGroups(files: DataFrame, partitionCols: Seq[String],
      pathCol: String, bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = (if (partitionCols.isEmpty) Window.partitionBy(lit(0))
      else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(bytesCol).desc, col(pathCol).asc)
    files
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("bin", expr(s"(__cum - `$bytesCol`) div ${targetBytes}L"))
      .drop("__cum")
  }
}
