package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity join (record linkage): all row pairs whose
 * string values are within a Levenshtein distance bound — the Ed-Join
 * shape (Xiao, Wang, Lin, "Ed-Join: An Efficient Algorithm for
 * Similarity Joins with Edit Distance Constraints", VLDB 2008; see
 * PAPERS.md): q-gram prefix filtering under a global rarest-first gram
 * order + length filter + exact verification. The reference engine has
 * no fuzzy matching at all (its filters are MVEL row predicates,
 * `implementation/RowFilter.java`); this is the linkage operator a
 * training-data pipeline needs for entity resolution across noisy
 * catalog/author/title fields.
 *
 * Plan shape (100 TB posture):
 *   1. Distinct q-gram set per row — map-only (`transform`/`substr`,
 *      codegen).
 *   2. ONE gram document-frequency aggregate over all rows (skinny
 *      `(gram)` shuffle) — the global order that makes prefixes RARE.
 *   3. Per-row signature: the `q·d + 1` globally-rarest grams. The
 *      pigeonhole: `d` edits each create/destroy at most `q` distinct
 *      grams, so two rows within distance `d` satisfy
 *      `|A ∩ B| >= |A| − q·d` — when `|A| > q·d` the rarest-`(q·d+1)`
 *      prefixes of both sides must intersect. One per-row regroup; the
 *      collect_list is bounded by the row's own gram count.
 *   4. Candidate join on signature grams — the joined frames carry
 *      `(id, str)` only, and buckets are naturally bounded because
 *      signatures are the RAREST grams; a [[Dedup.capBuckets]] skew
 *      guard (observed metric `edjoin_skew_guard`) bounds adversarial
 *      gram distributions the same way d03/d11 bound theirs.
 *   5. SHORT branch: a row whose distinct-gram set has `|A| <= q·d`
 *      members (short or highly repetitive strings) gets NO pigeonhole
 *      guarantee — such a pair can be within distance `d` sharing zero
 *      grams (e.g. "ab"/"ac" at q=3). Those rows join by a LENGTH BAND
 *      instead (`|len(a) − len(b)| <= d` always holds at distance `d`),
 *      against the pool of rows with `|B| <= 2·q·d` (set sizes differ by
 *      at most `q·d` at distance `d`, so no partner outside the pool is
 *      possible). Bounded fan-out `2d+1` per row; per-length buckets are
 *      capped by the same observed guard (`edjoin_short_guard`). In a
 *      real corpus this branch holds the tiny sub-`q(d+1)`-char /
 *      single-gram tail.
 *   6. Length filter + exact `levenshtein` verify (codegen'd binary
 *      expression) on the candidate-restricted union only.
 * No window, no cartesian, no driver-side state; strings ride only
 * candidate-restricted frames (the d03 verification posture). Null
 * strings never pair (`levenshtein(null, _)` is null, filtered).
 */
object FuzzyJoin {

  /** All pairs `(id_a, id_b, dist)` with `id_a < id_b` drawn from `df`
    * where `levenshtein(str_a, str_b) <= maxDist`. Exact modulo the skew
    * guard (`maxGramGroup`, observed as `edjoin_skew_guard` /
    * `edjoin_short_guard`): rows whose signature grams (or, short
    * branch, length buckets) ALL sit in over-cap buckets can lose
    * candidates — with rarest-first signatures that takes an adversarial
    * distribution, and the metrics make it visible. `maxGramGroup <= 0`
    * disables both guards.
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3, maxGramGroup: Int = 10000): DataFrame = {
    val rows = gramRows(df.select(col(idCol).as("__id"),
      col(strCol).as("__s")), maxDist, q)
    val sigs = signatures(rows, maxDist, q, maxGramGroup)
    val long = sigs.select(col("__g"), col("__id").as("id_a"),
        col("__s").as("__sa"))
      .join(sigs.select(col("__g"), col("__id").as("id_b"),
        col("__s").as("__sb")), "__g")
      .filter(col("id_a") < col("id_b"))
    val short = shortBand(rows, maxDist, q, maxGramGroup)
    val pool = shortPool(rows, maxDist, q)
    val shortCands = short.select(col("__lb"), col("__id").as("id_a"),
        col("__s").as("__sa"))
      .join(pool.select(col("__len").as("__lb"), col("__id").as("__pid"),
        col("__s").as("__ps")), "__lb")
      .filter(col("id_a") =!= col("__pid"))
      .select(least(col("id_a"), col("__pid")).as("id_a"),
        greatest(col("id_a"), col("__pid")).as("id_b"),
        when(col("id_a") < col("__pid"), col("__sa"))
          .otherwise(col("__ps")).as("__sa"),
        when(col("id_a") < col("__pid"), col("__ps"))
          .otherwise(col("__sa")).as("__sb"))
    verify(long.select("id_a", "id_b", "__sa", "__sb")
      .unionByName(shortCands), maxDist)
  }

  /** Two-table variant: all `(left, right)` row pairs within `maxDist`,
    * emitted as `(id_a = left id, id_b = right id, dist)`. The
    * gram-frequency order is computed over BOTH sides (a shared order is
    * what the prefix pigeonhole needs); the short branch takes
    * guarantee-less rows from EITHER side against the other side's
    * partner pool.
    */
  def editDistanceJoin(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, q: Int = 3, maxGramGroup: Int = 10000): DataFrame = {
    val both = left.select(col(leftId).as("__id"), col(leftStr).as("__s"),
        lit(0).as("__side"))
      .unionByName(right.select(col(rightId).as("__id"),
        col(rightStr).as("__s"), lit(1).as("__side")))
    val rows = gramRows(both, maxDist, q)
    val sigs = signatures(rows, maxDist, q, maxGramGroup)
    val long = sigs.filter(col("__side") === 0)
      .select(col("__g"), col("__id").as("id_a"), col("__s").as("__sa"))
      .join(sigs.filter(col("__side") === 1)
        .select(col("__g"), col("__id").as("id_b"), col("__s").as("__sb")),
        "__g")
    // short branch both ways: a pigeonhole-less LEFT row against the
    // right pool, and a pigeonhole-less RIGHT row against the left pool
    val short = shortBand(rows, maxDist, q, maxGramGroup)
    val pool = shortPool(rows, maxDist, q)
    def cross(shortSide: Int): DataFrame =
      short.filter(col("__side") === shortSide)
        .select(col("__lb"), col("__id").as("__sid"), col("__s").as("__ss"))
        .join(pool.filter(col("__side") === 1 - shortSide)
          .select(col("__len").as("__lb"), col("__id").as("__pid"),
            col("__s").as("__ps")), "__lb")
        .select(
          (if (shortSide == 0) col("__sid") else col("__pid")).as("id_a"),
          (if (shortSide == 0) col("__ss") else col("__ps")).as("__sa"),
          (if (shortSide == 0) col("__pid") else col("__sid")).as("id_b"),
          (if (shortSide == 0) col("__ps") else col("__ss")).as("__sb"))
    verify(long.select("id_a", "id_b", "__sa", "__sb")
      .unionByName(cross(0)).unionByName(cross(1)), maxDist)
  }

  /** Distinct q-grams of `s` as an array column; a string shorter than
    * `q` contributes itself as its only gram (it still lands in the
    * SHORT branch — the array only feeds the frequency order).
    */
  private[graft] def gramsOf(s: Column, q: Int): Column =
    when(length(s) >= q,
      array_distinct(transform(
        sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q)))))
      .otherwise(array(s))

  /** Input rows annotated with their distinct-gram array and its size:
    * `(__id, __s, [extras], __grams, __n)`.
    */
  private def gramRows(df: DataFrame, maxDist: Int, q: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(q >= 2, s"q must be >= 2: $q")
    df.withColumn("__grams", gramsOf(col("__s"), q))
      .withColumn("__n", size(col("__grams")))
  }

  /** Signature rows `(__id, __s, [extras], __g)` for the LONG branch
    * (`__n > q·d`): one row per rarest-`(q·d + 1)` gram under the global
    * `(df, gram)` order, skew-capped.
    */
  private def signatures(rows: DataFrame, maxDist: Int, q: Int,
      maxGramGroup: Int): DataFrame = {
    val carry = rows.columns.filterNot(
      Seq("__grams", "__n", "__g0", "__df").contains).toSeq
    val long = rows.filter(col("__n") > q * maxDist)
    val grams = long.select(carry.map(col) :+
      explode(col("__grams")).as("__g0"): _*)
    val gramDf = grams.groupBy(col("__g0")).agg(count(lit(1)).as("__df"))
    val ranked = grams.join(gramDf, "__g0")
      .groupBy(carry.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__df"), col("__g0"))))
        .as("__sorted"))
      .select(carry.map(col) :+
        explode(slice(col("__sorted.__g0"), 1, q * maxDist + 1))
          .as("__g"): _*)
    Dedup.capBuckets(ranked, Seq("__g"), maxGramGroup, "edjoin_skew_guard")
  }

  /** SHORT-branch left side: rows with no pigeonhole guarantee
    * (`__n <= q·d`), fanned out to every partner length in
    * `[len − d, len + d]` as `__lb`, per-length buckets skew-capped.
    */
  private def shortBand(rows: DataFrame, maxDist: Int, q: Int,
      maxGramGroup: Int): DataFrame = {
    val carry = rows.columns.filterNot(
      Seq("__grams", "__n", "__lb").contains).toSeq
    val banded = rows.filter(col("__n") <= q * maxDist)
      .select(carry.map(col) :+
        explode(sequence(length(col("__s")) - maxDist,
          length(col("__s")) + maxDist)).as("__lb"): _*)
      .filter(col("__lb") >= 0)
    Dedup.capBuckets(banded, Seq("__lb"), maxGramGroup, "edjoin_short_guard")
  }

  /** SHORT-branch partner pool: every row a guarantee-less row could be
    * within `maxDist` of — set sizes at distance `d` differ by at most
    * `q·d`, so `__n <= 2·q·d` is complete. Carries `__len` to meet the
    * band key.
    */
  private def shortPool(rows: DataFrame, maxDist: Int, q: Int): DataFrame =
    rows.filter(col("__n") <= 2 * q * maxDist)
      .withColumn("__len", length(col("__s")))

  /** Length filter + exact Levenshtein over candidate pairs carrying
    * `(id_a, id_b, __sa, __sb)`; emits distinct `(id_a, id_b, dist)`.
    */
  private def verify(cands: DataFrame, maxDist: Int): DataFrame =
    cands
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
      .distinct()
      .filter(levenshtein(col("__sa"), col("__sb")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).as("dist"))
}
