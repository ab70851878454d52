package graft.operators

import graft.functions.{BloomFilterKernel, GraftFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-pruned equi-join — the runtime-filter pattern (a.k.a. sideways
 * information passing; the technique behind Spark's own
 * InjectRuntimeFilter rule, made explicit and caller-controllable): when
 * a corpus-scale FACT side joins a selective but not-broadcastable
 * BUILD side, pre-filter the fact side MAP-SIDE with a constant-size
 * Bloom membership sketch of the build side's join keys BEFORE the
 * fact-side shuffle. Rows whose key cannot possibly match never enter
 * the exchange — at a 1% match rate that is a ~100× cut of fact-side
 * shuffle bytes for a few hundred MB of bits broadcast once.
 *
 * Result-identical to the plain inner join: a Bloom filter has no false
 * negatives (no matching row is ever pruned), and false positives only
 * let extra rows through to the exact join, which drops them. The
 * sketch is embedded as a literal (one driver-side collect of a single
 * constant-size row — the [[graft.operators.TextAnalysis.buildGramBloom]]
 * sanction); carrying it as a joined column would memcpy the bit array
 * out of every probe row.
 *
 * Observability: `bloom_join_pruned` reports input/kept fact-row counts
 * per action, so the realized selectivity is visible the same way the
 * LSH skew guards are.
 */
object BloomJoin {

  /** Inner equi-join `fact ⨝ build` on `key` (same column name both
    * sides), with the fact scan pre-filtered by a Bloom sketch of
    * `build`'s keys. `expectedKeys < 0` sizes the filter from a cheap
    * count of the build side (an overestimate is linear in bits and
    * harmless; an underestimate inflates the false-positive rate, never
    * the result). Keys are hashed with `xxhash64` on both sides; null
    * keys never match an inner join and may prune early.
    */
  def bloomPrunedInnerJoin(fact: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val nKeys = if (expectedKeys > 0) expectedKeys
      else math.max(1L, build.count())
    val numBits = BloomFilterKernel.optimalBits(nKeys, fpp)
    val numHashes = BloomFilterKernel.optimalHashes(numBits.toLong, nKeys)
    val sketch = build
      .agg(GraftFunctions.bloom_agg(xxhash64(col(key)), numBits, numHashes)
        .as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
    // probe once per row: materialize the verdict as a column, count it
    // in the observe, then filter on it — probing again inside the
    // filter would run the k hash probes twice per fact row
    val pruned = fact
      .withColumn("__keep", GraftFunctions.bloom_might_contain(
        lit(sketch), xxhash64(col(key))))
      .observe("bloom_join_pruned",
        count(lit(1)).as("fact_rows_in"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("fact_rows_kept"))
      .filter(col("__keep")).drop("__keep")
    pruned.join(build, Seq(key), "inner")
  }
}
