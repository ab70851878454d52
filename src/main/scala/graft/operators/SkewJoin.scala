package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Key-salted equi-join for skewed fact-fact joins — the manual escape
 * hatch when AQE's skew-join split can't help (e.g. one key holding a
 * double-digit percentage of the table, or a sort-merge join feeding a
 * stateful op that AQE won't re-plan).
 *
 * Mechanics: the skewed side gets a deterministic salt in `[0, saltFactor)`
 * appended to the join key, spreading one hot key over `saltFactor`
 * reducers; the other side is replicated `saltFactor`× so every salted key
 * still finds its partner. Join cardinality and results are IDENTICAL to
 * the unsalted join — only the shuffle layout changes. Cost: the other
 * side's shuffle volume × saltFactor, so salt the side that is LARGE and
 * HOT, replicate the side that is small-ish (if the other side is truly
 * small, use `broadcast()` instead — salting is for when BOTH sides are
 * too big to broadcast).
 *
 * The salt is a hash of the skewed side's whole row (deterministic across
 * retries — no rand(), which would break task retry idempotence).
 * Supported join types: inner and left_outer (the replicated side's
 * unmatched rows would be duplicated under right/full semantics).
 */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame, replicated: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join supports inner/left_outer, not '$joinType' " +
        "(the replicated side would duplicate unmatched rows)")
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val expanded = replicated.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
