package graft

import org.apache.spark.sql.types._

/** Canary for the driver-generated fixture contract. The fixtures are
  * regenerated between rounds and their PHYSICAL types have already
  * changed once (`events.ts`: parquet timestamp(NANOS) → timestamp(MICROS),
  * which silently flips the Spark-side type from LONG to TIMESTAMP_NTZ and
  * broke every query doing integer time arithmetic). These tests pin the
  * assumptions the query surface is written against, so the NEXT
  * regeneration that moves a type fails here with a diagnosis instead of
  * as 30 DATATYPE_MISMATCH correctness errors.
  */
class FixtureContractSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def load(name: String) =
    graft.sources.Tables.load(spark, graft.model.TableRef(path = dir), name)

  test("events.ts normalizes to epoch-nanos LONG through SparkEntry's loader") {
    // whatever the physical parquet type, the query surface sees long nanos
    val ts = SparkEntry.queries("j09_interval_overlap")(spark, dir)
    assert(ts.schema("overlap_us").dataType === LongType)
    // and the raw loader yields either long (nanosAsLong path) or a
    // timestamp type (micros path) — anything else is a new contract break
    val raw = load("events").schema("ts").dataType
    assert(raw === LongType || raw === TimestampType || raw === TimestampNTZType,
      s"events.ts arrived as $raw — extend SparkEntry.t's normalization")
  }

  test("embeddings are 64-dim float arrays with long ids") {
    val e = load("embeddings")
    assert(e.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    assert(e.schema("vec_id").dataType === LongType)
    val dims = e.selectExpr("size(embedding) d").distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(64),
      s"embedding dims $dims — the s-queries hardcode dim = 64")
  }

  test("documents carry (doc_id long, text string, lang, source, n_chars)") {
    val d = load("documents")
    assert(d.schema("doc_id").dataType === LongType)
    assert(d.schema("text").dataType === StringType)
    assert(Seq("lang", "source", "n_chars").forall(d.columns.contains),
      s"documents columns drifted: ${d.columns.mkString(", ")}")
  }

  test("documents.text has no null / empty / whitespace-only rows " +
      "(zero-token edge conventions differ between the engines)") {
    // several text queries (t26's mean-word-length and stopword ratios,
    // t02's quality blend, the per-token explodes) guard zero-token text
    // differently than their DuckDB oracles can express — the gates only
    // agree because the corpus never exercises that edge. Pin it at BOTH
    // fixture scales the driver uses, so a regeneration that introduces
    // degenerate docs fails here with a diagnosis instead of as scattered
    // hash mismatches.
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.load(spark,
        graft.model.TableRef(path = d), "documents")
      val bad = docs.filter(
        org.apache.spark.sql.functions.col("text").isNull ||
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text")) === "").count()
      assert(bad === 0L,
        s"$d/documents has $bad null/blank text rows — align the zero-token " +
          "conventions (engine vs oracle) before trusting the text gates")
    }
  }

  test("lineitem/orders date columns stay timestamp-typed (string-literal comparisons)") {
    // q1/q03/w-queries compare these against 'yyyy-MM-dd HH:mm:ss' strings
    // and call year()/date_trunc — a move to long epoch would break both
    for ((tbl, c) <- Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate")) {
      val dt = load(tbl).schema(c).dataType
      assert(dt === TimestampType || dt === TimestampNTZType || dt === DateType,
        s"$tbl.$c arrived as $dt — query surface expects a date/time type")
    }
  }
}
