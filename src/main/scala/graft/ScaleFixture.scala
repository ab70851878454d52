package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic scale-up fixture for the scaling probe:
  * `runMain graft.ScaleFixture <srcSfDir> <outDir> [factor]` writes
  * `documents`, `orders`, `embeddings` and `region` parquet under
  * `outDir` with `factor`× the source rows — the source unioned with
  * id-shifted copies (copy k shifts doc_id/vec_id by k·100000 /
  * o_orderkey by k·10⁷, far below the +10⁶/+2·10⁶ offsets the query
  * fixtures add, so nothing collides).
  *
  * Copy TEXT is Caesar-shifted per copy (a per-copy `translate` over the
  * lowercase alphabet): token/shingle spaces of different copies are
  * disjoint, so near-dup/all-pairs operators see 10× INDEPENDENT content
  * — the honest scaling measurement — rather than 10 exact duplicates of
  * every document (which would quadratically inflate pair counts by
  * fixture construction and measure the fixture, not the operator).
  * Never writes into /root/testdata; pass an outDir under /tmp.
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    require(!out.startsWith("/root/testdata"), "outDir must not touch the read-only fixtures")
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def shifted(k: Int) = abc.drop(k % 26) + abc.take(k % 26)
    // `source` doubles as the HOST key of the web family (t64's
    // site-level template removal): copy k gets its own host namespace,
    // so 10x data means 10 disjoint crawls of 10x the SITES — per-host
    // template page-counts stay source-scale (the honest measurement)
    // instead of every host's count inflating 10x by fixture construction
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k.toLong * 100000))
        .withColumn("text",
          if (k == 0) col("text") else translate(col("text"), abc, shifted(k)))
        .withColumn("source",
          if (k == 0) col("source")
          else concat(col("source"), lit(s"_c$k")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    (0 until factor).map { k =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // embeddings (the s-family / g21 probe tables): copy k applies a
    // PER-COPY ISOMETRY — component rotation by k plus a fixed per-copy
    // sign pattern. Within a copy every pairwise distance (and thus the
    // copy's whole ANN/kNN structure) is exactly the source's; across
    // copies vectors decorrelate, so candidate sets stay independent —
    // the embedding analogue of the Caesar shift (cluster sizes cannot
    // inflate by fixture construction).
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = 64
    def remix(k: Int) =
      if (k == 0) col("embedding")
      else expr(
        s"""transform(sequence(0, ${dim - 1}), i ->
           |  CAST(element_at(embedding, (CAST(i AS INT) + $k) % $dim + 1) *
           |       CASE WHEN (CAST(i AS INT) + $k) % 3 = 0
           |            THEN -1.0 ELSE 1.0 END AS FLOAT))""".stripMargin)
    (0 until factor).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k.toLong * 100000))
        .withColumn("embedding", remix(k))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    spark.read.parquet(s"$src/region.parquet")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    println(s"[scale-fixture] wrote ${factor}x documents/orders/embeddings" +
      s" + region to $out")
    spark.stop()
  }
}
