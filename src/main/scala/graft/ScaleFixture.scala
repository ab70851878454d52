package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic scale-up fixture for the scaling probe:
  * `runMain graft.ScaleFixture <srcSfDir> <outDir> [factor]` writes
  * `documents`, `orders` and `region` parquet under `outDir` with
  * `factor`× the source rows — the source unioned with id-shifted copies
  * (copy k shifts doc_id by k·100000 / o_orderkey by k·10⁷, far below the
  * +10⁶/+2·10⁶ offsets the query fixtures add, so nothing collides).
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
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k.toLong * 100000))
        .withColumn("text",
          if (k == 0) col("text") else translate(col("text"), abc, shifted(k)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    (0 until factor).map { k =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.read.parquet(s"$src/region.parquet")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    println(s"[scale-fixture] wrote ${factor}x documents/orders + region to $out")
    spark.stop()
  }
}
