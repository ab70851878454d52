package graft
import org.apache.spark.sql.SparkSession

/** Single-query profiler: `runMain graft.Profile <query> <sfDir> [n]`
  * prints the formatted physical plan, then executes the query `n` times
  * (default 3) through the same `noop` sink as [[Bench]] and prints each
  * wall time — the local loop for plan iteration on one operator without
  * paying for the whole bench suite.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
