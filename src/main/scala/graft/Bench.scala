package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, fully materializing each result through a `noop`
  * sink (forces real execution incl. shuffles/windows — `count()` would let
  * Catalyst prune most of the work). Prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // warm the session (codegen, file listing, shuffle machinery) so the
    // first timed query doesn't absorb JVM/session startup
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    // engine-observed output rows per query (an `observe` CollectMetrics
    // node rides the normal execution — no second job), captured through
    // the listener bus and reported as rows/s alongside wall time
    val observedRows = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val obsListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (metric, row) =>
          if (metric.startsWith("bench_"))
            observedRows.put(metric.stripPrefix("bench_"), row.getAs[Long]("rows"))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(obsListener)
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run for local iteration (the
    // driver never sets it — per-round behavior is the full sweep)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir)
            .observe(s"bench_$name",
              org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("rows"))
            .write.format("noop").mode("overwrite").save()
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    spark.listenerManager.unregister(obsListener)
    // failed queries carry a -1 sentinel so a failure can never read as a
    // fast success in the JSON line
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val rates = results.collect { case (k, v, true) if observedRows.containsKey(k) =>
      "\"" + k + "\":" + f"${observedRows.get(k) / math.max(v, 1e-9)}%.0f"
    }.mkString("{", ",", "}")
    // absolute observed output rows — bench_diff separates "same rows,
    // slower wall" (drift) from "rows changed" (the work itself moved)
    val rows = results.collect { case (k, _, true) if observedRows.containsKey(k) =>
      "\"" + k + "\":" + observedRows.get(k)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"rows_per_sec":$rates,"rows":$rows,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
