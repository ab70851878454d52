package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial skew-guard probe:
  * `runMain graft.SkewProbe <sfDir> <op> <cap>` builds a hot-key media
  * corpus from `documents` — every ~100th asset is PURE boilerplate
  * (one shared jingle prefix / boilerplate lead frame rides EVERY
  * asset, the ~1%-hot shape of real crawls) — and runs the guarded
  * operator with the given cap (pass a huge cap to measure the
  * UNGUARDED quadratic path). Prints one JSON line with wall seconds,
  * pair count, and the guard's observed (dropped_buckets,
  * max_bucket_size) so BENCH_AB can table guard-on vs guard-off at
  * volume. `op` ∈ {audio, clip}.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: SkewProbe <sfDir> <audio|clip> <cap>")
    val (sfDir, op, cap) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metricName =
      if (op == "audio") "audio_fp_skew_guard" else "clip_frame_skew_guard"
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(metricName).foreach(r =>
          observed = Some((r.getAs[Long]("dropped_buckets"),
            r.getAs[Long]("max_bucket_size"))))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // the adversarial corpus: a shared 512-byte boilerplate lead (a
    // 32-window jingle / 32 lead frames, window- and frame-aligned so
    // every lead landmark/digest is shared verbatim; VARIED bytes — a
    // constant-energy lead would have no peaks and hence no landmarks)
    // on EVERY asset, distinct content after it — the hot buckets are
    // corpus-sized, the genuine signal is per-asset
    val lead = {
      val r = new scala.util.Random(42)
      (1 to 512).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        encode(concat(lit(lead), col("text")), "UTF-8").as("content"))
    val t0 = System.nanoTime()
    val n =
      if (op == "audio")
        graft.operators.Multimodal.audioFingerprintPairs(media, "media_id",
          "content", windowBytes = 16, minAligned = 2, maxHashGroup = cap)
          .count()
      else
        graft.operators.Multimodal.videoClipAlign(media, "media_id",
          "content", frameBytes = 16, minAligned = 2, maxDigestGroup = cap)
          .count()
    val wall = (System.nanoTime() - t0) / 1e9
    var waited = 0
    while (observed.isEmpty && waited < 10000) { Thread.sleep(50); waited += 50 }
    spark.listenerManager.unregister(listener)
    val (dropped, maxSz) = observed.getOrElse((-1L, -1L))
    println(f"""{"probe":"skew_$op","cap":$cap,"wall_sec":$wall%.2f,"pairs":$n,"dropped_buckets":$dropped,"max_bucket_size":$maxSz,"sf":"$sfDir"}""")
    spark.stop()
  }
}
