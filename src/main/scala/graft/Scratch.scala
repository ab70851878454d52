package graft
// throwaway stage-timing probe for the r17 optimization round; not part
// of the driver contract (deleted before the round closes)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.Dedup
    import graft.functions.GraftFunctions
    val s = spark
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val buckets0 = Dedup.lshBuckets(docs, "doc_id", "text")
    time("1 lshBuckets noop")(noop(buckets0))
    time("1b lshBuckets noop again")(noop(buckets0))
    val capped = Dedup.capBuckets(buckets0, Seq("__band", "__bandkey"),
      1000, "m")
    time("2 capBuckets noop")(noop(capped))
    val a = capped.select(col("__band"), col("__bandkey"), col("doc_id").as("idA"))
    val b = capped.select(col("__band"), col("__bandkey"), col("doc_id").as("idB"))
    val cands = a.join(b, Seq("__band", "__bandkey"))
      .filter(col("idA") < col("idB")).select("idA", "idB").distinct()
    time("3 candidates noop")(noop(cands))
    val sets = docs.select(col("doc_id"),
      GraftFunctions.shingle_hashes(Dedup.normalized(col("text")), 5).as("__sh"))
    time("4 shingleSets noop")(noop(sets))
    val verif = cands
      .join(sets.select(col("doc_id").as("idA"), col("__sh").as("__shA")), "idA")
      .join(sets.select(col("doc_id").as("idB"), col("__sh").as("__shB")), "idB")
      .select(col("idA"), col("idB"),
        GraftFunctions.jaccard_sorted(col("__shA"), col("__shB")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    time("5 full pairs noop")(noop(verif))
    time("5b full pairs noop again")(noop(verif))
    // materialized variant: capped + candidates localCheckpointed
    def matPairs(): org.apache.spark.sql.DataFrame = {
      val cap2 = Dedup.capBuckets(Dedup.lshBuckets(docs, "doc_id", "text"),
        Seq("__band", "__bandkey"), 1000, "m2").localCheckpoint(true)
      val c2 = cap2.select(col("__band"), col("__bandkey"), col("doc_id").as("idA"))
        .join(cap2.select(col("__band"), col("__bandkey"), col("doc_id").as("idB")),
          Seq("__band", "__bandkey"))
        .filter(col("idA") < col("idB")).select("idA", "idB").distinct()
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(cap2)
      c2.join(sets.select(col("doc_id").as("idA"), col("__sh").as("__shA")), "idA")
        .join(sets.select(col("doc_id").as("idB"), col("__sh").as("__shB")), "idB")
        .select(col("idA"), col("idB"),
          GraftFunctions.jaccard_sorted(col("__shA"), col("__shB")).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
    }
    time("6 mat pairs end-to-end")(noop(matPairs()))
    time("6b mat pairs end-to-end again")(noop(matPairs()))
    val mangled = docs.select((col("doc_id") + 1000000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s", "").as("text"))
    val basePairs = time("basePairs construct") {
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.7)
    }
    val basePairsM = time("basePairs materialize") {
      basePairs.localCheckpoint(true)
    }
    val baseClusters = time("baseClusters (closure)") {
      Dedup.clusterAssignments(basePairsM.select("idA", "idB"),
        docs.select("doc_id"), "doc_id")
    }
    val deltaPairs = time("deltaPairs construct") {
      Dedup.minhashNearDupPairsIncremental(
        Dedup.lshBuckets(docs, "doc_id", "text"), docs, mangled,
        "doc_id", "text", threshold = 0.7)
    }
    val deltaPairsM = time("deltaPairs materialize") {
      deltaPairs.localCheckpoint(true)
    }
    val out = time("incremental closure") {
      Dedup.clusterAssignmentsIncremental(baseClusters,
        mangled.select("doc_id"), deltaPairsM.select("idA", "idB"), "doc_id")
    }
    time("final noop") {
      out.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
