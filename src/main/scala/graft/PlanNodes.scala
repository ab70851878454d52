package graft

import org.apache.spark.sql.SparkSession

/** Plan-pathology probe: per-node expression-tree sizes of a query's
  * OPTIMIZED plan, plus kernel-call counts per node — the diagnosis
  * recipe that caught the 45k-node substituted Filter (r16) and the
  * 235× duplicated stopword kernel (r17), as a main:
  * `runMain graft.PlanNodes <query> <sfDir> [minNodes=200]`.
  */
object PlanNodes {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanNodes <query> <sfDir> [minNodes]")
    val (name, dir) = (args(0), args(1))
    val minNodes = if (args.length > 2) args(2).toInt else 200
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lp = SparkEntry.queries(name)(spark, dir)
      .queryExecution.optimizedPlan
    var total = 0
    lp.foreach { n =>
      val sz = n.expressions.map(_.collect { case x => x }.size).sum
      total += sz
      if (sz >= minNodes) {
        val kernels = scala.collection.mutable.Map[String, Int]()
          .withDefaultValue(0)
        n.expressions.foreach(_.foreach { e =>
          val p = e.prettyName
          if (p.contains("_") || p == "regexp_replace" ||
            p == "regexp_extract_all") kernels(p) += 1
        })
        val top = kernels.toSeq.sortBy(-_._2).take(6)
          .map { case (k, c) => s"$k×$c" }.mkString(", ")
        println(s"[plan-nodes] ${n.nodeName}: $sz expr nodes ($top)")
      }
    }
    println(s"[plan-nodes] total expression nodes: $total")
    spark.stop()
  }
}
