package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the unsalted result on skewed data") {
    // one hot key holding 80% of the fact side
    val fact = ((1 to 8000).map(_ => ("hot", 1.0)) ++
      (1 to 2000).map(i => (s"k${i % 50}", 2.0))).toDF("k", "v")
    val dim = ((0 until 50).map(i => (s"k$i", i)) :+ (("hot", 999))).toDF("k", "attr")
    val expected = fact.join(dim, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val got = SkewJoin.saltedJoin(fact, dim, Seq("k"), saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("salted left join keeps unmatched skewed rows exactly once") {
    val fact = ((1 to 100).map(_ => ("hot", 1)) ++ Seq(("orphan", 2))).toDF("k", "v")
    val dim = Seq(("hot", "h")).toDF("k", "attr")
    val got = SkewJoin.saltedJoin(fact, dim, Seq("k"), 4, "left_outer")
    assert(got.count() === 101L)
    assert(got.filter($"k" === "orphan").count() === 1L)
    assert(got.filter($"k" === "orphan" && $"attr".isNull).count() === 1L)
  }

  test("unsupported join types are rejected") {
    val df = Seq(("a", 1)).toDF("k", "v")
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedJoin(df, df, Seq("k"), 4, "full_outer"))
  }
}
