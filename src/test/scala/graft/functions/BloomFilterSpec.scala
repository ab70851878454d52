package graft.functions

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel: inserted keys are always found (no false negatives)") {
    val buf = BloomFilterKernel.create(numBits = 4096, numHashes = 5)
    val keys = (1L to 300L).map(_ * 0x9E3779B97F4A7C15L)
    keys.foreach(BloomFilterKernel.put(buf, _))
    assert(keys.forall(BloomFilterKernel.mightContain(buf, _)))
  }

  test("kernel: false-positive rate is near the design point") {
    val n = 1000L
    val bits = BloomFilterKernel.optimalBits(n, 0.01)
    val k = BloomFilterKernel.optimalHashes(bits.toLong, n)
    val buf = BloomFilterKernel.create(bits, k)
    (1L to n).foreach(BloomFilterKernel.put(buf, _))
    val fps = (1000001L to 1010000L).count(BloomFilterKernel.mightContain(buf, _))
    assert(fps < 300, s"~1% design fpp but got $fps/10000 false positives")
  }

  test("kernel: merge is bitwise OR — union membership") {
    val a = BloomFilterKernel.create(1024, 3)
    val b = BloomFilterKernel.create(1024, 3)
    BloomFilterKernel.put(a, 42L); BloomFilterKernel.put(b, 99L)
    val m = BloomFilterKernel.merge(a, b)
    assert(BloomFilterKernel.mightContain(m, 42L))
    assert(BloomFilterKernel.mightContain(m, 99L))
    intercept[IllegalArgumentException] {
      BloomFilterKernel.merge(BloomFilterKernel.create(512, 3), b)
    }
  }

  test("bloom_agg builds across partitions; probe sees every inserted key") {
    val keys = (1L to 2000L).map(i => Mix64.mix(i))
    val df = keys.toDF("k").repartition(7)
    val bloom = df.agg(GraftFunctions.bloom_agg(col("k"), 65536, 7).as("b"))
    val missed = df.crossJoin(broadcast(bloom))
      .filter(!GraftFunctions.bloom_might_contain(col("b"), col("k")))
      .count()
    assert(missed === 0L, "a partial-merge path dropped inserted keys")
  }

  test("bloom_agg ignores nulls; probe of an empty filter is always false") {
    val df = Seq[Option[Long]](None, None).toDF("k")
    val bloom = df.agg(GraftFunctions.bloom_agg(col("k"), 1024, 3).as("b"))
    val hits = Seq(1L, 2L, 3L).toDF("v").crossJoin(broadcast(bloom))
      .filter(GraftFunctions.bloom_might_contain(col("b"), col("v"))).count()
    assert(hits === 0L)
  }

  test("decontaminateBloom flags a superset of the exact decontamination set") {
    val training = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "totally unrelated words nothing shared here at all"),
      (4L, "")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "three four five six seven")).toDF("doc_id", "text")
    val exact = TextAnalysis.decontaminate(training, eval, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val got = TextAnalysis.decontaminateBloom(training, eval, "doc_id", "text",
        expectedGrams = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val flagged = got.filter(_._3).map(_._1).toSet
    assert(exact === Set(1L, 2L))
    assert(exact.subsetOf(flagged), "bloom screen must never miss a true hit")
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L),
      "every training doc appears, hit or not")
    got.filter(g => !g._3).foreach(g => assert(g._2 === 0L))
  }
}
