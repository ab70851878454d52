package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Eval-vs-codegen agreement: DataFrame execution exercises the codegen
  * path; the expected values here are computed with plain JVM semantics
  * (the `nullSafeEval` contract).
  */
class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("JavaHashCode matches JVM String.hashCode through codegen") {
    GraftFunctions.register(spark)
    val strings = Seq("", "a", "Customer#000000001", "äöü-ß", "的是不了")
    val got = strings.toDF("s")
      .select(GraftFunctions.java_hash_code(col("s"))).as[Int].collect()
    assert(got.toSeq === strings.map(_.hashCode))
    // and via the registered SQL name (O22 surface)
    val viaSql = strings.toDF("s").selectExpr("java_hash_code(s)").as[Int].collect()
    assert(viaSql.toSeq === strings.map(_.hashCode))
  }

  test("register is a no-op on cloned sessions (registry survives the clone)") {
    import org.apache.spark.sql.graft.Bridge
    GraftFunctions.register(spark)
    // the streaming engine runs each micro-batch in a cloned session whose
    // registry COPIES the parent's — register() must detect the copies and
    // not re-register (the "replaced a previously registered function"
    // WARN of VERDICT r4 #5)
    val clone = Bridge.cloneSession(spark)
    assert(Bridge.functionExists(clone, "java_hash_code"))
    assert(Bridge.functionExists(clone, "poly_hash64"))
    assert(Bridge.functionExists(clone, "dot_product"))
    GraftFunctions.register(clone) // must take the functionExists no-op path
    assert(clone.sql("SELECT poly_hash64('abc')").collect().nonEmpty)
  }

  test("PolyHash64 is the base-31 rolling hash") {
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => h * 31L + c.toLong)
    val strings = Seq("", "abc", "hello world", "ü")
    val got = strings.toDF("s")
      .select(GraftFunctions.poly_hash64(col("s"))).as[Long].collect()
    assert(got.toSeq === strings.map(poly))
  }

  test("Mix64 codegen matches scala eval") {
    val xs = Seq(0L, 1L, -1L, Long.MaxValue, 42L)
    val got = xs.toDF("x")
      .select(GraftFunctions.mix64(col("x"), seed = 7L)).as[Long].collect()
    assert(got.toSeq === xs.map(x => Mix64.mix(x ^ 7L)))
  }

  test("DotProduct accumulates float products in double, index order") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(GraftFunctions.dot_product(col("a"), col("b")))
      .as[Double].collect()
    assert(got.head === (1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0))
  }

  test("DotProduct yields null on dimension mismatch (ADVICE r1)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val got = df.select(GraftFunctions.dot_product(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("expressions survive wholestage-codegen over many rows") {
    GraftFunctions.register(spark)
    val n = spark.range(10000)
      .selectExpr("cast(id as string) AS s")
      .selectExpr("java_hash_code(s) AS h", "poly_hash64(s) AS p")
      .where("h IS NOT NULL AND p IS NOT NULL").count()
    assert(n === 10000L)
  }

  test("JaccardSorted: identity, disjoint, empty edge cases") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array.empty[Long]),
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L))).toDF("a", "b")
    val got = df.select(GraftFunctions.jaccard_sorted(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0, 0.0, 2.0 / 6.0))
  }

  test("ShingleHashes word mode splits on single spaces, multiset preserved") {
    val df = Seq("a b a").toDF("s")
    val distinct = df.select(GraftFunctions.shingle_hashes(col("s"), 1, word = true))
      .as[Seq[Long]].head()
    val multi = df.select(GraftFunctions.shingle_hashes(col("s"), 1, word = true,
      distinct = false)).as[Seq[Long]].head()
    assert(distinct.length === 2)
    assert(multi.length === 3)
    assert(multi.head === multi(2)) // same word, same hash
  }

  test("WinnowHashes: deque minima equal brute-force per-window minima; short/empty edges") {
    val texts = Seq("the quick brown fox jumps over the lazy dog and runs on",
      "abcdefgh", "abc", "", "aaaaaaaaaaaaaaaaaaaaaaaa")
    val k = 4
    val w = 5
    val got = texts.toDF("s")
      .select(GraftFunctions.winnow_hashes(col("s"), k, w))
      .as[Seq[Long]].collect()
    // brute force from the positional shingle hashes (same hash kernel)
    val pos = texts.toDF("s")
      .select(GraftFunctions.shingle_hashes(col("s"), k, distinct = false))
      .as[Seq[Long]].collect()
    texts.indices.foreach { i =>
      val hs = pos(i)
      val expect =
        if (hs.isEmpty) Seq.empty[Long]
        else if (hs.length <= w) Seq(hs.min)
        else hs.sliding(w).map(_.min).toSeq.distinct.sorted
      assert(got(i) === expect, s"text ${texts(i)}")
    }
  }

  test("WinnowHashes: any shared run of >= w+k-1 chars shares a fingerprint (the guarantee)") {
    val shared = "zqxjkvwpyg mbtfdlcrhs nzqxjkvwpy" // 32 rare chars
    val a = s"left context here $shared and a tail"
    val b = s"completely different opening $shared other ending"
    val Seq(fa, fb) = Seq(a, b).toDF("s")
      .select(GraftFunctions.winnow_hashes(col("s"), 8, 16))
      .as[Seq[Long]].collect().toSeq
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }

  test("CmsEstimate probes the built-in count_min_sketch; never underestimates") {
    import org.apache.spark.sql.functions.{col, count, explode, expr, lit}
    val words = (1 to 400).map(i => s"w${i % 25}") // 25 keys, 16 each
    val df = words.toDF("w")
    val sketch = df.agg(expr("count_min_sketch(w, 0.01d, 0.99d, 7)"))
      .collect()(0).getAs[Array[Byte]](0)
    val got = df.groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"), col("n"),
        GraftFunctions.cms_estimate(lit(sketch), col("w")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 25)
    got.foreach { case (w, n, est) =>
      assert(est >= n, s"$w underestimated: $est < $n")
      assert(est <= n + 4, s"$w drifted: $est vs $n") // eps*N = 4
    }
    // absent key estimates stay within the additive bound of zero
    val miss = df.limit(1)
      .select(GraftFunctions.cms_estimate(lit(sketch), lit("absent-key")))
      .as[Long].head()
    assert(miss >= 0L && miss <= 4L)
  }

  test("HllSketch estimates distinct counts within HLL error bounds") {
    // 50k longs with 20k distinct
    val est = spark.range(50000).selectExpr("id % 20000 AS v")
      .agg(GraftFunctions.hll_distinct(col("v"))).as[Long].head()
    val err = math.abs(est - 20000.0) / 20000.0
    assert(err < 0.05, s"HLL estimate $est off by ${err * 100}%")
    // strings too, grouped
    val df = spark.range(30000)
      .selectExpr("id % 3 AS g", "concat('user_', id % 5000) AS u")
    val byGroup = df.groupBy("g").agg(GraftFunctions.hll_distinct(col("u")).as("d"))
      .as[(Long, Long)].collect().toMap
    byGroup.values.foreach { est =>
      assert(math.abs(est - 5000.0) / 5000.0 < 0.05, s"group estimate $est")
    }
  }

  test("deletion_variant_hashes: the O(len*d) assembled hashes equal the " +
      "hashes of the actually-deleted strings, for d = 0, 1, 2") {
    // self-consistency closes the loop without a second hash function:
    // kernel(s, d) must equal { kernel(v, 0).head : v in variants(s, d) } —
    // the d=0 case hashes the whole (variant) string directly, so every
    // assembled prefix/suffix combine is checked against a direct hash
    // of the same content
    def direct(v: String): Long =
      graft.functions.HashKernels.deletionVariantHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(v), 0)
        .toLongArray()(0)
    def kernel(s: String, d: Int): Set[Long] =
      graft.functions.HashKernels.deletionVariantHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), d)
        .toLongArray().toSet
    def variants(s: String, d: Int): Set[String] = {
      // CODE-POINT deletions, matching the kernel's (and Spark
      // levenshtein's) unit — a UTF-16 substring deletion would cut
      // surrogate pairs in half
      def del1(v: String): Set[String] = {
        val cps = v.codePoints().toArray
        cps.indices.map { i =>
          val kept = cps.take(i) ++ cps.drop(i + 1)
          new String(kept, 0, kept.length)
        }.toSet
      }
      val one = del1(s)
      d match {
        case 0 => Set(s)
        case 1 => Set(s) ++ one
        case 2 => Set(s) ++ one ++ one.flatMap(del1)
      }
    }
    for (s <- Seq("", "a", "ab", "abc", "abcdef", "aabbaa",
        "Customer#000000042", "😀x😀"); // 😀x😀
        d <- Seq(0, 1, 2)) {
      val want = variants(s, d).map(direct)
      assert(kernel(s, d) === want, s"diverged on '$s' d=$d")
    }
    // non-BMP sanity: 😀x😀 is THREE code points, so its d=1 neighborhood
    // is {itself, x😀, 😀😀, 😀x} — four distinct hashes, not the seven a
    // UTF-16-unit deletion would produce
    assert(kernel("😀x😀", 1).size === 4)
  }

  test("GramOverlapCounts equals the shingle_hashes multiset composition " +
      "(the r17 BLEU/chrF statistics) through codegen") {
    // reference: count multisets from the SAME shingle kernel the old
    // explode → (pair, n, gram) aggregate pipeline used, then clip
    def viaShingles(cand: String, ref: String, maxN: Int,
        word: Boolean): Seq[Long] = {
      def tf(s: String, n: Int): Map[Long, Long] = {
        val arr = Seq(s).toDF("s")
          .select(GraftFunctions.shingle_hashes(col("s"), n, word = word,
            distinct = false)).as[Seq[Long]].head()
        arr.groupBy(identity).view.mapValues(_.size.toLong).toMap
      }
      (1 to maxN).flatMap { n =>
        val c = tf(cand, n)
        val r = tf(ref, n)
        val m = c.iterator
          .map { case (g, cnt) => math.min(cnt, r.getOrElse(g, 0L)) }.sum
        Seq(m, c.values.sum, r.values.sum)
      }
    }
    val cases = Seq(
      ("a b c d e", "a b c d e"), ("a a a a", "a b a c"),
      ("a b c", "a b c d e"), ("", "abc"), ("xyz", "abc"),
      ("aa", "ab"), ("short", "a much longer reference text here"))
    for ((cand, ref) <- cases; word <- Seq(true, false)) {
      val got = Seq((cand, ref)).toDF("cand", "ref")
        .select(GraftFunctions.gram_overlap_counts(col("cand"), col("ref"),
          4, word)).as[Seq[Long]].head()
      assert(got === viaShingles(cand, ref, 4, word),
        s"diverged on ('$cand', '$ref') word=$word")
    }
  }
}
