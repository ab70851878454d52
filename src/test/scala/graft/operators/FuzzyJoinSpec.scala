package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Levenshtein (classic DP) for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq(
    (1L, "cold ring"), (2L, "old ring"), (3L, "cold rings"),
    (4L, "gold ring"), (5L, "hot gear"), (6L, "hot bear"),
    (7L, "hat gear"), (8L, "completely different"),
    (9L, "ab"), (10L, "ac"), (11L, "ab"), // shorter than q=3: whole-string gram
    (12L, ""), (13L, "x"),
    (14L, "navy lace shirt"), (15L, "navy lace shirts"))

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && math.abs(sa.length - sb.length) <= d && lev(sa, sb) <= d
    } yield (ia, ib, lev(sa, sb))).toSet

  test("editDistanceSelfJoin equals the brute-force Levenshtein join at " +
      "d = 1 and d = 2, including sub-q and empty strings") {
    val df = names.toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "name", maxDist = d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteForce(names, d), s"diverged at d=$d")
    }
    // d=1 sanity of the fixture itself: cold~old~gold ring chain, the
    // sub-q pair (ab, ac), the identical sub-q pair (ab, ab), x~'' at d=1
    val d1 = bruteForce(names, 1)
    assert(d1.contains((1L, 2L, 1)) && d1.contains((9L, 10L, 1)) &&
      d1.contains((9L, 11L, 0)) && d1.contains((12L, 13L, 1)))
  }

  test("deletionNeighborhoodSelfJoin equals the brute-force join (and the " +
      "q-gram path) at d = 1 and d = 2; guard caps variant buckets; " +
      "d outside 1..2 refuses") {
    val df = names.toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.deletionNeighborhoodSelfJoin(df, "id", "name", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteForce(names, d), s"symdelete diverged at d=$d")
    }
    // identical-string hot bucket: capped -> observable zero, uncapped -> all
    val hot = (1L to 20L).map((_, "aaaaaa")).toDF("id", "name")
    assert(FuzzyJoin.deletionNeighborhoodSelfJoin(hot, "id", "name", 1,
      maxBucketSize = 2).count() === 0L)
    assert(FuzzyJoin.deletionNeighborhoodSelfJoin(hot, "id", "name", 1,
      maxBucketSize = 0).count() === 190L)
    val err = intercept[IllegalArgumentException] {
      FuzzyJoin.deletionNeighborhoodSelfJoin(df, "id", "name", 3)
    }
    assert(err.getMessage.contains("1..2"))
  }

  test("deletionNeighborhoodJoin (two-table) equals brute force") {
    val left = names.take(8).toDF("lid", "lname")
    val right = names.drop(4).map { case (i, s) => (i + 100L, s) }
      .toDF("rid", "rname")
    val got = FuzzyJoin.deletionNeighborhoodJoin(left, "lid", "lname",
        right, "rid", "rname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (ia, sa) <- names.take(8)
      (ib0, sb) <- names.drop(4)
      ib = ib0 + 100L
      if math.abs(sa.length - sb.length) <= 1 && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got === want)
  }

  test("editDistanceJoin (two-table) equals brute force and only emits " +
      "cross-side pairs") {
    val left = names.take(8).toDF("lid", "lname")
    val right = names.drop(4).map { case (i, s) => (i + 100L, s) }
      .toDF("rid", "rname")
    val got = FuzzyJoin.editDistanceJoin(left, "lid", "lname",
        right, "rid", "rname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (ia, sa) <- names.take(8)
      (ib0, sb) <- names.drop(4)
      ib = ib0 + 100L
      if math.abs(sa.length - sb.length) <= 1 && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got === want)
    // identical rows appear on both sides (5..8) — the cross join must
    // report them (dist 0) exactly once each
    assert(got.contains((5L, 105L, 0)))
  }

  test("fuzzy join plan: no cartesian, no window; skew guard caps " +
      "signature-gram buckets with an observed metric") {
    val df = names.toDF("id", "name")
    val joined = FuzzyJoin.editDistanceSelfJoin(df, "id", "name", 1)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.toLowerCase.contains("window"),
      s"fuzzy join plan regressed:\n$plan")
    // adversarial gram distribution: every row the same string — with the
    // guard at 2 every signature bucket is over-cap, so no pairs emerge
    // and the run is observable rather than quadratic
    val hot = (1L to 20L).map((_, "aaaaaa")).toDF("id", "name")
    val guarded = FuzzyJoin.editDistanceSelfJoin(hot, "id", "name",
      maxDist = 1, maxBucketSize = 2)
    assert(guarded.count() === 0L)
    // disabled guard pairs them all: C(20,2) dist-0 pairs
    val free = FuzzyJoin.editDistanceSelfJoin(hot, "id", "name",
      maxDist = 1, maxBucketSize = 0)
    assert(free.count() === 190L)
  }

  test("signature prefix is the q*d + 1 rarest grams (pigeonhole bound " +
      "honored on fixture-scale data: recall vs brute force on part names)") {
    // part-name-shaped data: two-word combos with planted 1-edit variants
    val adjectives = Seq("cold", "old", "hot", "red", "blue", "small")
    val nouns = Seq("ring", "bolt", "gear", "anvil", "plate")
    val combos = for {
      (a, i) <- adjectives.zipWithIndex
      (n, j) <- nouns.zipWithIndex
    } yield ((i * nouns.size + j).toLong, s"$a $n")
    val df = combos.toDF("id", "name")
    val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === bruteForce(combos, 1))
    assert(got.nonEmpty, "fixture should contain cold~old pairs")
  }
}
