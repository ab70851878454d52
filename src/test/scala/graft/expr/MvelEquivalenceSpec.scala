package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The translator (pure Catalyst) and the interpreter (UDF fallback) share
  * a large expression subset; on it they MUST agree — otherwise plan-path
  * selection would silently change results. Known, documented divergence:
  * `/` on integers (SQL division is double; the interpreter keeps Java int
  * division) — excluded here, covered by its own semantics tests.
  */
class MvelEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private val df = (1 to 50).map { i =>
    (i.toLong, (53 - i * 7 % 19).toLong, i * 0.75 - 11.5, (i % 13) * 2.25, s"str_$i")
  }.toDF("a", "b", "x", "y", "s")

  private val overlap = Seq(
    "row.a + row.b * 2",
    "row.a - row.b % 7",
    "row.a % 7",
    "(row.a > row.b) ? row.x : row.y",
    "row.x * 0.5 + row.y",
    "row.a >= 10 && row.b < 30 || row.a == row.b",
    "!(row.a > 25)",
    "row.x >= 0.0 ? row.a + 1 : row.a - 1",
    "(long) row.x",
    "(int) row.y % 5",
    "abs(row.b - 40)",
    "row.a > 9 ? 'hi' : row.a > 5 ? 'mid' : 'lo'",
    "row.s == 'str_7' || row.s != 'str_8'",
    "row.a + (row.b > 20 ? 1 : 2)",
    // string-method fast paths — the interpreter IS the JVM-semantics
    // oracle these translations must match
    "row.s.length() + 1",
    "row.s.isEmpty()",
    "row.s.startsWith('str_1')",
    "row.s.endsWith('7')",
    "row.s.contains('r_1')",
    "row.s.substring(2)",
    "row.s.substring(0, 3)",
    "row.s.indexOf('_') >= 4")

  test("translator and interpreter agree on the shared expression subset") {
    graft.functions.GraftFunctions.register(spark) // kernel SQL names
    overlap.foreach { mvel =>
      val fast = MvelTranslator.toColumn(mvel)
      val interp = MvelInterp.toColumn(mvel, df.schema)
      val rows = df.select(
        fast.cast("string").as("fast"),
        interp.cast("string").as("interp")).collect()
      val bad = rows.zipWithIndex.filter { case (r, _) => r.getString(0) != r.getString(1) }
      assert(bad.isEmpty,
        s"'$mvel' diverges: ${bad.take(3).map { case (r, i) =>
          s"row $i fast=${r.getString(0)} interp=${r.getString(1)}" }.mkString("; ")}")
    }
  }

  test("subscripts agree between paths: 0-based, missing map key is null") {
    val cdf = (1 to 20).map { i =>
      (i.toLong, Seq(i, i * 2, i * 3), Map("k" -> i, "n" -> -i))
    }.toDF("a", "xs", "m")
    Seq(
      "row.xs[0] + row.xs[2]",
      "row.xs[1] * 2 > row.a",
      "row.m['k'] + row.m['n']",
      "row.m['absent']",       // missing key => null on BOTH paths (ANSI)
      "row.m['k'] > 10 ? row.xs[0] : row.xs[1]").foreach { mvel =>
      val fast = MvelTranslator.toColumn(mvel)
      val interp = MvelInterp.toColumn(mvel, cdf.schema)
      val rows = cdf.select(
        fast.cast("string").as("fast"),
        interp.cast("string").as("interp")).collect()
      val bad = rows.filter(r => r.getString(0) != r.getString(1))
      assert(bad.isEmpty, s"'$mvel' diverges: ${bad.take(3).mkString("; ")}")
    }
    // array OOB throws on BOTH paths (ANSI SQL and Java agree)
    intercept[Exception](cdf.select(MvelTranslator.toColumn("row.xs[9]")).collect())
    intercept[Exception](
      cdf.select(MvelInterp.toColumn("row.xs[9]", cdf.schema)).collect())
  }

  test("string methods over COLLECTION columns route to the interpreter " +
      "(type-gated rewrites, ADVICE r6)") {
    // before the gate, row.tags.contains('x') translated to the STRING
    // kernel contains(tags, 'x') — an AnalysisException past the fallback's
    // reach — and row.tags.isEmpty() passed analysis as java_str_len(tags)
    // then ClassCastException'd at runtime. With the schema gate these
    // route to the interpreter's collection semantics and just work.
    graft.functions.GraftFunctions.register(spark)
    val cdf = (1 to 20).map { i =>
      (i.toLong, if (i % 4 == 0) Seq.empty[String] else Seq(s"t$i", "common"))
    }.toDF("a", "tags")
    val kept = cdf.filter(MvelTranslator.toColumnFor(
        "row.tags.contains('common')", cdf.schema))
      .select("a").as[Long].collect().toSet
    assert(kept === (1 to 20).filter(_ % 4 != 0).map(_.toLong).toSet)
    val empty = cdf.filter(MvelTranslator.toColumnFor(
        "row.tags.isEmpty()", cdf.schema))
      .select("a").as[Long].collect().toSet
    assert(empty === (1 to 20).filter(_ % 4 == 0).map(_.toLong).toSet)
    val idx = cdf.filter(MvelTranslator.toColumnFor(
        "row.tags.indexOf('common') == 1", cdf.schema))
      .select("a").as[Long].collect().toSet
    assert(idx === (1 to 20).filter(_ % 4 != 0).map(_.toLong).toSet)
    // STRING receivers still take the translated fast path (pushdown
    // depends on it) — the gate must not over-fire
    val sdf = (1 to 9).map(i => (i.toLong, s"str_$i")).toDF("a", "s")
    val fast = MvelTranslator.toSql("row.s.contains('r_1')", Some(sdf.schema))
    assert(fast.contains("contains(s,"), s"string path no longer translates: $fast")
  }

  test("property: random expressions in the shared grammar agree (seeded)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // typed expression generators over cols a,b (long) and x,y (double);
    // '%' divisors restricted to nonzero literals (x % 0 is NULL in SQL but
    // throws in the JVM — a documented boundary, not part of the overlap)
    def lit: Gen[String] = Gen.choose(1, 9).map(_.toString)
    def numE(depth: Int): Gen[String] =
      if (depth <= 0) Gen.oneOf(Gen.oneOf("row.a", "row.b", "row.x", "row.y"), lit)
      else Gen.frequency(
        2 -> numE(0),
        2 -> (for {
          l <- numE(depth - 1); r <- numE(depth - 1)
          op <- Gen.oneOf("+", "-", "*")
        } yield s"($l $op $r)"),
        1 -> (for { l <- numE(depth - 1); d <- lit } yield s"($l % $d)"),
        1 -> (for {
          c <- boolE(depth - 1); t <- numE(depth - 1); f <- numE(depth - 1)
        } yield s"($c ? $t : $f)"))
    def boolE(depth: Int): Gen[String] =
      if (depth <= 0)
        for { l <- numE(0); r <- numE(0); op <- Gen.oneOf("<", ">", "<=", ">=", "==", "!=") }
          yield s"($l $op $r)"
      else Gen.frequency(
        2 -> boolE(0),
        1 -> (for { l <- boolE(depth - 1); r <- boolE(depth - 1) } yield s"($l && $r)"),
        1 -> (for { l <- boolE(depth - 1); r <- boolE(depth - 1) } yield s"($l || $r)"),
        1 -> boolE(depth - 1).map(b => s"(!$b)"))
    val gen = Gen.oneOf(numE(3), boolE(2))

    val data = (1 to 30).map(i =>
      (i.toLong, (i * 7 % 13).toLong, i * 0.5 - 7.25, (i % 9) * 1.75))
      .toDF("a", "b", "x", "y")
    (0 until 60).foreach { seed =>
      gen(Gen.Parameters.default, Seed(seed.toLong)).foreach { mvel =>
        val rows = data.select(
          MvelTranslator.toColumn(mvel).cast("string").as("fast"),
          MvelInterp.toColumn(mvel, data.schema).cast("string").as("interp"))
          .collect()
        val bad = rows.filter(r => r.getString(0) != r.getString(1))
        assert(bad.isEmpty,
          s"seed=$seed '$mvel': ${bad.take(2).map(r =>
            s"fast=${r.getString(0)} interp=${r.getString(1)}").mkString("; ")}")
      }
    }
  }

  test("filter results agree on the shared boolean subset") {
    val preds = Seq(
      "row.a >= 10 && row.b < 30",
      "row.x < 0.0 || row.y >= 20.0",
      "row.s != 'str_3'",
      "(row.a % 2 == 0) != (row.b % 2 == 0)")
    preds.foreach { mvel =>
      val fastIds = df.filter(MvelTranslator.toColumn(mvel))
        .select("a").as[Long].collect().toSet
      val interpIds = df.filter(MvelInterp.toColumn(mvel, df.schema))
        .select("a").as[Long].collect().toSet
      assert(fastIds === interpIds, s"'$mvel' filter diverges")
    }
  }
}
