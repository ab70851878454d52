package graft.expr

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions.col

/** Interpreted-MVEL fallback (VERDICT r2 item 6): scripts outside the
  * Catalyst translator's subset — loops, method calls — must still run,
  * with JVM semantics, as a UDF over the referenced columns.
  */
class MvelInterpSpec extends SparkTestBase {
  import spark.implicits._

  private def evalOne(mvel: String, rowVals: Map[String, Any]): Any =
    MvelInterp.eval(MvelInterp.parse(mvel), rowVals)

  test("for-loop script evaluates with JVM semantics") {
    val v = evalOne(
      "var total = 0; for (int i = 0; i < 5; i++) { total += row.x; } return total;",
      Map("x" -> Int.box(7)))
    assert(v === Int.box(35))
  }

  test("while-loop with type widening") {
    val v = evalOne("var x = 0; while (x < 3) { x = x + 0.5; } return x;",
      Map.empty)
    assert(v === Double.box(3.0))
  }

  test("java integer division and wraparound semantics") {
    assert(evalOne("row.a / 2", Map("a" -> Int.box(7))) === Int.box(3))
    assert(evalOne("row.a / 2.0", Map("a" -> Int.box(7))) === Double.box(3.5))
    assert(evalOne("2147483647 + 1", Map.empty) === Int.box(Int.MinValue))
  }

  test("string methods run JVM-exact") {
    assert(evalOne("row.s.toUpperCase().substring(0, 3)",
      Map("s" -> "hello world")) === "HEL")
    assert(evalOne("row.s.indexOf('wor')", Map("s" -> "hello world")) === Int.box(6))
    assert(evalOne("row.s.replace('l', 'L').length()",
      Map("s" -> "hello")) === Int.box(5))
  }

  test("hashCode matches the JVM (and therefore the codegen'd translator path)") {
    val s = "Customer#000000007"
    assert(evalOne("row.name.hashCode()", Map("name" -> s)) === Int.box(s.hashCode))
  }

  test("Math namespace and parse functions") {
    assert(evalOne("Math.max(row.a, 10)", Map("a" -> Int.box(3))) === Int.box(10))
    assert(evalOne("Math.floor(row.d)", Map("d" -> Double.box(3.9))) === Double.box(3.0))
    assert(evalOne("Integer.parseInt(row.s) * 2", Map("s" -> "21")) === Int.box(42))
  }

  test("nulls propagate instead of NPE-ing the task") {
    assert(evalOne("row.s.toUpperCase()", Map("s" -> null)) === null)
    assert(evalOne("row.a + 1", Map("a" -> null)) === null)
  }

  test("runaway loop fails loudly, not forever") {
    assertThrows[MvelTranslator.UnsupportedMvel](
      evalOne("var x = 0; while (true) { x += 1; } return x;", Map.empty))
  }

  test("planner falls back to the interpreter for a loop-bearing calculated column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvelfb").toString
    Seq((1L, 3), (2L, 4)).toDF("id", "n").write.parquet(s"$dir/src/t.parquet")
    val cfg = MigrationConfig(TableRef(path = s"$dir/src"),
      TableRef(path = s"$dir/none"), Nil)
    val planned = graft.pipeline.MigrationPlanner.plan(spark, cfg, TableMigrationDef(
      tableName = "t",
      calculatedColumns = Seq(CalculatedColumn("fact",
        "var f = 1; for (int i = 1; i <= row.n; i++) { f *= i; } return f;"))))
    val got = planned.data.select("id", "fact").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 6, 2L -> 24))
  }

  test("planner fallback filter keeps JVM method-call semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvelff").toString
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "name").write.parquet(s"$dir/src/t.parquet")
    val cfg = MigrationConfig(TableRef(path = s"$dir/src"),
      TableRef(path = s"$dir/none"), Nil)
    val planned = graft.pipeline.MigrationPlanner.plan(spark, cfg, TableMigrationDef(
      tableName = "t",
      filters = Seq(FieldValueFilter("row.name.endsWith('a') && row.name.length() > 4"))))
    assert(planned.data.select("id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("translator-supported expressions still produce pure Catalyst (no UDF)") {
    val df = Seq((1L, 10.0)).toDF("id", "v")
    val c = MvelTranslator.toColumnFor("row.v * 2.0 > 5.0", df.schema)
    val plan = df.filter(c).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"unexpected UDF in:\n$plan")
  }

  // ----- collection columns (VERDICT r4 #6): CQL list/set/map surface

  test("list methods: size/contains/isEmpty/indexOf with boxing-insensitive equality") {
    val tags = scala.collection.immutable.ArraySeq(10L, 20L, 30L)
    assert(evalOne("row.tags.size()", Map("tags" -> tags)) === Int.box(3))
    assert(evalOne("row.tags.size() > 0", Map("tags" -> tags)) === Boolean.box(true))
    // Integer literal vs Long element: boxing must not hide the match
    assert(evalOne("row.tags.contains(20)", Map("tags" -> tags)) === Boolean.box(true))
    assert(evalOne("row.tags.contains(25)", Map("tags" -> tags)) === Boolean.box(false))
    assert(evalOne("row.tags.indexOf(30)", Map("tags" -> tags)) === Int.box(2))
    assert(evalOne("row.tags.isEmpty()", Map("tags" -> tags)) === Boolean.box(false))
    assert(evalOne("row.tags.size()", Map("tags" -> null)) === null)
  }

  test("list subscript: 0-based; out of bounds throws like Java and ANSI SQL") {
    val tags = Seq("a", "b", "c")
    assert(evalOne("row.tags[1]", Map("tags" -> tags)) === "b")
    assertThrows[IndexOutOfBoundsException](
      evalOne("row.tags[7]", Map("tags" -> tags)))
    assert(evalOne("row.tags[0].toUpperCase()", Map("tags" -> tags)) === "A")
    assert(evalOne("row.nums[1] + 5", Map("nums" -> Seq(1, 2, 3))) === Int.box(7))
    assert(evalOne("row.tags[0]", Map("tags" -> null)) === null)
  }

  test("collection equality is exact for longs above 2^53 (no double collapse)") {
    val a = 912345678901234567L
    val b = 912345678901234568L // same double as a, different long
    assert(evalOne("row.ids.contains(912345678901234567l)",
      Map("ids" -> Seq(b))) === Boolean.box(false))
    assert(evalOne("row.ids.contains(912345678901234567l)",
      Map("ids" -> Seq(a))) === Boolean.box(true))
    assert(evalOne("row.ids.indexOf(912345678901234568l)",
      Map("ids" -> Seq(a, b))) === Int.box(1))
  }

  test("map methods and subscript: get/containsKey/containsValue, null on missing key") {
    val attrs = Map("lang" -> "en", "tier" -> "gold")
    assert(evalOne("row.attrs['lang']", Map("attrs" -> attrs)) === "en")
    assert(evalOne("row.attrs['absent']", Map("attrs" -> attrs)) === null)
    assert(evalOne("row.attrs.get('tier')", Map("attrs" -> attrs)) === "gold")
    assert(evalOne("row.attrs.containsKey('lang')", Map("attrs" -> attrs)) === Boolean.box(true))
    assert(evalOne("row.attrs.containsValue('gold')", Map("attrs" -> attrs)) === Boolean.box(true))
    assert(evalOne("row.attrs.size()", Map("attrs" -> attrs)) === Int.box(2))
  }

  test("collection ops in loops keep JVM numeric semantics") {
    val v = evalOne(
      "var s = 0; for (int i = 0; i < row.xs.size(); i++) { s += row.xs[i]; } return s;",
      Map("xs" -> Seq(1L, 2L, 3L, 4L)))
    assert(v === Long.box(10L))
  }

  test("translator REJECTS collection method calls; planner falls back to the " +
      "interpreter for a collection filter (VERDICT r4 #6)") {
    // the user expression the verdict cites verbatim
    assertThrows[MvelTranslator.UnsupportedMvel](
      MvelTranslator.toSql("row.tags.size() > 0"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mvelcoll").toString
    Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("c")))
      .toDF("id", "tags").write.parquet(s"$dir/src/t.parquet")
    val cfg = MigrationConfig(TableRef(path = s"$dir/src"),
      TableRef(path = s"$dir/none"), Nil)
    val planned = graft.pipeline.MigrationPlanner.plan(spark, cfg, TableMigrationDef(
      tableName = "t",
      filters = Seq(FieldValueFilter("row.tags.size() > 0"))))
    assert(planned.data.select("id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("interpreter calculated column over a map column infers the value type") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvelmap").toString
    Seq((1L, Map("score" -> 10)), (2L, Map("score" -> 20)), (3L, Map.empty[String, Int]))
      .toDF("id", "attrs").write.parquet(s"$dir/src/t.parquet")
    val cfg = MigrationConfig(TableRef(path = s"$dir/src"),
      TableRef(path = s"$dir/none"), Nil)
    val planned = graft.pipeline.MigrationPlanner.plan(spark, cfg, TableMigrationDef(
      tableName = "t",
      calculatedColumns = Seq(CalculatedColumn("bonus",
        "row.attrs.containsKey('score') ? row.attrs.get('score') * 2 : 0"))))
    val got = planned.data.select("id", "bonus").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 20, 2L -> 40, 3L -> 0))
  }

  test("subscript TRANSLATES on the fast path (no UDF) and matches the interpreter") {
    val df = Seq((1L, Seq(5, 6), Map("k" -> 2))).toDF("id", "xs", "m")
    // `tags[i]` / `m['k']` pass through the translator as Spark SQL element
    // access — pure Catalyst, no fallback
    val c = MvelTranslator.toColumnFor("row.xs[0] + row.m['k']", df.schema)
    val plan = df.select(c.as("v")).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"unexpected UDF in:\n$plan")
    assert(df.select(c.as("v")).as[Int].head() === 7)
    assert(evalOne("row.xs[0] + row.m['k']",
      Map("xs" -> Seq(5, 6), "m" -> Map("k" -> 2))) === Int.box(7))
  }
}
