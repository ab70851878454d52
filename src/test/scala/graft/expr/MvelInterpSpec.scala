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
}
