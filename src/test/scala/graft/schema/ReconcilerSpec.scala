package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ReconcilerSpec extends AnyFunSuite {

  private val source = StructType(Seq(
    StructField("pk", StringType),
    StructField("a", IntegerType),
    StructField("b", StringType),
    StructField("dropme", DoubleType)))

  test("rule 1: target PK must come from source or calculated columns") {
    val target = StructType(Seq(
      StructField("pk", StringType), StructField("extra_pk", LongType)))
    val e = intercept[Reconciler.ReconcileError](
      Reconciler.reconcile(source, target, Seq("pk", "extra_pk"), Map.empty))
    assert(e.getMessage.contains("extra_pk"))
  }

  test("rule 2: unmappable non-PK target columns dropped with a warning") {
    val target = StructType(Seq(
      StructField("pk", StringType),
      StructField("a", IntegerType),
      StructField("extra_nopk", LongType)))
    val rec = Reconciler.reconcile(source, target, Seq("pk"), Map.empty)
    assert(rec.writeColumns === Seq("pk", "a"))
    assert(rec.droppedColumns === Seq("extra_nopk"))
    assert(rec.warnings.exists(_.contains("extra_nopk")))
  }

  test("rule 3: calculated column must name an existing target column") {
    val target = StructType(Seq(StructField("pk", StringType)))
    val e = intercept[Reconciler.ReconcileError](
      Reconciler.reconcile(source, target, Seq("pk"), Map("ghost" -> IntegerType)))
    assert(e.getMessage.contains("ghost"))
  }

  test("rule 4: cast-incompatible mapping fails at plan time") {
    val target = StructType(Seq(
      StructField("pk", StringType),
      StructField("a", ArrayType(IntegerType)))) // int -> array<int> impossible
    val e = intercept[Reconciler.ReconcileError](
      Reconciler.reconcile(source, target, Seq("pk"), Map.empty))
    assert(e.getMessage.contains("'a'"))
  }

  test("calculated column satisfies PK coverage (reference A2 shape)") {
    val target = StructType(Seq(
      StructField("my_col", StringType),
      StructField("my_col_hash", ShortType)))
    val src = StructType(Seq(StructField("my_col", StringType)))
    val rec = Reconciler.reconcile(src, target, Seq("my_col"),
      Map("my_col_hash" -> ShortType))
    assert(rec.writeColumns === Seq("my_col", "my_col_hash"))
  }

  test("type gate: unsupported type fails fast, supported pass") {
    Reconciler.validateTypes(source, "t")
    val bad = StructType(Seq(StructField("x", CalendarIntervalType)))
    val e = intercept[Reconciler.ReconcileError](Reconciler.validateTypes(bad, "t"))
    assert(e.getMessage.contains("unsupported type"))
  }
}
