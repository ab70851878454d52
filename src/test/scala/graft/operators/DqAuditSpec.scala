package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DqAuditSpec extends SparkTestBase {
  import spark.implicits._
  import DqAudit._

  test("planted violations of every rule type are counted exactly") {
    val users = Seq(
      (1L, "alice"), (2L, null.asInstanceOf[String]), (3L, "carol"),
      (3L, "carol-dup"), (4L, null.asInstanceOf[String]))
      .toDF("uid", "name")
    val orders = Seq[(Long, java.lang.Long, Double)](
      (100L, 1L, 10.0), (101L, 3L, -5.0), (102L, 99L, 20.0),
      (103L, null, 0.0))
      .toDF("oid", "uid", "amount")
    val got = DqAudit.run(
      Map("users" -> users, "orders" -> orders),
      Seq(
        NotNull("name_nn", "users", "name"),
        RangeRule("amount_nonneg", "orders", col("amount") < 0),
        UniqueKey("users_pk", "users", Seq("uid")),
        ForeignKey("orders_users_fk", "orders", "uid", "users", "uid")))
      .as[(String, String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("name_nn") === (("not_null", "users", 2L, 5L)))
    assert(got("amount_nonneg") === (("range", "orders", 1L, 4L)))
    // uid 3 appears twice -> one surplus row
    assert(got("users_pk") === (("unique_key", "users", 1L, 5L)))
    // uid 99 is an orphan; the NULL uid row is exempt (not a violation of
    // the FK rule — that's the NotNull rule's job)
    assert(got("orders_users_fk") === (("foreign_key", "orders", 1L, 4L)))
  }

  test("scalar rules of one table fuse into a single aggregation pass; " +
      "the audit plan has no cartesian") {
    val df = Seq((1L, "a", 5.0), (2L, null.asInstanceOf[String], -1.0))
      .toDF("id", "s", "v")
    val audit = DqAudit.run(Map("t" -> df), Seq(
      NotNull("s_nn", "t", "s"),
      RangeRule("v_pos", "t", col("v") < 0),
      RangeRule("v_small", "t", col("v") > 100)))
    // one fused table: exactly ONE aggregate pair (partial+final) in the
    // whole plan — three rules, one scan
    val p = audit.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    val scans = "Scan|LocalTableScan".r.findAllIn(p).size
    assert(scans <= 2, s"scalar rules re-scan the table:\n$p")
    assert(audit.count() === 3L)
  }

  test("duplicate rule names on one table are refused up front " +
      "(fused __v_<name> columns would collide at run time)") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val ex = intercept[IllegalArgumentException] {
      DqAudit.run(Map("t" -> df), Seq(
        NotNull("r", "t", "s"),
        RangeRule("r", "t", col("id") < 0)))
    }
    assert(ex.getMessage.contains("duplicate rule name"), ex.getMessage)
    // same name on DIFFERENT tables is fine
    DqAudit.run(Map("t" -> df, "u" -> df), Seq(
      NotNull("r", "t", "s"), NotNull("r", "u", "s"))).count()
  }

  test("an empty table reports 0 violations from every rule type " +
      "(fused sums coalesce instead of emitting null)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val ref = Seq((1L, "x")).toDF("k", "v")
    val audit = DqAudit.run(Map("t" -> empty, "r" -> ref), Seq(
      NotNull("nn", "t", "s"),
      RangeRule("rg", "t", col("id") < 0),
      UniqueKey("uk", "t", Seq("id")),
      ForeignKey("fk", "t", "id", "r", "k")))
      .select("check", "violations", "total")
      .as[(String, Long, Long)].collect()
      .map { case (c, v, t) => c -> ((v, t)) }.toMap
    assert(audit == Map("nn" -> (0L, 0L), "rg" -> (0L, 0L),
      "uk" -> (0L, 0L), "fk" -> (0L, 0L)), audit)
  }
}
