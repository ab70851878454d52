package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val log = Seq(
    // key 1: three versions, the middle one twice (seq tie-break)
    (1L, 10L, 1, "v1"), (1L, 20L, 1, "v2-lost"), (1L, 20L, 2, "v2"), (1L, 30L, 1, "v3"),
    // key 2: single version
    (2L, 15L, 1, "only")).toDF("k", "ver", "seq", "payload")

  test("scd2History: intervals chain, tie-break collapses version collisions") {
    val got = Cdc.scd2History(log, Seq("k"), "ver", tieBreak = Seq("seq"))
      .select("k", "payload", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, "v1", 10L, 20L, false),
      (1L, "v2", 20L, 30L, false), // seq=2 won the ver=20 collision
      (1L, "v3", 30L, -1L, true),
      (2L, "only", 15L, -1L, true)))
  }

  test("applyCdc: upsert, insert, and delete all resolve from the latest op") {
    val snap = Seq(
      (1L, "old-a", 10.0), (2L, "old-b", 20.0), (3L, "old-c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "new-a1", 11.0, 100L, 1, "U"), // superseded
      (1L, "new-a2", 12.0, 200L, 1, "U"), // latest for key 1 -> update
      (2L, "gone", 0.0, 150L, 1, "D"), // delete key 2
      (4L, "ins-d", 44.0, 120L, 1, "U"), // insert new key 4
      (5L, "never", 0.0, 90L, 1, "D")) // delete of absent key -> no row
      .toDF("k", "name", "bal", "ver", "seq", "op")
    val got = Cdc.applyCdc(snap, changes, Seq("k"), "ver", "op",
        tieBreak = Seq("seq"))
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set(
      (1L, "new-a2", 12.0),
      (3L, "old-c", 30.0),
      (4L, "ins-d", 44.0)))
  }

  test("applyCdc: delete then later re-insert keeps the key (latest wins)") {
    val snap = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "dead", 0.0, 100L, 1, "D"),
      (1L, "reborn", 2.0, 200L, 1, "U")).toDF("k", "name", "bal", "ver", "seq", "op")
    val got = Cdc.applyCdc(snap, changes, Seq("k"), "ver", "op",
      tieBreak = Seq("seq")).as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "reborn", 2.0)))
  }

  test("applyCdc plan: keep-last is a hash aggregate, not a window sort") {
    val snap = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    val changes = Seq((1L, "y", 2.0, 100L, 1, "U"))
      .toDF("k", "name", "bal", "ver", "seq", "op")
    val plan = Cdc.applyCdc(snap, changes, Seq("k"), "ver", "op",
      tieBreak = Seq("seq")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in CDC apply:\n$plan")
  }

  test("applyCdcVersioned: stale deliveries never clobber newer state") {
    val snap = Seq((1L, "cur", 5.0, 100L)).toDF("k", "name", "bal", "ver")
    val changes = Seq(
      (1L, "stale", 1.0, 50L, "U"), // older than stored 100 -> ignored
      (2L, "new", 2.0, 60L, "U")).toDF("k", "name", "bal", "ver", "op")
    val got = Cdc.applyCdcVersioned(snap, changes, Seq("k"), "ver", "op")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got === Set((1L, "cur", 5.0, 100L), (2L, "new", 2.0, 60L)))
    // version tie with the stored row: the (redelivered) update wins
    val tie = Seq((1L, "cur", 5.0, 100L, "U")).toDF("k", "name", "bal", "ver", "op")
    val got2 = Cdc.applyCdcVersioned(snap, tie, Seq("k"), "ver", "op")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got2 === Set((1L, "cur", 5.0, 100L)))
  }

  test("applyCdcVersioned: tie semantics hold for any op vocabulary") {
    // lowercase ops: with raw-string ordering "d" would beat the snapshot
    // sentinel on a version tie and wrongly delete the stored row
    val snap = Seq((1L, "cur", 100L)).toDF("k", "name", "ver")
    val redelivered = Seq((1L, "cur", 100L, "d"))
      .toDF("k", "name", "ver", "op")
    val got = Cdc.applyCdcVersioned(snap, redelivered, Seq("k"), "ver", "op",
      deleteOp = "d").as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "cur", 100L)),
      "same-version delete redelivery must not beat the stored row")
    // an op value literally "S" is an ordinary update, not a snapshot row
    val sOp = Seq((1L, "upd", 200L, "S")).toDF("k", "name", "ver", "op")
    val got2 = Cdc.applyCdcVersioned(snap, sOp, Seq("k"), "ver", "op")
      .as[(Long, String, Long)].collect().toSet
    assert(got2 === Set((1L, "upd", 200L)))
  }

  test("applyCdcVersioned: batching-independent (fold over batches == one shot)") {
    val snap = Seq((1L, "a", 1.0, 10L), (2L, "b", 2.0, 10L))
      .toDF("k", "name", "bal", "ver")
    val batches = Seq(
      Seq((1L, "a2", 1.2, 30L, "U"), (3L, "c", 3.0, 20L, "U")),
      Seq((2L, "dead", 0.0, 40L, "D"), (1L, "late-stale", 0.0, 20L, "U")),
      Seq((3L, "c2", 3.3, 50L, "U"), (4L, "d", 4.0, 15L, "U")))
    val folded = batches.foldLeft(snap) { (acc, b) =>
      Cdc.applyCdcVersioned(acc, b.toDF("k", "name", "bal", "ver", "op"),
        Seq("k"), "ver", "op")
    }.as[(Long, String, Double, Long)].collect().toSet
    val oneShot = Cdc.applyCdcVersioned(snap,
      batches.flatten.toDF("k", "name", "bal", "ver", "op"),
      Seq("k"), "ver", "op").as[(Long, String, Double, Long)].collect().toSet
    assert(folded === oneShot)
    assert(folded === Set(
      (1L, "a2", 1.2, 30L), (3L, "c2", 3.3, 50L), (4L, "d", 4.0, 15L)))
  }

  test("applyCdc rejects changes missing a snapshot payload column") {
    val snap = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    val changes = Seq((1L, "y", 100L, "U")).toDF("k", "name", "ver", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyCdc(snap, changes, Seq("k"), "ver", "op")
    }
    assert(e.getMessage.contains("bal"))
  }

  test("snapshotDiff classifies I/U/D, null-safely, and skips identical rows") {
    val before = Seq(
      (1L, "a", Some(1.0)), // unchanged → absent
      (2L, "b", Some(2.0)), // payload update
      (3L, "c", None),      // null → value update
      (4L, "d", Some(4.0))) // deleted
      .toDF("k", "name", "bal")
    val after = Seq(
      (1L, "a", Some(1.0)),
      (2L, "b", Some(2.5)),
      (3L, "c", Some(3.0)),
      (5L, "e", None))      // inserted, null payload
      .toDF("k", "name", "bal")
    val got = Cdc.snapshotDiff(before, after, Seq("k"))
      .as[(Long, String, Option[Double], String)].collect().toSet
    assert(got === Set(
      (2L, "b", Some(2.5), "U"),
      (3L, "c", Some(3.0), "U"),
      (4L, "d", Some(4.0), "D"),
      (5L, "e", None, "I")))
  }

  test("snapshotDiff round-trips: applyCdc(before, diff) reproduces after") {
    val before = (1L to 50L).map(k => (k, s"n$k", k * 1.0)).toDF("k", "name", "bal")
    val after = (1L to 50L).filter(_ % 7 != 0)
      .map(k => (k, s"n$k", if (k % 5 == 0) k * 1.0 + 9 else k * 1.0))
      .toDF("k", "name", "bal")
      .unionByName(Seq((999L, "new", 0.5)).toDF("k", "name", "bal"))
    val diff = Cdc.snapshotDiff(before, after, Seq("k"))
      .withColumn("ver", lit(1L))
    val rebuilt = Cdc.applyCdc(before, diff, Seq("k"), "ver", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(rebuilt === after.as[(Long, String, Double)].collect().toSet)
  }
}
