package graft.operators

import graft.SparkTestBase
import graft.functions.HashKernels
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleaveBits: exact Morton bit placement") {
    // a = 101b lands on even bits (0,4), b = 011b on odd bits (1,3)
    assert(HashKernels.interleaveBits(5L, 3L, 3) === 27L)
    assert(HashKernels.interleaveBits(0L, 0L, 16) === 0L)
    assert(HashKernels.interleaveBits((1L << 16) - 1, 0L, 16) === 0x55555555L)
    assert(HashKernels.interleaveBits(0L, (1L << 16) - 1, 16) === 0xAAAAAAAAL)
    // adjacent cells differ in low bits only — the locality property
    assert(HashKernels.interleaveBits(2L, 3L, 2) ===
      HashKernels.interleaveBits(3L, 3L, 2) - 1)
  }

  test("zorderKey scales exactly with integer arithmetic (identity on [0, 2^bits))") {
    val df = Seq((0L, 31L), (31L, 0L), (10L, 20L)).toDF("a", "b")
    val got = Layout.zorderKey(df, "a", "b", bits = 5)
      .select("a", "b", "zkey").as[(Long, Long, Long)].collect().toSet
    def z(a: Long, b: Long) = HashKernels.interleaveBits(a, b, 5)
    assert(got === Set((0L, 31L, z(0, 31)), (31L, 0L, z(31, 0)), (10L, 20L, z(10, 20))))
  }

  test("zorderBy: a 2-D box touches fewer partitions than a lexicographic layout") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
    def boxParts(laid: org.apache.spark.sql.DataFrame): Long = laid
      .withColumn("pid", spark_partition_id())
      .filter(col("x").between(8, 11) && col("y").between(16, 19))
      .select("pid").distinct().count()
    // 1024 cells into 64 partitions of ~16 rows; an aligned 4x4 box is one
    // contiguous z-range of 16 keys -> a couple of partitions
    val zParts = boxParts(Layout.zorderBy(grid, "x", "y", bits = 5, numPartitions = 64))
    // lexicographic (x, y) layout: the box spans 4 widely-separated x-runs
    val lexParts = boxParts(
      grid.repartitionByRange(64, col("x"), col("y")).sortWithinPartitions("x", "y"))
    assert(zParts < lexParts,
      s"z-order box spread $zParts must beat lexicographic $lexParts")
    assert(zParts <= 3L, s"aligned box should stay in ~1-2 z-partitions, got $zParts")
  }

  test("zorderKey: constant column degrades gracefully to the other axis") {
    val df = Seq((7L, 0L), (7L, 1L), (7L, 2L)).toDF("a", "b")
    val got = Layout.zorderKey(df, "a", "b", bits = 4)
      .select("b", "zkey").as[(Long, Long)].collect().toMap
    // a contributes 0 everywhere; b in [0,2] scales to {0, 7, 15} and its
    // bits land on odd positions: 7 -> 2+8+32, 15 -> 2+8+32+128
    assert(got === Map(0L -> 0L, 1L -> 42L, 2L -> 170L))
  }

  test("shardBy: balanced deterministic shards with dense in-shard ranks") {
    val df = (0L until 100L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text")
    def run() = Layout.shardBy(df, "doc_id",
        TextAnalysis.fingerprint(col("text")), numShards = 4)
      .select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Int, Long)].collect()
    val rows = run()
    assert(rows.length === 100)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 4))
    // ranks are dense 0..n-1 within every shard
    rows.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq === (0L until rs.length).toSeq)
    }
    // hash sharding balances: no shard is empty at 100 rows / 4 shards
    assert(rows.groupBy(_._2).size === 4)
    // reproducible: a rerun yields the identical layout
    assert(run().toSet === rows.toSet)
    // duplicate texts tie-break by id: same shard, adjacent deterministic order
    val dup = Seq((1L, "same"), (2L, "same"), (3L, "same")).toDF("doc_id", "text")
    val d = Layout.shardBy(dup, "doc_id",
        TextAnalysis.fingerprint(col("text")), numShards = 2)
      .select("doc_id", "pos_in_shard").as[(Long, Long)].collect().sortBy(_._1)
    assert(d.map(_._2).toSeq === d.map(_._2).sorted.toSeq)
  }

  test("zorderKeyN on two columns equals the 2-D kernel bit-for-bit") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
    val twoD = Layout.zorderKey(grid, "x", "y", bits = 5)
      .select("x", "y", "zkey").as[(Int, Int, Long)].collect().toSet
    val nD = Layout.zorderKeyN(grid, Seq("x", "y"), bits = 5)
      .select("x", "y", "zkey").as[(Int, Int, Long)].collect().toSet
    assert(nD === twoD)
  }

  test("zorderKeyN: three axes interleave round-robin") {
    val df = Seq((1L, 0L, 1L, 1L)).toDF("id", "a", "b", "c")
      .unionByName(Seq((2L, 1L, 0L, 1L)).toDF("id", "a", "b", "c"))
      .unionByName(Seq((3L, 1L, 1L, 0L)).toDF("id", "a", "b", "c"))
    // ranges are [0,1] so 1 scales to the full mask (all `bits` ones)
    val got = Layout.zorderKeyN(df, Seq("a", "b", "c"), bits = 2)
      .select("id", "zkey").as[(Long, Long)].collect().toMap
    // bit layout per j: a -> 3j, b -> 3j+1, c -> 3j+2
    def key(a: Long, b: Long, c: Long) =
      (0 until 2).map(j => (((a >> j) & 1) << (3 * j)) +
        (((b >> j) & 1) << (3 * j + 1)) + (((c >> j) & 1) << (3 * j + 2))).sum
    assert(got(1L) === key(0, 3, 3)) // scaled: 0 -> 0, 1 -> mask=3
    assert(got(2L) === key(3, 0, 3))
    assert(got(3L) === key(3, 3, 0))
  }

  test("hilbertIndex: bijective on the grid and consecutive keys are " +
      "grid-adjacent (the locality Morton lacks)") {
    val bits = 4
    val n = 1 << bits
    val keyed = (for (x <- 0 until n; y <- 0 until n)
      yield (x, y, graft.functions.HashKernels.hilbertIndex(x, y, bits)))
    // bijection: every cell gets a distinct key covering [0, n²)
    val keys = keyed.map(_._3)
    assert(keys.toSet === (0L until (n.toLong * n)).toSet)
    // THE Hilbert property: walking the curve in key order moves exactly
    // one grid step at a time — Morton violates this at every power-of-two
    // boundary (diagonal jumps), which is why Hilbert boxes are tighter
    val byKey = keyed.sortBy(_._3)
    byKey.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumped from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbertKey: map-only keyed frame; box query touches few key ranges") {
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val keyed = Layout.hilbertKey(pts, "x", "y", bits = 5)
    // identity scaling on [0, 2^bits): key equals the raw kernel value
    val sample = keyed.filter($"x" === 3L && $"y" === 7L)
      .select("hkey").as[Long].head()
    assert(sample === graft.functions.HashKernels.hilbertIndex(3L, 7L, 5))
    // locality vs Morton on the same 8x8 box: the Hilbert span of a box
    // is never worse here (tighter key ranges => better min/max pruning)
    val box = keyed.filter($"x" < 8L && $"y" < 8L).select("hkey").as[Long].collect()
    val mort = Layout.zorderKey(pts, "x", "y", bits = 5)
      .filter($"x" < 8L && $"y" < 8L).select("zkey").as[Long].collect()
    assert(box.max - box.min <= mort.max - mort.min)
    assert(box.max - box.min === 63L, "an aligned 8x8 box is one contiguous Hilbert range")
  }

  test("hilbertIndexN: equals the 2-D kernel exhaustively on two axes; " +
      "3-D walk is a true Hilbert curve (bijection + unit steps)") {
    // n = 2 parity with the classic quadrant-walk kernel, every cell of
    // every grid up to 5 bits (the z06 <-> z08 consistency contract)
    for (b <- 1 to 5; x <- 0L until (1L << b); y <- 0L until (1L << b))
      assert(graft.functions.HashKernels.hilbertIndexN(Array(x, y), b) ===
        graft.functions.HashKernels.hilbertIndex(x, y, b),
        s"Skilling diverges from the 2-D kernel at bits=$b ($x,$y)")
    // n = 3: distinct keys covering [0, 8^3) and unit Manhattan steps
    val keyed = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z, graft.functions.HashKernels.hilbertIndexN(Array(x, y, z), 3))
    assert(keyed.map(_._4).toSet === (0L until 512L).toSet)
    keyed.sortBy(_._4).sliding(2).foreach {
      case Seq((x1, y1, z1, _), (x2, y2, z2, _)) =>
        assert((x1 - x2).abs + (y1 - y2).abs + (z1 - z2).abs === 1,
          s"3-D curve jumped from ($x1,$y1,$z1) to ($x2,$y2,$z2)")
    }
  }

  test("hilbertIndexN: rejects bits outside the contract instead of " +
      "shifting by -1 into silently wrong keys (direct-caller guard)") {
    intercept[IllegalArgumentException] {
      graft.functions.HashKernels.hilbertIndexN(Array(1L, 2L), 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.HashKernels.hilbertIndexN(Array(1L, 2L, 3L), 22) // 66 > 63
    }
    intercept[IllegalArgumentException] {
      graft.functions.HilbertIndexN(
        org.apache.spark.sql.catalyst.expressions.Literal(null), 0)
    }
  }

  test("hilbertKeyN: two-axis frame equals hilbertKey row-for-row; " +
      "3-axis key matches the kernel on scaled coords") {
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
    val viaN = Layout.hilbertKeyN(pts, Seq("x", "y"), bits = 4)
      .select("x", "y", "hkey").as[(Long, Long, Long)].collect().toSet
    val via2 = Layout.hilbertKey(pts, "x", "y", bits = 4)
      .select("x", "y", "hkey").as[(Long, Long, Long)].collect().toSet
    assert(viaN === via2)
    val pts3 = Seq((0L, 0L, 0L), (7L, 3L, 5L), (7L, 7L, 7L)).toDF("x", "y", "z")
    val got3 = Layout.hilbertKeyN(pts3, Seq("x", "y", "z"), bits = 3)
      .select("x", "y", "z", "hkey").as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (x, y, z, k) =>
      assert(k === graft.functions.HashKernels.hilbertIndexN(Array(x, y, z), 3))
    }
  }

  test("hilbertKeyN: a null coordinate yields a NULL key (parity with " +
      "zorderKeyN), never an NPE or a silently-zeroed cell") {
    val pts = Seq((java.lang.Long.valueOf(0L), java.lang.Long.valueOf(0L)),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(3L)))
      .toDF("x", "y")
    val h = Layout.hilbertKeyN(pts, Seq("x", "y"), bits = 2)
      .select($"x", $"hkey").as[(Long, Option[Long])].collect().toMap
    val z = Layout.zorderKeyN(pts, Seq("x", "y"), bits = 2)
      .select($"x", $"zkey").as[(Long, Option[Long])].collect().toMap
    assert(h(1L).isEmpty, "null coordinate must give a null hilbert key")
    assert(z(1L).isEmpty, "null coordinate must give a null morton key")
    assert(h(0L).nonEmpty && h(3L).nonEmpty)
  }

  test("compactionGroups: largest-first bins per partition; oversize files isolate") {
    val files = Seq(
      ("p1", "a", 900L), ("p1", "b", 800L), ("p1", "c", 300L), ("p1", "d", 200L),
      ("p1", "e", 1500L),
      ("p2", "f", 100L), ("p2", "g", 100L)).toDF("part", "path", "bytes")
    val got = Layout.compactionGroups(files, Seq("part"), "path", "bytes", 1000L)
      .select("part", "path", "bin").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // p1 largest-first: e(1500) starts at 0 → bin 0 (isolated oversize),
    // a starts 1500 → bin 1, b starts 2400 → bin 2, c starts 3200 and
    // d starts 3500 → both bin 3 (the residual tail shares a bin)
    assert(got === Map(
      ("p1", "e") -> 0L, ("p1", "a") -> 1L, ("p1", "b") -> 2L,
      ("p1", "c") -> 3L, ("p1", "d") -> 3L,
      ("p2", "f") -> 0L, ("p2", "g") -> 0L))
  }

  test("epochShuffle: total deterministic layout; epochs permute differently") {
    val docs = (1L to 400L).toDF("id")
    def order(epoch: Int): Seq[Long] = Layout.epochShuffle(docs, "id", epoch, 4)
      .select("id", "shard", "pos_in_shard").as[(Long, Int, Long)].collect()
      .sortBy(r => (r._2, r._3)).map(_._1).toSeq
    val e1 = order(1)
    assert(e1.toSet == (1L to 400L).toSet) // a true permutation, no loss
    assert(order(1) == e1)                 // reproducible
    assert(order(2) != e1)                 // epochs differ
    // shards stay balanced within a loose binomial bound
    val sizes = Layout.epochShuffle(docs, "id", 1, 4)
      .groupBy("shard").count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.length == 4 && sizes.forall(c => c > 50 && c < 150), sizes.toSeq)
  }
}
