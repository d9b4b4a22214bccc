package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def z(x: Int, y: Int, bits: Int): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), bits)).head.getLong(0)
  }

  test("zValue2 interleaves bits: x at even positions, y at odd") {
    // x=101b -> positions 0,4 ; y=011b -> positions 1,3
    assert(z(5, 3, 3) == 27L)
    assert(z(0, 0, 8) == 0L)
    assert(z(1, 0, 8) == 1L)
    assert(z(0, 1, 8) == 2L)
    assert(z(255, 0, 8) == 0x5555L)
    assert(z(0, 255, 8) == 0xAAAAL)
    // reference scalar implementation on random points
    val rnd = new scala.util.Random(5)
    def ref(x: Int, y: Int, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))
      }.reduce(_ | _)
    for (_ <- 1 to 50) {
      val (x, y) = (rnd.nextInt(1 << 12), rnd.nextInt(1 << 12))
      assert(z(x, y, 12) == ref(x, y, 12))
    }
  }

  test("aligned power-of-two tiles are contiguous z-ranges") {
    // the property that makes min/max file pruning work: an aligned
    // 2^k x 2^k tile's z-values form EXACTLY [z0, z0 + 4^k)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val k = 1 + rnd.nextInt(3) // tile 2..8 on a side
      val side = 1 << k
      val tx = rnd.nextInt(64 / side) * side
      val ty = rnd.nextInt(64 / side) * side
      val zs = (for (x <- tx until tx + side; y <- ty until ty + side)
        yield (x, y)).toDF("x", "y")
        .select(Layout.zValue2(col("x"), col("y"), 6))
        .collect().map(_.getLong(0)).sorted
      assert(zs.length == side * side)
      assert(zs.last - zs.head == side * side - 1,
        s"tile ($tx,$ty) side $side not contiguous: ${zs.head}..${zs.last}")
      assert(zs.zip(zs.tail).forall { case (a, b) => b == a + 1 })
    }
  }

  test("z-ordered range layout prunes a 2-D box to few partitions") {
    import spark.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    val laid = Layout.zorder(grid, "x", "y", bits = 6, numFiles = 16)
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      assert(laid.select(countDistinct("pid")).head.getLong(0) == 16L)
      // an aligned 8x8 box is 64 contiguous z-values; 4096/16 = 256
      // values per range partition -> the box lives in at most 2
      val touched = laid
        .filter(col("x").between(8, 15) && col("y").between(8, 15))
        .select(countDistinct("pid")).head.getLong(0)
      assert(touched <= 2L, s"8x8 box touched $touched of 16 partitions")
      // same box under the naive x-major layout touches at least half
      // the partitions (every x-stripe of the box lands elsewhere)
      val naive = grid
        .repartitionByRange(16, col("x") * 64 + col("y"))
        .withColumn("pid", spark_partition_id())
        .filter(col("y").between(8, 15)) // y-selective predicate
        .select(countDistinct("pid")).head.getLong(0)
      assert(naive >= 8L, s"expected naive layout to scatter, got $naive")
    } finally laid.unpersist()
  }

  test("rendezvousShard: minimal disruption on add AND remove; balanced; null keys null") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k")
    val s5 = Seq("s0", "s1", "s2", "s3", "s4")
    val a5 = Layout.rendezvousAssign(keys, "k", s5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every shard gets a plausible share (uniform-ish: 2000/5 = 400)
    val shares = a5.values.groupBy(identity).view.mapValues(_.size)
    s5.foreach(sh => assert(shares(sh) > 250 && shares(sh) < 550,
      s"$sh got ${shares.toMap}"))
    // ADD law: growing to 6 shards moves ONLY keys that land on the
    // new shard — nobody relocates between surviving shards
    val a6 = Layout.rendezvousAssign(keys, "k", s5 :+ "s5")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val movedElsewhere = a5.count { case (k, sh) =>
      a6(k) != sh && a6(k) != "s5" }
    assert(movedElsewhere == 0, s"$movedElsewhere keys relocated " +
      "between surviving shards on scale-out")
    val movedToNew = a5.count { case (k, _) => a6(k) == "s5" }
    assert(movedToNew > 200 && movedToNew < 500, // ~1/6 of 2000 = 333
      s"expected ~1/6 of keys on the new shard, got $movedToNew")
    // REMOVE law: dropping a shard reassigns ONLY its keys
    val a4 = Layout.rendezvousAssign(keys, "k", s5.filterNot(_ == "s2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a5.forall { case (k, sh) => sh == "s2" || a4(k) == sh },
      "a surviving shard lost keys on shard removal")
    // NULL keys get NULL shards, loud contracts
    val withNull = Seq[java.lang.Long](7L, null).toDF("k")
    val got = Layout.rendezvousAssign(withNull, "k", s5).collect()
      .map(r => Option(r.get(0)) -> Option(r.getString(1))).toMap
    assert(got(None).isEmpty && got(Some(7L)).nonEmpty)
    intercept[IllegalArgumentException] {
      Layout.rendezvousShard(col("k"), Nil)
    }
    intercept[IllegalArgumentException] {
      Layout.rendezvousShard(col("k"), Seq("a", "a"))
    }
  }
}
