package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("semDedup: duplicates drop, near-but-below-tau survives") {
    // seeds (k=2) are ids 1,2; id3 duplicates seed1, id5 duplicates
    // seed2, id4 is near seed1 but under tau=0.95 (cos 3/sqrt(10)).
    val e = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(1f, 0f),
      4L -> Seq(3f, 1f), 5L -> Seq(0f, 1f))
    val out = VectorOps.semDedup(e, "vec_id", "embedding", k = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(3L) == (1L, false))
    assert(out(2L) == (2L, true) && out(5L) == (2L, false))
    assert(out(4L) == (1L, true), "below-tau neighbor must survive")
  }

  test("lmScore: hand-computed bigram log-probs, unseen-context floor, quality ordering") {
    import spark.implicits._
    val train = Seq(1L -> "a b a b", 2L -> "a c").toDF("doc_id", "text")
    // c12: "a b"->2, "b a"->1, "a c"->1 ; c1: a->3, b->1 ; V = |{b,a,c}| = 3
    val score = Seq(10L -> "a b c", 11L -> "z z", 12L -> "a b a b a b")
      .toDF("doc_id", "text")
    val out = TrainingOps.lmScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def micro(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val expected10 = BigDecimal(
        (micro(2.5 / 4.5) + micro(0.5 / 2.5)) / 2.0 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L)._1 == 2L)
    assert(out(10L)._2 == expected10)
    // fully unseen context: p = alpha / (alpha * V) = 1/V = 1/3
    val expected11 = BigDecimal(micro(1.0 / 3.0) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(11L)._2 == expected11)
    // a doc of frequent train bigrams outscores gibberish
    assert(out(12L)._2 > out(11L)._2)
    assert(out(12L)._3 < out(11L)._3, "higher avg logp = lower perplexity")
  }

  test("lmScore is partitioning-independent (integer micro-unit sums)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1L to 40L).map(i =>
      i -> Seq.fill(50)(s"t${rnd.nextInt(30)}").mkString(" ")).toDF("doc_id", "text")
    val a = TrainingOps.lmScore(docs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    val b = TrainingOps.lmScore(docs.repartition(7), docs.repartition(13),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }

  test("semDedup laws: min id per cluster always kept; tau>1 keeps all; tau=-1 keeps only cluster minima") {
    val rnd = new scala.util.Random(11)
    val e = vecs((1L to 60L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1)): _*)
    val out = VectorOps.semDedup(e, "vec_id", "embedding", k = 4, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 60)
    out.groupBy(_._2).foreach { case (c, members) =>
      val minId = members.map(_._1).min
      assert(members.find(_._1 == minId).get._3,
        s"cluster $c smallest id $minId must be kept")
    }
    val keepAll = VectorOps.semDedup(e, "vec_id", "embedding", k = 4, tau = 1.01)
    assert(keepAll.filter(!col("kept")).count() == 0)
    val onlyMin = VectorOps.semDedup(e, "vec_id", "embedding", k = 4, tau = -1.0)
      .filter(col("kept")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = out.map(t => (t._1, t._2))
    val expectedKept = clusters.groupBy(_._2).map { case (c, m) =>
      (m.map(_._1).min, c)
    }.toSet
    assert(onlyMin.toSet == expectedKept,
      "tau=-1 must keep exactly the smallest id of each cluster")
  }
}
