package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def withRule[T](width: Option[String])(f: => T): T = {
    val rule = RangeJoinRewrite(spark)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ rule
    width.foreach(w => spark.conf.set(rule.ConfKey, w))
    try f
    finally {
      spark.experimental.extraOptimizations = prev
      spark.conf.unset(rule.ConfKey)
    }
  }

  private def fixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // points and intervals over [0, 10000); ~1% empty intervals
    // (lo > hi), NULL points and NULL bounds sprinkled in
    val pts = (1L to 400L).map { i =>
      (i, if (i % 37 == 0) null else
        java.lang.Long.valueOf(rnd.nextInt(10000).toLong))
    }.toDF("p_id", "pt")
    val ivs = (1L to 300L).map { i =>
      val lo = rnd.nextInt(10000).toLong
      val w = rnd.nextInt(400).toLong - 4 // some empty (negative width)
      (i,
        if (i % 41 == 0) null else java.lang.Long.valueOf(lo),
        if (i % 43 == 0) null else java.lang.Long.valueOf(lo + w))
    }.toDF("i_id", "lo", "hi")
    (pts, ivs)
  }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pure range join replans from nested-loop to bucketed equi-join; rows identical") {
    val (pts, ivs) = fixture
    def query = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("p_id", "i_id", "pt", "lo", "hi")
    val baseline = query.collect().map(_.toSeq).toSet
    assert(planString(query).contains("NestedLoop") ||
      planString(query).contains("Cartesian"),
      "fixture no longer plans as a nested-loop join — test is vacuous")
    withRule(Some("256")) {
      val got = query
      val plan = planString(got)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"rule did not remove the nested-loop join:\n$plan")
      assert(plan.contains("Generate"),
        "expected the bucket explode in the rewritten plan")
      assert(got.collect().map(_.toSeq).toSet == baseline,
        "rewritten join changed the result")
    }
  }

  test("strict bounds, flipped operand order, and point on the RIGHT side all rewrite") {
    val (pts, ivs) = fixture
    // lo < pt AND hi > pt, interval side as the LEFT input
    def query = ivs.join(pts, col("lo") < col("pt") && col("hi") > col("pt"))
      .select("i_id", "p_id")
    val baseline = query.collect().map(_.toSeq).toSet
    withRule(Some("100")) {
      val plan = planString(query)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"strict/flipped form not rewritten:\n$plan")
      assert(query.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("mixed numeric types (int point, double bounds) rewrite and stay exact") {
    import spark.implicits._
    val pts = (1 to 500).map(i => (i.toLong, i % 97)).toDF("p_id", "pt")
    val ivs = Seq((1L, 10.5, 20.5), (2L, 90.0, 96.0), (3L, 96.5, 3.0))
      .toDF("i_id", "lo", "hi") // third interval is empty (lo > hi)
    def q = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .groupBy("i_id").agg(count(lit(1)).as("n"))
    val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(Some("7")) {
      assert(planString(q).contains("Generate"), "mixed types not rewritten")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == baseline)
    }
  }

  test("rule is inert without the conf, and leaves equi-keyed joins alone") {
    val (pts, ivs) = fixture
    def rangeOnly = pts.join(ivs,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    withRule(None) {
      assert(planString(rangeOnly).contains("NestedLoop") ||
        planString(rangeOnly).contains("Cartesian"),
        "rule fired without its conf")
    }
    // an equi predicate means Spark already hash-joins: leave it be
    def keyed = pts.join(ivs,
      col("p_id") === col("i_id") &&
        col("pt") >= col("lo") && col("pt") <= col("hi"))
    withRule(Some("256")) {
      assert(!planString(keyed).contains("Generate"),
        "rule rewrote a join that already had an equi key")
    }
    // invalid width fails loudly at plan time
    withRule(Some("-5")) {
      val e = intercept[Exception] { rangeOnly.collect() }
      val msg = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msg.contains("positive finite"), msg)
    }
  }

  test("GraftExtensions wires the SQL surface and the rule into a fresh session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      // the injected function surface answers without registerAll
      assert(s2.sql("SELECT g_clean_text('  a   b ') AS t")
        .head().getString(0) == "a b")
      assert(s2.sql("SELECT simhash64(array('x','y'))").head().get(0) != null)
      // the injected optimizer rule fires under its conf
      import s2.implicits._
      val pts = Seq((1L, 5L), (2L, 50L)).toDF("p_id", "pt")
      val ivs = Seq((10L, 0L, 10L)).toDF("i_id", "lo", "hi")
      s2.conf.set("spark.graft.rangeJoin.bucketWidth", "8")
      try {
        val q = pts.join(ivs,
          col("pt") >= col("lo") && col("pt") <= col("hi"))
        assert(q.queryExecution.executedPlan.toString.contains("Generate"),
          "extension-injected rule did not fire")
        assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
      } finally s2.conf.unset("spark.graft.rangeJoin.bucketWidth")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
