package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 optimization round: dumps `.explain("formatted")` for the plan
  * shapes the round touched, so plans/r19/<query>_{before,after}.txt
  * can be produced from any git state. Not part of the driver
  * contract.
  *
  * Usage: PlanDump <shape> — prints ONE formatted plan on stdout.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = dump(spark, sfDir, args.headOption.getOrElse(""))
    println(out)
    spark.stop()
  }

  def dump(spark: SparkSession, sfDir: String, shape: String): String = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the q228/q230 bigram fixture, spelled over whichever staged
    // schema the current tree builds (side rows pre-r19, flags post)
    lazy val bgRows = {
      val ts = filter(graft.ops.TextDedup.tokensOf(col("text")),
        t => length(t) > 0)
      docs.filter(col("doc_id").isNotNull)
        .select(col("lang"), (col("doc_id") % 2).as("side"),
          explode(when(size(ts) >= 2,
            transform(sequence(lit(1), size(ts) - 1), i =>
              concat(element_at(ts, i), lit(" "),
                element_at(ts, i + 1))))
            .otherwise(array().cast("array<string>"))).as("bg"))
    }
    lazy val exA = bgRows.filter(col("side") === 0).select("lang", "bg")
    lazy val exB = bgRows.filter(col("side") === 1).select("lang", "bg")
    def fmt(df: org.apache.spark.sql.DataFrame): String = {
      val w = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(w, true, "UTF-8")) {
        df.explain("formatted")
      }
      w.toString("UTF-8")
    }
    shape match {
      case "kmv_overlap" =>
        fmt(graft.ops.Sketches.kmvOverlap(
          graft.ops.Sketches.kmvSketch(exA, Seq("lang"), "bg", k = 256),
          graft.ops.Sketches.kmvSketch(exB, Seq("lang"), "bg", k = 256),
          Seq("lang")))
      case "kmv_difference" =>
        fmt(graft.ops.Sketches.kmvDifference(
          graft.ops.Sketches.kmvSketch(exA, Seq("lang"), "bg", k = 256),
          graft.ops.Sketches.kmvSketch(exB, Seq("lang"), "bg", k = 256),
          Seq("lang")))
      case "pq_adc" =>
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val books = graft.ops.VectorOps.pqCodebooks(e, "vec_id",
          "embedding", m = 4, ksub = 8).persist()
        books.count()
        val enc = graft.ops.VectorOps.pqEncode(e, "vec_id", "embedding",
          books).persist()
        enc.count()
        fmt(graft.ops.VectorOps.pqAdcKnn(
          e.filter(col("vec_id") % 7 === 3), enc, books, "vec_id",
          "embedding", k = 5))
      case "simhash_sig" =>
        fmt(graft.ops.TextDedup.simHashMd5Sig(
          docs.select(col("doc_id"), col("text")), "doc_id", "text"))
      case "srp_bands" =>
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        fmt(graft.ops.VectorOps.srpBands(e, "vec_id", "embedding",
          bands = 4, bandBits = 16))
      case other =>
        s"unknown plan shape '$other'"
    }
  }
}
