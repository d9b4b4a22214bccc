package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 scratch: anatomy of the q228/q230 bigram exact side. Not part
  * of the driver contract. */
object ScratchKmv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch-kmv")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ts = filter(graft.ops.TextDedup.tokensOf(col("text")),
      t => length(t) > 0)
    val bgRaw = docs.filter(col("doc_id").isNotNull)
      .select(col("lang"), (col("doc_id") % 2).as("side"),
        explode(when(size(ts) >= 2,
          transform(sequence(lit(1), size(ts) - 1), i =>
            concat(element_at(ts, i), lit(" "),
              element_at(ts, i + 1))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .distinct()
    val bg = graft.ops.Materialize.stage(bgRaw)
    time("bg materialize")(println("bg rows " + bg.count()))
    println("bg stats sizeInBytes = " +
      bg.queryExecution.optimizedPlan.stats.sizeInBytes)
    val exA = bg.filter(col("side") === 0).select("lang", "bg")
    val exB = bg.filter(col("side") === 1).select("lang", "bg")
    val inter = exA.join(exB, Seq("lang", "bg"))
      .groupBy("lang").agg(count(lit(1)).as("__exi"))
    inter.explain("formatted")
    time("exact inter")(inter.write.format("noop").mode("overwrite").save())
    time("exact counts a")(exA.groupBy("lang").agg(count(lit(1)))
      .write.format("noop").mode("overwrite").save())
    val sk = graft.ops.Sketches.kmvSketch(exA, Seq("lang"), "bg", k = 256)
    time("kmvSketch A alone")(sk.write.format("noop").mode("overwrite").save())
    val meter = new ProfileEntry.JobMeter
    spark.sparkContext.addSparkListener(meter)
    val ov = graft.ops.Sketches.kmvOverlap(
      graft.ops.Sketches.kmvSketch(exA, Seq("lang"), "bg", k = 256),
      graft.ops.Sketches.kmvSketch(exB, Seq("lang"), "bg", k = 256),
      Seq("lang"))
    time("kmvOverlap collect")(ov.orderBy("lang").collect())
    Thread.sleep(300); meter.drainPrint("kmvOverlap")
    val d = graft.ops.Sketches.kmvDifference(
      graft.ops.Sketches.kmvSketch(exA, Seq("lang"), "bg", k = 256),
      graft.ops.Sketches.kmvSketch(exB, Seq("lang"), "bg", k = 256),
      Seq("lang"))
    time("kmvDifference collect")(d.orderBy("lang").collect())
    Thread.sleep(300); meter.drainPrint("kmvDifference")
    time("kmvOverlap again")(ov.orderBy("lang").collect())
    Thread.sleep(300); meter.drainPrint("kmvOverlap rep2")
    spark.stop()
  }
}
