package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 scratch: anatomy of q199's ADC scan. Not part of the driver
  * contract. */
object ScratchAdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch-adc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    println("emb rows " + e.count())
    val books = graft.ops.VectorOps.pqCodebooks(e, "vec_id", "embedding",
      m = 4, ksub = 8).persist()
    books.count()
    val enc = graft.ops.VectorOps.pqEncode(e, "vec_id", "embedding", books)
      .repartition(32).persist()
    println("enc rows " + enc.count())
    val q = e.filter(col("vec_id") % 7 === 3)
    println("q rows " + q.count())
    val g0 = graft.ops.VectorOps.pqAdcKnn(q, enc, books, "vec_id",
      "embedding", k = 5)
    time("pqAdcKnn run1")(noop(g0))
    time("pqAdcKnn run2")(noop(g0))
    // ---- the q199 pin phases
    val g = g0.persist()
    time("g persist")(g.count())
    val recon = enc
      .select(col("vec_id"), posexplode(col("pq_codes"))
        .as(Seq("subspace", "code")))
      .join(broadcast(books), Seq("subspace", "code"))
      .groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("subspace"), col("cvec")))),
        x => x.getField("cvec"))).as("__recon"))
    time("recon alone")(noop(recon))
    val q9 = q.filter(col("vec_id") % 21 === 3)
    def subFold(f: Int => org.apache.spark.sql.Column) =
      aggregate(array((0 until 4).map(f): _*), lit(0.0),
        (acc, v) => acc + v)
    val scored9 = recon.crossJoin(broadcast(q9.select(
        col("vec_id").as("__q_id"), col("embedding").as("__q_vec"))))
      .filter(col("__q_id") =!= col("vec_id"))
      .select(col("__q_id"), col("vec_id"),
        round(
          subFold(sp => graft.ops.VectorOps.dot(
            slice(col("__q_vec"), sp * 16 + 1, 16),
            slice(col("__recon"), sp * 16 + 1, 16))) /
            (graft.ops.VectorOps.l2norm(col("__q_vec")) *
              sqrt(subFold(sp => graft.ops.VectorOps.dot(
                slice(col("__recon"), sp * 16 + 1, 16),
                slice(col("__recon"), sp * 16 + 1, 16))))),
          6).as("adc_cos"))
    time("scored9")(noop(scored9))
    val g9dec = scored9.groupBy("__q_id")
      .agg(graft.functions.TopKAgg.topKByScore(col("adc_cos"),
        col("vec_id"), 5).as("__top"))
      .select(col("__q_id").as("q_id"),
        posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("q_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("vec_id"), col("__e.score").as("adc_cos"))
    time("g9dec")(noop(g9dec))
    val g9 = g.filter(col("q_id") % 21 === 3)
    val diff = g9.select(col("q_id"), col("rank"),
        col("vec_id").as("__v_l"), col("adc_cos").as("__c_l"))
      .join(g9dec.select(col("q_id"), col("rank"),
        col("vec_id").as("__v_d"), col("adc_cos").as("__c_d")),
        Seq("q_id", "rank"), "full_outer")
      .filter(col("__v_l").isNull || col("__v_d").isNull ||
        col("__v_l") =!= col("__v_d") || col("__c_l") =!= col("__c_d"))
    time("diff count")(println("diff " + diff.count()))
    time("diff count again")(println("diff " + diff.count()))
    spark.stop()
  }
}
