package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextDedup

/** Scratch profiler for the round-9 heavy battery entries (q162 /
  * q172 / q174): times each phase in isolation so optimization effort
  * lands on the real hot spot. Not part of the driver contract.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-q")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()

    // ---- q172/q174 chain
    time("spanList (full chain)")(noop(
      TextDedup.duplicateSpanList(d, "doc_id", "text", 40)))
    val base = d.select(col("doc_id"), col("text").as("__t"),
      length(col("text")).cast("long").as("__len"))
    val anchors = base.filter(col("__len") >= 40)
      .select(col("doc_id"), col("__len"), col("__t"),
        explode(sequence(lit(1L), col("__len") - 39)).as("p"))
      .withColumn("h", md5(expr("substring(__t, p, 40)").cast("binary")))
      .drop("__t")
    time("anchors alone")(noop(anchors))
    time("anchors count-agg")(noop(
      anchors.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") >= 2)))
    time("excise (full chain)")(noop(
      TextDedup.exciseDuplicateSpans(d, "doc_id", "text", 40)))

    // ---- q162 phases
    val oldCorpus = d.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    val newCorpus = d.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    var built: TextDedup.ShingleState = null
    time("q162 shingleState(old)") {
      built = TextDedup.shingleState(oldCorpus, "doc_id", "text", 5, 8, 3)
      built.grams.persist().count(); built.df.persist().count()
      built.pairs.persist().count()
    }
    val removedIds = oldCorpus
      .filter(col("doc_id") % 13 === 0 || col("doc_id") % 5 === 0)
      .select("doc_id")
    val addedDocs = newCorpus
      .filter(col("doc_id") % 11 === 0 || col("doc_id") % 5 === 0)
    var inc: TextDedup.ShingleState = null
    time("q162 incremental") {
      inc = TextDedup.incrementalShingleState(built, removedIds, addedDocs,
        "doc_id", "text", 5, 8, 3)
      inc.pairs.persist().count()
    }
    var full: org.apache.spark.sql.DataFrame = null
    time("q162 full recompute") {
      full = TextDedup.rareShingleCandidates(newCorpus, "doc_id", "text", 5, 8, 3)
      noop(full)
    }
    time("q162 equivalence join") {
      inc.pairs.withColumnRenamed("n_shared", "n_inc")
        .join(full.withColumnRenamed("n_shared", "n_full"),
          Seq("id_a", "id_b"), "full_outer")
        .agg(count(lit(1))).head()
    }
    time("q162 connectedComponents")(noop(
      TextDedup.connectedComponents(inc.pairs)))
    spark.stop()
  }
}

import org.apache.spark.sql.functions._

/** q175 phase profiler. */
object ProfileSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val copies = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val pert = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" zz11 zz22 zz33")).as("text"))
    val corpus = d.union(copies).union(pert)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("warmup-50")(graft.ops.TextDedup
      .simHashCandidatesMd5(corpus.limit(50), "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("full candidates A")(graft.ops.TextDedup
      .simHashCandidatesMd5(corpus, "doc_id", "text", 8)
      .write.format("noop").mode("overwrite").save())
    val sig = graft.ops.TextDedup.simHashMd5Sig(corpus, "doc_id", "text")
    time("sig")(sig.write.format("noop").mode("overwrite").save())
    val sigP = sig.persist(); println("docs " + sigP.count())
    val banded = sigP.select(col("doc_id"), col("sig"),
      explode(org.apache.spark.sql.functions.array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("sig"), b * 4 + 1, 4).as("chunk"))): _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.chunk"))
    val a = banded.as("a"); val b = banded.as("b")
    val pairs = a.join(b, col("a.band") === col("b.band") &&
        col("a.chunk") === col("b.chunk") && col("a.doc_id") < col("b.doc_id"))
    println("collision pair rows: " + pairs.count())
    time("full candidates")(graft.ops.TextDedup
      .simHashCandidatesMd5(corpus, "doc_id", "text", 8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

/** q169 phase profiler. */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.pipeline.H3Wide
    import graft.queries.GeoQueries
    time("sharedIndex build")(
      GeoQueries.sharedIndex(spark, sfDir).count())
    val idx = GeoQueries.sharedIndex(spark, sfDir)
      .select("h3_cell", "klass", "dataset_id")
    println("index rows " + idx.count())
    val klasses = H3Wide.klassValuesOf(idx)
    val groups = H3Wide.defaultGroups(klasses, n = 2)
    val tables = H3Wide.hybrid(idx, groups).map { case (k, df) => k -> df.persist() }
    time("hybrid materialize")(tables.values.foreach(_.count()))
    time("build(long) full")(noop(H3Wide.build(idx, klasses)))
    time("assemble")(noop(H3Wide.assemble(tables, groups)))
    val cat = groups.keys.min
    time("routed single")(noop(H3Wide.routed(idx, tables, groups, groups(cat))))
    val span = groups.values.map(_.head).toSeq.sorted
    time("routed span")(noop(H3Wide.routed(idx, tables, groups, span)))
    time("q169 full")(noop(
      graft.SparkEntry.queries("q169_hybrid_identity")(spark, sfDir)))
    spark.stop()
  }
}

/** q176 phase profiler. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.ops.{TextDedup, TrainingOps}
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val spans = TextDedup.duplicateSpanList(d, "doc_id", "text", 40).persist()
    time("spans materialize")(spans.count())
    time("fracs")(noop(TextDedup.duplicateSpans(spans, "doc_id")))
    val ct = TextDedup.excisedText(d, "doc_id", "text", spans)
      .select(col("doc_id"), col("clean_text")).persist()
    time("ct materialize")(ct.count())
    val sp = TrainingOps.hashSplit(ct, "doc_id",
      Seq("train" -> 0.75, "heldout" -> 0.25), salt = "lm")
    val lm = TrainingOps.lmScore(
      sp.filter(col("split") === "train"), ct, "doc_id", "clean_text")
    time("lm over cleaned")(noop(lm))
    time("q176 full (2nd run)")(noop(
      graft.SparkEntry.queries("q176_curation_e2e")(spark, sfDir)))
    spark.stop()
  }
}
