package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement mains backing PERF.md's two scale claims that were
  * previously analytical only:
  *
  *  - [[ProfileDelta]]: the incremental-dedup O(delta) PAYOFF —
  *    q162 proves the delta run EQUALS the full recompute; this
  *    measures that it is also CHEAPER (state maintenance vs
  *    from-scratch shingle state at a ~10% corpus delta).
  *
  *  - [[ProfileScale]]: the geo-index scale curve — polygon-query
  *    latency vs index size at 1x/4x/16x the sf fixture, with the
  *    index growing in AREA (disjoint east-shifted replicas at equal
  *    density) so the query polygon keeps constant selectivity, which
  *    is the 100 TB shape (more lake, not more overlap).
  *
  * Not part of the driver battery: run by hand, results recorded in
  * PERF.md.
  */
object ProfileCurves {
  def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def medianMs(reps: Int)(f: () => Unit): Double = {
    val ts = (1 to reps).map { _ =>
      val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e6
    }.sorted
    ts(reps / 2)
  }

  /** `times` pairwise-DISTINCT disjoint replicas of the docs table at
    * the SAME per-replica shingle statistics: replica i's text is a
    * composition of two letter rotations — the 10 most frequent
    * letters rotated by i % 10 and the NEXT 10 most frequent rotated
    * by i / 10. Each transform is a character bijection, so every
    * replica's token/shingle df counts match the base corpus; the two
    * disjoint alphabets make the composite map distinct for every
    * i < 100 (a single period-10 rotation made replicas i and i + 10
    * byte-identical, flooding the 16x curve point with exact
    * cross-replica duplicates — r9 ADVICE). Cross-replica token sets
    * stay (near-)disjoint: any token containing one of the 20 mapped
    * letters differs between replicas, and 5-gram shingles without any
    * of e,t,a,o,i,n,s,r,h,l,d,c,u,m,f,p,g,w,y,b are vanishingly
    * rare in English-like text. */
  def blowupDocs(docs: DataFrame, times: Int): DataFrame = {
    val l1 = "etaoinsrhl"
    val l2 = "dcumfpgwyb"
    require(times <= 100, "blowupDocs replicas are distinct only for i < 100")
    (0 until times).map { i =>
      val r1 = l1.drop(i % 10) ++ l1.take(i % 10)
      val g = i / 10
      val r2 = l2.drop(g) ++ l2.take(g)
      val t =
        if (i == 0) col("text")
        else translate(translate(col("text"), l1, r1), l2, r2)
      docs.select((col("doc_id") + i.toLong * 10000000L).as("doc_id"),
        t.as("text"))
    }.reduce(_.unionByName(_))
  }
}

/** Sums shuffle bytes written across stages — wall-clock on a 32-core
  * single box is stage-overhead-bound at test scale, but shuffle
  * VOLUME is what a 1000-executor cluster pays for; this is every
  * profiler's measurable form of its O(...) claims. One shared class
  * (replaces five identical per-object copies, so a metric tweak
  * cannot land in only some of them). */
private[graft] final class ShuffleMeter
    extends org.apache.spark.scheduler.SparkListener {
  val bytes = new java.util.concurrent.atomic.AtomicLong()
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    bytes.addAndGet(
      sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  def drain(): Long = bytes.getAndSet(0L)
}

object ProfileDelta {
  import ProfileCurves._


  /** Disjoint distinct replicas at base-corpus per-replica shingle
    * statistics — see [[ProfileCurves.blowupDocs]] (a plain copy would
    * push every common gram's corpus-df over maxDf and hollow the pair
    * join out; the shared helper also keeps replicas i and i + 10
    * distinct, which the old single-rotation version did not). */
  private def blowup(docs: DataFrame, times: Int): DataFrame =
    blowupDocs(docs, times)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-delta")
    import graft.ops.TextDedup

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val timesList = sys.env.get("SPARK_GRAFT_TIMES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 10))
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    for (times <- timesList) {
      val docs = blowup(base, times).persist()
      val nDocs = docs.count()

      // ~10% delta: 4% of docs removed, ~4.3% changed (removed +
      // re-added with new text) — the re-crawl shape the incremental
      // path exists for
      val removedPred = col("doc_id") % 25 === 0
      val changedPred = col("doc_id") % 23 === 0 && col("doc_id") % 25 =!= 0
      val newCorpus = docs.filter(!removedPred)
        .select(col("doc_id"),
          when(changedPred, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
        .persist()
      newCorpus.count()
      val nDelta = docs.filter(removedPred || changedPred).count()

      def materialize(st: TextDedup.ShingleState): Unit = {
        def mb(): Double = { Thread.sleep(300); meter.bytes.get() / 1e6 }
        val m0 = mb()
        val tg = timed(noop(st.grams)); val m1 = mb()
        val td = timed(noop(st.df)); val m2 = mb()
        val tp = timed(noop(st.pairs)); val m3 = mb()
        println(f"    grams $tg%.2f s (${m1 - m0}%.1f MB), df $td%.2f s (${m2 - m1}%.1f MB), pairs $tp%.2f s (${m3 - m2}%.1f MB)")
      }

      // stored state (NOT part of the comparison: it's the warehouse
      // state an incremental engine already has)
      val built = TextDedup.shingleState(docs, "doc_id", "text",
        shingleN = 5, maxDf = 8, minShared = 3)
      val st = TextDedup.ShingleState(
        built.grams.persist(), built.df.persist(), built.pairs.persist())
      materialize(st)

      // the contender: delta maintenance (re-shingles ONLY delta docs)
      val removedIds = docs.filter(removedPred || changedPred)
        .select("doc_id")
      val addedDocs = newCorpus.filter(changedPred)
      var incState: TextDedup.ShingleState = null
      Thread.sleep(500); meter.drain() // let queued listener events land
      val tInc = timed {
        incState = TextDedup.incrementalShingleState(st, removedIds,
          addedDocs, "doc_id", "text", shingleN = 5, maxDf = 8,
          minShared = 3)
        materialize(incState)
      }
      Thread.sleep(500)
      val incShuffleMb = meter.drain() / 1e6

      // the baseline: full from-scratch state build over the new corpus
      val tFull = timed {
        materialize(TextDedup.shingleState(newCorpus, "doc_id", "text",
          shingleN = 5, maxDf = 8, minShared = 3))
      }
      Thread.sleep(500)
      val fullShuffleMb = meter.drain() / 1e6
      // and the pairs-only form (an engine that keeps no state)
      val tPairsOnly = timed {
        noop(TextDedup.rareShingleCandidates(newCorpus, "doc_id", "text",
          shingleN = 5, maxDf = 8, minShared = 3))
      }

      println(f"""{"metric":"incremental_dedup_delta","sf":"$sfDir","times":$times,"n_docs":$nDocs,"n_delta":$nDelta,"delta_frac":${nDelta.toDouble / nDocs}%.4f,"full_state_s":$tFull%.3f,"pairs_only_s":$tPairsOnly%.3f,"inc_state_s":$tInc%.3f,"inc_over_full":${tInc / tFull}%.3f,"full_shuffle_mb":$fullShuffleMb%.1f,"inc_shuffle_mb":$incShuffleMb%.1f,"inc_shuffle_ratio":${incShuffleMb / math.max(fullShuffleMb, 1e-9)}%.3f}""")

      incState.release()
      st.release()
      Seq(newCorpus, docs).foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}

object ProfileScale {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-scale")
    import graft.pipeline._

    val fm = FieldMapping(Map(
      "source_id" -> "$source_id", "klass" -> "$klass_raw",
      "grupp" -> "b", "typ" -> "b", "leverantor" -> "$lev_raw"))
    val res = H3Query.DefaultQueryRes
    // fixed 2x2 km polygon in replica 0's band: constant selectivity
    // at every scale factor
    val poly =
      "POLYGON ((574000 6450000, 576000 6450000, 576000 6452000, 574000 6452000, 574000 6450000))"

    val mList = sys.env.get("SPARK_GRAFT_SCALES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    for (m <- mList) {
      // m disjoint 70 km east-west bands, same density each
      val fixture = (0 until m).map(i =>
        GeoFixture(spark, sfDir, eastOffset = i.toLong * 70000L,
          fidOffset = i.toLong * 100000000L))
        .reduce(_.unionByName(_))
        .repartition(spark.sparkContext.defaultParallelism)
      val tBuild = timed {
        val mart = Stages.martH3Cells(
          Stages.normalizeExtRestr(Stages.stage004(fixture), fm, "bench"),
          "bench")
        val idx0 = H3Index.withParentAt(
          H3Index.build(spark, Map("bench" -> mart)), res)
        idx0.persist().count()
        ()
      }
      // rebuild handle on the persisted plan (persist() above reuses
      // the same lineage -> same cache entry)
      val mart = Stages.martH3Cells(
        Stages.normalizeExtRestr(Stages.stage004(fixture), fm, "bench"),
        "bench")
      val index = H3Index.withParentAt(
        H3Index.build(spark, Map("bench" -> mart)), res).persist()
      val nRows = index.count()

      // full-index aggregate — EXPECTED linear in m (scans everything)
      val tStats = timed(noop(H3Index.stats(index)))
      // polygon-scoped paths — the flat-latency claim under test
      val tObjects = timed(H3Query.objects(spark, index, poly, res).collect())
      val tExact = timed(H3Query.objectsExact(spark, index, poly, res).collect())
      def probeLatency(idx: org.apache.spark.sql.DataFrame)
          : (Double, Double) = {
        val prepared = H3Query.objects(spark, idx, poly, res)
        prepared.collect(); prepared.collect() // plan + broadcast + JIT
        val (aqe0, sp0) = (spark.conf.get("spark.sql.adaptive.enabled"),
          spark.conf.get("spark.sql.shuffle.partitions"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val warmMs = medianMs(11)(() => { prepared.collect(); () })
        val handle = PreparedPolygonQuery(idx, res)
        handle.objects(poly)
        var i = 0
        val freshMs = medianMs(7) { () =>
          i += 1
          val dx = 400 * i
          handle.objects(
            s"POLYGON ((${574000 + dx} 6450000, ${576000 + dx} 6450000, ${576000 + dx} 6452000, ${574000 + dx} 6452000, ${574000 + dx} 6450000))")
          ()
        }
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
        spark.conf.set("spark.sql.shuffle.partitions", sp0)
        (warmMs, freshMs)
      }

      val (warmMs, freshMs) = probeLatency(index)

      // LAYOUT variant: the same index range-partitioned AND sorted by
      // the query-res ancestor before caching. The prepared probe's
      // sargable [min,max] range filter can then PRUNE cached batches
      // by their min/max stats (and most partitions entirely) instead
      // of scanning every batch — the in-memory analogue of parquet
      // row-group skipping, and the layout a 100 TB warehouse would
      // write anyway (cluster/Z-order by cell).
      val sorted = index
        .repartitionByRange(32, col(s"h3_parent_$res"))
        .sortWithinPartitions(s"h3_parent_$res")
        .persist()
      sorted.count()
      val (warmSortedMs, freshSortedMs) = probeLatency(sorted)

      // PARQUET-backed variant — the warehouse layout this index
      // actually lives in at deployment scale: clustered by the
      // query-res key so the literal [min,max] prefilter (and every
      // handle bucket's literal range) reaches the scan as a pushed
      // predicate and row-group footer stats skip everything outside
      // the polygon. This is where sub-linear probes really come from:
      // ProfileCachePrune measured Spark's cached-batch stats pruning
      // as a net NO-OP (disabling it is faster), so the cached-index
      // probes above are linear-with-a-small-constant by construction,
      // while this path stays flat as the index grows.
      val pqDir = java.nio.file.Files
        .createTempDirectory(s"graft_scale_idx_$m").toString
      // written through the SHIPPED layout path (H3Index.writeClustered
      // — the same call Runner.run makes for every mart _h3 table), so
      // this row measures the default runner-built layout, not a
      // profiler-only construction
      H3Index.writeClustered(index, pqDir, res)
      val pq = spark.read.parquet(pqDir)
      val (warmPqMs, freshPqMs) = probeLatency(pq)

      println(f"""{"metric":"geo_scale_curve","m":$m,"index_rows":$nRows,"build_s":$tBuild%.2f,"stats_s":$tStats%.2f,"objects_s":$tObjects%.3f,"exact_s":$tExact%.3f,"warm_ms":$warmMs%.1f,"fresh_plan_ms":$freshMs%.1f,"warm_sorted_ms":$warmSortedMs%.1f,"fresh_sorted_ms":$freshSortedMs%.1f,"warm_parquet_ms":$warmPqMs%.1f,"fresh_parquet_ms":$freshPqMs%.1f}""")
      index.unpersist()
      sorted.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pqDir))
      System.gc()
    }
    spark.stop()
  }
}

/** Scale curves for the round-9 corpus operators: exact substring
  * spans, production MinHash LSH, semantic dedup, bigram-LM scoring —
  * wall time and shuffle volume at 1x/4x/16x disjoint blow-ups.
  * Text replicas are letter-rotated ([[ProfileDelta]]'s trick) so
  * per-replica duplicate statistics match the base corpus; embedding
  * replicas sign-flip a replica-specific dimension mask (norms and
  * intra-replica cosine structure preserved; cross-replica cosines
  * decorrelate). semDedup's k scales with the corpus — the documented
  * rule that keeps per-cluster pair work constant.
  */
object ProfileCorpus {
  import ProfileCurves._


  private def blowupDocs(docs: DataFrame, times: Int): DataFrame =
    ProfileCurves.blowupDocs(docs, times)

  private[graft] def blowupEmb(emb: DataFrame, times: Int): DataFrame = {
    require(times <= 64, "blowupEmb sign masks are distinct only for i < 64")
    (0 until times).map { i =>
      // replica i's sign mask flips dim d iff bit (d mod 6) of i is
      // set — distinct masks for every i < 64, covering the m=64
      // curve point (the r10 5-bit spelling repeated masks past i=32,
      // which would flood an m=64 run with exact cross-replica
      // duplicates the way the original (d+i)%5==0 mask did at m=16)
      emb.select((col("vec_id") + i.toLong * 10000000L).as("vec_id"),
        (if (i == 0) col("embedding")
         else zip_with(col("embedding"),
           sequence(lit(0), size(col("embedding")) - 1),
           (v, d) => {
             val flip = (0 until 6)
               .map(b => d % 6 === b && lit(((i >> b) & 1) == 1))
               .reduce(_ || _)
             when(flip, -v).otherwise(v)
           }))
          .as("embedding"))
    }.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-corpus")
    import graft.ops.{TextDedup, TrainingOps, VectorOps}

    val baseDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val baseEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val timesList = sys.env.get("SPARK_GRAFT_TIMES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    for (times <- timesList) {
      val docs = blowupDocs(baseDocs, times).persist()
      val nDocs = docs.count()
      val emb = blowupEmb(baseEmb, times).persist()
      val nVecs = emb.count()
      meter.drain()

      val tSpans = timed(noop(
        TextDedup.duplicateSpans(docs, "doc_id", "text", 40)))
      val bSpans = meter.drain()
      val tMinhash = timed(noop(
        TextDedup.minHashCandidates(docs, "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, maxBucket = 200)))
      val bMinhash = meter.drain()
      val tLm = timed(noop(
        TrainingOps.lmScore(docs, docs, "doc_id", "text")))
      val bLm = meter.drain()
      val tSem = timed(noop(
        VectorOps.semDedup(emb, "vec_id", "embedding",
          k = 16 * times, tau = 0.4)))
      val bSem = meter.drain()
      // the production KMeans-centroid variant at the same k — the
      // curve that shows the seeded assignment's N x k Catalyst-cosine
      // quadratic broken (same prune stage, vectorized assignment)
      val tIvfSem = timed(noop(
        VectorOps.ivfSemDedup(emb, "vec_id", "embedding",
          nlist = 16 * times, tau = 0.4)))
      val bIvfSem = meter.drain()

      println(f"""{"metric":"corpus_scale_curve","m":$times,"n_docs":$nDocs,"n_vecs":$nVecs,"spans_s":$tSpans%.2f,"spans_shuffle_mb":${bSpans / 1e6}%.1f,"minhash_s":$tMinhash%.2f,"minhash_shuffle_mb":${bMinhash / 1e6}%.1f,"lm_s":$tLm%.2f,"lm_shuffle_mb":${bLm / 1e6}%.1f,"semdedup_s":$tSem%.2f,"semdedup_shuffle_mb":${bSem / 1e6}%.1f,"ivfsemdedup_s":$tIvfSem%.2f,"ivfsemdedup_shuffle_mb":${bIvfSem / 1e6}%.1f}""")
      docs.unpersist(); emb.unpersist(); System.gc()
    }
    spark.stop()
  }
}

/** IVF recall/latency trade — the one ANN quality number the battery
  * does not pin: q59 proves nprobe = nlist ≡ brute force exactly, but
  * nothing records what partial probing actually buys. This measures
  * recall@10 and median probe wall against brute-force ground truth
  * over the 16x embedding fixture for nprobe in {1, 2, 4, 8}.
  * Run by hand; results recorded in PERF.md. */
object ProfileIvfRecall {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-ivf-recall")
    import graft.ops.VectorOps

    val m = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val emb = ProfileCorpus.blowupEmb(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding")), m)
      .persist()
    val nVecs = emb.count()
    val nlist = 16 * m
    val (assigned0, centroids) = VectorOps.ivfBuild(emb, "vec_id",
      "embedding", nlist = nlist)
    // the DEPLOYED index layout (VectorOps scaladoc): written
    // partitioned by ivf_cell, so an nprobe-cell probe's isin filter
    // prunes to nprobe/nlist of the files before any row is read —
    // measuring the probe against the unpartitioned in-memory
    // assignment would charge it a full scan the production layout
    // never pays
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString
    assigned0.write.partitionBy("ivf_cell").mode("overwrite").parquet(idxDir)
    val assigned = spark.read.parquet(idxDir)

    // 20 deterministic query vectors spread across the id range
    val queries = emb.filter(col("vec_id") % 251 === 3)
      .orderBy("vec_id").limit(20)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val k = 10

    def top(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet

    val truth = queries.map { case (qid, q) =>
      qid -> top(VectorOps.knnBrute(emb, "vec_id", "embedding", q, k))
    }.toMap
    val tBrute = medianMs(5)(() => {
      VectorOps.knnBrute(emb, "vec_id", "embedding", queries.head._2, k)
        .collect(); ()
    })

    val rows = Seq(1, 2, 4, 8, nlist).map { nprobe =>
      val recalls = queries.map { case (qid, q) =>
        val got = top(VectorOps.ivfSearch(assigned, centroids, "vec_id",
          "embedding", q, k, nprobe))
        got.intersect(truth(qid)).size.toDouble / k
      }
      val tProbe = medianMs(5)(() => {
        VectorOps.ivfSearch(assigned, centroids, "vec_id", "embedding",
          queries.head._2, k, nprobe).collect(); ()
      })
      f""""nprobe_$nprobe":{"recall_at_10":${recalls.sum / recalls.length}%.3f,"probe_ms":$tProbe%.1f}"""
    }
    println(s"""{"metric":"ivf_recall_curve","m":$m,"n_vecs":$nVecs,"nlist":$nlist,"brute_ms":${f"$tBrute%.1f"},${rows.mkString(",")}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    spark.stop()
  }
}

/** Isolates WHERE a literal range filter over a big CACHED frame gets
  * its speed: Spark's in-memory columnar cache keeps per-batch
  * min/max stats and can skip batches whose range misses the
  * predicate — but only when the cached layout CLUSTERS the key so
  * batch ranges are tight. Measures a narrow between() probe over the
  * same N-row long-keyed frame cached (a) unsorted and (b)
  * range-partitioned + sorted, plus the full-scan baseline. Run by
  * hand; informs the PreparedPolygonQuery bucket sizing and the
  * PERF.md account of warm-probe behavior past ~100M cached rows. */
object ProfileCachePrune {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val spark = session("graft-profile-cache-prune")
    import spark.implicits._
    // toggles for isolating which scan path prunes:
    //   SPARK_GRAFT_VEC=false  -> row-based cache reader
    //   SPARK_GRAFT_PRUNE=false -> disable stats-based batch pruning
    sys.env.get("SPARK_GRAFT_VEC").foreach(v =>
      spark.conf.set("spark.sql.inMemoryColumnarStorage.enableVectorizedReader", v))
    sys.env.get("SPARK_GRAFT_PRUNE").foreach(v =>
      spark.conf.set("spark.sql.inMemoryColumnarStorage.partitionPruning", v))
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "50000000").toLong
    val base = spark.range(n)
      .select(col("id"),
        (col("id") * 2654435761L % n).as("k"),
        (col("id") % 1000).as("v"))
    val unsorted = base.persist(); unsorted.count()
    val sorted = base.repartitionByRange(32, col("k"))
      .sortWithinPartitions("k").persist()
    sorted.count()
    val lo = n / 2
    val hi = lo + n / 1000 // 0.1% selectivity probe
    def probe(df: org.apache.spark.sql.DataFrame): Double =
      medianMs(9)(() => {
        df.filter(col("k").between(lo, hi))
          .agg(sum("v"), count(lit(1))).collect(); ()
      })
    def full(df: org.apache.spark.sql.DataFrame): Double =
      medianMs(5)(() => { df.agg(sum("v"), count(lit(1))).collect(); () })
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      println(sorted.filter(col("k").between(lo, hi))
        .queryExecution.executedPlan.toString.take(4000))
    // warm both paths
    probe(unsorted); probe(sorted); full(unsorted)
    println(f"""{"metric":"cache_prune","n":$n,"probe_unsorted_ms":${probe(unsorted)}%.1f,"probe_sorted_ms":${probe(sorted)}%.1f,"full_scan_ms":${full(unsorted)}%.1f}""")
    spark.stop()
  }
}

/** O(delta) payoff for the round-10 VECTOR states ([[ProfileDelta]] /
  * [[ProfileSpanDelta]]'s counterpart): shuffle volume + wall of
  * maintaining the IVF assignment and the append-only SemDeDup state
  * through a delta vs full rebuilds against the same frozen
  * centroids. */
object ProfileVecDelta {
  import ProfileCurves._


  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-vec-delta")
    import graft.ops.VectorOps
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val m = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val emb = ProfileCorpus.blowupEmb(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")), m)
      .persist()
    val nVecs = emb.count()
    val maxOld = emb.agg(max("vec_id")).collect()(0).getLong(0)

    // ~8% delta: removals spread across the id range, additions appended
    val removedIds = emb.filter(col("vec_id") % 25 === 0).select("vec_id")
    val added = emb.filter(col("vec_id") % 25 === 1)
      .select((col("vec_id") + maxOld + 1L).as("vec_id"), col("embedding"))
      .persist()
    val nDelta = removedIds.count() + added.count()

    val cents = VectorOps.lloydCentroids(emb, "vec_id", "embedding",
      k = 16 * m)
    val centsP = cents.persist(); centsP.count()
    meter.drain()

    // IVF: stored state persisted (a warehouse would be)
    val st = VectorOps.ivfState(emb, "vec_id", "embedding", centsP)
    val stored = st.assigned.persist(); stored.count()
    val bState = meter.drain()
    val tInc = timed(noop(
      VectorOps.incrementalIvf(
        VectorOps.IvfState(stored, centsP), removedIds, added,
        "vec_id", "embedding").assigned))
    val bInc = meter.drain()
    val newCorpus = emb.join(removedIds, Seq("vec_id"), "left_anti")
      .unionByName(added)
    val tFull = timed(noop(
      VectorOps.assignToCentroids(newCorpus, "vec_id", "embedding",
        centsP)))
    val bFull = meter.drain()

    // append-only SemDeDup: same construction, add-only delta
    val sem = VectorOps.semState(emb, "vec_id", "embedding", centsP,
      tau = 0.4)
    val semStored = sem.members.persist(); semStored.count()
    meter.drain()
    val tSemInc = timed(noop(
      VectorOps.incrementalSemDedup(
        VectorOps.SemState(semStored, centsP), added, "vec_id",
        "embedding", tau = 0.4).members))
    val bSemInc = meter.drain()
    val tSemFull = timed(noop(
      VectorOps.semState(emb.unionByName(added), "vec_id", "embedding",
        centsP, tau = 0.4).members))
    val bSemFull = meter.drain()

    // removal-capable SemDeDup (r10 Next #2): dirty-frontier cost of a
    // removals+adds maintenance run vs the full re-prune over
    // (old \ removed) ∪ added it provably equals (q184)
    val tSemRm = timed(noop(
      VectorOps.incrementalSemDedup(
        VectorOps.SemState(semStored, centsP), removedIds, added,
        "vec_id", "embedding", tau = 0.4,
        hintBroadcastDelta = true).members))
    val bSemRm = meter.drain()
    val tSemRmFull = timed(noop(
      VectorOps.semState(newCorpus, "vec_id", "embedding",
        centsP, tau = 0.4).members))
    val bSemRmFull = meter.drain()

    println(f"""{"metric":"vec_delta","m":$m,"n_vecs":$nVecs,"n_delta":$nDelta,"ivf_state_shuffle_mb":${bState / 1e6}%.1f,"ivf_inc_s":$tInc%.2f,"ivf_inc_shuffle_mb":${bInc / 1e6}%.1f,"ivf_full_s":$tFull%.2f,"ivf_full_shuffle_mb":${bFull / 1e6}%.1f,"sem_inc_s":$tSemInc%.2f,"sem_inc_shuffle_mb":${bSemInc / 1e6}%.1f,"sem_full_s":$tSemFull%.2f,"sem_full_shuffle_mb":${bSemFull / 1e6}%.1f,"sem_rm_inc_s":$tSemRm%.2f,"sem_rm_inc_shuffle_mb":${bSemRm / 1e6}%.1f,"sem_rm_full_s":$tSemRmFull%.2f,"sem_rm_full_shuffle_mb":${bSemRmFull / 1e6}%.1f}""")
    spark.stop()
  }
}

/** Incremental-span O(delta) payoff, the [[ProfileDelta]] counterpart
  * for the char-level state: shuffle volume of maintaining SpanState
  * through a ~10% delta vs rebuilding from scratch. */
object ProfileSpanDelta {
  import ProfileCurves._


  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-span-delta")
    import graft.ops.TextDedup
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    base.count()
    val removedPred = col("doc_id") % 25 === 0
    val changedPred = col("doc_id") % 23 === 0 && col("doc_id") % 25 =!= 0
    val newCorpus = base.filter(!removedPred)
      .select(col("doc_id"),
        when(changedPred, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .persist()
    newCorpus.count()
    meter.drain()

    // stored state (persisted + materialized, as a warehouse would be)
    val built = TextDedup.spanState(base, "doc_id", "text", 40)
    val st = TextDedup.SpanState(built.anchors.persist(),
      built.counts.persist(), built.spans.persist())
    val tState = timed {
      st.anchors.count(); st.counts.count(); st.spans.count()
    }
    val bState = meter.drain()

    val removedIds = base.filter(removedPred || changedPred).select("doc_id")
    val addedDocs = newCorpus.filter(changedPred)
    val tDelta = timed {
      val inc = TextDedup.incrementalSpanState(st, removedIds, addedDocs,
        "doc_id", "text", 40)
      inc.spans.persist().count()
      inc.anchors.count(); inc.counts.count()
    }
    val bDelta = meter.drain()

    val tFull = timed {
      val f = TextDedup.spanState(newCorpus, "doc_id", "text", 40)
      f.spans.persist().count()
      f.anchors.persist().count(); f.counts.persist().count()
    }
    val bFull = meter.drain()

    println(f"""{"metric":"span_delta","state_build_s":$tState%.2f,"state_shuffle_mb":${bState / 1e6}%.1f,"delta_s":$tDelta%.2f,"delta_shuffle_mb":${bDelta / 1e6}%.1f,"full_s":$tFull%.2f,"full_shuffle_mb":${bFull / 1e6}%.1f,"ratio":${bDelta.toDouble / bFull}%.3f}""")
    spark.stop()
  }
}

/** knnJoin partial-probe trade-off (r10 Next #3): the q183 law pins
  * only nprobe = nlist (provably exact). This measures what the knob
  * actually buys for the batch knn-graph builder — recall@5 of the
  * partial-probe graph against the exact graph plus wall and shuffle
  * volume per nprobe — over a 2000-query slice of the blown-up
  * fixture (SPARK_GRAFT_SCALE replicas, centroids from the production
  * KMeans ivfBuild). Recall is computed IN Spark (a rank<=5 inner
  * join on (q_id, vec_id)), never by collecting the graph. */
object ProfileKnnJoin {
  import ProfileCurves._


  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-knn-join")
    import graft.ops.VectorOps
    import spark.implicits._
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val m = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val emb = ProfileCorpus.blowupEmb(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")), m)
      .persist()
    val nVecs = emb.count()
    val nlist = 16 * m
    val (_, centArr) = VectorOps.ivfBuild(emb, "vec_id", "embedding",
      nlist = nlist)
    val cents = centArr.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("__c_id", "__c_vec").persist()
    cents.count()

    // 2000 deterministic queries spread across replicas and ids
    val queries = emb.filter(pmod(xxhash64(col("vec_id")), lit(1000)) <
        (2000.0 * 1000 / nVecs).toLong.max(1L))
      .persist()
    val nQ = queries.count()
    val k = 5

    val truth = VectorOps.knnJoin(queries, emb, "vec_id", "embedding",
      cents, k = k, nprobe = nlist).persist()
    meter.drain()
    val tExact = timed(noop(VectorOps.knnJoin(queries, emb, "vec_id",
      "embedding", cents, k = k, nprobe = nlist)))
    val bExact = meter.drain()
    val truthN = truth.count()
    meter.drain()

    val rows = Seq(1, 2, 4, 8, 16).map { nprobe =>
      val g = VectorOps.knnJoin(queries, emb, "vec_id", "embedding",
        cents, k = k, nprobe = nprobe).persist()
      meter.drain()
      val t = timed(noop(VectorOps.knnJoin(queries, emb, "vec_id",
        "embedding", cents, k = k, nprobe = nprobe)))
      val b = meter.drain()
      val hits = g.select("q_id", "vec_id")
        .join(truth.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
        .count()
      g.unpersist()
      f""""nprobe_$nprobe":{"recall_at_5":${hits.toDouble / truthN}%.3f,"wall_s":$t%.2f,"shuffle_mb":${b / 1e6}%.1f}"""
    }
    println(s"""{"metric":"knn_join_curve","m":$m,"n_vecs":$nVecs,"n_queries":$nQ,"nlist":$nlist,"exact_wall_s":${f"$tExact%.2f"},"exact_shuffle_mb":${f"${bExact / 1e6}%.1f"},${rows.mkString(",")}}""")
    spark.stop()
  }
}

/** BPE merge induction at 1x/4x/16x the corpus — the type-table claim
  * measured. blowupDocs is the WORST case for a tokenizer trainer:
  * replica alphabets are disjoint, so the vocabulary grows ~linearly
  * with the corpus instead of Heaps-law sublinearly — if the per-merge
  * cost stays proportional to TYPES here, a natural corpus (vocab
  * nearly flat in corpus size) does strictly better. */
object ProfileBpe {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-bpe")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val rows = Seq(1, 4, 16).map { m =>
      val docs = blowupDocs(base, m).persist()
      val nDocs = docs.count()
      // one pass for both corpus statistics
      val stats = docs.select(
          explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) > 0)
        .agg(count(col("w")), countDistinct(col("w"))).head()
      val (occurrences, types) = (stats.getLong(0), stats.getLong(1))
      meter.drain()
      val t = timed {
        val merges = graft.ops.TrainingOps.bpeMerges(docs, "text", 8)
        assert(merges.count() == 8)
      }
      val b = meter.drain()
      docs.unpersist()
      f""""m_$m":{"docs":$nDocs,"word_occurrences":$occurrences,"word_types":$types,"learn8_wall_s":$t%.2f,"learn8_shuffle_mb":${b / 1e6}%.1f}"""
    }
    println(s"""{"metric":"bpe_scale_curve",${rows.mkString(",")}}""")

    // REAL merge counts (the deployment shape): the driver-local learn
    // engine over the collected type table — one distributed collapse,
    // then the whole rule sequence in memory. The distributed loop's
    // ~0.3 s/merge scheduler floor is what this removes: at 30k merges
    // that floor alone is ~2.5 h, while the local engine's per-rule
    // cost is an argmax scan + the merged pair's occurrences. The
    // blowup corpus exhausts after a few hundred rules (its base vocab
    // is tiny), so deep rows use a synthetic 200k-type vocabulary
    // (md5-derived 12-letter words, Zipf-ish 1..8 repeats) — the shape
    // of a real tokenizer-training type table.
    val deepWords = spark.range(200000).select(
      translate(substring(md5(concat(lit("bpe#"), col("id"))), 1, 12),
        "0123456789abcdef", "ghijklmnopqrstuv").as("w"),
      (col("id") % 8 + 1).cast("int").as("reps"))
    val deep = deepWords
      .select(explode(expr("array_repeat(w, reps)")).as("text"))
      .persist()
    deep.count()
    for (merges <- Seq(1024, 8192, 30000)) {
      meter.drain()
      val t = timed {
        val got = graft.ops.TrainingOps.bpeMerges(deep, "text", merges)
        assert(got.count() == merges)
      }
      val b = meter.drain()
      println(f"""{"metric":"bpe_deep_learn","word_types":200000,"merges":$merges,"wall_s":$t%.2f,"shuffle_mb":${b / 1e6}%.1f}""")
    }
    // BYTE-LEVEL engine (r14): same learn loop underneath, but the
    // type table is pre-tokens in unit space (case, digits,
    // punctuation, whitespace all kept — nothing dropped, nothing
    // OOV). Corpus curve + a deep run over the same synthetic
    // vocabulary: the byte alphabet costs nothing extra per rule
    // (per-rule work is the merged pair's occurrences, not the
    // alphabet size); what changes is the type-table width (' word'
    // and 'word' are distinct pre-token types).
    val rowsB = Seq(1, 4, 16).map { m =>
      val docs = blowupDocs(base, m).persist()
      val nDocs = docs.count()
      val nTypes = docs.select(explode(
          graft.ops.TrainingOps.bytePretokens(col("text"))).as("w0"))
        .filter(length(col("w0")) > 0)
        .select(graft.ops.TrainingOps.byte_units(col("w0")))
        .distinct().count()
      meter.drain()
      val t = timed {
        assert(graft.ops.TrainingOps
          .byteBpeMerges(docs, "text", 8).count() == 8)
      }
      val b = meter.drain()
      docs.unpersist()
      f""""m_$m":{"docs":$nDocs,"pretoken_types":$nTypes,"learn8_wall_s":$t%.2f,"learn8_shuffle_mb":${b / 1e6}%.1f}"""
    }
    println(s"""{"metric":"byte_bpe_scale_curve",${rowsB.mkString(",")}}""")
    for (merges <- Seq(8192)) {
      meter.drain()
      val t = timed {
        assert(graft.ops.TrainingOps
          .byteBpeMerges(deep, "text", merges).count() == merges)
      }
      val b = meter.drain()
      println(f"""{"metric":"byte_bpe_deep_learn","word_types":200000,"merges":$merges,"wall_s":$t%.2f,"shuffle_mb":${b / 1e6}%.1f}""")
    }
    deep.unpersist()
    spark.stop()
  }
}

/** Streaming SemDeDup state, MEASURED (r11 Next #4): the per-cluster
  * keyed state holds every member seen — this reports Spark's own
  * state-store numbers (numRowsTotal = live clusters,
  * memoryUsedBytes) plus the max/mean cluster occupancy, at three
  * micro-batch granularities over the same corpus. The state total is
  * corpus-bound by design (full membership, no eviction — see
  * streamingSemDedup's cap contract); what the batch-size sweep shows
  * is that state is a function of the CORPUS, not of how it arrives. */
object ProfileStream {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-stream")
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    val nVecs = e.count()
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val centArr = graft.ops.VectorOps.lloydCentroids(e, "vec_id",
        "embedding", k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val rows = Seq(1, 3, 9).map { nBatches =>
      // id-ordered batches (the operator's append-only contract) via
      // the shared quantile-split + mtime-stamp writer
      val (tmp, src) = graft.queries.StreamFixtures
        .writeIdOrderedMicroBatches(e, "vec_id", "pstream", nBatches)
      val stream = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val qname = s"pstream_$nBatches"
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingOps
        .streamingSemDedup(spark, stream, centArr, tau = 0.4)
        .writeStream.outputMode("append")
        .format("memory").queryName(qname).start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val st = q.lastProgress.stateOperators
      val (stateRows, stateBytes) =
        if (st.nonEmpty) (st.map(_.numRowsTotal).sum,
          st.map(_.memoryUsedBytes).sum)
        else (-1L, -1L)
      val occ = spark.table(qname).groupBy("cluster").count()
        .agg(max("count"), avg("count")).head()
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      f""""batches_$nBatches":{"wall_s":$wall%.2f,"state_clusters":$stateRows,"state_store_bytes":$stateBytes,"max_cluster_members":${occ.getLong(0)},"mean_cluster_members":${occ.getDouble(1)}%.1f,"est_member_bytes":${8 + 4 * dims}}"""
    }
    println(s"""{"metric":"streaming_semdedup_state","n_vecs":$nVecs,"dims":$dims,"k":16,${rows.mkString(",")}}""")
    spark.stop()
  }
}

/** Product quantization, measured (ops/VectorOps.pqCodebooks/pqEncode/
  * pqAdcKnn/pqAdcKnnIndexed): the stored-footprint cut of replacing
  * float vectors with m-int code words, and the ADC scan's wall/recall
  * against the exact cosine graph — at the blowup corpus, both for the
  * full scan and the IVFADC probe-pruned composition (the q199/q200
  * operators at profile scale). */
object ProfilePq {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-pq")
    import org.apache.spark.sql.functions._
    import graft.ops.VectorOps
    val mx = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val emb = ProfileCorpus.blowupEmb(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")), mx)
      .persist()
    val nVecs = emb.count()
    val meter = new ShuffleMeter
    meter.drain()
    var books: org.apache.spark.sql.DataFrame = null
    val tLearn = timed {
      books = VectorOps.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, ksub = 32).persist()
      books.count(); ()
    }
    var enc: org.apache.spark.sql.DataFrame = null
    val tEnc = timed {
      enc = VectorOps.pqEncode(emb, "vec_id", "embedding", books)
        .persist()
      enc.count(); ()
    }
    val bBuild = meter.drain()
    // stored footprint: the raw float vectors vs the code words, both
    // as ZSTD parquet (the warehouse's actual at-rest delta)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_prof")
    emb.write.mode("overwrite").parquet(s"$tmp/raw")
    enc.write.mode("overwrite").parquet(s"$tmp/codes")
    def dirMb(p: String): Double = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(p)) / 1e6
    val (rawMb, codeMb) = (dirMb(s"$tmp/raw"), dirMb(s"$tmp/codes"))
    // 20 deterministic queries; exact graph via the full cosine scan
    val queries = emb.filter(col("vec_id") % 251 === 3)
      .orderBy("vec_id").limit(20).persist()
    queries.count()
    val cents = VectorOps.lloydCentroids(emb, "vec_id", "embedding",
      k = 16)
    val k = 5
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    meter.drain()
    var exact: Map[Long, Set[Long]] = null
    val tExact = timed {
      exact = sets(VectorOps.knnJoin(queries, emb, "vec_id",
        "embedding", cents, k = k, nprobe = 16)); ()
    }
    val bExact = meter.drain()
    var adc: Map[Long, Set[Long]] = null
    val tAdc = timed {
      adc = sets(VectorOps.pqAdcKnn(queries, enc, books, "vec_id",
        "embedding", k = k)); ()
    }
    val bAdc = meter.drain()
    val st = VectorOps.ivfState(emb, "vec_id", "embedding", cents)
    var ivfadc: Map[Long, Set[Long]] = null
    val tIvfAdc = timed {
      ivfadc = sets(VectorOps.pqAdcKnnIndexed(queries, st, enc, books,
        "vec_id", "embedding", k = k, nprobe = 4)); ()
    }
    val bIvfAdc = meter.drain()
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
      hits.sum / hits.size
    }
    // deeper codebook training: 4 Lloyd steps instead of 1 — the
    // recall lever that does NOT change the stored footprint or the
    // scan cost (same m x ksub book, same m-int codes)
    var books4: org.apache.spark.sql.DataFrame = null
    val tLearn4 = timed {
      books4 = VectorOps.pqCodebooks(emb, "vec_id", "embedding",
        m = 8, ksub = 32, steps = 4).persist()
      books4.count(); ()
    }
    val enc4 = VectorOps.pqEncode(emb, "vec_id", "embedding", books4)
      .persist()
    enc4.count()
    val adc4 = sets(VectorOps.pqAdcKnn(queries, enc4, books4, "vec_id",
      "embedding", k = k))
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    println(f"""{"metric":"pq_adc","n_vecs":$nVecs,"m":8,"ksub":32,"learn_s":$tLearn%.2f,"encode_s":$tEnc%.2f,"build_shuffle_mb":${bBuild / 1e6}%.1f,"raw_parquet_mb":$rawMb%.1f,"codes_parquet_mb":$codeMb%.2f,"footprint_ratio":${rawMb / codeMb}%.1f,"exact_scan_s":$tExact%.2f,"exact_shuffle_mb":${bExact / 1e6}%.2f,"adc_scan_s":$tAdc%.2f,"adc_shuffle_mb":${bAdc / 1e6}%.2f,"ivfadc_np4_s":$tIvfAdc%.2f,"ivfadc_np4_shuffle_mb":${bIvfAdc / 1e6}%.2f,"recall_adc_at5":${recall(adc)}%.3f,"recall_ivfadc_np4_at5":${recall(ivfadc)}%.3f,"learn4_s":$tLearn4%.2f,"recall_adc_steps4_at5":${recall(adc4)}%.3f}""")
    spark.stop()
  }
}

/** Exact COUNT(DISTINCT) vs the replayable HLL sketch at 16x events —
  * the shuffle-volume claim behind q191: the sketch pre-agg carries
  * max-combinable (group, bucket, rho) rows bounded by m=256 per
  * group per partition, while exact distinct shuffles every distinct
  * (group, value) pair. */
object ProfileHll {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-hll")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"))
    val m = 16
    // replica i derives a UNIQUE user per row (event_id x 16 + i):
    // distinct cardinality = row count, the regime where exact
    // distinct's map-side partial dedup stops compressing anything
    // and the shuffle carries every value — the case sketches exist for
    val ev = (0 until m).map(i => base.select(col("event_type"),
        (col("event_id") * 16L + lit(i.toLong)).as("user_id")))
      .reduce(_.unionByName(_)).persist()
    val nRows = ev.count()
    meter.drain()
    val tExact = timed(noop(ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))))
    val bExact = meter.drain()
    val tHll = timed(noop(
      graft.ops.Sketches.hllDistinct(ev, Seq("event_type"), "user_id")))
    val bHll = meter.drain()
    println(f"""{"metric":"hll_vs_exact","rows":$nRows,"exact_wall_s":$tExact%.2f,"exact_shuffle_mb":${bExact / 1e6}%.2f,"hll_wall_s":$tHll%.2f,"hll_shuffle_mb":${bHll / 1e6}%.3f}""")
    spark.stop()
  }
}

/** Exact percentiles vs the hdr histogram at 16x lineitem — the
  * shuffle-volume claim behind q202: exact rank selection shuffles
  * every distinct (value, count) pair (and a sort-based median every
  * VALUE), while the hdr pre-agg is map-side combinable into at most
  * ~64 * 2^p bins per partition, a fixed footprint at any
  * cardinality. Accuracy is not sampled here — it is the 2^-(p+1)
  * LAW q202 requires in-query. */
object ProfileHdr {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-hdr")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val m = 16
    // replica i perturbs the cents value so distinct cardinality
    // grows with the blowup — the regime where a distinct-value
    // cum-sum stops compressing
    val cents = (0 until m).map(i => base.select(
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") * 16L +
          lit(i.toLong)).as("v")))
      .reduce(_.unionByName(_)).persist()
    val nRows = cents.count()
    meter.drain()
    // exact p99: distinct-value counts + ordered cum-sum + rank pick
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rank = math.max(math.ceil(0.99 * nRows).toLong, 1L)
    val tExact = timed(noop(
      cents.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("__c", sum(col("cnt")).over(w))
        .filter(col("__c") >= rank)
        .agg(min(col("v")).as("p99"))))
    val bExact = meter.drain()
    val tHdr = timed(noop(graft.ops.Sketches.hdrQuantiles(
      graft.ops.Sketches.hdrBuild(cents, "v", precision = 7),
      Seq(0.5, 0.9, 0.99, 0.999), precision = 7)))
    val bHdr = meter.drain()
    println(f"""{"metric":"hdr_vs_exact","rows":$nRows,"exact_p99_wall_s":$tExact%.2f,"exact_shuffle_mb":${bExact / 1e6}%.2f,"hdr_4q_wall_s":$tHdr%.2f,"hdr_shuffle_mb":${bHdr / 1e6}%.3f}""")
    spark.stop()
  }
}

/** DSIR + SRP scale curves (round 13): the two new selection layers'
  * measurable claims.
  *
  *  - DSIR: the ratio table is B rows at ANY corpus size (the hashed-
  *    feature point) and the scoring shuffle carries (id, partial-sum)
  *    longs, not grams — wall + shuffle at 1x/4x/16x corpus blowup.
  *  - SRP: banded candidates vs the all-pairs cosine baseline — the
  *    pruning ratio and its cost, embeddings replicated with element
  *    rotations (norm-preserving bijections, so replicas stay
  *    distinct and bucket statistics stay realistic).
  */
object ProfileSelect {
  import ProfileCurves._
  def main(args: Array[String]): Unit = {
    val spark = session("profile_select")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") % 37 === 0).persist()
    target.count()
    for (m <- Seq(1, 4, 16)) {
      val raw = blowupDocs(docs.filter(col("doc_id") % 37 =!= 0), m)
        .persist()
      val n = raw.count()
      meter.drain()
      val t = timed(noop(graft.ops.TrainingOps.dsirWeights(
        raw, target, "doc_id", "text")))
      val b = meter.drain()
      println(f"""{"metric":"dsir","blowup":$m,"raw_docs":$n,"wall_s":$t%.2f,"shuffle_mb":${b / 1e6}%.2f}""")
      raw.unpersist(blocking = false)
    }
    // the STREAMING probe's per-row cost (the scoring expression over
    // the 16x corpus, one map — no shuffle at all)
    {
      val raw = blowupDocs(docs.filter(col("doc_id") % 37 =!= 0), 16)
        .persist()
      raw.count()
      val probe = graft.ops.TrainingOps.dsirScoreProbe(raw, target, "text")
      meter.drain()
      val t = timed(noop(raw.select(col("doc_id"),
        probe(col("text")).as("p"))))
      println(f"""{"metric":"dsir_probe","raw_docs":${raw.count()},"wall_s":$t%.2f}""")
      raw.unpersist(blocking = false)
    }
    // SRP vs all-pairs: embeddings replicated by element rotation
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def blowVecs(times: Int): DataFrame =
      (0 until times).map { i =>
        val rot =
          if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, 64 - i),
            slice(col("embedding"), 1, i))
        emb.select((col("vec_id") + i.toLong * 1000000L).as("vec_id"),
          rot.as("embedding"))
      }.reduce(_.unionByName(_))
    for (m <- Seq(1, 4, 16)) {
      val vecs = blowVecs(m).persist()
      val n = vecs.count()
      meter.drain()
      val tSrp = timed(noop(graft.ops.VectorOps.srpCandidates(
        vecs, "vec_id", "embedding", tau = 0.6, bands = 4,
        bandBits = 16)))
      val bSrp = meter.drain()
      val nCand = graft.ops.VectorOps.srpCandidates(
        vecs, "vec_id", "embedding", tau = -1.0, bands = 4,
        bandBits = 16).count()
      meter.drain()
      // all-pairs baseline only while quadratic cost is affordable
      val (tBrute, bBrute) =
        if (m <= 4) {
          val t = timed(noop(
            vecs.select(col("vec_id").as("id_a"), col("embedding").as("__a"))
              .crossJoin(vecs.select(col("vec_id").as("id_b"),
                col("embedding").as("__b")))
              .filter(col("id_a") < col("id_b"))
              .select(col("id_a"), col("id_b"),
                round(graft.ops.VectorOps.cosine(col("__a"), col("__b")), 6)
                  .as("cos_sim"))
              .filter(col("cos_sim") >= 0.6)))
          (t, meter.drain())
        } else (-1.0, -1L)
      val totalPairs = n * (n - 1) / 2
      println(f"""{"metric":"srp","blowup":$m,"vecs":$n,"cand_pairs":$nCand,"total_pairs":$totalPairs,"srp_wall_s":$tSrp%.2f,"srp_shuffle_mb":${bSrp / 1e6}%.2f,"brute_wall_s":$tBrute%.2f,"brute_shuffle_mb":${bBrute / 1e6}%.2f}""")
      vecs.unpersist(blocking = false)
    }
    spark.stop()
  }
}

/** SRP operating-point guidance (r13 VERDICT #4): recall vs the EXACT
  * cosine join at tau in {0.85, 0.95}, across (bands, bandBits)
  * points at a fixed 64-bit signature budget, plus the banded
  * candidate mass each point pays. Fixture: the embeddings table plus
  * noised copies at three graded noise levels (scaled element
  * rotation added at 0.15/0.35/0.6 — cosines ~0.99/0.96/0.87), so
  * both taus have planted true-pair mass; base-corpus coincidental
  * pairs count too (the brute join is the truth, not the plant). */
object ProfileSrpRecall {
  import ProfileCurves._
  def main(args: Array[String]): Unit = {
    val spark = session("profile_srp_recall")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def noised(block: Int, eps: Double): DataFrame =
      emb.select((col("vec_id") + block.toLong * 1000000L).as("vec_id"),
        zip_with(col("embedding"),
          concat(slice(col("embedding"), 2, 63),
            slice(col("embedding"), 1, 1)),
          (a, b) => a + lit(eps) * b).as("embedding"))
    val corpus = emb.unionByName(noised(1, 0.15))
      .unionByName(noised(2, 0.35)).unionByName(noised(3, 0.6))
      .persist()
    val n = corpus.count()
    val exact = corpus
      .select(col("vec_id").as("id_a"), col("embedding").as("__a"))
      .crossJoin(corpus.select(col("vec_id").as("id_b"),
        col("embedding").as("__b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.ops.VectorOps.cosine(col("__a"), col("__b")).as("c"))
      .filter(col("c") >= 0.85)
      .persist()
    exact.count()
    def report(label: String, bands: Int, bits: Int, probes: Int,
        cand: Long, pairsAt: Double => DataFrame): Unit =
      for (tau <- Seq(0.85, 0.95)) {
        val truePairs = exact.filter(col("c") >= tau)
          .select("id_a", "id_b")
        val nTrue = truePairs.count()
        val hit = pairsAt(tau).select("id_a", "id_b")
          .join(truePairs, Seq("id_a", "id_b")).count()
        println(f"""{"metric":"$label%s","vecs":$n,"bands":$bands,"bits":$bits,"probes":$probes,"tau":$tau,"true_pairs":$nTrue,"found":$hit,"recall":${hit.toDouble / math.max(nTrue, 1)}%.4f,"cand_pairs":$cand}""")
      }
    for ((bands, bits) <- Seq((4, 16), (8, 8), (16, 4))) {
      val cand = graft.ops.VectorOps.srpCandidates(corpus, "vec_id",
        "embedding", tau = -1.0, bands = bands, bandBits = bits).count()
      report("srp_recall", bands, bits, 0, cand,
        t => graft.ops.VectorOps.srpCandidates(corpus, "vec_id",
          "embedding", tau = t, bands = bands, bandBits = bits))
    }
    // multi-probe at the precision point: recall recovered WITHOUT
    // more bands (the candidate mass stays a fraction of 8x8's)
    for (probes <- Seq(1, 2, 4)) {
      val cand = graft.ops.VectorOps.srpMultiProbeCandidates(corpus,
        "vec_id", "embedding", tau = -1.0, bands = 4, bandBits = 16,
        probes = probes).count()
      report("srp_multiprobe_recall", 4, 16, probes, cand,
        t => graft.ops.VectorOps.srpMultiProbeCandidates(corpus,
          "vec_id", "embedding", tau = t, bands = 4, bandBits = 16,
          probes = probes))
    }
    corpus.unpersist(blocking = false)
    exact.unpersist(blocking = false)
    spark.stop()
  }
}

/** RangeJoinRewrite payoff: the SAME bare interval join executed as
  * Spark's default BroadcastNestedLoopJoin vs under the optimizer
  * rule (points x intervals comparisons vs bucketed equi-join). */
object ProfileRule {
  import ProfileCurves._
  def main(args: Array[String]): Unit = {
    val spark = session("profile_rule")
    import spark.implicits._
    val nPts = 500000L
    val pts = spark.range(nPts)
      .select(col("id").as("p_id"),
        (col("id") * 7919L % 100000L).cast("double").as("pt"))
      .persist()
    pts.count()
    val rule = graft.plans.RangeJoinRewrite(spark)
    for (nIvs <- Seq(20000L, 40000L, 80000L)) {
      val ivs = spark.range(nIvs)
        .select(col("id").as("i_id"),
          (col("id") * 104729L % 100000L).cast("double").as("lo"))
        .withColumn("hi", col("lo") + 4.0)
        .persist()
      ivs.count()
      def q = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .groupBy("i_id").agg(count(lit(1)).as("n"))
      val tBnlj = timed(noop(q))
      spark.experimental.extraOptimizations = Seq(rule)
      spark.conf.set(rule.ConfKey, "8.0")
      val plan = q.queryExecution.executedPlan.toString
      require(!plan.contains("NestedLoop") && plan.contains("Generate"),
        "rule did not fire in ProfileRule")
      val tRule = timed(noop(q))
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(rule.ConfKey)
      println(f"""{"metric":"rangejoin_rule","pts":$nPts,"ivs":$nIvs,"bnlj_wall_s":$tBnlj%.2f,"rule_wall_s":$tRule%.2f}""")
      ivs.unpersist(blocking = false)
    }
    pts.unpersist(blocking = false)
    // COMPOSITE (keyed) form: Spark hash-joins `pk = ik AND pt
    // BETWEEN lo AND hi` unaided, but the interval is a POST-JOIN
    // filter — a hot key pairs quadratically before filtering. The
    // rule appends the bucket to the equi keys, so the hot key's
    // pairing is bounded by time-locality. Fixture: 1/3 of both
    // sides on one hot key, the rest uniform over 50 keys.
    def keyOf(c: org.apache.spark.sql.Column) =
      when(c % 3 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (c % 50).cast("string")))
    for ((nKp, nKi) <- Seq((150000L, 15000L), (600000L, 60000L))) {
      val kpts = spark.range(nKp)
        .select(col("id").as("p_id"), keyOf(col("id")).as("pk"),
          (col("id") * 7919L % 100000L).cast("double").as("pt"))
        .persist()
      kpts.count()
      val kivs = spark.range(nKi)
        .select(col("id").as("i_id"), keyOf(col("id") + 1L).as("ik"),
          (col("id") * 104729L % 100000L).cast("double").as("lo"))
        .withColumn("hi", col("lo") + 4.0)
        .persist()
      kivs.count()
      def kq = kpts.join(kivs,
          col("pk") === col("ik") &&
            col("pt") >= col("lo") && col("pt") <= col("hi"))
        .groupBy("i_id").agg(count(lit(1)).as("n"))
      val tKeyed = timed(noop(kq))
      spark.experimental.extraOptimizations = Seq(rule)
      spark.conf.set(rule.ConfKey, "8.0")
      val kplan = kq.queryExecution.executedPlan.toString
      require(kplan.contains("Generate") && kplan.contains("__g_rj_b_"),
        "composite rewrite did not fire in ProfileRule")
      val tKeyedRule = timed(noop(kq))
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(rule.ConfKey)
      println(f"""{"metric":"rangejoin_rule_keyed","pts":$nKp,"ivs":$nKi,"postfilter_wall_s":$tKeyed%.2f,"rule_wall_s":$tKeyedRule%.2f}""")
      kpts.unpersist(blocking = false)
      kivs.unpersist(blocking = false)
    }
    spark.stop()
  }
}

/** jaccardJoin's prefix-pruning claim, measured on a ZIPFIAN
  * vocabulary (the battery fixture's 31-token dense vocab is the
  * documented degenerate case where NO exact method can prune):
  * md5-derived log-uniform token ranks (pmf ~ 1/rank over 20k types),
  * planted near-dup copies, candidate mass + wall vs the brute-force
  * token join at growing corpus size. */
object ProfileJaccard {
  import ProfileCurves._
  def main(args: Array[String]): Unit = {
    val spark = session("profile_jaccard")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val V = 20000.0
    def corpus(n: Long): DataFrame = {
      val toks = (0 until 30).map { j =>
        val bits = conv(substring(
            md5(concat(col("id").cast("string"), lit(s"#$j"))), 1, 13),
          16, 10).cast("long").cast("double")
        val u = (bits + lit(0.5)) / lit(4503599627370496.0)
        concat(lit("t"), floor(exp(u * math.log(V))).cast("long"))
      }
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", toks: _*).as("text"))
      // planted near-dups: every 17th doc cloned with one token changed
      base.unionByName(base.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text")))
    }
    for (n <- Seq(4000L, 16000L)) {
      val d = corpus(n).persist()
      val nd = d.count()
      meter.drain()
      val t = timed(noop(
        graft.ops.TextDedup.jaccardJoin(d, "doc_id", "text", tau = 0.8)))
      val b = meter.drain()
      val pairs = graft.ops.TextDedup
        .jaccardJoin(d, "doc_id", "text", tau = 0.8).count()
      meter.drain()
      // the PPJoin positional filter's candidate cut, measured: same
      // prefix join, with and without the first-shared-token bound
      val toksC = graft.ops.TextDedup.jaccardTokens(d, "doc_id", "text")
      val candPos = graft.ops.TextDedup
        .jaccardCandidates(toksC, 0.8, positional = true).count()
      val candPrefixOnly = graft.ops.TextDedup
        .jaccardCandidates(toksC, 0.8, positional = false).count()
      // brute force only while affordable: the full token equi-join's
      // fan-out is sum(df^2), dominated by the zipf head
      val (tBrute, bruteRows) =
        if (n <= 4000L) {
          import org.apache.spark.sql.functions.{explode, array_distinct}
          val tk = d.select(col("doc_id"), explode(array_distinct(
            graft.ops.TextDedup.tokensOf(col("text")))).as("tok"))
          val rows = tk.select(col("doc_id").as("a"), col("tok"))
            .join(tk.select(col("doc_id").as("b"), col("tok")), "tok")
            .filter(col("a") < col("b")).count()
          val tB = timed {
            val i = tk.select(col("doc_id").as("id_a"), col("tok"))
              .join(tk.select(col("doc_id").as("id_b"), col("tok")),
                Seq("tok"))
              .filter(col("id_a") < col("id_b"))
              .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
            noop(i.filter(col("i") >= 20))
          }
          (tB, rows)
        } else (-1.0, -1L)
      println(f"""{"metric":"jaccard_join","docs":$nd,"pairs_ge_tau":$pairs,"cand_prefix_only":$candPrefixOnly,"cand_positional":$candPos,"wall_s":$t%.2f,"shuffle_mb":${b / 1e6}%.2f,"brute_join_rows":$bruteRows,"brute_wall_s":$tBrute%.2f}""")
      d.unpersist(blocking = false)
    }
    // INCREMENTAL state: append a ~6% delta to the 17k corpus vs a
    // full rebuild over the union — the O(delta) claim, measured
    {
      val all = corpus(16000L).persist(); all.count()
      val init = all.filter(col("doc_id") % 17 =!= 3).persist()
      val delta = all.filter(col("doc_id") % 17 === 3).persist()
      val (nInit, nDelta) = (init.count(), delta.count())
      val s0 = graft.ops.TextDedup.jaccardJoinState(
        init, "doc_id", "text", tau = 0.8)
      s0.pairs.count() // materialize the stored state
      meter.drain()
      val tInc = timed {
        val s1 = graft.ops.TextDedup.jaccardJoinAppend(
          s0, delta, "doc_id", "text")
        s1.pairs.count()
        s1.release()
      }
      val bInc = meter.drain()
      val tFull = timed(noop(
        graft.ops.TextDedup.jaccardJoin(all, "doc_id", "text", tau = 0.8)))
      val bFull = meter.drain()
      println(f"""{"metric":"jaccard_incremental","docs":$nInit,"delta_docs":$nDelta,"append_wall_s":$tInc%.2f,"append_shuffle_mb":${bInc / 1e6}%.2f,"rebuild_wall_s":$tFull%.2f,"rebuild_shuffle_mb":${bFull / 1e6}%.2f}""")
      s0.release()
      Seq(all, init, delta).foreach(_.unpersist(blocking = false))
    }
    // Per-append STAGED bytes + READ cost, measured across a
    // 10-append chain: with the segmented state (r15 Next #3) each
    // append stages only its O(delta) segments — staged_new_mb should
    // track the DELTA size (the r15 pre-segmentation capture measured
    // a ~45-54 MB O(corpus) re-staging floor here) — and with
    // AUTO-COMPACTION (r16 Next #3, default threshold 8) the segment
    // count and therefore the per-read union cost stay BOUNDED across
    // an unattended chain: read_s should stay flat instead of growing
    // one union branch per append (r16 measured the un-compacted
    // append wall drifting 3.1 -> 5.6 s over five appends), at the
    // price of one O(corpus) re-staging on the compacting append
    // (visible as that row's staged_new_mb spike). Releasing the
    // superseded state each step keeps the RESIDENT total bounded too
    // (the service discipline; Materialize.release frees the
    // localCheckpoint blocks Dataset.unpersist cannot).
    {
      val all = corpus(16000L).persist(); all.count()
      val init = all.filter(col("doc_id") % 23 > 9).persist(); init.count()
      def storageBytes: Long = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      var st = graft.ops.TextDedup.jaccardJoinState(
        init, "doc_id", "text", tau = 0.8)
      Seq(st.toks, st.prefix, st.sizes, st.pairs).foreach(_.count())
      for (k <- 0 until 10) {
        val delta = all.filter(col("doc_id") % 23 === k).persist()
        val nd = delta.count()
        val before = storageBytes
        meter.drain()
        var nxt: graft.ops.TextDedup.JaccardState = null
        val t = timed {
          nxt = graft.ops.TextDedup.jaccardJoinAppend(
            st, delta, "doc_id", "text")
          // materialize every state table — what a service stores
          Seq(nxt.toks, nxt.prefix, nxt.sizes, nxt.pairs)
            .foreach(_.count())
        }
        val stagedNew = storageBytes - before
        val sh = meter.drain()
        // the chain release: frees the superseded state's own frames,
        // never the dfFrozen the next state carries by reference
        st.releaseSuperseded(nxt)
        st = nxt
        // READ cost over the stored state: what every consumer
        // (candidate join, verify, export) pays to scan the segment
        // unions — the quantity auto-compaction bounds
        val tRead = timed {
          Seq(st.toks, st.prefix, st.sizes, st.pairs).foreach(_.count())
        }
        println(f"""{"metric":"jaccard_append_chain","append_idx":${k + 1},"delta_docs":$nd,"segments":${st.toksSegs.length},"wall_s":$t%.2f,"read_s":$tRead%.3f,"staged_new_mb":${stagedNew / 1e6}%.2f,"shuffle_mb":${sh / 1e6}%.2f,"resident_after_release_mb":${storageBytes / 1e6}%.2f}""")
        delta.unpersist(blocking = false)
      }
      st.release()
      Seq(all, init).foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

/** KMV build shuffle volume vs corpus size — the measurable form of
  * the r15 verdict's What's-wrong #1 fix: the old spelling ran a full
  * `.distinct()` (an exchange carrying O(distinct values)) before its
  * bounded heap, so its wire cost GREW with the corpus; the
  * duplicate-skipping KmvAgg register emits at most k longs per
  * (group, partition), so shuffle bytes stay FLAT as the corpus (and
  * its distinct cardinality) scales — the HLL story (ProfileHll),
  * now shared by the distinct sketch. Prints one row per scale point
  * with the new build's shuffle bytes beside the old spelling's. */
object ProfileKmv {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-kmv")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"))
    val k = 256
    Seq(1, 4, 16).foreach { m =>
      // replica i derives a UNIQUE user per row: distinct cardinality
      // = row count, the regime where a distinct's map-side partial
      // dedup compresses nothing (ProfileHll's construction).
      // FIXED task width across scale points: the register shuffle is
      // k longs per (group, partition) — at constant parallelism it is
      // flat in corpus size, while the distinct's shuffle carries the
      // values themselves and grows with cardinality at ANY width
      val ev = (0 until m).map(i => base.select(col("event_type"),
          (col("event_id") * 16L + lit(i.toLong)).as("user_id")))
        .reduce(_.unionByName(_))
        .repartition(spark.sparkContext.defaultParallelism).persist()
      val nRows = ev.count()
      meter.drain()
      val tNew = timed(noop(
        graft.ops.Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k)))
      val bNew = meter.drain()
      // the pre-fix r15 spelling VERBATIM: full distinct, then the
      // bounded TopKAgg heap (not the new register — the point is to
      // measure the code path that shipped)
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 13),
        16, 10).cast("long")
      val tOld = timed(noop(
        ev.filter(col("user_id").isNotNull)
          .select(col("event_type"), h.as("__h")).distinct()
          .groupBy("event_type")
          .agg(graft.functions.TopKAgg.topKByScore(
            -col("__h").cast("double"), col("__h"), k).as("__top"))
          .select(col("event_type"), explode(col("__top")).as("__e"))
          .select(col("event_type"), col("__e.id").as("kmv_h"))))
      val bOld = meter.drain()
      ev.unpersist(blocking = false)
      println(f"""{"metric":"kmv_build","m":$m,"rows":$nRows,"k":$k,"new_wall_s":$tNew%.2f,"new_shuffle_mb":${bNew / 1e6}%.3f,"old_wall_s":$tOld%.2f,"old_shuffle_mb":${bOld / 1e6}%.2f}""")
    }
    spark.stop()
  }
}

/** The H3IntersectsRewrite speedup, measured: the same declarative
  * st_intersects filter over the shared exploded index, unrewritten
  * (per-row cell->geometry + exact test over EVERY index row) vs with
  * the rule installed (broadcast covering-cell prefilter + guarded
  * refine on candidates only) — the engine-side form of the
  * reference's ~100x two-step claim (docs/H3_POLYGON_ANALYSIS.md:
  * 318-321). Median of 5 full executions each; same session, same
  * cached index, identical rows require-checked. */
object ProfileH3Filter {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-h3filter")
    import graft.functions.GFunctions._
    val idx = graft.queries.GeoQueries.sharedIndex(spark, sfDir)
    idx.drop("geom").write.format("noop").mode("overwrite").save()
    val wkb = graft.spatial.Geometry.toWkb(
      graft.spatial.Geometry.fromWkt(
        graft.pipeline.GeoFixture.queryPolygonWkt))
    def q = idx.filter(st_intersects(col("geom"), lit(wkb)))
      .select("id", "dataset_id", "leverantor", "klass").distinct()
    val nRows = idx.count()
    val fullRows = q.count()
    val tFull = medianMs(5)(() => noop(q))
    val rule = graft.plans.H3IntersectsRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.ConfKey, "8")
    require(q.queryExecution.executedPlan.toString.contains("__g_h3f_"),
      "rule did not fire in the profile session")
    require(q.count() == fullRows, "rewrite changed the result")
    val tRule = medianMs(5)(() => noop(q))
    // the rule's driver-side planning cost in isolation
    val poly = graft.spatial.Geometry.fromWkt(
      graft.pipeline.GeoFixture.queryPolygonWkt)
    val tCover = medianMs(5) { () =>
      val c = graft.pipeline.PreparedPolygonQuery.coveringCellIds(poly, 8)
      graft.pipeline.H3Query.needsRefineFlags(c, poly); ()
    }
    println(f"""{"metric":"h3filter_rule","index_rows":$nRows,"match_rows":$fullRows,"full_scan_ms":$tFull%.1f,"rule_ms":$tRule%.1f,"speedup":${tFull / tRule}%.1f,"driver_cover_ms":$tCover%.1f}""")

    // the r17 ST_DWithin FILTER shape: a 1.5 km radius query around a
    // point — unrewritten it evaluates per-row cell->geometry math
    // plus an exact distance over EVERY index row; rewritten, the
    // covering (widened by exactly the radius) prefilters and the
    // verbatim distance decides candidates only
    {
      val pt = graft.spatial.Geometry.toWkb(graft.spatial.Pt(570000, 6452000))
      def qd = idx.filter(st_distance(col("geom"), lit(pt)) <= 1500.0)
        .select("id", "dataset_id", "leverantor", "klass").distinct()
      spark.conf.unset(rule.ConfKey)
      val dRows = qd.count()
      val tFullD = medianMs(5)(() => noop(qd))
      spark.conf.set(rule.ConfKey, "8")
      require(qd.queryExecution.executedPlan.toString.contains("__g_h3f_"),
        "distance-filter rewrite did not fire in the profile session")
      require(qd.count() == dRows, "distance rewrite changed the result")
      val tRuleD = medianMs(5)(() => noop(qd))
      println(f"""{"metric":"h3filter_rule_dwithin","index_rows":$nRows,"match_rows":$dRows,"radius_m":1500,"full_scan_ms":$tFullD%.1f,"rule_ms":$tRuleD%.1f,"speedup":${tFullD / tRuleD}%.1f}""")
    }

    // production layout: the cell-CLUSTERED parquet index (the
    // PreparedPolygonQuery crossover layout) — here the rule's
    // sargable BETWEEN prefilter reaches row-group stats and the scan
    // reads only the polygon's cell band, while the unrewritten
    // filter still reads every row AND pays per-row cell->geometry
    // math. This is the 100 TB comparison; the cached-index one above
    // is bounded by the no-stats-pruning cached-scan floor.
    val dir = java.nio.file.Files.createTempDirectory("graft_h3f_idx")
      .toString
    try {
      graft.pipeline.H3Index.writeClustered(
        idx.select("id", "dataset_id", "leverantor", "klass", "h3_cell"),
        dir, 8)
      val pq = spark.read.parquet(dir)
        .withColumn("geom", g_h3_cell_to_geom(col("h3_cell")))
      // two selectivities: the fixture polygon covers ~60% of the box
      // (prefilter prunes little — the win is only skipping the
      // per-row geometry math), and the BASELINE.md 2x2 km probe
      // polygon (the reference's own 100x setup: a SMALL query over a
      // big index, where the sargable BETWEEN skips almost every
      // parquet row group)
      val probes = Seq(
        ("fixture_60pct", wkb),
        ("probe_2x2km", graft.spatial.Geometry.toWkb(
          graft.spatial.Geometry.fromWkt(
            "POLYGON ((574000 6450000, 576000 6450000, 576000 6452000, " +
              "574000 6452000, 574000 6450000))"))))
      probes.foreach { case (tag, w) =>
        def q2 = pq.filter(st_intersects(col("geom"), lit(w)))
          .select("id", "dataset_id", "leverantor", "klass").distinct()
        spark.conf.set(rule.ConfKey, "8")
        val mRows = q2.count() // rule installed: count via rewrite
        // fresh: a new Dataset per rep — pays Spark's ~300 ms fixed
        // per-plan cost (analysis + the rule's driver polyfill +
        // physical planning) every time
        val tRulePq = medianMs(5)(() => noop(q2))
        // warm: ONE rewritten plan re-executed — the repeated-query
        // regime the reference's ~50 ms / 100x numbers are measured
        // in (its prepared DuckDB relation re-runs one plan too)
        val q2w = q2
        q2w.write.format("noop").mode("overwrite").save()
        val tWarmPq = medianMs(5)(() => noop(q2w))
        spark.conf.unset(rule.ConfKey)
        require(q2.count() == mRows, "rewrite changed the result")
        val tFullPq = medianMs(5)(() => noop(q2))
        println(f"""{"metric":"h3filter_rule_parquet","polygon":"$tag","index_rows":$nRows,"match_rows":$mRows,"full_scan_ms":$tFullPq%.1f,"rule_fresh_ms":$tRulePq%.1f,"rule_warm_ms":$tWarmPq%.1f,"speedup_fresh":${tFullPq / tRulePq}%.1f,"speedup_warm":${tFullPq / tWarmPq}%.1f}""")
      }

      // the DWithin filter on the SAME clustered layout: a small
      // radius's covering is a tight cell band, so the rule's
      // sargable BETWEEN prefilter prunes row groups exactly like the
      // 2x2 km intersects probe — the 100 TB radius-query story
      {
        val pt2 = graft.spatial.Geometry.toWkb(
          graft.spatial.Pt(570000, 6452000))
        def qd2 = pq.filter(st_distance(col("geom"), lit(pt2)) <= 1500.0)
          .select("id", "dataset_id", "leverantor", "klass").distinct()
        spark.conf.set(rule.ConfKey, "8")
        val dRows = qd2.count()
        require(qd2.queryExecution.executedPlan.toString
          .contains("__g_h3f_"), "parquet DWithin rewrite did not fire")
        val tRuleDq = medianMs(5)(() => noop(qd2))
        val qd2w = qd2
        qd2w.write.format("noop").mode("overwrite").save()
        val tWarmDq = medianMs(5)(() => noop(qd2w))
        spark.conf.unset(rule.ConfKey)
        require(qd2.count() == dRows, "parquet DWithin rewrite changed rows")
        val tFullDq = medianMs(5)(() => noop(qd2))
        println(f"""{"metric":"h3filter_rule_parquet","polygon":"dwithin_1500m","index_rows":$nRows,"match_rows":$dRows,"full_scan_ms":$tFullDq%.1f,"rule_fresh_ms":$tRuleDq%.1f,"rule_warm_ms":$tWarmDq%.1f,"speedup_fresh":${tFullDq / tRuleDq}%.1f,"speedup_warm":${tFullDq / tWarmDq}%.1f}""")
      }
      // the r18 COARSENED guard on the same clustered layout: a
      // 20x20 km query polygon whose res-8 covering (~1090 cells) is
      // capped at 500, so the prefilter can only land at the coarser
      // res 7 — the measured claim is "degrades, not disables, and
      // stays SARGABLE" (r19): writeClustered stores h3_parent_{6,7}
      // alongside 8, so the landing res keys a bare STORED column
      // (rank 0) whose gap-split multi-range prefilter still reaches
      // parquet row-group stats — pre-r19 the coarse key was per-row
      // parent math over a full scan (PERF.md r18: 1.4x, refine
      // avoidance only). Cap note: 200 would land at res 6, whose
      // ±2.5-spacing corridor (~17 km) blankets this ~60 km fixture
      // field entirely — nothing any prefilter could prune; one
      // coarsening level is the demonstrable regime at this scale,
      // and at a country-scale index the same math holds per level.
      // two selectivities, the parquet-probe convention: "wide" is a
      // 20x20 km query on the ~60 km fixture field — a tenth of the
      // whole lake, where corridor refine work bounds any prefilter —
      // and "sized" is a production-shaped 5x5 km query, where the
      // sargable coarse landing shows its real pruning
      Seq(
        ("wide_20km", "POLYGON ((570000 6455000, 590000 6455000, " +
          "590000 6475000, 570000 6475000, 570000 6455000))", 500),
        ("sized_5km", "POLYGON ((570000 6455000, 575000 6455000, " +
          "575000 6460000, 570000 6460000, 570000 6455000))", 110)
      ).foreach { case (tag, midWkt, cap) =>
        val midPoly = graft.spatial.Geometry.fromWkt(midWkt)
        val midWkb = graft.spatial.Geometry.toWkb(midPoly)
        val cover8n = graft.pipeline.PreparedPolygonQuery
          .coveringCellIds(midPoly, 8).length
        require(cover8n > cap, s"$tag covering too small: $cover8n")
        def qc = pq.filter(st_intersects(col("geom"), lit(midWkb)))
          .select("id", "dataset_id", "leverantor", "klass").distinct()
        spark.conf.set(rule.ConfKey, "8")
        spark.conf.set(rule.MaxCellsKey, cap.toString)
        val cRows = qc.count()
        val coarsePlan = qc.queryExecution.executedPlan.toString
        require(coarsePlan.contains("__g_h3f_"),
          "coarsened rewrite did not fire in the profile session")
        val landed = "h3_parent_(\\d+)#\\d+L AS __g_h3f_key".r
          .findFirstMatchIn(coarsePlan).map(_.group(1).toInt).getOrElse(-1)
        require(landed >= 0 && landed < 8,
          s"coarsened key is not a stored coarse ancestor:\n$coarsePlan")
        val tCoarse = medianMs(5)(() => noop(qc))
        spark.conf.unset(rule.MaxCellsKey)
        require(qc.count() == cRows, "res-8 rewrite changed the rows")
        val tRes8 = medianMs(5)(() => noop(qc))
        spark.conf.unset(rule.ConfKey)
        require(qc.count() == cRows, "unrewritten scan changed the rows")
        val tFullC = medianMs(5)(() => noop(qc))
        println(f"""{"metric":"h3filter_rule_coarse","polygon":"$tag","index_rows":$nRows,"match_rows":$cRows,"cover_res8_cells":$cover8n,"cap":$cap,"landed_res":$landed,"full_scan_ms":$tFullC%.1f,"rule_res8_ms":$tRes8%.1f,"rule_coarse_ms":$tCoarse%.1f,"speedup_coarse":${tFullC / tCoarse}%.1f,"coarse_vs_res8":${tCoarse / tRes8}%.1f}""")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}

/** The H3JoinRewrite speedup, measured at FULL index scale: the
  * declarative spatial join (2.67 M index rows x 40 mixed geometries
  * = ~107 M exact geometry pair-tests under Spark's
  * BroadcastNestedLoopJoin) vs the covering-cell equi-join the rule
  * plans (exact math only on cell-colocated candidates). Identical
  * per-geometry aggregates require-checked. The nested-loop side runs
  * ONCE (it is the measurement's denominator, minutes not needed to
  * establish the order); the rule side is a median of 5. */
object ProfileH3Join {
  import ProfileCurves._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("graft-profile-h3join")
    import graft.functions.GFunctions._
    val idx = graft.queries.GeoQueries.sharedIndex(spark, sfDir)
    idx.drop("geom").write.format("noop").mode("overwrite").save()
    val nIdx = idx.count()
    val rule = graft.plans.H3JoinRewrite(spark)
    // install ONCE, outside the sweep (appending per iteration would
    // stack duplicate rule instances); the unrewritten arm is taken
    // by unsetting the conf, which makes the rule inert
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    // geometry-count sweep: the nested loop is O(index x geometries)
    // while the rule side grows only with candidates — the speedup is
    // the geometry count, which is the point of a JOIN vs repeating
    // the single-polygon query
    Seq(40L, 400L).foreach { m =>
      val gs = graft.pipeline.GeoFixture(spark, sfDir)
        .filter(col("fid") <= m)
        .select(col("fid").cast("long").as("gid"), col("geom").as("qgeom"))
        .persist()
      val nGeom = gs.count()
      def q = idx.join(gs, st_intersects(col("geom"), col("qgeom")))
        .groupBy("gid").agg(count(lit(1)).as("n_pairs"))
      spark.conf.unset(rule.ConfKey)
      val tFull = timed(noop(q))
      val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      spark.conf.set(rule.ConfKey, "8")
      require(q.queryExecution.executedPlan.toString.contains("__g_h3j_"),
        "rule did not fire in the profile session")
      require(q.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
        baseline, "rewrite changed the join result")
      val tRule = medianMs(5)(() => noop(q)) / 1000.0
      println(f"""{"metric":"h3join_rule","index_rows":$nIdx,"geometries":$nGeom,"nested_loop_s":$tFull%.2f,"rule_s":$tRule%.3f,"speedup":${tFull / tRule}%.1f}""")
      gs.unpersist(blocking = false)
    }

    // BUCKETED-LAYOUT arm (r17): the repeated-spatial-join story — a
    // bucketBy(h3_parent_8) index joins under the rewrite with ZERO
    // index-side exchange (the threaded stored key stays a bare
    // relation attribute, so alias-aware partitioning propagation
    // reuses the bucketing), vs the same data as plain parquet paying
    // a full index shuffle per query. Shuffle BYTES are the
    // 1000-executor claim; wall on one box mostly shows the skipped
    // exchange's serialization.
    {
      val meter = new ShuffleMeter
      spark.sparkContext.addSparkListener(meter)
      val stratum = idx.filter(pmod(xxhash64(col("h3_cell")), lit(8)) === 0)
      spark.sql("DROP TABLE IF EXISTS h3j_profile_bucketed")
      stratum.write.bucketBy(16, "h3_parent_8").sortBy("h3_parent_8")
        .mode("overwrite").saveAsTable("h3j_profile_bucketed")
      val flatDir = java.nio.file.Files
        .createTempDirectory("graft_h3j_flat").toString
      stratum.write.mode("overwrite").parquet(flatDir)
      val gsb = graft.pipeline.GeoFixture(spark, sfDir)
        .filter(col("fid") <= 200)
        .select(col("fid").cast("long").as("gid"), col("geom").as("qgeom"))
        .persist()
      gsb.count()
      def joined(t: org.apache.spark.sql.DataFrame) =
        t.join(gsb, st_intersects(col("geom"), col("qgeom")))
          .groupBy("gid").agg(count(lit(1)).as("n_pairs"))
      val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled")
        .map(k => k -> spark.conf.getOption(k)).toMap
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        spark.conf.set(rule.ConfKey, "8")
        val qFlat = joined(spark.read.parquet(flatDir))
        val flatRows = qFlat.collect().map(r => (r.getLong(0), r.getLong(1)))
          .toMap
        meter.drain()
        val tFlat = medianMs(3)(() => noop(joined(
          spark.read.parquet(flatDir)))) / 1000.0
        val bFlat = meter.drain() / 3
        val qB = joined(spark.table("h3j_profile_bucketed"))
        require(qB.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          == flatRows, "bucketed join diverged from the flat layout")
        val planB = qB.queryExecution.executedPlan.toString
        require(!planB.linesIterator.exists(
          _.contains("Exchange hashpartitioning(__g_h3j_key")),
          s"bucketed index still re-shuffled:\n$planB")
        meter.drain()
        val tBuck = medianMs(3)(() => noop(joined(
          spark.table("h3j_profile_bucketed")))) / 1000.0
        val bBuck = meter.drain() / 3
        println(f"""{"metric":"h3join_rule_bucketed","index_rows":${stratum.count()},"geometries":200,"flat_wall_s":$tFlat%.2f,"flat_shuffle_mb":${bFlat / 1e6}%.1f,"bucketed_wall_s":$tBuck%.2f,"bucketed_shuffle_mb":${bBuck / 1e6}%.1f}""")
      } finally {
        prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        spark.conf.unset(rule.ConfKey)
        spark.sql("DROP TABLE IF EXISTS h3j_profile_bucketed")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(flatDir))
        gsb.unpersist(blocking = false)
      }
    }

    // CELL-SKEW arm (r16 Next #1): the one 100x-scale shape the rule
    // itself cannot fix — a hot covering cell (dense urban region)
    // whose ancestor matches a large fraction of the index makes the
    // rewritten equi-join a single-partition straggler under a
    // shuffled join. Fixture: a 1-in-8 index stratum with its hottest
    // res-8 cell's rows REPLICATED until that ONE cell holds >= 50%
    // of all rows (honest skew — many distinct objects in one cell;
    // the key contract stays intact so the rewrite is still exact and
    // the nested-loop identity still holds). The broadcast path is
    // disabled (autoBroadcastJoinThreshold=-1) to force the
    // sort-merge shape a too-big-to-broadcast geometry side would
    // take at scale; AQE's skew-join must then SPLIT the hot
    // partition (assert skew=true in the final adaptive plan) and
    // the rewrite must still beat the nested loop.
    {
      val stratum = idx
        .filter(pmod(xxhash64(col("h3_cell")), lit(8)) === 0)
        .persist()
      val top = stratum.groupBy("h3_parent_8")
        .agg(count(lit(1)).as("__n")).orderBy(desc("__n")).head()
      val hotCell = top.getLong(0)
      val hot = stratum.filter(col("h3_parent_8") === hotCell).persist()
      val (nAll, nHot) = (stratum.count(), hot.count())
      val m = math.max(1L, math.ceil((nAll - nHot).toDouble / nHot).toLong)
      val rep = hot
        .crossJoin(spark.range(m).select(col("id").as("__rep")))
        .withColumn("id", concat(col("id"), lit("#"), col("__rep")))
        .drop("__rep")
        .select(stratum.columns.map(col).toIndexedSeq: _*)
      val skewIdx = stratum.unionByName(rep).persist()
      val nSkew = skewIdx.count()
      val hotFrac = (nHot * (m + 1)).toDouble / nSkew
      require(hotFrac >= 0.5,
        f"skew fixture under-skewed: hot cell holds $hotFrac%.2f")
      val gsk = graft.pipeline.GeoFixture(spark, sfDir)
        .filter(col("fid") <= 200)
        .select(col("fid").cast("long").as("gid"), col("geom").as("qgeom"))
        .persist()
      gsk.count()
      // countDistinct(id) keeps the high-entropy id column IN the join
      // shuffle: with only (geom, key) surviving pruning, the hot
      // partition's m geometry replicas LZ4 away to a few KB and the
      // byte-based skew detector (correctly) sees nothing — real dense
      // cells carry distinct per-object payloads, so the honest
      // fixture must too
      def qs = skewIdx.join(gsk, st_intersects(col("geom"), col("qgeom")))
        .groupBy("gid").agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id")).as("n_objects"))
      val prevConf = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        .map(k => k -> spark.conf.getOption(k)).toMap
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // profile-scale skew thresholds: the defaults (256 MB) are
        // sized for production partitions; the SKEW SHAPE here is
        // real (one partition >> factor x median), only smaller
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "2m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "1m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "2")
        spark.conf.unset(rule.ConfKey)
        val tFullSkew = timed(noop(qs))
        val baseline = qs.collect().map(_.toSeq).sortBy(_.mkString(","))
        spark.conf.set(rule.ConfKey, "8")
        val ran = qs
        // execute through ran's OWN QueryExecution (a .write would
        // plan a separate one and leave this AdaptiveSparkPlan
        // un-finalized — no skew markers to inspect)
        val ranRows = ran.collect()
        val plan = ran.queryExecution.executedPlan.toString
        require(plan.contains("__g_h3j_"),
          "rule did not fire on the skewed fixture")
        require(plan.contains("skew=true"),
          s"AQE did not split the hot-cell partition:\n$plan")
        require(ranRows.map(_.toSeq).sortBy(_.mkString(","))
          .sameElements(baseline),
          "rewrite changed the skewed join result")
        val tRuleSkew = medianMs(3)(() => noop(qs)) / 1000.0
        println(f"""{"metric":"h3join_rule_skew","index_rows":$nSkew,"hot_cell_frac":$hotFrac%.2f,"geometries":200,"aqe_skew_split":true,"nested_loop_s":$tFullSkew%.2f,"rule_s":$tRuleSkew%.3f,"speedup":${tFullSkew / tRuleSkew}%.1f}""")
      } finally {
        prevConf.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        spark.conf.unset(rule.ConfKey)
      }
      Seq(stratum, hot, skewIdx, gsk).foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
