package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (builder brief): exact
  * brute-force cosine as the correctness baseline, IVF (inverted-file)
  * partitioning as the scale path — KMeans-coarse-quantize the corpus
  * once, then probe only the nearest `nprobe` partitions per query.
  *
  * At 100 TB: the IVF assignment is a map-only pass; the index is
  * written partitioned by `ivf_cell` so a query reads nprobe/nlist of
  * the data (the same partition-pruning trick as the H3 index). The
  * centroid table is tiny and broadcast.
  */
object VectorOps {

  /** In-order fold dot product (deterministic, codegen'd built-ins). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine against one query vector (broadcast 1-row
    * side; TakeOrdered keeps the result shuffle at k rows). */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val qLit = typedLit(query.toSeq)
    emb.select(col(idCol),
        cosine(col(vecCol), qLit).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  /** IVF index: assign every vector to its nearest of `nlist` centroids
    * (trained with distributed KMeans, fixed seed). Returns
    * (assignments with `ivf_cell` column, centroid array). */
  def ivfBuild(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L, maxIter: Int = 10,
      initMode: String = "k-means||"): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.withColumn("__fv",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter).setInitMode(initMode)
      .setFeaturesCol("__fv")
      .fit(feats)
    val assigned = model.transform(feats)
      .withColumnRenamed("prediction", "ivf_cell")
      .drop("__fv")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** IVF probe: search only the `nprobe` cells whose centroids are
    * closest to the query — partition pruning for vectors. */
  def ivfSearch(assigned: DataFrame, centroids: Array[Array[Double]],
      idCol: String, vecCol: String, query: Array[Float], k: Int,
      nprobe: Int): DataFrame = {
    val q = query.map(_.toDouble)
    def dist2(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2)
    val qLit = typedLit(query.toSeq)
    assigned
      .filter(col("ivf_cell").isin(probeCells.toIndexedSeq: _*))
      .select(col(idCol), cosine(col(vecCol), qLit).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }
}
