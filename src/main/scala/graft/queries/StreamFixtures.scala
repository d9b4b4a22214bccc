package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared micro-batch fixture writer for the streaming battery
  * entries and stream profiles.
  *
  * Splits `df` into `nBatches` id-ordered parquet micro-batches under
  * a temp dir and returns (tmpDir, srcPath). Split points are EXACT
  * quantiles of the row population (a plain (min+max)/n range split
  * leaves interior batches empty under bimodal id ranges — e.g.
  * planted copies at id + 30M). FileStreamSource orders new files by
  * MODIFICATION TIME, and local writes can land within one ms (ties
  * then resolve by arbitrary listing order), so each slice's files
  * get an explicit strictly-increasing mtime stamped ONCE —
  * restamping would flatten the order; setLastModified FAILS BY
  * RETURNING FALSE on some filesystems, hence the require. Callers
  * must deleteQuietly(tmpDir) in a finally — a require failure must
  * not leak a corpus copy per run. */
private[graft] object StreamFixtures {
  def writeIdOrderedMicroBatches(df: DataFrame, idCol: String,
      tag: String, nBatches: Int = 3): (java.nio.file.Path, String) = {
    require(nBatches >= 1, "need nBatches >= 1")
    val cuts =
      if (nBatches == 1) Array.empty[Double]
      else df.stat.approxQuantile(idCol,
        (1 until nBatches).map(_.toDouble / nBatches).toArray, 0.0)
    val bounds = (Double.NegativeInfinity +: cuts.toSeq) :+
      Double.PositiveInfinity
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    val src = tmp.resolve("src").toString
    val stamped = scala.collection.mutable.Set[java.io.File]()
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), r) =>
      df.filter(col(idCol) > lo && col(idCol) <= hi)
        .coalesce(1).write.mode("append").parquet(src)
      new java.io.File(src).listFiles().foreach { f =>
        if (!stamped.contains(f)) {
          require(f.setLastModified(1700000000000L + r * 60000L),
            s"could not stamp mtime on $f — batch order would be " +
              "nondeterministic on this filesystem")
          stamped += f
        }
      }
    }
    (tmp, src)
  }
}
