package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

/** Streaming downloader with URL-keyed cache + per-URL locks
  * (`src/g_etl/utils/downloader.py:22-93`; cache pattern
  * `zip_geopackage.py:15-57`). Driver-side utility — O(config) work,
  * never on the data path. `file://` URLs are served by copy, which is
  * also how the offline test environment exercises it.
  */
object Downloader {

  private val locks = new ConcurrentHashMap[String, Object]()

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Fetch `url` into `cacheDir`, reusing a cached copy; concurrent
    * fetches of the same URL serialize on a per-URL lock. */
  def fetch(url: String, cacheDir: String,
      headers: Map[String, String] = Map.empty): Path = {
    val cache = Paths.get(cacheDir)
    Files.createDirectories(cache)
    val suffix = url.split('/').last.takeRight(64).replaceAll("[^A-Za-z0-9._-]", "_")
    val target = cache.resolve(s"${md5(url)}_$suffix")
    val lock = locks.computeIfAbsent(url, _ => new Object)
    lock.synchronized {
      if (Files.exists(target) && Files.size(target) > 0) return target
      val tmp = Files.createTempFile(cache, "dl_", ".part")
      try {
        val uri = URI.create(url)
        uri.getScheme match {
          case "file" =>
            Files.copy(Paths.get(uri), tmp,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          case "http" | "https" =>
            val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
            conn.setConnectTimeout(30000)
            conn.setReadTimeout(300000)
            headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
            val in = new BufferedInputStream(conn.getInputStream)
            val out = new FileOutputStream(tmp.toFile)
            try {
              val buf = new Array[Byte](8192) // 8 KB chunks (downloader.py)
              var n = in.read(buf)
              while (n >= 0) {
                out.write(buf, 0, n)
                n = in.read(buf)
              }
            } finally { in.close(); out.close() }
          case other =>
            throw new IllegalArgumentException(s"unsupported URL scheme: $other")
        }
        Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        target
      } finally Files.deleteIfExists(tmp)
    }
  }

  /** Unzip an archive into a sibling directory, returning it. */
  def unzip(archive: Path): Path = {
    val outDir = archive.resolveSibling(archive.getFileName.toString + "_x")
    if (Files.isDirectory(outDir)) return outDir
    val tmp = Files.createTempDirectory(archive.getParent, "unzip_")
    val zf = new java.util.zip.ZipFile(archive.toFile)
    try {
      zf.entries().asIterator().forEachRemaining { e =>
        val dest = tmp.resolve(e.getName).normalize()
        require(dest.startsWith(tmp), s"zip-slip blocked: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          val in = zf.getInputStream(e)
          try Files.copy(in, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    try {
      Files.move(tmp, outDir)
      outDir
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => outDir
    }
  }
}
