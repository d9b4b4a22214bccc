package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Idempotent-transform ledger mirroring the reference's migration
  * checksum table (`src/g_etl/migrations/migrator.py:102-112,162-166,
  * 488-507`): one record per (version key, checksum); a re-run with an
  * unchanged template is skipped, a changed checksum triggers re-apply.
  * Versions keyed `"template:dataset"` like the reference's
  * per-dataset template versions (`"aab_ext_restr/001:ds"`).
  *
  * Storage is a line-oriented state file (`version<TAB>checksum<TAB>
  * appliedAt`) — bookkeeping, not a query-engine concern (SURVEY §1.1).
  */
final class Ledger(stateFile: Path) {

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def readAll(): Map[String, String] =
    if (!Files.exists(stateFile)) Map.empty
    else Files.readAllLines(stateFile).asScala
      .map(_.split('\t'))
      .collect { case Array(v, c, _*) => v -> c }
      .toMap

  def isApplied(version: String, content: String): Boolean =
    readAll().get(version).contains(md5(content))

  /** True when the version exists but content changed (checksum
    * mismatch -> re-apply, reference migrator.py:497-507). */
  def isStale(version: String, content: String): Boolean =
    readAll().get(version).exists(_ != md5(content))

  def record(version: String, content: String): Unit = {
    val remaining = readAll() - version
    val lines = (remaining + (version -> md5(content))).toSeq.sorted
      .map { case (v, c) => s"$v\t$c\t${java.time.Instant.now()}" }
    Files.createDirectories(stateFile.getParent)
    Files.write(stateFile, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** migrate:down — drop a version record (migrator.py:306-375). */
  def rollback(version: String): Unit = {
    val remaining = readAll() - version
    val lines = remaining.toSeq.sorted
      .map { case (v, c) => s"$v\t$c\t${java.time.Instant.now()}" }
    Files.write(stateFile, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  def appliedVersions: Set[String] = readAll().keySet
}

object Ledger {
  def at(dir: String): Ledger =
    new Ledger(Paths.get(dir, "_migrations.tsv"))
}
