package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer

/** Minimal read-only SQLite 3 file parser — enough to read GeoPackage
  * layers (`src/g_etl/plugins/geopackage.py:49-167` reads .gpkg via
  * GDAL's ST_Read; this replaces it without GDAL/JDBC). Implements the
  * published SQLite file format: page structure, table b-tree traversal
  * (interior + leaf), varints, the record serial-type system, and
  * overflow-page chains. Not implemented (unneeded for GPKG archives):
  * WAL mode, freelist reuse, indexes, writing.
  */
final class SQLiteFile(bytes: Array[Byte]) {

  require(bytes.length >= 100 &&
    new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
    "not a SQLite database")

  private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
  val pageSize: Int = {
    val raw = bb.getShort(16) & 0xFFFF
    if (raw == 1) 65536 else raw
  }
  private val reservedPerPage: Int = bytes(20) & 0xFF
  private val usable: Int = pageSize - reservedPerPage

  final case class MasterRow(
      typ: String, name: String, tblName: String, rootPage: Int, sql: String)

  /** sqlite_master: schema table rooted at page 1 (no rowid alias). */
  lazy val master: Seq[MasterRow] =
    readTableRows(1, -1).map { case (_, vals) =>
      MasterRow(
        str(vals(0)), str(vals(1)), str(vals(2)),
        vals(3) match { case l: Long => l.toInt; case _ => 0 },
        str(vals(4)))
    }

  def tableNames: Seq[String] =
    master.filter(_.typ == "table").map(_.name)

  /** Top-level column/constraint parts of the CREATE TABLE body, with
    * table-level constraints filtered out. */
  private def columnParts(table: String): Seq[String] = {
    val sql = master.find(m => m.typ == "table" && m.name == table)
      .getOrElse(throw new IllegalArgumentException(s"no such table: $table"))
      .sql
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open > 0 && close > open, s"cannot parse DDL: $sql")
    // split top-level commas
    val parts = ArrayBuffer[String]()
    var depth = 0
    val cur = new StringBuilder
    sql.substring(open + 1, close).foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    parts += cur.toString
    parts.map(_.trim)
      .filterNot(p => Seq("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
        .exists(k => p.toUpperCase.startsWith(k)))
      .toSeq
  }

  /** Column names declared by CREATE TABLE (records are positional). */
  def columnsOf(table: String): Seq[String] =
    columnParts(table).map { p =>
      val first = p.split("\\s+")(0)
      first.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]")
    }

  /** Position of the column declared `INTEGER PRIMARY KEY` (SQLite's
    * rowid alias — stored as NULL in records), or -1 when the table has
    * none. Only that position may substitute the rowid; a NULL in any
    * other column — including a NULL first column — is real data. */
  def rowidAliasIndex(table: String): Int =
    columnParts(table).indexWhere(p =>
      p.toUpperCase.replaceAll("\\s+", " ").contains("INTEGER PRIMARY KEY"))

  /** All rows of a table as (rowid, positional values). A NULL stored in
    * the table's INTEGER PRIMARY KEY position (per the DDL) is decoded
    * as the rowid alias. */
  def readTable(table: String): Seq[(Long, Seq[Any])] = {
    val root = master.find(m => m.typ == "table" && m.name == table)
      .getOrElse(throw new IllegalArgumentException(s"no such table: $table"))
      .rootPage
    readTableRows(root, rowidAliasIndex(table))
  }

  // -------------------------------------------------------- b-tree walk

  private def readTableRows(rootPage: Int, aliasIdx: Int): Seq[(Long, Seq[Any])] = {
    val out = ArrayBuffer[(Long, Seq[Any])]()
    walk(rootPage, aliasIdx, out)
    out.toSeq
  }

  private def walk(page: Int, aliasIdx: Int,
      out: ArrayBuffer[(Long, Seq[Any])]): Unit = {
    val base = (page - 1) * pageSize
    val hdr = base + (if (page == 1) 100 else 0)
    val pageType = bytes(hdr) & 0xFF
    val nCells = bb.getShort(hdr + 3) & 0xFFFF
    pageType match {
      case 0x0D => // leaf table
        var i = 0
        while (i < nCells) {
          val cellPtr = base + (bb.getShort(hdr + 8 + 2 * i) & 0xFFFF)
          out += readLeafCell(cellPtr, aliasIdx)
          i += 1
        }
      case 0x05 => // interior table
        var i = 0
        while (i < nCells) {
          val cellPtr = base + (bb.getShort(hdr + 12 + 2 * i) & 0xFFFF)
          val child = bb.getInt(cellPtr)
          walk(child, aliasIdx, out)
          i += 1
        }
        walk(bb.getInt(hdr + 8), aliasIdx, out) // rightmost pointer
      case other =>
        throw new IllegalStateException(f"unexpected page type 0x$other%02x at page $page")
    }
  }

  private def readLeafCell(pos0: Int, aliasIdx: Int): (Long, Seq[Any]) = {
    var pos = pos0
    val (payloadLen, p1) = varint(pos); pos = p1
    val (rowid, p2) = varint(pos); pos = p2
    val payload = readPayload(pos, payloadLen.toInt)
    (rowid, parseRecord(payload, rowid, aliasIdx))
  }

  /** Local payload + overflow chain per the documented spill formula. */
  private def readPayload(pos: Int, total: Int): Array[Byte] = {
    val u = usable
    val x = u - 35
    if (total <= x) {
      java.util.Arrays.copyOfRange(bytes, pos, pos + total)
    } else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + (total - m) % (u - 4)
      val local = if (k <= x) k else m
      val out = new Array[Byte](total)
      System.arraycopy(bytes, pos, out, 0, local)
      var written = local
      var overflowPage = bb.getInt(pos + local)
      while (overflowPage != 0 && written < total) {
        val pBase = (overflowPage - 1) * pageSize
        val next = bb.getInt(pBase)
        val chunk = math.min(u - 4, total - written)
        System.arraycopy(bytes, pBase + 4, out, written, chunk)
        written += chunk
        overflowPage = next
      }
      require(written == total, s"short overflow chain: $written/$total")
      out
    }
  }

  // ----------------------------------------------------- record format

  private def parseRecord(payload: Array[Byte], rowid: Long,
      aliasIdx: Int): Seq[Any] = {
    val (headerLen, hStart) = varintIn(payload, 0)
    var hPos = hStart
    val serials = ArrayBuffer[Long]()
    while (hPos < headerLen) {
      val (s, np) = varintIn(payload, hPos)
      serials += s
      hPos = np
    }
    var dPos = headerLen.toInt
    serials.zipWithIndex.map { case (s, idx) =>
      val (v, size) = decodeSerial(payload, dPos, s)
      dPos += size
      // only the DDL-declared INTEGER PRIMARY KEY position aliases the
      // rowid; a NULL anywhere else is real data
      if (v == null && idx == aliasIdx) rowid else v
    }.toSeq
  }

  private def decodeSerial(b: Array[Byte], pos: Int, serial: Long): (Any, Int) =
    serial match {
      case 0 => (null, 0)
      case 1 => (b(pos).toLong, 1)
      case 2 => (beInt(b, pos, 2), 2)
      case 3 => (beInt(b, pos, 3), 3)
      case 4 => (beInt(b, pos, 4), 4)
      case 5 => (beInt(b, pos, 6), 6)
      case 6 => (beInt(b, pos, 8), 8)
      case 7 =>
        (java.lang.Double.longBitsToDouble(beInt(b, pos, 8)), 8)
      case 8 => (0L, 0)
      case 9 => (1L, 0)
      case n if n >= 12 && n % 2 == 0 =>
        val len = ((n - 12) / 2).toInt
        (java.util.Arrays.copyOfRange(b, pos, pos + len), len)
      case n if n >= 13 =>
        val len = ((n - 13) / 2).toInt
        (new String(b, pos, len, StandardCharsets.UTF_8), len)
      case other =>
        throw new IllegalStateException(s"unsupported serial type $other")
    }

  private def beInt(b: Array[Byte], pos: Int, n: Int): Long = {
    var v = b(pos).toLong // sign-extended first byte
    var i = 1
    while (i < n) { v = (v << 8) | (b(pos + i) & 0xFFL); i += 1 }
    v
  }

  private def varint(pos: Int): (Long, Int) = varintIn(bytes, pos)

  private def varintIn(b: Array[Byte], pos0: Int): (Long, Int) = {
    var v = 0L
    var pos = pos0
    var i = 0
    while (i < 8) {
      val x = b(pos)
      pos += 1
      if ((x & 0x80) == 0) return ((v << 7) | x, pos)
      v = (v << 7) | (x & 0x7F)
      i += 1
    }
    ((v << 8) | (b(pos) & 0xFF), pos + 1)
  }

  private def str(a: Any): String = a match {
    case s: String => s
    case null => null
    case other => other.toString
  }
}

object SQLiteFile {
  def open(path: Path): SQLiteFile = new SQLiteFile(Files.readAllBytes(path))
}
