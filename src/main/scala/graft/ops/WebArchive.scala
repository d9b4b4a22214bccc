package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GeoExpr

/** Web-archive (WARC/1.0) and gzip payload support — the ingestion
  * formats a web-crawl training corpus actually arrives in (the
  * public WARC spec, ISO 28500; gzip via the JDK's zlib, the same
  * inflate the PNG decoder uses).
  *
  *  - [[warcRecords]]: strict record walk over a WARC blob — version
    * line, case-insensitive headers to the blank line, Content-Length
  *    bytes of payload, CRLF CRLF trailer — yielding (type, target
  *    URI, date, content length, payload byte range). A malformed
  *    walk yields None (SQL NULL), never a half-parsed archive.
  *  - [[gunzip]]: full gzip member decode (header flags incl. FEXTRA/
  *    FNAME/FCOMMENT/FHCRC skipping, raw-deflate inflate, 64 MiB cap).
  *
  * 100 TB shape: both are map-only projections; archive payloads never
  * reach a shuffle — only the narrow per-record structs do. At
  * cluster scale a WARC lake is read as `binaryFile` blobs, exploded
  * by [[warc_records]], and the bodies routed to the text/dedup ops.
  */
object WebArchive {

  /** One WARC record: header fields + payload byte range. */
  final case class Record(recType: String, uri: String, date: String,
      contentLength: Long, bodyStart: Int)

  private final val MaxRecords = 1 << 20

  /** Strict WARC/1.0 record walk; None on any malformation. */
  def warcRecords(b: Array[Byte]): Option[Vector[Record]] = {
    if (b == null || b.length < 9) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var p = 0
    while (p < b.length) {
      if (out.length >= MaxRecords) return None
      // version line
      val lineEnd = indexOfCrlf(b, p)
      if (lineEnd < 0) return None
      val version = ascii(b, p, lineEnd - p)
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      var q = lineEnd + 2
      var recType = ""
      var uri = ""
      var date = ""
      var len = -1L
      // header lines to the blank line
      var done = false
      while (!done) {
        val e = indexOfCrlf(b, q)
        if (e < 0) return None
        if (e == q) { done = true; q += 2 } // blank line
        else {
          val line = ascii(b, q, e - q)
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "warc-type" => recType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" =>
              len = try value.toLong catch { case _: NumberFormatException => return None }
            case _ => // tolerated: foreign headers
          }
          q = e + 2
        }
      }
      if (len < 0 || recType.isEmpty) return None
      if (q.toLong + len + 4 > b.length) return None
      val bodyStart = q
      q += len.toInt
      // record trailer: CRLF CRLF
      if (b(q) != '\r' || b(q + 1) != '\n' || b(q + 2) != '\r' || b(q + 3) != '\n')
        return None
      out += Record(recType, uri, date, len, bodyStart)
      p = q + 4
    }
    if (out.isEmpty) None else Some(out.toVector)
  }

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Serialize records into a WARC/1.0 blob (the inverse fixture). */
  def warcBytes(records: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((recType, uri, date, body) <- records) {
      val header = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: ").append(recType).append("\r\n")
        .append("WARC-Target-URI: ").append(uri).append("\r\n")
        .append("WARC-Date: ").append(date).append("\r\n")
        .append("Content-Length: ").append(body.length).append("\r\n")
        .append("\r\n")
      out.write(header.toString.getBytes("US-ASCII"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  /** One TAR entry: ustar header fields + payload byte range. */
  final case class TarEntry(name: String, size: Long, typeflag: Char,
      bodyStart: Int)

  /** Strict POSIX ustar walk — the WebDataset shard format a
    * multimodal training corpus ships in (sample files grouped by key
    * inside .tar shards). 512-byte headers with VALIDATED checksums
    * (sum of header bytes, checksum field as spaces), octal sizes,
    * 512-aligned bodies, terminated by a zero block or EOF. None on
    * any malformation — a bad checksum rejects the archive rather
    * than mis-slicing every later entry. */
  def tarEntries(b: Array[Byte]): Option[Vector[TarEntry]] = {
    if (b == null || b.length < 512) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var p = 0
    var ended = false
    while (!ended && p + 512 <= b.length) {
      if (b(p) == 0) { // zero block terminates the archive
        ended = true
      } else {
        // magic: "ustar\0" (POSIX) or "ustar " (GNU)
        if (!(b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
          b(p + 260) == 'a' && b(p + 261) == 'r')) return None
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toLong else (b(p + i) & 0xFFL))
          i += 1
        }
        val stored = octal(b, p + 148, 8).getOrElse(return None)
        if (stored != sum) return None
        var nameEnd = p
        while (nameEnd < p + 100 && b(nameEnd) != 0) nameEnd += 1
        val name = ascii(b, p, nameEnd - p)
        val size = octal(b, p + 124, 12).getOrElse(return None)
        if (size < 0 || size > Int.MaxValue) return None
        val typeflag = (b(p + 156) & 0xFF).toChar
        val bodyStart = p + 512
        val padded = ((size + 511) / 512) * 512
        if (bodyStart.toLong + padded > b.length) return None
        if (out.length >= MaxRecords) return None
        out += TarEntry(name, size, typeflag, bodyStart)
        p = bodyStart + padded.toInt
      }
    }
    if (out.isEmpty) None else Some(out.toVector)
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { /* terminator/padding */ }
      else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  /** Serialize (name, body) pairs as a POSIX ustar archive. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, body) <- entries) {
      require(name.getBytes("US-ASCII").length < 100, "tar name too long")
      val hdr = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      writeOctal(hdr, 100, 8, 420) // mode 0644
      writeOctal(hdr, 108, 8, 0) // uid
      writeOctal(hdr, 116, 8, 0) // gid
      writeOctal(hdr, 124, 12, body.length.toLong)
      writeOctal(hdr, 136, 12, 0) // mtime (fixed: deterministic)
      hdr(156) = '0' // regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      hdr(263) = '0'; hdr(264) = '0' // version "00"
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += hdr(i) & 0xFFL; i += 1 }
      writeOctal(hdr, 148, 7, sum)
      hdr(155) = ' '
      out.write(hdr)
      out.write(body)
      val pad = ((body.length + 511) / 512) * 512 - body.length
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  private def writeOctal(hdr: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (len - 1 - s.length)) + s
    val bytes = padded.getBytes("US-ASCII")
    System.arraycopy(bytes, 0, hdr, off, bytes.length)
    hdr(off + len - 1) = 0
  }

  private final val MaxInflate = 64 << 20

  /** Full gzip member decode: RFC 1952 header (magic 1F 8B, deflate
    * method, FEXTRA/FNAME/FCOMMENT/FHCRC skipping), raw inflate,
    * size-capped; None for anything malformed. */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 18) return None
    if ((b(0) & 0xFF) != 0x1F || (b(1) & 0xFF) != 0x8B || b(2) != 8) return None
    val flg = b(3) & 0xFF
    var p = 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (p + 2 > b.length) return None
      val xlen = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { // FNAME
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p >= b.length) return None
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        out.write(buf, 0, n)
        if (out.size() > MaxInflate) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Deterministic gzip encode (JDK deflater, fixed settings). */
  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(data)
    gz.close()
    out.toByteArray
  }

  // ------------------------------------------------------ expressions

  val recordSchema: StructType = StructType(Seq(
    StructField("rec_idx", IntegerType),
    StructField("rec_type", StringType),
    StructField("uri", StringType),
    StructField("date", StringType),
    StructField("content_length", LongType),
    StructField("body_md5", StringType)))

  /** warc_records(payload) -> array<struct(rec_idx, rec_type, uri,
    * date, content_length, body_md5)>: every record of a WARC blob
    * with its payload digested from the TRUE byte range. NULL for
    * malformed archives. */
  case class WarcRecordsExpr(payload: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(payload)
    override def dataType: DataType = ArrayType(recordSchema)
    override protected def evalNotNull(a: Array[Any]): Any = {
      val bytes = a(0).asInstanceOf[Array[Byte]]
      warcRecords(bytes) match {
        case Some(recs) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val rows = recs.zipWithIndex.map { case (r, i) =>
            md.reset()
            md.update(bytes, r.bodyStart, r.contentLength.toInt)
            val hex = md.digest().map(x => f"${x & 0xFF}%02x").mkString
            new GenericInternalRow(Array[Any](i,
              UTF8String.fromString(r.recType), UTF8String.fromString(r.uri),
              UTF8String.fromString(r.date), r.contentLength,
              UTF8String.fromString(hex))): Any
          }
          new GenericArrayData(rows.toArray)
        case None => null
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(payload = c(0))
  }

  /** gunzip_text(payload) -> the decompressed payload as a UTF-8
    * string; NULL for non-gzip/corrupt payloads. */
  case class GunzipTextExpr(payload: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(payload)
    override def dataType: DataType = StringType
    override protected def evalNotNull(a: Array[Any]): Any =
      gunzip(a(0).asInstanceOf[Array[Byte]]) match {
        case Some(d) => UTF8String.fromBytes(d)
        case None => null
      }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(payload = c(0))
  }

  /** gzip_fixture(text) -> gzip bytes of the text's UTF-8 encoding. */
  case class GzipFixtureExpr(text: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(text)
    override def dataType: DataType = BinaryType
    override protected def evalNotNull(a: Array[Any]): Any =
      gzipBytes(a(0).asInstanceOf[UTF8String].getBytes)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(text = c(0))
  }

  /** warc_fixture(doc_id, text) -> a 3-record WARC blob (request/
    * response/metadata) whose response body is the text and whose
    * fields are closed forms of doc_id — the Common Crawl shape. */
  case class WarcFixtureExpr(docId: Expression, text: Expression)
      extends GeoExpr {
    override def children: Seq[Expression] = Seq(docId, text)
    override def dataType: DataType = BinaryType
    override protected def evalNotNull(a: Array[Any]): Any = {
      val id = lng(a(0))
      val text = a(1).asInstanceOf[UTF8String].toString
      val uri = s"https://example.com/doc/$id"
      val date = "2026-01-01T00:00:00Z"
      warcBytes(Seq(
        ("request", uri, date, s"GET /doc/$id HTTP/1.1".getBytes("UTF-8")),
        ("response", uri, date, text.getBytes("UTF-8")),
        ("metadata", uri, date, s"len=${text.length}".getBytes("UTF-8"))))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(docId = c(0), text = c(1))
  }

  val tarEntrySchema: StructType = StructType(Seq(
    StructField("entry_idx", IntegerType),
    StructField("name", StringType),
    StructField("n_bytes", LongType),
    StructField("type", StringType),
    StructField("body_md5", StringType)))

  /** tar_entries(payload) -> array<struct(entry_idx, name, n_bytes,
    * type, body_md5)>: every ustar entry (checksum-validated) with its
    * payload digested from the TRUE byte range — WebDataset shard
    * iteration as a columnar op. NULL for malformed archives. */
  case class TarEntriesExpr(payload: Expression) extends GeoExpr {
    override def children: Seq[Expression] = Seq(payload)
    override def dataType: DataType = ArrayType(tarEntrySchema)
    override protected def evalNotNull(a: Array[Any]): Any = {
      val bytes = a(0).asInstanceOf[Array[Byte]]
      tarEntries(bytes) match {
        case Some(entries) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val rows = entries.zipWithIndex.map { case (t, i) =>
            md.reset()
            md.update(bytes, t.bodyStart, t.size.toInt)
            val hex = md.digest().map(x => f"${x & 0xFF}%02x").mkString
            new GenericInternalRow(Array[Any](i,
              UTF8String.fromString(t.name), t.size,
              UTF8String.fromString(t.typeflag.toString),
              UTF8String.fromString(hex))): Any
          }
          new GenericArrayData(rows.toArray)
        case None => null
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(payload = c(0))
  }

  /** tar_fixture(doc_id, text) -> a WebDataset-style shard sample:
    * {id}.txt (the text), {id}.json (closed-form json), {id}.cls
    * (closed-form label) as one ustar archive. */
  case class TarFixtureExpr(docId: Expression, text: Expression)
      extends GeoExpr {
    override def children: Seq[Expression] = Seq(docId, text)
    override def dataType: DataType = BinaryType
    override protected def evalNotNull(a: Array[Any]): Any = {
      val id = lng(a(0))
      val text = a(1).asInstanceOf[UTF8String].toString
      tarBytes(Seq(
        (s"$id.txt", text.getBytes("UTF-8")),
        (s"$id.json", s"""{"id":$id}""".getBytes("UTF-8")),
        (s"$id.cls", (text.length % 10).toString.getBytes("UTF-8"))))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(docId = c(0), text = c(1))
  }

  def tar_entries(payload: Column): Column =
    toCol(TarEntriesExpr(toExpr(payload)))

  def tar_fixture(docId: Column, text: Column): Column =
    toCol(TarFixtureExpr(toExpr(docId), toExpr(text)))

  def warc_records(payload: Column): Column =
    toCol(WarcRecordsExpr(toExpr(payload)))

  def gunzip_text(payload: Column): Column =
    toCol(GunzipTextExpr(toExpr(payload)))

  def gzip_fixture(text: Column): Column =
    toCol(GzipFixtureExpr(toExpr(text)))

  def warc_fixture(docId: Column, text: Column): Column =
    toCol(WarcFixtureExpr(toExpr(docId), toExpr(text)))

  // ------------------------------------------------ URL canonicalization

  /** Canonical URL — the key a web corpus dedups and joins crawls on
    * (the same page arrives as dozens of surface forms across WARC
    * snapshots). Normalizations, each replayable in ANSI SQL:
    *  - scheme and host lowercased (path stays case-sensitive per
    *    RFC 3986 §6.2.2.1);
    *  - default ports stripped (http:80 / https:443);
    *  - fragment dropped;
    *  - tracking params removed (utm_*, fbclid, gclid);
    *  - remaining query params sorted (binary order, both engines);
    *  - trailing path slashes stripped.
    *
    * Built from codegen'd regexp/string built-ins plus tiny-array
    * lambda HOFs (filter/array_sort over the param list — interpreted,
    * but bounded by the handful of params a URL carries, not corpus
    * size). Idempotent: canonical input maps to itself. */
  def canonicalizeUrl(url: Column): Column = {
    import org.apache.spark.sql.functions._
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQ, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid=")))
    val q = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registered-domain-ish key (last two host labels) — the grouping
    * key for per-site corpus stats and crawl politeness. A true public
    * -suffix-list lookup is a broadcast join against the PSL table;
    * the two-label fallback is the standard offline approximation. */
  def urlDomain(url: Column): Column = {
    import org.apache.spark.sql.functions._
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(auth, ":\\d+$", "")
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }
}
