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

  def warc_records(payload: Column): Column =
    toCol(WarcRecordsExpr(toExpr(payload)))

  def gunzip_text(payload: Column): Column =
    toCol(GunzipTextExpr(toExpr(payload)))

  def gzip_fixture(text: Column): Column =
    toCol(GzipFixtureExpr(toExpr(text)))

  def warc_fixture(docId: Column, text: Column): Column =
    toCol(WarcFixtureExpr(toExpr(docId), toExpr(text)))
}
