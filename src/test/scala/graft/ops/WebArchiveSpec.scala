package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** WARC/gzip: hand-written byte vectors from the published formats
  * (ISO 28500 record grammar, RFC 1952 gzip header), writer
  * round-trips, strictness of the record walk, never-throw fuzz.
  */
class WebArchiveSpec extends AnyFunSuite {

  test("hand-written WARC/1.0 record parses fields and body range") {
    // written line by line from the spec, NOT via warcBytes
    val body = "hello archive"
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.test/a\r\n" +
      "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
      "X-Foreign-Header: tolerated\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes("US-ASCII")
    val recs = WebArchive.warcRecords(rec).getOrElse(fail("parse failed"))
    assert(recs.length === 1)
    val r = recs.head
    assert(r.recType === "response")
    assert(r.uri === "https://x.test/a")
    assert(r.date === "2026-02-03T04:05:06Z")
    assert(r.contentLength === body.length.toLong)
    assert(new String(rec, r.bodyStart, body.length, "US-ASCII") === body)
  }

  test("multi-record round-trip; bodies may contain CRLF CRLF (length-delimited)") {
    val tricky = "a\r\n\r\nb".getBytes("UTF-8")
    val blob = WebArchive.warcBytes(Seq(
      ("request", "u1", "d1", "GET /".getBytes("UTF-8")),
      ("response", "u2", "d2", tricky),
      ("metadata", "u3", "d3", Array.emptyByteArray)))
    val recs = WebArchive.warcRecords(blob).getOrElse(fail("round-trip failed"))
    assert(recs.map(_.recType) === Vector("request", "response", "metadata"))
    assert(recs(1).contentLength === tricky.length.toLong)
    assert(recs(2).contentLength === 0L)
  }

  test("strict walk rejects truncation, bad version, missing trailer") {
    val good = WebArchive.warcBytes(Seq(
      ("response", "u", "d", "body".getBytes("UTF-8"))))
    assert(WebArchive.warcRecords(good.dropRight(1)).isEmpty)
    assert(WebArchive.warcRecords(good.dropRight(5)).isEmpty)
    val badVer = good.clone(); badVer(5) = '2'
    assert(WebArchive.warcRecords(badVer).isEmpty)
    // corrupt the trailer's first CR
    val noTrailer = good.clone()
    noTrailer(good.length - 4) = 'X'
    assert(WebArchive.warcRecords(noTrailer).isEmpty)
    assert(WebArchive.warcRecords("plain text".getBytes).isEmpty)
  }

  test("gzip round-trips, incl. FNAME/FEXTRA/FCOMMENT header variants") {
    for (s <- Seq("", "x", "hello world", "ü†f-8 ☃", "a" * 10000)) {
      val data = s.getBytes("UTF-8")
      val got = WebArchive.gunzip(WebArchive.gzipBytes(data))
        .getOrElse(fail(s"gunzip failed for '${s.take(10)}'"))
      assert(got.toSeq === data.toSeq)
    }
    // hand-build a header with FNAME + FEXTRA + FCOMMENT around a JDK
    // deflate stream: flags must be skipped correctly (RFC 1952 §2.3)
    val payload = "flagged content".getBytes("UTF-8")
    val plain = WebArchive.gzipBytes(payload)
    val deflate = plain.drop(10) // raw deflate + trailer
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write(Array[Byte](0x1F.toByte, 0x8B.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0))
    hdr.write(Array[Byte](3, 0)) // XLEN = 3
    hdr.write(Array[Byte](1, 2, 3)) // extra field
    hdr.write("name.txt".getBytes("US-ASCII")); hdr.write(0) // FNAME
    hdr.write("a comment".getBytes("US-ASCII")); hdr.write(0) // FCOMMENT
    hdr.write(deflate)
    val got = WebArchive.gunzip(hdr.toByteArray)
      .getOrElse(fail("flagged header failed"))
    assert(got.toSeq === payload.toSeq)
    // corrupt magic / method
    assert(WebArchive.gunzip("not gzip at all....".getBytes).isEmpty)
    val badMethod = plain.clone(); badMethod(2) = 7
    assert(WebArchive.gunzip(badMethod).isEmpty)
  }

  test("tar: writer round-trip validates against real GNU/POSIX semantics") {
    val entries = Seq(
      ("1.txt", "hello".getBytes("UTF-8")),
      ("1.json", """{"id":1}""".getBytes("UTF-8")),
      ("empty.cls", Array.emptyByteArray),
      ("big.bin", ("x" * 1300).getBytes("UTF-8"))) // crosses block sizes
    val blob = WebArchive.tarBytes(entries)
    assert(blob.length % 512 === 0)
    val got = WebArchive.tarEntries(blob).getOrElse(fail("tar parse failed"))
    assert(got.map(_.name) === entries.map(_._1).toVector)
    assert(got.map(_.size) === entries.map(_._2.length.toLong).toVector)
    for ((e, (_, body)) <- got.zip(entries))
      assert(blob.slice(e.bodyStart, e.bodyStart + e.size.toInt).toSeq === body.toSeq)
  }

  test("tar: checksum damage and truncation reject the archive") {
    val blob = WebArchive.tarBytes(Seq(("a.txt", "abc".getBytes("UTF-8"))))
    // flip a name byte WITHOUT updating the checksum
    val bad = blob.clone(); bad(0) = 'z'
    assert(WebArchive.tarEntries(bad).isEmpty, "stale checksum must reject")
    assert(WebArchive.tarEntries(blob.take(600)).isEmpty, "truncated body")
    assert(WebArchive.tarEntries("not a tar".getBytes).isEmpty)
    // a real system tar must also accept our writer's output
    val tmp = java.nio.file.Files.createTempFile("graft", ".tar")
    try {
      java.nio.file.Files.write(tmp, blob)
      val p = new ProcessBuilder("tar", "-tf", tmp.toString)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      if (p.waitFor() == 0) assert(out.trim === "a.txt")
      // (absent system tar: the round-trip + checksum law above stands)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("fuzz: mutated WARC and gzip payloads never throw") {
    val rnd = new scala.util.Random(20260816L)
    val warc = WebArchive.warcBytes(Seq(
      ("request", "u", "d", "GET /x".getBytes("UTF-8")),
      ("response", "u", "d", ("body " * 20).getBytes("UTF-8"))))
    val gz = WebArchive.gzipBytes(("text " * 50).getBytes("UTF-8"))
    val tar = WebArchive.tarBytes(Seq(("a.txt", ("y" * 700).getBytes("UTF-8"))))
    for (base <- Seq(warc, gz, tar); _ <- 1 to 300) {
      val b = base.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      WebArchive.warcRecords(b)
      WebArchive.gunzip(b)
      WebArchive.tarEntries(b)
    }
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(100))
      rnd.nextBytes(b)
      WebArchive.warcRecords(b)
      WebArchive.gunzip(b)
      WebArchive.tarEntries(b)
    }
  }
}
