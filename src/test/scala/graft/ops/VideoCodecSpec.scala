package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container codec: hand-written byte-layout vectors from the
  * published 14496-12 grammar (NOT via our own writer, so an encoder+
  * decoder inverse-bug pair can't hide), writer round-trips over the
  * parameter grid, the sample-table offset walk, and never-throw fuzz.
  */
class VideoCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def be32h(v: Long): String = f"$v%08x"

  test("hand-written mvhd v0 vector: ts=600 dur=1800 reads back 3000 ms") {
    // mvhd payload written nibble by nibble from the 14496-12 field
    // list (NOT via the writer): ver/flags 0, creation 0, modification
    // 0, timescale=0x258=600, duration=0x708=1800, rate 1.0, volume
    // 1.0, identity matrix, next_track_ID=2.
    val mvhdPayload = "00000000 00000000 00000000 00000258 00000708" +
      "00010000 0100 0000" + "0000000000000000" +
      "00010000 00000000 00000000 00000000 00010000 00000000 00000000 00000000 40000000" +
      "00000000 00000000 00000000 00000000 00000000 00000000" + "00000002"
    val mvhdHex = be32h(8 + mvhdPayload.replaceAll(" ", "").length / 2) +
      "6d766864" + mvhdPayload
    val handMvhd = hex(mvhdHex)

    // a trak-less file must be rejected (no video track), not throw
    val ftyp = hex("00000014 66747970 69736f6d 00000200 6d703432")
    val bareMoov = hex(be32h(8L + handMvhd.length) + "6d6f6f76") ++ handMvhd
    assert(VideoCodec.decode(ftyp ++ bareMoov).isEmpty)

    // splice the hand-written mvhd over the writer's (same v0 length)
    // -> the decoded movie clock must be the hand-written one
    val base = VideoCodec.mp4Bytes(320, 240, 1000, 40, 5, 3L)
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val at = indexOf(base, "mvhd".getBytes("US-ASCII")) - 4
    assert(handMvhd.length === 108, "mvhd v0 box is 108 bytes by spec")
    val spliced = base.take(at) ++ handMvhd ++ base.drop(at + 108)
    val m = VideoCodec.decode(spliced).getOrElse(fail("hand mvhd failed"))
    assert(m.timescale === 600)
    assert(m.durationMs === 1800L * 1000 / 600)
  }

  test("writer round-trip: every metadata field matches the closed form") {
    for (seed <- Seq(0L, 1L, 17L, 999L); n <- Seq(1, 3, 4, 5, 20)) {
      val b = VideoCodec.mp4Bytes(width = 320, height = 240,
        timescale = 1000, delta = 40, nSamples = n, seed = seed)
      val m = VideoCodec.decode(b).getOrElse(fail(s"decode failed n=$n seed=$seed"))
      assert(m.brand === "isom")
      assert(m.timescale === 1000)
      assert(m.width === 320)
      assert(m.height === 240)
      assert(m.trackCount === 1)
      assert(m.codec === "avc1")
      assert(m.sampleCount === n.toLong)
      val durTicks = VideoCodec.fixtureDurationTicks(n, 40)
      assert(m.durationMs === durTicks * 1000L / 1000)
    }
  }

  test("sample table: times follow the two-run stts, offsets land on the pattern bytes") {
    val seed = 7L
    val n = 11
    val b = VideoCodec.mp4Bytes(160, 120, 600, 25, n, seed)
    val t = VideoCodec.decodeSampleTable(b).getOrElse(fail("no sample table"))
    assert(t.timescale === 600)
    assert(t.samples.length === n)
    for (s <- t.samples) {
      assert(s.timeTicks === VideoCodec.fixtureTimeTicks(n, 25, s.idx))
      assert(s.size === VideoCodec.sampleSize(seed, s.idx))
      assert(s.isSync === (s.idx % 3 == 0))
      // the offset must point at the sample's actual pattern bytes
      for (j <- 0 until s.size)
        assert((b((s.offset + j).toInt) & 0xFF) ===
          VideoCodec.sampleByte(seed, s.idx, j),
          s"sample ${s.idx} byte $j off by offset walk")
    }
    // offsets strictly increase and samples tile the mdat contiguously
    val sorted = t.samples.sortBy(_.idx)
    for (i <- 1 until n)
      assert(sorted(i).offset === sorted(i - 1).offset + sorted(i - 1).size,
        "chunk walk left a gap")
  }

  test("version-1 mvhd/tkhd and largesize boxes parse identically") {
    // take the writer's file and rewrite moov/mvhd/tkhd as v1 +
    // wrap mdat in a largesize box — decode must be unchanged.
    val base = VideoCodec.mp4Bytes(320, 240, 1000, 40, 5, 3L)
    val meta0 = VideoCodec.decode(base).get

    // hand-build an mvhd v1 with the same ts/duration
    def be(v: Long, w: Int): Array[Byte] =
      (w - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val durTicks = VideoCodec.fixtureDurationTicks(5, 40)
    val mvhdV1Payload =
      Array[Byte](1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++ be(1000, 4) ++
        be(durTicks, 8) ++ be(0x00010000L, 4) ++ be(0x0100, 2) ++ be(0, 2) ++
        new Array[Byte](8) ++ new Array[Byte](36) ++ new Array[Byte](24) ++ be(2, 4)
    val mvhdV1 = be(mvhdV1Payload.length + 8L, 4) ++
      "mvhd".getBytes("US-ASCII") ++ mvhdV1Payload

    // splice: find the original mvhd box inside moov and replace it
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val tag = "mvhd".getBytes("US-ASCII")
    val at = indexOf(base, tag) - 4 // box size precedes the fourcc
    val oldLen = ((base(at) & 0xFF) << 24) | ((base(at + 1) & 0xFF) << 16) |
      ((base(at + 2) & 0xFF) << 8) | (base(at + 3) & 0xFF)
    val spliced = base.take(at) ++ mvhdV1 ++ base.drop(at + oldLen)
    // fix the enclosing moov size (grew by mvhdV1.length - oldLen)
    val moovAt = indexOf(spliced, "moov".getBytes("US-ASCII")) - 4
    val moovLen = ((spliced(moovAt) & 0xFF) << 24) | ((spliced(moovAt + 1) & 0xFF) << 16) |
      ((spliced(moovAt + 2) & 0xFF) << 8) | (spliced(moovAt + 3) & 0xFF)
    val newMoovLen = moovLen + (mvhdV1.length - oldLen)
    val fixed = spliced.clone()
    fixed(moovAt) = ((newMoovLen >> 24) & 0xFF).toByte
    fixed(moovAt + 1) = ((newMoovLen >> 16) & 0xFF).toByte
    fixed(moovAt + 2) = ((newMoovLen >> 8) & 0xFF).toByte
    fixed(moovAt + 3) = (newMoovLen & 0xFF).toByte
    val metaV1 = VideoCodec.decode(fixed).getOrElse(fail("v1 mvhd failed"))
    assert(metaV1.timescale === meta0.timescale)
    assert(metaV1.durationMs === meta0.durationMs)
    assert(metaV1.width === meta0.width) // tkhd untouched

    // largesize: rewrite ftyp as size==1 + 64-bit largesize; metadata
    // (which never touches stco) must decode identically
    val ftypLen = 24 // 8 header + brand(4) minor(4) compat(8)
    val payload = base.slice(8, ftypLen)
    val largeFtyp = be(1, 4) ++ "ftyp".getBytes("US-ASCII") ++
      be(16L + payload.length, 8) ++ payload
    val withLarge = largeFtyp ++ base.drop(ftypLen)
    val mL = VideoCodec.decode(withLarge).getOrElse(fail("largesize ftyp failed"))
    assert(mL.brand === meta0.brand)
    assert(mL.width === meta0.width)
  }

  test("absent stss means every sample is sync (14496-12 §8.6.2)") {
    val base = VideoCodec.mp4Bytes(160, 120, 1000, 40, 6, 1L)
    // excise the stss box: find it, splice it out, shrink ancestors
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val at = indexOf(base, "stss".getBytes("US-ASCII")) - 4
    val len = ((base(at) & 0xFF) << 24) | ((base(at + 1) & 0xFF) << 16) |
      ((base(at + 2) & 0xFF) << 8) | (base(at + 3) & 0xFF)
    val cut = base.take(at) ++ base.drop(at + len)
    // shrink every enclosing box (moov, trak, mdia, minf, stbl) by len
    def shrink(b: Array[Byte], typ: String): Unit = {
      val p = indexOf(b, typ.getBytes("US-ASCII")) - 4
      val old = ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      val nw = old - len
      b(p) = ((nw >> 24) & 0xFF).toByte; b(p + 1) = ((nw >> 16) & 0xFF).toByte
      b(p + 2) = ((nw >> 8) & 0xFF).toByte; b(p + 3) = (nw & 0xFF).toByte
    }
    Seq("moov", "trak", "mdia", "minf", "stbl").foreach(shrink(cut, _))
    // NOTE: stco offsets now point len bytes late; decode the TABLE
    // only for sync flags (offsets shift but stay in-bounds because
    // the file shrank at a point before mdat — so just check flags)
    val t = VideoCodec.decodeSampleTable(cut)
    assert(t.isEmpty || t.get.samples.forall(_.isSync),
      "without stss every sample must be sync")
  }

  test("fixed-size stsz (sample_size != 0) expands to uniform sizes") {
    // rewrite the writer's stsz to the fixed-size form by hand
    val n = 4
    val base = VideoCodec.mp4Bytes(160, 120, 1000, 40, n, 5L)
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val at = indexOf(base, "stsz".getBytes("US-ASCII")) - 4
    // keep the box length, set sample_size=40 (payload bytes 4..7
    // after fourcc+verflags), leave per-sample entries as garbage tail
    val b = base.clone()
    val payload = at + 8 + 4 // size+fourcc+verflags
    b(payload) = 0; b(payload + 1) = 0; b(payload + 2) = 0; b(payload + 3) = 40
    val t = VideoCodec.decodeSampleTable(b)
    assert(t.isDefined && t.get.samples.forall(_.size === 40))
  }

  test("malformed containers return None, never throw") {
    val good = VideoCodec.mp4Bytes(320, 240, 1000, 40, 8, 11L)
    assert(VideoCodec.decode(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.decode(good.take(40)).isEmpty)
    // truncating INSIDE moov loses the box tree -> None, no throw
    // (ftyp is 24 bytes, so offset 100 is mid-moov)
    assert(VideoCodec.decode(good.take(100)).isEmpty)
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 300) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      VideoCodec.decode(b)
      VideoCodec.decodeSampleTable(b)
    }
    for (_ <- 1 to 400) {
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      VideoCodec.decode(b) // must return, not throw/hang
      VideoCodec.decodeSampleTable(b) match {
        case Some(t) => // if it still parses, ranges must stay in-bounds
          assert(t.samples.forall(s => s.offset + s.size <= b.length))
        case None =>
      }
    }
  }

  test("fragmented layout law: moof/trun walk yields the SAME samples as the flat stbl") {
    for (seed <- Seq(0L, 5L, 42L); n <- Seq(1, 4, 7, 13)) {
      val flat = VideoCodec.mp4Bytes(320, 240, 1000, 40, n, seed)
      val frag = VideoCodec.mp4FragBytes(320, 240, 1000, 40, n, seed)
      val tf = VideoCodec.decodeSampleTable(flat).getOrElse(fail("flat"))
      val tg = VideoCodec.decodeSampleTable(frag).getOrElse(fail(s"frag n=$n"))
      assert(tg.timescale === tf.timescale)
      assert(tg.samples.length === tf.samples.length)
      for ((a, b) <- tf.samples.zip(tg.samples)) {
        assert(a.idx === b.idx)
        assert(a.timeTicks === b.timeTicks, s"time diverges at ${a.idx}")
        assert(a.size === b.size)
        assert(a.isSync === b.isSync, s"sync diverges at ${a.idx}")
        // offsets differ between layouts; the BYTES must not
        for (j <- 0 until a.size)
          assert(flat((a.offset + j).toInt) === frag((b.offset + j).toInt),
            s"payload bytes diverge at sample ${a.idx} byte $j")
      }
      // metadata: duration comes from mehd (mvhd is 0 in the frag file)
      val mf = VideoCodec.decode(flat).get
      val mg = VideoCodec.decode(frag).getOrElse(fail("frag meta"))
      assert(mg.durationMs === mf.durationMs)
      assert(mg.sampleCount === mf.sampleCount)
      assert(mg.width === mf.width)
    }
  }

  test("co64 (64-bit chunk offsets) parses like stco") {
    // rewrite the writer's stco as a co64 box: same offsets widened to
    // 8 bytes; grow the enclosing boxes accordingly
    val n = 6
    val base = VideoCodec.mp4Bytes(160, 120, 1000, 40, n, 9L)
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val at = indexOf(base, "stco".getBytes("US-ASCII")) - 4
    val oldLen = ((base(at) & 0xFF) << 24) | ((base(at + 1) & 0xFF) << 16) |
      ((base(at + 2) & 0xFF) << 8) | (base(at + 3) & 0xFF)
    val nChunks = (n + 3) / 4
    val offs = (0 until nChunks).map { c =>
      val p = at + 8 + 4 + 4 + c * 4
      ((base(p) & 0xFFL) << 24) | ((base(p + 1) & 0xFFL) << 16) |
        ((base(p + 2) & 0xFFL) << 8) | (base(p + 3) & 0xFFL)
    }
    val grow = 4 * nChunks // each offset widens by 4 bytes
    def be(v: Long, w: Int): Array[Byte] =
      (w - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val co64 = be(oldLen + grow, 4) ++ "co64".getBytes("US-ASCII") ++
      be(0, 4) ++ be(nChunks, 4) ++
      offs.flatMap(o => be(o + grow, 8)) // mdat shifts by `grow` too
    val spliced = base.take(at) ++ co64 ++ base.drop(at + oldLen)
    for (typ <- Seq("moov", "trak", "mdia", "minf", "stbl")) {
      val p = indexOf(spliced, typ.getBytes("US-ASCII")) - 4
      val old = ((spliced(p) & 0xFF) << 24) | ((spliced(p + 1) & 0xFF) << 16) |
        ((spliced(p + 2) & 0xFF) << 8) | (spliced(p + 3) & 0xFF)
      val nw = old + grow
      spliced(p) = ((nw >> 24) & 0xFF).toByte
      spliced(p + 1) = ((nw >> 16) & 0xFF).toByte
      spliced(p + 2) = ((nw >> 8) & 0xFF).toByte
      spliced(p + 3) = (nw & 0xFF).toByte
    }
    val t = VideoCodec.decodeSampleTable(spliced).getOrElse(fail("co64 failed"))
    assert(t.samples.length === n)
    for (s <- t.samples; j <- 0 until s.size)
      assert((spliced((s.offset + j).toInt) & 0xFF) ===
        VideoCodec.sampleByte(9L, s.idx, j))
  }

  test("fragmented fuzz: mutated fMP4 never throws; surviving parses stay in-bounds") {
    val good = VideoCodec.mp4FragBytes(320, 240, 1000, 40, 9, 13L)
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 400) {
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      VideoCodec.decode(b)
      VideoCodec.decodeSampleTable(b) match {
        case Some(t) =>
          assert(t.samples.forall(s => s.offset >= 0 &&
            s.offset + s.size <= b.length))
        case None =>
      }
    }
  }

  test("WebM: EBML round-trip matches the MP4 layout's samples (cross-container law)") {
    for (seed <- Seq(0L, 5L, 42L); n <- Seq(1, 4, 9, 16)) {
      val mp4 = VideoCodec.mp4Bytes(320, 240, 1000, 40, n, seed)
      val webm = WebmCodec.webmBytes(320, 240, 40, n, seed)
      val tm = VideoCodec.decodeSampleTable(mp4).getOrElse(fail("mp4"))
      val tw = WebmCodec.decodeSampleTable(webm).getOrElse(fail(s"webm n=$n"))
      assert(tw.timescale === 1000)
      assert(tw.samples.length === tm.samples.length)
      for ((a, b) <- tm.samples.zip(tw.samples)) {
        // mp4 ticks are 1/1000 s here too, so times align directly
        assert(a.timeTicks === b.timeTicks, s"time diverges at ${a.idx}")
        assert(a.size === b.size)
        assert(a.isSync === b.isSync)
        for (j <- 0 until a.size)
          assert(mp4((a.offset + j).toInt) === webm((b.offset + j).toInt),
            s"payload bytes diverge at sample ${a.idx} byte $j")
      }
      val m = WebmCodec.decode(webm).getOrElse(fail("webm meta"))
      assert(m.brand === "webm")
      assert(m.codec === "V_VP9")
      assert(m.width === 320)
      assert(m.height === 240)
      assert(m.trackCount === 1)
      assert(m.sampleCount === n.toLong)
      assert(m.durationMs === VideoCodec.fixtureDurationTicks(n, 40))
    }
  }

  test("WebM: laced SimpleBlocks are rejected, not mis-sliced") {
    val webm = WebmCodec.webmBytes(160, 120, 40, 4, 1L)
    // find the first SimpleBlock (id 0xA3) and set a lacing bit in its
    // flags byte (track vint 0x81 + s16 + flags)
    def indexOf(hay: Array[Byte], pred: Int => Boolean): Int =
      hay.indices.find(pred).getOrElse(-1)
    val at = indexOf(webm, i => (webm(i) & 0xFF) == 0xA3 &&
      i + 2 < webm.length && (webm(i + 2) & 0xFF) == 0x81)
    assert(at >= 0, "SimpleBlock not found")
    val flagsAt = at + 2 + 1 + 2 // id + size byte + vint + s16
    val laced = webm.clone()
    laced(flagsAt) = (laced(flagsAt) | 0x02).toByte
    assert(WebmCodec.decodeSampleTable(laced).isEmpty)
  }

  test("WebM fuzz: mutated payloads never throw; survivors stay in-bounds") {
    val good = WebmCodec.webmBytes(320, 240, 40, 9, 13L)
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 400) {
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      WebmCodec.decode(b)
      WebmCodec.decodeSampleTable(b) match {
        case Some(t) =>
          assert(t.samples.forall(s => s.offset >= 0 &&
            s.offset + s.size <= b.length))
        case None =>
      }
    }
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      WebmCodec.decode(b)
      WebmCodec.decodeSampleTable(b)
    }
  }

  test("stsz/stts count mismatch is rejected") {
    val base = VideoCodec.mp4Bytes(160, 120, 1000, 40, 8, 2L)
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val b = base.clone()
    val at = indexOf(b, "stts".getBytes("US-ASCII")) - 4
    // stts first run count 8 -> 9 (entry_count stays 2): totals diverge
    val firstRunCount = at + 8 + 4 + 4 // size+fourcc, verflags, entry_count
    b(firstRunCount + 3) = (b(firstRunCount + 3) + 1).toByte
    assert(VideoCodec.decodeSampleTable(b).isEmpty,
      "stts total != stsz count must be rejected")
  }
}
