package graft.ops

/** Pure-JVM baseline JPEG pixel codec (ITU-T T.81): sequential DCT,
  * 8-bit precision, Huffman entropy coding, arbitrary sampling factors
  * (grayscale, YCbCr 4:4:4, and SUBSAMPLED 4:2:0/4:2:2 via the
  * generalized interleaved-MCU walk with nearest-sample chroma
  * upsampling). The DECODER is the general article — segment walk,
  * DQT/DHT/SOF0/DRI/SOS parsing, MSB-first bit reader with 0xFF00
  * unstuffing and RSTn handling, canonical Huffman decode, coefficient
  * EXTEND (F.2.2.1), zigzag + dequantization, separable IDCT, YCbCr ->
  * RGB. PROGRESSIVE (SOF2) streams decode too: per-component
  * coefficient buffers accumulate across scans (spectral selection +
  * successive approximation, DC and AC first/refine passes with
  * EOB-run accounting per T.81 G.2), dequantized and IDCT'd at EOI.
  * Only arithmetic-coded streams yield None (documented limit), as
  * does any malformed stream — never a throw.
  *
  * The ENCODER is fixture-grade by design: block-constant images
  * (every 8x8 block one value) have only a DC coefficient, and with
  * the DC quantizer set to 8 the quantized value is exactly v-128 —
  * so encode->decode is LOSSLESS on the fixture family and an oracle
  * can predict every decoded pixel by arithmetic, while the decoder
  * paths exercised (Huffman, differential DC, dequant, IDCT, color
  * convert) are the real ones any baseline JPEG needs.
  */
object JpegCodec {

  import ImageCodec.Pixels

  // --------------------------------------------------------- constants

  /** Zigzag scan order (T.81 figure 5): zigzag index -> block index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: cos((2x+1) u pi / 16) * C(u), C(0)=1/sqrt2. */
  private val Cos: Array[Array[Double]] = {
    val t = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u)(x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  // ----------------------------------------------------------- decoder

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code tables: minCode/maxCode/valPtr per length (F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  /** Entropy-coded-segment bit reader: MSB first, 0xFF00 unstuffed,
    * stops (returns -1) at any real marker. RSTn markers are consumed
    * by [[restart]]. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var markerSeen = false
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xFF
        if (v == 0xFF) {
          if (pos + 1 >= b.length) return -1
          val m = b(pos + 1) & 0xFF
          if (m == 0x00) { pos += 2; acc = 0xFF }
          else { markerSeen = true; return -1 } // real marker: stop
        } else { pos += 1; acc = v }
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }
    /** Consume an expected RSTn marker; true on success. */
    def restart(): Boolean = {
      nBits = 0
      markerSeen = false
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
  }

  /** EXTEND (T.81 F.2.2.1): map `size`-bit magnitude to signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(id: Int, hSamp: Int, vSamp: Int,
      quantId: Int, var dcId: Int = 0, var acId: Int = 0)

  def decodePixels(b: Array[Byte]): Option[Pixels] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var width = -1; var height = -1
    var comps: Array[Component] = null
    var restartInterval = 0
    var progressive = false
    // progressive state: per-component coefficient buffers accumulated
    // across scans, dequantized + IDCT'd only at EOI (T.81 G)
    var pCoefs: Array[Array[Int]] = null
    var pBw: Array[Int] = null; var pBh: Array[Int] = null
    var pHMax = 1; var pVMax = 1
    var sawProgScan = false
    var i = 2
    while (i + 2 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None
      if ((b(i + 1) & 0xFF) == 0xFF) { i += 1 }
      else {
        val marker = b(i + 1) & 0xFF
        if (marker == 0xD9) { // EOI
          if (!progressive || !sawProgScan) return None
          return finalizeProgressive(width, height, comps, quant,
            pCoefs, pBw, pBh, pHMax, pVMax)
        }
        if (i + 4 > b.length) return None // all other markers carry a length
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xFF) >> 4
              val tq = b(p) & 0x0F
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              if (p + 1 + 64 > segEnd) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(k) = b(p + 1 + k) & 0xFF; k += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xFF) >> 4
              val th = b(p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val counts = new Array[Int](16)
              var total = 0
              var k = 0
              while (k < 16) {
                counts(k) = b(p + 1 + k) & 0xFF; total += counts(k); k += 1
              }
              if (p + 17 + total > segEnd || total > 256) return None
              val syms = new Array[Int](total)
              k = 0
              while (k < total) { syms(k) = b(p + 17 + k) & 0xFF; k += 1 }
              val h = new Huff(counts, syms)
              if (tc == 0) dcTables(th) = h else acTables(th) = h
              p += 17 + total
            }
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if (len < 8) return None
            if ((b(seg) & 0xFF) != 8) return None // 8-bit precision
            height = ((b(seg + 1) & 0xFF) << 8) | (b(seg + 2) & 0xFF)
            width = ((b(seg + 3) & 0xFF) << 8) | (b(seg + 4) & 0xFF)
            val n = b(seg + 5) & 0xFF
            if (n != 1 && n != 3) return None
            if (width <= 0 || height <= 0 ||
              width.toLong * height * n > (64L << 20)) return None
            if (seg + 6 + 3 * n > segEnd) return None
            comps = Array.tabulate(n) { c =>
              val o = seg + 6 + 3 * c
              val samp = b(o + 1) & 0xFF
              Component(b(o) & 0xFF, samp >> 4, samp & 0x0F, b(o + 2) & 0xFF)
            }
            // sampling factors 1-4 with the spec's <=10 blocks/MCU cap
            // (T.81 B.2.2); 4:2:0 / 4:2:2 decode via the generalized
            // MCU walk below
            if (comps.exists(c => c.hSamp < 1 || c.hSamp > 4 ||
              c.vSamp < 1 || c.vSamp > 4)) return None
            if (comps.map(c => c.hSamp * c.vSamp).sum > 10) return None
            if (progressive) {
              pHMax = comps.map(_.hSamp).max
              pVMax = comps.map(_.vSamp).max
              val mcusX = (width + 8 * pHMax - 1) / (8 * pHMax)
              val mcusY = (height + 8 * pVMax - 1) / (8 * pVMax)
              pBw = comps.map(c => mcusX * c.hSamp)
              pBh = comps.map(c => mcusY * c.vSamp)
              var total = 0L
              var ci = 0
              while (ci < n) { total += pBw(ci).toLong * pBh(ci) * 64; ci += 1 }
              if (total * 4 > (256L << 20)) return None
              pCoefs = Array.tabulate(n)(c => new Array[Int](pBw(c) * pBh(c) * 64))
            }
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // other frame types (arithmetic etc.) unsupported
          case 0xDD => // DRI
            if (len != 4) return None
            restartInterval = ((b(seg) & 0xFF) << 8) | (b(seg + 1) & 0xFF)
          case 0xDA => // SOS: entropy-coded data follows
            if (comps == null || seg >= segEnd || segEnd > b.length) return None
            if (!progressive) {
              val n = b(seg) & 0xFF
              if (n != comps.length || seg + 1 + 2 * n + 3 > segEnd) return None
              var k = 0
              while (k < n) {
                val cid = b(seg + 1 + 2 * k) & 0xFF
                val tbl = b(seg + 2 + 2 * k) & 0xFF
                val comp = comps.find(_.id == cid).getOrElse(return None)
                comp.dcId = tbl >> 4
                comp.acId = tbl & 0x0F
                k += 1
              }
              return decodeScan(b, segEnd, width, height, comps, quant,
                dcTables, acTables, restartInterval)
            } else {
              decodeProgScan(b, seg, segEnd, width, height, comps,
                dcTables, acTables, restartInterval,
                pCoefs, pBw, pBh, pHMax, pVMax) match {
                case Some(nextPos) =>
                  sawProgScan = true
                  i = nextPos
                case None => return None
              }
            }
          case _ => () // APPn/COM/etc: skip
        }
        if (!(progressive && marker == 0xDA)) i += 2 + len
      }
    }
    None
  }

  /** One progressive scan (T.81 G.2): spectral selection [Ss, Se] at
    * successive-approximation stage Ah -> Al, accumulating into the
    * coefficient buffers. Returns the position of the next marker's
    * 0xFF after the scan's entropy data, or None on malformed input. */
  private def decodeProgScan(b: Array[Byte], seg: Int, segEnd: Int,
      width: Int, height: Int, comps: Array[Component],
      dcT: Array[Huff], acT: Array[Huff], restartInterval: Int,
      coefs: Array[Array[Int]], bw: Array[Int], bh: Array[Int],
      hMax: Int, vMax: Int): Option[Int] = {
    val ns = b(seg) & 0xFF
    if (ns < 1 || ns > comps.length || seg + 1 + 2 * ns + 3 > segEnd)
      return None
    val scanIdx = new Array[Int](ns)
    var k = 0
    while (k < ns) {
      val cid = b(seg + 1 + 2 * k) & 0xFF
      val tbl = b(seg + 2 + 2 * k) & 0xFF
      val ci = comps.indexWhere(_.id == cid)
      if (ci < 0 || (tbl >> 4) > 3 || (tbl & 0x0F) > 3) return None
      comps(ci).dcId = tbl >> 4
      comps(ci).acId = tbl & 0x0F
      scanIdx(k) = ci
      k += 1
    }
    val ss = b(seg + 1 + 2 * ns) & 0xFF
    val se = b(seg + 2 + 2 * ns) & 0xFF
    val ahAl = b(seg + 3 + 2 * ns) & 0xFF
    val ah = ahAl >> 4
    val al = ahAl & 0x0F
    if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 13) return None
    val isDc = ss == 0
    if (isDc && se != 0) return None // DC scans carry only coef 0
    if (!isDc && ns != 1) return None // AC scans are non-interleaved
    if (ah != 0 && ah != al + 1) return None // approximation steps by 1
    val br = new BitReader(b, segEnd)
    var eobrun = 0
    val pred = new Array[Int](comps.length)

    // ---- per-block decoders -----------------------------------------
    def dcFirst(ci: Int, blockIdx: Int): Boolean = {
      val t = dcT(comps(ci).dcId)
      if (t == null) return false
      val s = t.decode(br)
      if (s < 0 || s > 11) return false
      val diffBits = if (s == 0) 0 else br.bits(s)
      if (diffBits < 0) return false
      pred(ci) += extend(diffBits, s)
      if (pred(ci) < -2048 || pred(ci) > 2048) return false
      coefs(ci)(blockIdx * 64) = pred(ci) << al
      true
    }
    def dcRefine(ci: Int, blockIdx: Int): Boolean = {
      val bit = br.bit()
      if (bit < 0) return false
      if (bit == 1) coefs(ci)(blockIdx * 64) |= (1 << al)
      true
    }
    def acFirst(ci: Int, blockIdx: Int): Boolean = {
      val co = coefs(ci)
      val base = blockIdx * 64
      if (eobrun > 0) { eobrun -= 1; return true }
      var kk = ss
      while (kk <= se) {
        val rs = acT(comps(ci).acId) match {
          case null => return false
          case t => t.decode(br)
        }
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) { kk += 16 } // ZRL
          else {
            val extra = if (r == 0) 0 else br.bits(r)
            if (extra < 0) return false
            eobrun = (1 << r) - 1 + extra
            return true
          }
        } else {
          kk += r
          if (kk > se) return false
          val vb = br.bits(s)
          if (vb < 0) return false
          co(base + Zigzag(kk)) = extend(vb, s) << al
          kk += 1
        }
      }
      true
    }
    def acRefine(ci: Int, blockIdx: Int): Boolean = {
      // T.81 G.2.2 correction-bit pass (the libjpeg AC_refine shape)
      val co = coefs(ci)
      val base = blockIdx * 64
      val p1 = 1 << al
      val m1 = -1 << al
      var kk = ss
      if (eobrun == 0) {
        var break = false
        while (kk <= se && !break) {
          val t = acT(comps(ci).acId)
          if (t == null) return false
          val rs = t.decode(br)
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 0x0F
          var newval = 0
          if (s != 0) {
            if (s != 1) return false // refinement codes only +-1
            val sb = br.bit()
            if (sb < 0) return false
            newval = if (sb == 1) p1 else m1
          } else if (r != 15) {
            // refine-scan EOB runs COUNT the current block (its
            // remaining correction bits are handled below, then the
            // run is decremented) — unlike first-scan runs
            val extra = if (r == 0) 0 else br.bits(r)
            if (extra < 0) return false
            eobrun = (1 << r) + extra
            break = true
          }
          if (!break) {
            // advance past r zero-history coefficients, emitting
            // correction bits for every nonzero coefficient passed
            var placed = false
            while (kk <= se && !placed) {
              val idx = base + Zigzag(kk)
              if (co(idx) != 0) {
                val cb = br.bit()
                if (cb < 0) return false
                if (cb == 1 && (co(idx) & p1) == 0)
                  co(idx) += (if (co(idx) >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newval != 0) co(idx) = newval
                  placed = true
                } else r -= 1
              }
              kk += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run: still emit correction bits for the
        // remaining nonzero coefficients of this block
        while (kk <= se) {
          val idx = base + Zigzag(kk)
          if (co(idx) != 0) {
            val cb = br.bit()
            if (cb < 0) return false
            if (cb == 1 && (co(idx) & p1) == 0)
              co(idx) += (if (co(idx) >= 0) p1 else m1)
          }
          kk += 1
        }
        eobrun -= 1
      }
      true
    }
    def decodeBlock(ci: Int, blockIdx: Int): Boolean =
      if (isDc) { if (ah == 0) dcFirst(ci, blockIdx) else dcRefine(ci, blockIdx) }
      else { if (ah == 0) acFirst(ci, blockIdx) else acRefine(ci, blockIdx) }

    // ---- traversal ---------------------------------------------------
    var unit = 0
    var nUnits = 0
    def maybeRestart(): Boolean = {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        if (!br.restart()) return false
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      true
    }
    if (isDc && ns > 1) {
      // interleaved DC scan: MCU walk with sampling factors
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      nUnits = mcusX * mcusY
      while (unit < nUnits) {
        if (!maybeRestart()) return None
        val mcuX = unit % mcusX
        val mcuY = unit / mcusX
        var si = 0
        while (si < ns) {
          val ci = scanIdx(si)
          val comp = comps(ci)
          var byy = 0
          while (byy < comp.vSamp) {
            var bxx = 0
            while (bxx < comp.hSamp) {
              val blockIdx = (mcuY * comp.vSamp + byy) * bw(ci) +
                (mcuX * comp.hSamp + bxx)
              if (!decodeBlock(ci, blockIdx)) return None
              bxx += 1
            }
            byy += 1
          }
          si += 1
        }
        unit += 1
      }
    } else {
      // non-interleaved: raster walk over the component's OWN block
      // grid (ceil of its scaled dimensions — the interleaved grid's
      // edge padding blocks are NOT coded, T.81 A.2.2)
      val ci = scanIdx(0)
      val comp = comps(ci)
      val compW = (width * comp.hSamp + hMax - 1) / hMax
      val compH = (height * comp.vSamp + vMax - 1) / vMax
      val nbx = (compW + 7) / 8
      val nby = (compH + 7) / 8
      nUnits = nbx * nby
      while (unit < nUnits) {
        if (!maybeRestart()) return None
        val bx = unit % nbx
        val by = unit / nbx
        if (!decodeBlock(ci, by * bw(ci) + bx)) return None
        unit += 1
      }
    }
    // skip to the next marker (pad bits, stuffing and RSTn are part of
    // the entropy stream; anything else is the next segment)
    var p = br.pos
    while (p + 1 < b.length) {
      if ((b(p) & 0xFF) == 0xFF) {
        val m = b(p + 1) & 0xFF
        if (m == 0x00) p += 2
        else if (m >= 0xD0 && m <= 0xD7) p += 2
        else if (m == 0xFF) p += 1
        else return Some(p)
      } else p += 1
    }
    None
  }

  /** Dequantize + IDCT the accumulated progressive coefficients and
    * assemble pixels (same plane layout + upsampling as the baseline
    * path). */
  private def finalizeProgressive(width: Int, height: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      coefs: Array[Array[Int]], bw: Array[Int], bh: Array[Int],
      hMax: Int, vMax: Int): Option[Pixels] = {
    if (comps == null || coefs == null) return None
    val n = comps.length
    for (c <- comps)
      if (c.quantId > 3 || quant(c.quantId) == null) return None
    val planes = Array.tabulate(n)(c => new Array[Byte](bw(c) * bh(c) * 64))
    val deq = new Array[Int](64)
    val block = new Array[Double](64)
    val idctTmp = new Array[Double](64)
    var c = 0
    while (c < n) {
      val q = quant(comps(c).quantId)
      val co = coefs(c)
      val nBlocks = bw(c) * bh(c)
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        // progressive buffers store coefficients in BLOCK order but
        // quant tables index in zigzag order: map through Zigzag
        var z = 0
        while (z < 64) { deq(Zigzag(z)) = co(base + Zigzag(z)) * q(z); z += 1 }
        idct(deq, block, idctTmp)
        var p = 0
        while (p < 64) {
          val v = math.round(block(p) + 128.0).toInt
          planes(c)(base + p) =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          p += 1
        }
        bi += 1
      }
      c += 1
    }
    def sampleAt(ci: Int, x: Int, y: Int): Int = {
      val comp = comps(ci)
      val sx = x * comp.hSamp / hMax
      val sy = y * comp.vSamp / vMax
      val blockIdx = (sy >> 3) * bw(ci) + (sx >> 3)
      planes(ci)(blockIdx * 64 + ((sy & 7) << 3) + (sx & 7)) & 0xFF
    }
    val out = new Array[Byte](width * height * n)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * n
        if (n == 1) out(o) = sampleAt(0, x, y).toByte
        else {
          val yy = sampleAt(0, x, y)
          val cb = sampleAt(1, x, y) - 128
          val cr = sampleAt(2, x, y) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some(Pixels(width, height, n, out))
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, width: Int,
      height: Int, comps: Array[Component], quant: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff],
      restartInterval: Int): Option[Pixels] = {
    val n = comps.length
    for (c <- comps) {
      if (c.quantId > 3 || quant(c.quantId) == null) return None
      // table ids come from the 4-bit SOS nibbles (0..15); only 0..3
      // index the table arrays — range-check BEFORE indexing
      if (c.dcId > 3 || c.acId > 3) return None
      if (dcT(c.dcId) == null || acT(c.acId) == null) return None
    }
    // generalized interleaved-MCU geometry (T.81 A.2.3): an MCU spans
    // 8*Hmax x 8*Vmax pixels and carries hSamp x vSamp blocks per
    // component; each component keeps its own block-grid plane
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val bw = comps.map(c => mcusX * c.hSamp)
    val bh = comps.map(c => mcusY * c.vSamp)
    var planeBytes = 0L
    var ci = 0
    while (ci < n) { planeBytes += bw(ci).toLong * bh(ci) * 64; ci += 1 }
    if (planeBytes > (128L << 20)) return None
    // byte planes: values are clamped to 0..255 anyway, and Int planes
    // would quadruple the decoded-size cap the other decoders enforce
    val planes = Array.tabulate(n)(c => new Array[Byte](bw(c) * bh(c) * 64))
    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](n)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val idctTmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      var c = 0
      while (c < n) {
        val comp = comps(c)
        val q = quant(comp.quantId)
        var byy = 0
        while (byy < comp.vSamp) {
          var bxx = 0
          while (bxx < comp.hSamp) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val s = dcT(comp.dcId).decode(br)
            if (s < 0 || s > 11) return None
            val diffBits = if (s == 0) 0 else br.bits(s)
            if (diffBits < 0) return None
            pred(c) += extend(diffBits, s)
            // T.81 F.1.1.5.1: for 8-bit precision the reconstructed DC
            // lives in the 12-bit range — a stream that drives |pred|
            // past 2048 is malformed, and an unbounded Int accumulator
            // would otherwise overflow into silent garbage output
            if (pred(c) < -2048 || pred(c) > 2048) return None
            coef(0) = pred(c) * q(0)
            // AC
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = acT(comp.acId).decode(br)
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return None
                val vb = br.bits(size)
                if (vb < 0) return None
                coef(Zigzag(k)) = extend(vb, size) * q(k)
                k += 1
              }
            }
            // IDCT (separable, double precision)
            idct(coef, block, idctTmp)
            val blockIdx = (mcuY * comp.vSamp + byy) * bw(c) +
              (mcuX * comp.hSamp + bxx)
            val base = blockIdx * 64
            var p = 0
            while (p < 64) {
              val v = math.round(block(p) + 128.0).toInt
              planes(c)(base + p) =
                (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              p += 1
            }
            bxx += 1
          }
          byy += 1
        }
        c += 1
      }
      mcu += 1
    }
    // assemble: per-component block planes -> row-major interleaved
    // pixels; subsampled components upsample by sample replication
    // (nearest), the standard box reconstruction
    def sampleAt(c: Int, x: Int, y: Int): Int = {
      val comp = comps(c)
      val sx = x * comp.hSamp / hMax
      val sy = y * comp.vSamp / vMax
      val blockIdx = (sy >> 3) * bw(c) + (sx >> 3)
      planes(c)(blockIdx * 64 + ((sy & 7) << 3) + (sx & 7)) & 0xFF
    }
    val out = new Array[Byte](width * height * n)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * n
        if (n == 1) {
          out(o) = sampleAt(0, x, y).toByte
        } else {
          val yy = sampleAt(0, x, y)
          val cb = sampleAt(1, x, y) - 128
          val cr = sampleAt(2, x, y) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some(Pixels(width, height, n, out))
  }

  /** 2-D IDCT via the separable definition (T.81 A.3.3). `tmp` is a
    * caller-owned 64-slot scratch buffer (hoisted out of the per-block
    * hot loop). */
  private def idct(coef: Array[Int], out: Array[Double],
      tmp: Array[Double]): Unit = {
    // rows then columns; 0.5 factor per 1-D pass (total 1/4)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cos(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cos(v)(yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = 0.5 * s
        yy += 1
      }
      x += 1
    }
  }

  // ----------------------------------------------------------- encoder

  /** Block-constant fixture JPEG: every 8x8 block of the Y plane holds
    * one value — block (bx, by) has
    * `v = ((by * blocksX + bx) * 31 + seed) mod 256` — chroma is
    * neutral (128), so the decoded RGB equals (v, v, v) EXACTLY: with
    * the DC quantizer at 8, the quantized DC is v-128 with zero
    * rounding loss, every AC coefficient is genuinely zero, and the
    * neutral chroma makes the color transform the identity. Dimensions
    * must be multiples of 8 (fixture-grade; the decoder itself clips
    * partial edge blocks). */
  def jpegPixelBytes(width: Int, height: Int, channels: Int,
      seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "fixture dimensions must be positive multiples of 8")
    require(channels == 1 || channels == 3, s"channels must be 1 or 3")
    require(width.toLong * height * channels <= (64L << 20),
      s"pixel fixture ${width}x$height exceeds the 64 MiB cap")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    // DQT: table 0, DC quantizer 8 (lossless for our DC values), AC 16
    m(0xDB); be16(2 + 1 + 64); out.write(0x00)
    out.write(8)
    var k = 1
    while (k < 64) { out.write(16); k += 1 }
    // SOF0
    m(0xC0); be16(8 + 3 * channels)
    out.write(8); be16(height); be16(width); out.write(channels)
    var c = 0
    while (c < channels) {
      out.write(c + 1) // component id
      out.write(0x11)  // 1x1 sampling
      out.write(0)     // quant table 0
      c += 1
    }
    // DHT: DC table 0 = categories 0..11 as 4-bit codes; AC table 0 =
    // the single EOB symbol as a 1-bit code
    m(0xC4); be16(2 + (17 + 12) + (17 + 1))
    out.write(0x00) // DC, id 0
    val dcCounts = new Array[Int](16); dcCounts(3) = 12 // twelve 4-bit codes
    dcCounts.foreach(out.write)
    (0 to 11).foreach(out.write)
    out.write(0x10) // AC, id 0
    val acCounts = new Array[Int](16); acCounts(0) = 1 // one 1-bit code
    acCounts.foreach(out.write)
    out.write(0x00) // EOB
    // SOS
    m(0xDA); be16(6 + 2 * channels)
    out.write(channels)
    c = 0
    while (c < channels) { out.write(c + 1); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0) // spectral selection
    // entropy-coded data: per MCU, per component: DC category+bits, EOB
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    def putBits(v: Int, n2: Int): Unit = {
      var i = n2 - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          val byte = (acc & 0xFF).toInt
          bits.write(byte)
          if (byte == 0xFF) bits.write(0x00) // byte stuffing
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a > 0) { a >>= 1; s += 1 }
      s
    }
    val blocksX = width / 8
    val blocksY = height / 8
    val pred = new Array[Int](channels)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        val v = (((by * blocksX + bx) * 31L + seed) & 0xFF).toInt
        c = 0
        while (c < channels) {
          val dc = (if (c == 0) v else 128) - 128 // chroma neutral
          val diff = dc - pred(c)
          pred(c) = dc
          val s = category(diff)
          putBits(s, 4) // DC category (4-bit code = its own value)
          if (s > 0) {
            val db = if (diff < 0) diff + (1 << s) - 1 else diff
            putBits(db, s)
          }
          putBits(0, 1) // EOB (1-bit code 0)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    if (nAcc > 0) { // pad final byte with 1s (spec F.1.2.3)
      val pad = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      val byte = (pad & 0xFF).toInt
      bits.write(byte)
      if (byte == 0xFF) bits.write(0x00)
    }
    val stream = bits.toByteArray
    out.write(stream, 0, stream.length)
    m(0xD9) // EOI
    out.toByteArray
  }

  /** COMPLETE 4:2:0 SUBSAMPLED color JPEG: Y at 2x2 sampling, Cb/Cr at
    * 1x1, so each interleaved MCU carries 4 luma + 2 chroma blocks over
    * a 16x16 pixel macroblock — the layout virtually every camera/web
    * encoder emits. Each 16x16 macroblock is CONSTANT (value
    * `(tile*31 + seed) mod 256`, neutral chroma), so all four luma
    * blocks are DC-only, the chroma DCs are zero, and with the DC
    * quantizer at 8 the decode is LOSSLESS: decoded RGB = (v, v, v)
    * exactly, every pixel oracle-predictable. Dimensions must be
    * multiples of 16. */
  def jpegPixelBytes420(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
      "fixture dimensions must be positive multiples of 16")
    require(width.toLong * height * 3 <= (64L << 20),
      s"pixel fixture ${width}x$height exceeds the 64 MiB cap")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xDB); be16(2 + 1 + 64); out.write(0x00)
    out.write(8)
    var k = 1
    while (k < 64) { out.write(16); k += 1 }
    // SOF0: Y 2x2, Cb 1x1, Cr 1x1 — all on quant table 0
    m(0xC0); be16(8 + 9)
    out.write(8); be16(height); be16(width); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    // DHT: same fixture tables as the 4:4:4 encoder
    m(0xC4); be16(2 + (17 + 12) + (17 + 1))
    out.write(0x00)
    val dcCounts = new Array[Int](16); dcCounts(3) = 12
    dcCounts.foreach(out.write)
    (0 to 11).foreach(out.write)
    out.write(0x10)
    val acCounts = new Array[Int](16); acCounts(0) = 1
    acCounts.foreach(out.write)
    out.write(0x00)
    // SOS
    m(0xDA); be16(6 + 6)
    out.write(3)
    (1 to 3).foreach { id => out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    def putBits(v: Int, n2: Int): Unit = {
      var i = n2 - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          val byte = (acc & 0xFF).toInt
          bits.write(byte)
          if (byte == 0xFF) bits.write(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a > 0) { a >>= 1; s += 1 }
      s
    }
    def putDc(diff: Int): Unit = {
      val s = category(diff)
      putBits(s, 4)
      if (s > 0) {
        val db = if (diff < 0) diff + (1 << s) - 1 else diff
        putBits(db, s)
      }
      putBits(0, 1) // EOB
    }
    val mcusX = width / 16
    val mcusY = height / 16
    val pred = new Array[Int](3)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        val v = (((my * mcusX + mx) * 31L + seed) & 0xFF).toInt
        // four Y blocks, all the same constant tile value
        var blk = 0
        while (blk < 4) {
          val dc = v - 128
          putDc(dc - pred(0)); pred(0) = dc
          blk += 1
        }
        // Cb then Cr, neutral
        putDc(0 - pred(1)); pred(1) = 0
        putDc(0 - pred(2)); pred(2) = 0
        mx += 1
      }
      my += 1
    }
    if (nAcc > 0) {
      val pad = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      val byte = (pad & 0xFF).toInt
      bits.write(byte)
      if (byte == 0xFF) bits.write(0x00)
    }
    val stream = bits.toByteArray
    out.write(stream, 0, stream.length)
    m(0xD9) // EOI
    out.toByteArray
  }

  /** COMPLETE PROGRESSIVE (SOF2) JPEG: the same block-constant pattern
    * as [[jpegPixelBytes]], but spread across 2 + channels scans the
    * way real progressive encoders stage them —
    *
    *   1. interleaved DC first scan at successive-approximation
    *      Al=1 (each block's DC arrives with its low bit missing),
    *   2. a DC refinement scan (Ah=1, Al=0) delivering that low bit,
    *   3. one non-interleaved AC first scan per component (Ss=1,
    *      Se=63) whose entire payload is a single EOB run covering
    *      every block (all ACs are genuinely zero).
    *
    * Because the DC quantizer is 8 and the refinement restores the
    * exact low bit, decode is LOSSLESS: pixel (x, y) = the block
    * constant `(block*31 + seed) mod 256` on every channel, so a SQL
    * oracle predicts every byte while the decoder exercises dcFirst,
    * dcRefine, acFirst EOB-run accounting and the multi-scan
    * coefficient accumulation. Dimensions must be multiples of 8. */
  def jpegPixelBytesProg(width: Int, height: Int, channels: Int,
      seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "fixture dimensions must be positive multiples of 8")
    require(channels == 1 || channels == 3, s"channels must be 1 or 3")
    require(width.toLong * height * channels <= (64L << 20),
      s"pixel fixture ${width}x$height exceeds the 64 MiB cap")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xDB); be16(2 + 1 + 64); out.write(0x00)
    out.write(8)
    var k = 1
    while (k < 64) { out.write(16); k += 1 }
    // SOF2 (progressive), all components 1x1 on quant table 0
    m(0xC2); be16(8 + 3 * channels)
    out.write(8); be16(height); be16(width); out.write(channels)
    var c = 0
    while (c < channels) {
      out.write(c + 1); out.write(0x11); out.write(0)
      c += 1
    }
    // DHT: DC table 0 = categories 0..11 as 4-bit codes; AC table 0 =
    // the fifteen EOBRUN symbols EOB0..EOB14 (r<<4) as 4-bit codes,
    // canonical order => symbol r<<4 gets code value r at length 4
    m(0xC4); be16(2 + (17 + 12) + (17 + 15))
    out.write(0x00)
    val dcCounts = new Array[Int](16); dcCounts(3) = 12
    dcCounts.foreach(out.write)
    (0 to 11).foreach(out.write)
    out.write(0x10)
    val acCounts = new Array[Int](16); acCounts(3) = 15
    acCounts.foreach(out.write)
    (0 to 14).foreach(r => out.write(r << 4))

    // per-scan entropy buffer with byte stuffing + 1-padding
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    def putBits(v: Int, n2: Int): Unit = {
      var i = n2 - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          val byte = (acc & 0xFF).toInt
          bits.write(byte)
          if (byte == 0xFF) bits.write(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def flushScan(): Unit = {
      if (nAcc > 0) {
        val pad = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
        val byte = (pad & 0xFF).toInt
        bits.write(byte)
        if (byte == 0xFF) bits.write(0x00)
        acc = 0; nAcc = 0
      }
      val stream = bits.toByteArray
      out.write(stream, 0, stream.length)
      bits.reset()
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a > 0) { a >>= 1; s += 1 }
      s
    }
    def sosHeader(compIds: Seq[Int], ss: Int, se: Int, ah: Int,
        al: Int): Unit = {
      m(0xDA); be16(6 + 2 * compIds.length)
      out.write(compIds.length)
      compIds.foreach { id => out.write(id); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    val blocksX = width / 8
    val blocksY = height / 8
    val nBlocks = blocksX * blocksY
    def dcq(bx: Int, by: Int, comp: Int): Int =
      if (comp == 0) (((by * blocksX + bx) * 31L + seed) & 0xFF).toInt - 128
      else 0 // neutral chroma

    // ---- scan 1: DC first, Al=1 (values arrive >> 1, diff-coded) ----
    sosHeader((1 to channels), ss = 0, se = 0, ah = 0, al = 1)
    val pred = new Array[Int](channels)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        c = 0
        while (c < channels) {
          val v1 = dcq(bx, by, c) >> 1 // arithmetic: T.81 G.1.2.1
          val diff = v1 - pred(c)
          pred(c) = v1
          val s = category(diff)
          putBits(s, 4)
          if (s > 0) {
            val db = if (diff < 0) diff + (1 << s) - 1 else diff
            putBits(db, s)
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    flushScan()
    // ---- scan 2: DC refinement, Ah=1 Al=0 (the missing low bit) ----
    sosHeader((1 to channels), ss = 0, se = 0, ah = 1, al = 0)
    by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        c = 0
        while (c < channels) {
          putBits(dcq(bx, by, c) & 1, 1)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    flushScan()
    // ---- scans 3..: per-component AC first scan, one EOB run -------
    c = 0
    while (c < channels) {
      sosHeader(Seq(c + 1), ss = 1, se = 63, ah = 0, al = 0)
      // single EOBn covering all nBlocks blocks: run = 2^r - 1 + extra
      // ends the current block plus `run` more
      var r = 0
      while ((1 << (r + 1)) <= nBlocks) r += 1
      putBits(r, 4) // AC code for symbol r<<4
      if (r > 0) putBits(nBlocks - (1 << r), r)
      flushScan()
      c += 1
    }
    m(0xD9) // EOI
    out.toByteArray
  }
}
