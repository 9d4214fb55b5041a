package graft.functions

/** Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) — pure-JVM codec.
  *
  * The DECODER is general for the baseline feature set: marker parse
  * (SOI/APPn/COM/DQT/DHT/SOF0/SOS/EOI), canonical Huffman tables built
  * FROM THE STREAM's DHT segments (not hard-wired), byte-stuffing-aware
  * bit reader, DC-prediction + magnitude-category extend, AC
  * run/size with EOB/ZRL, zigzag, dequantization, naive
  * double-precision IDCT (fixed summation order — deterministic), and
  * JFIF YCbCr→RGB for 3-component scans. Constraints: 8-bit precision,
  * 1 or 3 components, 1x1 sampling (no chroma subsampling), no
  * progressive, no restart markers.
  *
  * The ENCODER emits spec-valid baseline streams with self-describing
  * canonical Huffman tables (4-bit DC categories, 9-bit AC symbols —
  * both leave the all-ones code unused per Annex C) and a flat
  * quantization table. With quant=8 a CONSTANT 8x8 block round-trips
  * BIT-EXACTLY (DC = 8·(v-128) quantizes losslessly, every AC
  * coefficient is zero), which is what lets a decode be ORACLE-GATED:
  * the oracle predicts exact pixel sums without running any codec.
  */
object Jpeg {

  // cos((2x+1)·u·π/16) table — the same math.cos values the naive
  // loops would compute, cached once (they dominated encode cost:
  // multimodal_video 23.9s → the trig calls, not the arithmetic)
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  // zigzag scan order (spec Figure A.6)
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per spec
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  /** Canonical encoder tables: (code, length) per symbol. DC: 12
    * categories at 4 bits; AC: all 256 symbols at 9 bits. */
  private def canonicalCodes(nSymbols: Int, len: Int): Array[(Int, Int)] =
    Array.tabulate(nSymbols)(i => (i, len))

  private val DcLen = 4
  private val AcLen = 9

  private def dhtSegment(tableClass: Int, id: Int, nSymbols: Int,
                         len: Int): Array[Byte] = {
    val counts = new Array[Int](17)
    counts(len) = nSymbols
    val body = new java.io.ByteArrayOutputStream()
    body.write((tableClass << 4) | id)
    (1 to 16).foreach(l => body.write(counts(l)))
    (0 until nSymbols).foreach(body.write)
    val b = body.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xc4)
    seg.write(((b.length + 2) >> 8) & 0xff); seg.write((b.length + 2) & 0xff)
    seg.write(b)
    seg.toByteArray
  }

  private def category(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  private def fdctQuant(block: Array[Int], q: Int): Array[Int] = {
    // naive exact-order double FDCT, then round(F/q)
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            sum += (block(y * 8 + x) - 128) * Cos(x)(u) * Cos(y)(v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        out(v * 8 + u) = math.round(0.25 * cu * cv * sum / q).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  private def writeBlock(w: BitWriter, coefs: Array[Int], predDc: Int,
                         dc: Array[(Int, Int)], ac: Array[(Int, Int)]): Int = {
    // DC
    val diff = coefs(0) - predDc
    val t = category(diff)
    val (dcode, dlen) = dc(t)
    w.put(dcode, dlen)
    if (t > 0) {
      val bits = if (diff < 0) diff + (1 << t) - 1 else diff
      w.put(bits, t)
    }
    // AC in zigzag
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coefs(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = ac(0xf0); w.put(c, l); run -= 16 }
        val s = category(v)
        val (c, l) = ac((run << 4) | s)
        w.put(c, l)
        val bits = if (v < 0) v + (1 << s) - 1 else v
        w.put(bits, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = ac(0x00); w.put(c, l) } // EOB
    coefs(0)
  }

  /** Encode an 8-bit GRAYSCALE image (dims multiples of 8). */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
                 quant: Int = 8): Array[Byte] =
    encodeInternal(width, height, Array(gray), quant)

  /** Encode RGB via JFIF YCbCr (dims multiples of 8, 1x1 sampling). */
  def encodeRgb(r: MediaCodecs.Raster, quant: Int = 8): Array[Byte] = {
    val n = r.width * r.height
    val y = new Array[Byte](n); val cb = new Array[Byte](n)
    val cr = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val rr = r.rgb(i * 3) & 0xff; val gg = r.rgb(i * 3 + 1) & 0xff
      val bb = r.rgb(i * 3 + 2) & 0xff
      y(i) = clamp8(math.round(0.299 * rr + 0.587 * gg + 0.114 * bb).toInt)
      cb(i) = clamp8(math.round(128 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb).toInt)
      cr(i) = clamp8(math.round(128 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb).toInt)
      i += 1
    }
    encodeInternal(r.width, r.height, Array(y, cb, cr), quant)
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  private def encodeInternal(width: Int, height: Int,
                             planes: Array[Array[Byte]],
                             quant: Int): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0,
      "encoder requires dimensions in multiples of 8")
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 or 3 components")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      bos.write(((body.length + 2) >> 8) & 0xff)
      bos.write((body.length + 2) & 0xff)
      bos.write(body)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, flat
    val dqt = new Array[Byte](65)
    dqt(0) = 0
    (1 to 64).foreach(i => dqt(i) = quant.toByte)
    seg(0xdb, dqt)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(nc)
    (1 to nc).foreach { c => sof.write(c); sof.write(0x11); sof.write(0) }
    seg(0xc0, sof.toByteArray)
    // DHT: DC table 0 (12 syms @4 bits), AC table 0 (255 syms @9 bits
    // — a DHT count byte caps at 255; symbol 0xFF is (run 15, size 15),
    // which baseline never emits, so dropping it loses nothing)
    bos.write(dhtSegment(0, 0, 12, DcLen))
    bos.write(dhtSegment(1, 0, 255, AcLen))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nc)
    (1 to nc).foreach { c => sos.write(c); sos.write(0x00) }
    sos.write(0); sos.write(63); sos.write(0)
    seg(0xda, sos.toByteArray)
    // entropy-coded data: interleaved MCUs, 1x1 sampling
    val dc = canonicalCodes(12, DcLen)
    val ac = canonicalCodes(255, AcLen)
    val w = new BitWriter(bos)
    val pred = new Array[Int](nc)
    val bw = width / 8; val bh = height / 8
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var c = 0
        while (c < nc) {
          val block = new Array[Int](64)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              block(yy * 8 + xx) =
                planes(c)((by * 8 + yy) * width + bx * 8 + xx) & 0xff
              xx += 1
            }
            yy += 1
          }
          pred(c) = writeBlock(w, fdctQuant(block, quant), pred(c), dc, ac)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    w.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  // ------------------------------------------------------------- decode

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < b.length, "jpeg scan truncated")
        var byteV = b(pos) & 0xff; pos += 1
        if (byteV == 0xff) {
          require(pos < b.length, "jpeg scan truncated at ff")
          val m = b(pos) & 0xff
          require(m == 0x00, f"unexpected marker ff$m%02x inside scan")
          pos += 1
        }
        acc = byteV; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Canonical Huffman decode table from a DHT segment's bits/vals. */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per length (spec Annex F.2.2.3)
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l); k += counts(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit(); var l = 1
      while (maxCode(l) < 0 || code > maxCode(l)) {
        require(l < 16, "invalid huffman code")
        code = (code << 1) | r.bit(); l += 1
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a baseline JPEG to an RGB raster (grayscale replicates). */
  def decode(b: Array[Byte]): MediaCodecs.Raster = {
    require(b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a jpeg")
    var pos = 2
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4); val acTables = new Array[Huff](4)
    var width = 0; var height = 0; var nc = 0
    var compQt: Array[Int] = null
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var planes: Array[Array[Int]] = null
    var done = false
    while (!done) {
      require(pos + 2 <= b.length, "truncated jpeg")
      require((b(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = b(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => done = true
        case _ =>
          require(pos + 2 <= b.length, "truncated jpeg segment")
          val len = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
          val body = pos + 2
          val end = pos + len
          m match {
            case 0xdb => // DQT (possibly multiple tables)
              var p = body
              while (p < end) {
                val prec = (b(p) & 0xff) >> 4; val id = b(p) & 0x0f
                require(prec == 0, "16-bit quant tables unsupported")
                quantTables(id) = Array.tabulate(64)(i => b(p + 1 + i) & 0xff)
                p += 65
              }
            case 0xc4 => // DHT (possibly multiple tables)
              var p = body
              while (p < end) {
                val tc = (b(p) & 0xff) >> 4; val id = b(p) & 0x0f
                val counts = new Array[Int](17)
                var total = 0
                (1 to 16).foreach { l =>
                  counts(l) = b(p + l) & 0xff; total += counts(l)
                }
                val vals = Array.tabulate(total)(i => b(p + 17 + i) & 0xff)
                val h = new Huff(counts, vals)
                if (tc == 0) dcTables(id) = h else acTables(id) = h
                p += 17 + total
              }
            case 0xc0 => // SOF0 baseline
              require((b(body) & 0xff) == 8, "8-bit precision only")
              height = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
              width = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
              nc = b(body + 5) & 0xff
              require(nc == 1 || nc == 3, s"$nc components unsupported")
              compQt = new Array[Int](nc)
              (0 until nc).foreach { c =>
                val samp = b(body + 6 + c * 3 + 1) & 0xff
                require(samp == 0x11, "chroma subsampling unsupported")
                compQt(c) = b(body + 6 + c * 3 + 2) & 0xff
              }
            case 0xc1 | 0xc2 | 0xc3 =>
              throw new IllegalArgumentException(
                "only baseline sequential (SOF0) supported")
            case 0xda => // SOS, then entropy data
              val ns = b(body) & 0xff
              require(ns == nc, "partial scans unsupported")
              compDc = new Array[Int](nc); compAc = new Array[Int](nc)
              (0 until ns).foreach { c =>
                val tt = b(body + 1 + c * 2 + 1) & 0xff
                compDc(c) = tt >> 4; compAc(c) = tt & 0x0f
              }
              val r = new BitReader(b, end)
              planes = Array.fill(nc)(new Array[Int](width * height))
              val pred = new Array[Int](nc)
              val bw = width / 8; val bh = height / 8
              require(width % 8 == 0 && height % 8 == 0,
                "partial edge blocks unsupported (dims % 8 == 0)")
              val coefs = new Array[Int](64)
              var by = 0
              while (by < bh) {
                var bx = 0
                while (bx < bw) {
                  var c = 0
                  while (c < nc) {
                    java.util.Arrays.fill(coefs, 0)
                    val qt = quantTables(compQt(c))
                    require(qt != null, "missing quant table")
                    // DC
                    val t = dcTables(compDc(c)).decode(r)
                    pred(c) += extend(r.bits(t), t)
                    coefs(0) = pred(c) * qt(0)
                    // AC
                    var k = 1
                    while (k < 64) {
                      val rs = acTables(compAc(c)).decode(r)
                      if (rs == 0x00) k = 64 // EOB
                      else if (rs == 0xf0) k += 16 // ZRL
                      else {
                        k += rs >> 4
                        require(k < 64, "AC run overflow")
                        val s = rs & 0x0f
                        coefs(Zigzag(k)) = extend(r.bits(s), s) * qt(Zigzag(k))
                        k += 1
                      }
                    }
                    idctInto(coefs, planes(c), width, bx, by)
                    c += 1
                  }
                  bx += 1
                }
                by += 1
              }
              pos = r.pos
              // skip to the EOI marker (ignore trailing pad bits)
              while (pos + 1 < b.length &&
                !((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) != 0x00))
                pos += 1
            case _ => () // APPn / COM skipped
          }
          if (m != 0xda) pos = end
      }
    }
    require(planes != null, "jpeg has no scan")
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    while (i < width * height) {
      if (nc == 1) {
        val v = clampI(planes(0)(i))
        rgb(i * 3) = v.toByte; rgb(i * 3 + 1) = v.toByte
        rgb(i * 3 + 2) = v.toByte
      } else {
        val y = planes(0)(i); val cb = planes(1)(i) - 128
        val cr = planes(2)(i) - 128
        rgb(i * 3) = clampI(math.round(y + 1.402 * cr).toInt).toByte
        rgb(i * 3 + 1) = clampI(
          math.round(y - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        rgb(i * 3 + 2) = clampI(math.round(y + 1.772 * cb).toInt).toByte
      }
      i += 1
    }
    MediaCodecs.Raster(width, height, rgb)
  }

  private def clampI(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def idctInto(coefs: Array[Int], plane: Array[Int], width: Int,
                       bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            sum += cu * cv * coefs(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
            v += 1
          }
          u += 1
        }
        plane((by * 8 + y) * width + bx * 8 + x) =
          clampI(math.round(0.25 * sum + 128).toInt)
        x += 1
      }
      y += 1
    }
  }
}
