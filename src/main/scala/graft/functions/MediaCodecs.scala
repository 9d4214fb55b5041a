package graft.functions

/** Pure-JVM decoders for the library-free public media formats: PPM
  * (netpbm P6), BMP (Windows BITMAPINFOHEADER, 24bpp uncompressed),
  * PNG (full zlib + scanline filters — zlib ships with the JDK, so
  * "compressed" does not mean "needs a codec library" here) and WAV
  * (RIFF PCM 16-bit). These are REAL decode kernels — byte-exact per
  * their public specs — so the multimodal pipeline's decode stage is
  * genuine for any corpus in these formats; JPEG/MP3-class formats
  * still need an external codec library and keep the documented
  * stand-in path in [[Multimodal]].
  *
  * Everything here is per-row/per-batch kernel code by design (the
  * mapPartitions contract): no Spark imports, no allocation beyond the
  * output buffers, total functions that throw only on corrupt input.
  */
object MediaCodecs {

  /** Row-major interleaved RGB, 8 bits per channel. */
  final case class Raster(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"raster buffer ${rgb.length} != $width*$height*3")
  }

  /** Interleaved signed 16-bit PCM. */
  final case class Pcm(channels: Int, sampleRate: Int,
                       samples: Array[Short])

  // little-endian readers (BMP/WAV are LE formats)
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Magic-byte sniff, JVM side — the kernel-dispatch twin of
    * [[Multimodal.mimeSniff]]'s Column spelling. */
  def sniff(b: Array[Byte]): String = {
    def has(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(i => (b(off + i) & 0xff) == s.charAt(i).toInt)
    if (b == null || b.length < 4) "application/octet-stream"
    else if (b.length >= 8 && isPng(b)) "image/png"
    else if (has(0, "P6")) "image/x-portable-pixmap"
    else if (has(0, "BM")) "image/bmp"
    else if (has(0, "RIFF") && has(8, "WAVE")) "audio/wav"
    else "application/octet-stream"
  }

  /** netpbm P6: `P6 <ws> width <ws> height <ws> maxval <single-ws> raw
    * RGB`. `#` comments allowed inside the header whitespace. Only
    * maxval 255 (the 1-byte-per-channel case) is supported. */
  def decodePpm(b: Array[Byte]): Raster = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 ppm")
    var pos = 2
    def token(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < b.length && {
        val c = b(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      var v = 0
      require(pos < b.length && b(pos).toChar.isDigit, "bad ppm header")
      while (pos < b.length && b(pos).toChar.isDigit) {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = token(); val h = token(); val maxval = token()
    require(maxval == 255, s"ppm maxval $maxval unsupported (need 255)")
    pos += 1 // exactly ONE whitespace byte separates header from raster
    val need = w * h * 3
    require(b.length - pos >= need, "truncated ppm raster")
    Raster(w, h, java.util.Arrays.copyOfRange(b, pos, pos + need))
  }

  /** Encode a raster back to P6 (the library-free interchange format —
    * what [[resizeNearest]] results serialize as). */
  def encodePpm(r: Raster): Array[Byte] = {
    val header = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.rgb, 0, out, header.length, r.rgb.length)
    out
  }

  /** BMP, BITMAPINFOHEADER (or larger) 24bpp BI_RGB: pixel rows are
    * BGR, padded to 4 bytes, bottom-up unless height is negative. */
  def decodeBmp(b: Array[Byte]): Raster = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a bmp")
    val dataOffset = i32(b, 10)
    val headerSize = i32(b, 14)
    require(headerSize >= 40, s"bmp header size $headerSize unsupported")
    val w = i32(b, 18)
    val hRaw = i32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    require(bpp == 24 && compression == 0,
      s"bmp bpp=$bpp compression=$compression unsupported (need 24/BI_RGB)")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    require(b.length >= dataOffset + rowBytes * h, "truncated bmp raster")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2)     // R (file is BGR)
        rgb(d + 1) = b(s + 1) // G
        rgb(d + 2) = b(s)     // B
        x += 1
      }
      y += 1
    }
    Raster(w, h, rgb)
  }

  // ------------------------------------------------------------------ PNG
  // (W3C PNG spec / RFC 2083: zlib IS in the JDK, so PNG is NOT a
  // codec-library format — full real decode, all five filter types)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i))

  /** PNG decode: 8-bit depth, colorType 0 (gray), 2 (RGB) or 6 (RGBA,
    * alpha dropped), non-interlaced. Walks the chunk list (length +
    * type + data + CRC), inflates the concatenated IDAT zlib stream,
    * then unfilters every scanline — None/Sub/Up/Average/Paeth per the
    * spec's byte-exact recurrences. CRCs are VERIFIED (a flipped bit
    * in transit must fail decode, not produce silent wrong pixels). */
  def decodePng(b: Array[Byte]): Raster = {
    require(isPng(b), "not a png")
    var pos = 8
    var w = 0; var h = 0; var colorType = -1; var bpp = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= b.length) {
      val len = be32(b, pos)
      require(len >= 0 && pos + 12L + len <= b.length,
        s"png chunk at $pos overruns payload")
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + len)
      require(crc.getValue == (be32(b, pos + 8 + len) & 0xffffffffL),
        s"png $ctype chunk crc mismatch")
      ctype match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          val depth = b(pos + 16) & 0xff
          colorType = b(pos + 17) & 0xff
          val (comp, filt, inter) =
            (b(pos + 18) & 0xff, b(pos + 19) & 0xff, b(pos + 20) & 0xff)
          require(depth == 8, s"png bit depth $depth unsupported (need 8)")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"png colorType $colorType unsupported (need gray/RGB/RGBA)")
          require(comp == 0 && filt == 0 && inter == 0,
            "png compression/filter/interlace method unsupported")
          bpp = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
        case "IDAT" => idat.write(b, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(sawEnd && w > 0 && h > 0, "truncated png (no IEND/IHDR)")
    // inflate the scanline stream: h rows of (1 filter byte + w*bpp)
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (!inf.finished() && off < raw.length) {
      val n = inf.inflate(raw, off, raw.length - off)
      require(n > 0 || inf.finished() || !inf.needsInput(),
        "png idat stream truncated")
      off += n
    }
    inf.end()
    require(off == raw.length, s"png raster $off != expected ${raw.length}")
    // unfilter in place into `img` (per-row filter byte dispatch)
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(rowIn + i) & 0xff
        val a = if (i >= bpp) img(rowOut + i - bpp) & 0xff else 0 // left
        val up = if (y > 0) img(rowOut - stride + i) & 0xff else 0 // above
        val c = if (y > 0 && i >= bpp) img(rowOut - stride + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case 4 => // Paeth predictor, spec-exact tie order a, b, c
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case other =>
            throw new IllegalArgumentException(s"png filter $other invalid")
        }
        img(rowOut + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    // normalize to interleaved RGB
    val rgb = colorType match {
      case 2 => img
      case 0 =>
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          out(i * 3) = img(i); out(i * 3 + 1) = img(i); out(i * 3 + 2) = img(i)
          i += 1
        }
        out
      case _ => // RGBA: alpha dropped
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          out(i * 3) = img(i * 4); out(i * 3 + 1) = img(i * 4 + 1)
          out(i * 3 + 2) = img(i * 4 + 2)
          i += 1
        }
        out
    }
    Raster(w, h, rgb)
  }

  /** PNG encode (colorType 2, 8-bit, non-interlaced). `filterType`
    * applies one spec filter to every scanline (-1 = cycle 0..4 by
    * row, exercising every unfilter recurrence on decode). Output is
    * byte-valid PNG: real CRCs, one zlib IDAT. */
  def encodePng(r: Raster, filterType: Int = -1): Array[Byte] = {
    val stride = r.width * 3
    val raw = new Array[Byte](r.height * (1 + stride))
    var y = 0
    while (y < r.height) {
      val ft = if (filterType >= 0) filterType else y % 5
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = r.rgb(y * stride + i) & 0xff
        val a = if (i >= 3) r.rgb(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) r.rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) r.rgb((y - 1) * stride + i - 3) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(y * (1 + stride) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      def put32(o: Int, v: Long): Unit = {
        out(o) = ((v >> 24) & 0xff).toByte; out(o + 1) = ((v >> 16) & 0xff).toByte
        out(o + 2) = ((v >> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
      }
      put32(0, data.length.toLong)
      System.arraycopy(ctype.getBytes("US-ASCII"), 0, out, 4, 4)
      System.arraycopy(data, 0, out, 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      put32(8 + data.length, crc.getValue)
      out
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((r.width >> 24) & 0xff).toByte; ihdr(1) = ((r.width >> 16) & 0xff).toByte
    ihdr(2) = ((r.width >> 8) & 0xff).toByte; ihdr(3) = (r.width & 0xff).toByte
    ihdr(4) = ((r.height >> 24) & 0xff).toByte; ihdr(5) = ((r.height >> 16) & 0xff).toByte
    ihdr(6) = ((r.height >> 8) & 0xff).toByte; ihdr(7) = (r.height & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    val bos = new java.io.ByteArrayOutputStream()
    PngSig.foreach(bos.write)
    bos.write(chunk("IHDR", ihdr))
    bos.write(chunk("IDAT", zbuf.toByteArray))
    bos.write(chunk("IEND", Array.emptyByteArray))
    bos.toByteArray
  }

  /** Dispatch PPM/BMP/PNG on magic bytes. */
  def decodeImage(b: Array[Byte]): Raster = sniff(b) match {
    case "image/x-portable-pixmap" => decodePpm(b)
    case "image/bmp"               => decodeBmp(b)
    case "image/png"               => decodePng(b)
    case m => throw new IllegalArgumentException(
      s"no library-free decoder for $m")
  }

  /** Nearest-neighbor resize — the standard integer mapping
    * `src = floor(dst * srcDim / dstDim)`, deterministic and
    * engine-reproducible (no filtering kernel to disagree over). */
  def resizeNearest(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, "resize target must be positive")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * r.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * r.width / w2).toInt
        val s = (sy * r.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = r.rgb(s); out(d + 1) = r.rgb(s + 1); out(d + 2) = r.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, out)
  }

  /** RIFF/WAVE with a PCM (audioFormat=1) fmt chunk and 16-bit
    * samples. Walks the chunk list (fmt may be followed by LIST/fact
    * before data), little-endian throughout. */
  def decodeWav(b: Array[Byte]): Pcm = {
    require(sniff(b) == "audio/wav", "not a riff/wave")
    var pos = 12
    var channels = -1; var rate = -1; var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = i32(b, pos + 4)
      // a corrupt/malicious negative size would walk pos backward (or
      // hold it still) and spin this loop forever — callers' try/NonFatal
      // routes a throw to quarantine but cannot contain a hang. The
      // upper bound must hold BEFORE any `body + size` arithmetic: near
      // Int.MaxValue that sum wraps negative, which would both defeat
      // the truncation require and size a ~2 GB sample array whose
      // OutOfMemoryError (not NonFatal) escapes the quarantine path.
      require(size >= 0 && size <= b.length,
        s"wav chunk '$id' size $size outside payload (${b.length} bytes)")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16 && body + 16 <= b.length, "short fmt chunk")
          val fmt = u16(b, body)
          require(fmt == 1, s"wav audioFormat $fmt unsupported (need PCM)")
          channels = u16(b, body + 2)
          rate = i32(b, body + 4)
          bits = u16(b, body + 14)
          require(bits == 16, s"wav bits=$bits unsupported (need 16)")
        case "data" =>
          require(channels > 0, "data chunk before fmt")
          require(body.toLong + size <= b.length, "truncated data chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((b(body + 2 * i) & 0xff) |
              (b(body + 2 * i + 1) << 8)).toShort
            i += 1
          }
          samples = out
        case _ => // LIST/fact/cue…: skip
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "wav has no data chunk")
    Pcm(channels, rate, samples)
  }
}
