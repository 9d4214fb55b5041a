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
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
             (b(2) & 0xff) == 0xff) "image/jpeg"
    else if (has(0, "GIF8")) "image/gif"
    else if (has(0, "P6")) "image/x-portable-pixmap"
    else if (has(0, "BM")) "image/bmp"
    else if (has(0, "RIFF") && has(8, "WAVE")) "audio/wav"
    else if (has(0, "RIFF") && has(8, "AVI ")) "video/avi"
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

  // ------------------------------------------------------------------ GIF
  // (GIF87a spec, public: LZW is fully documented and pure-JVM)

  /** GIF decode: single non-interlaced image, global or local color
    * table, REAL variable-width LZW decompression (dictionary build,
    * width growth 3→12 bits, clear-code resets, the deferred-clear
    * 4095 cap). Extensions are skipped per the block grammar. */
  def decodeGif(b: Array[Byte]): Raster = {
    require(b.length >= 13 &&
      new String(b, 0, 3, "US-ASCII") == "GIF", "not a gif")
    var pos = 6
    val sw = u16(b, pos); val sh = u16(b, pos + 2)
    val packed = b(pos + 4) & 0xff
    pos += 7
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      palette = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
      pos += n * 3
    }
    var w = sw; var h = sh
    var indices: Array[Byte] = null
    var done = false
    while (!done) {
      require(pos < b.length, "truncated gif (no trailer)")
      (b(pos) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
          pos += 1
        case 0x2c => // image descriptor
          w = u16(b, pos + 5); h = u16(b, pos + 7)
          val ip = b(pos + 9) & 0xff
          require((ip & 0x40) == 0, "interlaced gif unsupported")
          pos += 10
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            palette = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
            pos += n * 3
          }
          require(palette != null, "gif image has no color table")
          val minCode = b(pos) & 0xff; pos += 1
          // concatenate sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while ((b(pos) & 0xff) != 0) {
            val len = b(pos) & 0xff
            data.write(b, pos + 1, len); pos += 1 + len
          }
          pos += 1
          indices = lzwDecode(data.toByteArray, minCode, w * h)
        case other =>
          throw new IllegalArgumentException(f"gif block 0x$other%02x invalid")
      }
    }
    require(indices != null, "gif has no image data")
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val ix = (indices(i) & 0xff) * 3
      require(ix + 2 < palette.length, s"gif index ${indices(i)} outside palette")
      rgb(i * 3) = palette(ix); rgb(i * 3 + 1) = palette(ix + 1)
      rgb(i * 3 + 2) = palette(ix + 2)
      i += 1
    }
    Raster(w, h, rgb)
  }

  /** GIF LZW decode: codes read LSB-first, width minCode+1 .. 12. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream(expected)
    var width = minCode + 1
    var next = end + 1
    var prev = -1
    var bitPos = 0
    def emit(code: Int): Byte = { // writes the code's expansion, returns its first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { stack = suffix(c) :: stack; c = prefix(c) }
      val first = c.toByte
      out.write(first & 0xff)
      stack.foreach(s => out.write(s & 0xff))
      first
    }
    var stop = false
    while (!stop && bitPos + width <= data.length * 8) {
      var code = 0; var i = 0
      while (i < width) {
        val bit = bitPos + i
        if ((data(bit >> 3) & (1 << (bit & 7))) != 0) code |= 1 << i
        i += 1
      }
      bitPos += width
      if (code == clear) { width = minCode + 1; next = end + 1; prev = -1 }
      else if (code == end) stop = true
      else {
        require(code < next || (code == next && prev >= 0),
          s"lzw code $code out of sequence (next=$next)")
        if (prev < 0) { emit(code); prev = code }
        else {
          val first =
            if (code < next) emit(code)
            else { // KwKwK case: cur = prev expansion + its first byte
              val f = firstByte(prefix, suffix, clear, prev)
              prefix(next) = prev; suffix(next) = f
              emit(code)
            }
          if (code < next && next < 4096) {
            prefix(next) = prev; suffix(next) = first
          }
          if (next < 4096) {
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    require(out.size == expected,
      s"gif raster ${out.size} != expected $expected")
    out.toByteArray
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte],
                        clear: Int, code: Int): Byte = {
    var c = code
    while (c >= clear) c = prefix(c)
    c.toByte
  }

  /** GIF87a encode: 256-entry global color table, REAL LZW compression
    * (string-table build, width growth, clear-code reset at 4096). */
  def encodeGif(width: Int, height: Int, indices: Array[Byte],
                palette: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height, "index buffer size")
    require(palette.length == 768, "need a 256-entry palette")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF87a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    bos.write(0xf7) // GCT present, 8-bit, 256 entries
    bos.write(0); bos.write(0)
    bos.write(palette)
    bos.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height); bos.write(0)
    val minCode = 8
    bos.write(minCode)
    // LZW compress
    val clear = 1 << minCode; val end = clear + 1
    val codes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var width0 = minCode + 1
    def put(code: Int, w: Int): Unit = {
      acc |= code.toLong << accBits; accBits += w
      while (accBits >= 8) { codes.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8 }
    }
    val table = new java.util.HashMap[String, Integer]()
    def reset(): Int = {
      table.clear()
      (0 until clear).foreach(i => table.put(String.valueOf(i.toChar), i))
      width0 = minCode + 1
      end + 1
    }
    put(clear, width0)
    var next = reset()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < indices.length) {
      val k = (indices(i) & 0xff).toChar
      sb.append(k)
      if (!table.containsKey(sb.toString)) {
        val prefixStr = sb.substring(0, sb.length - 1)
        put(table.get(prefixStr), width0)
        if (next < 4096) {
          table.put(sb.toString, next)
          if (next == (1 << width0) && width0 < 12) width0 += 1
          next += 1
        } else { put(clear, width0); next = reset() }
        sb.setLength(0); sb.append(k)
      }
      i += 1
    }
    put(table.get(sb.toString), width0)
    put(end, width0)
    if (accBits > 0) codes.write((acc & 0xff).toInt)
    // sub-block the code stream
    val cd = codes.toByteArray
    var off = 0
    while (off < cd.length) {
      val n = math.min(255, cd.length - off)
      bos.write(n); bos.write(cd, off, n); off += n
    }
    bos.write(0)
    bos.write(0x3b)
    bos.toByteArray
  }

  // ------------------------------------------------------------------ AVI
  // (RIFF AVI container, public spec; frames are MJPEG = whole JPEGs)

  /** Minimal spec-valid AVI/MJPEG container around pre-encoded JPEG
    * frames: RIFF('AVI ') → LIST hdrl (avih + strl(strh 'vids'/'MJPG'
    * + strf BITMAPINFOHEADER)) → LIST movi ('00dc' chunks, RIFF
    * even-byte padding). Enough structure that standard tools index
    * the stream; enough reality that the decoder must walk a real
    * container. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                     fps: Int = 25): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def chunkBody(frames: Seq[Array[Byte]]): Array[Byte] = {
      val m = new java.io.ByteArrayOutputStream()
      frames.foreach { f =>
        m.write("00dc".getBytes("US-ASCII"))
        m.write(f.length & 0xff); m.write((f.length >> 8) & 0xff)
        m.write((f.length >> 16) & 0xff); m.write((f.length >> 24) & 0xff)
        m.write(f)
        if (f.length % 2 == 1) m.write(0) // RIFF even padding
      }
      m.toByteArray
    }
    val movi = chunkBody(frames)
    // strl: strh (56) + strf (40)
    val strl = new java.io.ByteArrayOutputStream()
    def sl32(v: Int): Unit = {
      strl.write(v & 0xff); strl.write((v >> 8) & 0xff)
      strl.write((v >> 16) & 0xff); strl.write((v >> 24) & 0xff)
    }
    strl.write("strh".getBytes("US-ASCII")); sl32(56)
    strl.write("vids".getBytes("US-ASCII"))
    strl.write("MJPG".getBytes("US-ASCII"))
    sl32(0); sl32(0); sl32(0) // flags, prio+lang, initialFrames
    sl32(1); sl32(fps)        // scale, rate
    sl32(0); sl32(frames.length) // start, length
    sl32(0); sl32(-1); sl32(0)   // bufSize, quality, sampleSize
    sl32(0); sl32((height << 16) | width) // rcFrame
    strl.write("strf".getBytes("US-ASCII")); sl32(40)
    sl32(40); sl32(width); sl32(height); sl32((24 << 16) | 1)
    strl.write("MJPG".getBytes("US-ASCII"))
    sl32(width * height * 3); sl32(0); sl32(0); sl32(0); sl32(0)
    val strlB = strl.toByteArray
    // hdrl: avih (56) + LIST strl
    val hdrlLen = 4 + 8 + 56 + 8 + 4 + strlB.length
    val riffLen = 4 + 8 + hdrlLen + 8 + 4 + movi.length
    ascii("RIFF"); le32(riffLen); ascii("AVI ")
    ascii("LIST"); le32(hdrlLen); ascii("hdrl")
    ascii("avih"); le32(56)
    le32(1000000 / fps); le32(0); le32(0); le32(0x10) // hasIndex-less, AVIF_WASCAPTUREFILE? plain flags
    le32(frames.length); le32(0); le32(1); le32(0)
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0)
    ascii("LIST"); le32(4 + strlB.length); ascii("strl")
    bos.write(strlB)
    ascii("LIST"); le32(4 + movi.length); ascii("movi")
    bos.write(movi)
    bos.toByteArray
  }

  /** Walk a RIFF AVI container and return the video frames ('00dc' /
    * '00db' chunk payloads) in stream order. Tolerant of any header
    * layout: only the RIFF grammar is assumed — find the movi LIST,
    * iterate its even-padded subchunks. */
  def decodeAviFrames(b: Array[Byte]): Seq[Array[Byte]] = {
    require(b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "AVI ", "not a riff/avi")
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walkList(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = new String(b, p, 4, "US-ASCII")
        val size = i32(b, p + 4)
        require(size >= 0 && p + 8L + size <= b.length,
          s"avi chunk '$id' overruns payload")
        if (id == "LIST") {
          val listType = new String(b, p + 8, 4, "US-ASCII")
          if (listType == "movi" || listType == "hdrl" || listType == "rec ")
            walkList(p + 12, p + 8 + size)
        } else if (id == "00dc" || id == "00db") {
          frames += java.util.Arrays.copyOfRange(b, p + 8, p + 8 + size)
        }
        p += 8 + size + (size % 2) // RIFF even padding
      }
    }
    walkList(12, math.min(b.length, 8 + i32(b, 4)))
    frames.toSeq
  }

  /** Dispatch PPM/BMP/PNG/GIF/JPEG on magic bytes. */
  def decodeImage(b: Array[Byte]): Raster = sniff(b) match {
    case "image/x-portable-pixmap" => decodePpm(b)
    case "image/bmp"               => decodeBmp(b)
    case "image/png"               => decodePng(b)
    case "image/gif"               => decodeGif(b)
    case "image/jpeg"              => Jpeg.decode(b)
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
