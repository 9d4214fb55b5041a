package graft.functions

/** Pure-JVM decoders for the library-free public media formats: PPM
  * (netpbm P6), BMP (Windows BITMAPINFOHEADER, 24bpp uncompressed) and
  * WAV (RIFF PCM 16-bit). These are REAL decode kernels — byte-exact
  * per their public specs — so the multimodal pipeline's decode stage
  * is genuine for any corpus in these formats; compressed formats
  * (JPEG/PNG/MP3…) still need a codec library this container lacks and
  * keep the documented stand-in path in [[Multimodal]].
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

  /** Dispatch PPM/BMP on magic bytes. */
  def decodeImage(b: Array[Byte]): Raster = sniff(b) match {
    case "image/x-portable-pixmap" => decodePpm(b)
    case "image/bmp"               => decodeBmp(b)
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
