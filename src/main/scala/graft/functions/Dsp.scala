package graft.functions

/** Pure-JVM DSP kernels for audio feature extraction — the frequency-
  * domain half of the multimodal audio stage (time-domain rms/peak/
  * zero-crossings live in [[Multimodal]]).
  *
  * The FFT is the standard iterative radix-2 Cooley-Tukey with a fixed
  * butterfly order, so results are bit-deterministic across runs and
  * machines (same IEEE ops in the same order). Correctness is
  * oracle-gated the planted-signal way: an integer-cycle sine lands its
  * entire energy in exactly one bin — the oracle predicts the bin from
  * the generating formula without running any transform.
  */
object Dsp {

  /** In-place iterative radix-2 FFT (length must be a power of two). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"fft length $n must be a power of two")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Dominant non-DC frequency bin of the first `n` samples: argmax of
    * |X[k]| over k in 1..n/2, ties to the smallest bin. */
  def dominantBin(samples: Array[Short], n: Int = 64): Int = {
    require(samples.length >= n, s"need $n samples, got ${samples.length}")
    val re = new Array[Double](n); val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = samples(i).toDouble; i += 1 }
    fft(re, im)
    var best = 1
    var bestMag = re(1) * re(1) + im(1) * im(1)
    var k = 2
    while (k <= n / 2) {
      val m = re(k) * re(k) + im(k) * im(k)
      if (m > bestMag) { best = k; bestMag = m }
      k += 1
    }
    best
  }

  /** Integer-cycle sine test signal: k full cycles over n samples at
    * the given amplitude — all of its energy in bin k exactly. */
  def sine(k: Int, n: Int, amplitude: Int): Array[Short] =
    Array.tabulate[Short](n)(i =>
      math.round(amplitude * math.sin(2.0 * math.Pi * k * i / n)).toShort)
}
