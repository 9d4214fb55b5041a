package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input guarantees for every pure-JVM decode kernel: on
  * corrupt bytes a decoder must THROW (the quarantine contract routes
  * NonFatal to the unparsed side) — never hang, never allocate
  * unboundedly, never return silently-wrong pixels. The WAV
  * negative-chunk-size hang (round 7) is the class of bug this suite
  * pins down for all codecs at once: truncations at EVERY offset plus
  * deterministic byte-flip corruption.
  *
  * No SparkSession needed — kernels are plain JVM functions.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def pal: Array[Byte] =
    Array.tabulate[Byte](768)(j => ((j / 3 + (j % 3) * 85) % 256).toByte)

  private def gray(n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((i * 37) % 256).toByte)

  private val samples: Seq[(String, Array[Byte], Array[Byte] => Any)] = {
    val px = Array.tabulate[Byte](12)(i => (i * 17).toByte)
    Seq(
      ("ppm", MediaCodecs.encodePpm(MediaCodecs.Raster(2, 2, px)),
        MediaCodecs.decodePpm _),
      ("png", MediaCodecs.encodePng(MediaCodecs.Raster(2, 2, px)),
        MediaCodecs.decodePng _),
      ("gif", MediaCodecs.encodeGif(16, 16, gray(256), pal),
        MediaCodecs.decodeGif _),
      ("jpeg", Jpeg.encodeGray(16, 16, gray(256)),
        Jpeg.decode _),
      ("avi", MediaCodecs.encodeAviMjpeg(
          Seq(Jpeg.encodeGray(16, 16, gray(256))), 16, 16),
        (b: Array[Byte]) =>
          MediaCodecs.decodeAviFrames(b).map(Jpeg.decode)))
  }

  // a decode attempt must finish fast — a hang is the failure mode
  // we're hunting, so run each attempt on a watchdog
  private def boundedAttempt(name: String, f: () => Any): Unit = {
    val t = new Thread(() => try { f(); () } catch { case _: Throwable => () })
    t.setDaemon(true)
    t.start()
    t.join(30000)
    if (t.isAlive) {
      t.interrupt()
      fail(s"$name decode did not terminate (hang)")
    }
  }

  test("every codec rejects or survives truncation at every offset, quickly") {
    samples.foreach { case (name, valid, decode) =>
      // sanity: the intact sample decodes
      decode(valid)
      val step = math.max(1, valid.length / 97) // ~100 cut points
      (0 until valid.length by step).foreach { cut =>
        boundedAttempt(s"$name@cut$cut",
          () => decode(java.util.Arrays.copyOf(valid, cut)))
      }
    }
  }

  test("every codec tolerates deterministic byte flips without hanging") {
    samples.foreach { case (name, valid, decode) =>
      val step = math.max(1, valid.length / 61)
      (0 until valid.length by step).foreach { i =>
        val mutated = valid.clone()
        mutated(i) = (mutated(i) ^ 0x5a).toByte
        boundedAttempt(s"$name@flip$i", () => decode(mutated))
      }
    }
  }

  test("pseudo-random garbage never hangs any decoder") {
    // deterministic LCG — no RNG seeds from the clock
    var s = 0x12345678L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toInt }
    samples.foreach { case (name, valid, decode) =>
      (0 until 20).foreach { k =>
        val len = 16 + math.abs(next()) % 4096
        val junk = Array.tabulate[Byte](len)(_ => next().toByte)
        // graft a valid magic prefix so the parser commits to decoding
        System.arraycopy(valid, 0, junk, 0, math.min(12, valid.length))
        boundedAttempt(s"$name#garbage$k", () => decode(junk))
      }
    }
  }
}
