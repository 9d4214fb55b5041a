package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ImageDedupSpec extends SparkSpec {
  import MediaCodecs.Raster

  /** 9×8 grayscale raster from a per-pixel value function. */
  private def gray9x8(v: Int => Int): Raster = {
    val rgb = new Array[Byte](9 * 8 * 3)
    for (p <- 0 until 72) {
      val b = (v(p) & 0xff).toByte
      rgb(3 * p) = b; rgb(3 * p + 1) = b; rgb(3 * p + 2) = b
    }
    Raster(9, 8, rgb)
  }

  private def toLong(bands: Array[Int]): Long =
    bands.zipWithIndex.map { case (b, i) => (b.toLong & 0xffff) << (16 * i) }.sum

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    java.lang.Long.bitCount(toLong(a) ^ toLong(b))

  test("dhashBands encodes horizontal gradients bit by bit") {
    // row-major ramp: every left pixel < its right neighbor → all bits 0
    val ramp = gray9x8(p => (p % 9) * 20)
    assert(ImageDedup.dhashBands(ramp).forall(_ == 0))
    // reversed ramp → every bit set
    val rev = gray9x8(p => (8 - p % 9) * 20)
    assert(ImageDedup.dhashBands(rev).forall(_ == 0xffff))
    // a step 200→100→50 in row 2: falling edges at cols 4→5 and 5→6
    // → exactly bits 2*8+4 and 2*8+5
    val one = gray9x8 { p =>
      val (r, c) = (p / 9, p % 9)
      if (r == 2 && c == 4) 200 else if (r == 2 && c == 5) 100 else 50
    }
    val bands = ImageDedup.dhashBands(one)
    assert(toLong(bands) == ((1L << 20) | (1L << 21)))
  }

  test("dhash is computed on the resized image, so scale-doubling is invariant") {
    val base = gray9x8(p => (p * 37 + 11) % 256)
    // 18×16 pixel-doubled copy: nearest resize back to 9×8 must
    // reproduce the source pixels exactly, hence the identical hash
    val big = {
      val rgb = new Array[Byte](18 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 18) {
        val src = (y / 2) * 9 + (x / 2)
        val d = (y * 18 + x) * 3
        rgb(d) = base.rgb(3 * src); rgb(d + 1) = base.rgb(3 * src + 1)
        rgb(d + 2) = base.rgb(3 * src + 2)
      }
      Raster(18, 16, rgb)
    }
    assert(ImageDedup.dhashBands(base).sameElements(ImageDedup.dhashBands(big)))
  }

  private val hashedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("b0", IntegerType), StructField("b1", IntegerType),
    StructField("b2", IntegerType), StructField("b3", IntegerType)))

  private def hashedDf(rows: Seq[(Long, Array[Int])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b) =>
        Row(id, b(0), b(1), b(2), b(3)) }),
      hashedSchema)

  test("nearDupPairs finds banded collisions and gates on exact Hamming") {
    val base = ImageDedup.dhashBands(gray9x8(p => (p * 53 + 7) % 256))
    def flip(bits: Int*): Array[Int] = {
      val l = bits.foldLeft(toLong(base))((acc, b) => acc ^ (1L << b))
      Array.tabulate(4)(i => ((l >> (16 * i)) & 0xffff).toInt)
    }
    val far = ImageDedup.dhashBands(gray9x8(p => (p * 101 + 3) % 256))
    val rows = Seq(1L -> base, 2L -> flip(0), 3L -> flip(1, 17, 33),
      4L -> far)
    val out = ImageDedup.nearDupPairs(hashedDf(rows), maxHamming = 4)
      .orderBy("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 1↔2 at Hamming 1, 1↔3 at 3, 2↔3 at 4 (bit 0 differs both ways);
    // `far` differs in every band (random vs random) → no pair
    assert(out.toSeq == Seq((1L, 2L, 1), (1L, 3L, 3), (2L, 3L, 4)))
  }

  test("banding recall is total for Hamming <= 3 (pigeonhole property)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).flatMap { i =>
      val base = Array.fill(4)(rnd.nextInt(65536))
      val l = toLong(base)
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(4))
      val mut = flips.foldLeft(l)((acc, b) => acc ^ (1L << b))
      val mutB = Array.tabulate(4)(j => ((mut >> (16 * j)) & 0xffff).toInt)
      Seq((i * 2L, base), (i * 2L + 1, mutB))
    }
    val out = ImageDedup.nearDupPairs(hashedDf(rows), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // <= 3 flipped bits across 4 bands leave >= 1 band untouched, so
    // every planted twin MUST collide into a candidate bucket
    (0 until 50).foreach { i => assert(out.contains((i * 2L, i * 2L + 1))) }
  }

  test("hot-bucket cap drops degenerate buckets whole") {
    val const = ImageDedup.dhashBands(gray9x8(_ => 128)) // all-equal image
    val rows = (1L to 20L).map(_ -> const)
    val capped = ImageDedup.nearDupPairs(hashedDf(rows), bucketCap = 10)
    assert(capped.count() == 0)
    val uncapped = ImageDedup.nearDupPairs(hashedDf(rows), bucketCap = 100)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("undecodable payloads quarantine to null bands and never pair") {
    val ppm = MediaCodecs.encodePpm(gray9x8(p => (p * 31) % 256))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ppm), Row(2L, ppm),
        Row(3L, "not an image".getBytes("US-ASCII")))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    val hashed = ImageDedup.dhashFrame(df)
    assert(hashed.filter(col("b0").isNull).count() == 1)
    val pairs = ImageDedup.nearDupPairs(hashed).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getInt(2) == 0)
  }

  test("rrfFuse sums reciprocal ranks and breaks score ties on id") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "id", "rank")
    val vec = Seq((0L, 11L, 1), (0L, 13L, 2), (0L, 14L, 3))
      .toDF("query_id", "id", "rank")
    val out = Similarity.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // 11 fuses both lists (1/61+1/62) and wins; then 10 (1/61),
    // 13 (1/62); 12 and 14 tie exactly at 1/63 → ascending-id break
    assert(out.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L, 14L))
    assert(out(0)._2 > out(1)._2)
    val score12 = out.find(_._1 == 12L).get._2
    val score14 = out.find(_._1 == 14L).get._2
    assert(score12 == score14) // both 1/63 → tie; 12 < 14 wins on id
    assert(out.find(_._1 == 12L).get._3 < out.find(_._1 == 14L).get._3)
  }
}
