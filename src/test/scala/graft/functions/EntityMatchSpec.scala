package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityMatchSpec extends SparkSpec {
  import spark.implicits._

  test("maskBlocker: a 1-substitution pair always shares the key at " +
    "its differing position (recall-complete), 500 seeded cases") {
    // driver-side twin of the column expression, for the property
    def keys(s: String): Set[String] =
      (1 to s.length).map(p =>
        s"$p|${s.substring(0, p - 1)}*${s.substring(p)}").toSet
    val rnd = new scala.util.Random(42)
    val alpha = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    for (_ <- 1 to 500) {
      val a = Seq.fill(1 + rnd.nextInt(30))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val p = rnd.nextInt(a.length)
      val c = Iterator.continually(alpha(rnd.nextInt(alpha.length)))
        .dropWhile(_ == a(p)).next()
      val b = a.updated(p, c)
      val shared = keys(a) & keys(b)
      // the masked key at the differing position is shared; no OTHER
      // position's key can be (they differ at p, visible in every
      // other mask)
      assert(shared == Set(s"${p + 1}|${a.updated(p, '*')}"),
        s"a=$a b=$b p=$p")
    }
    // identical strings share every key
    assert(keys("abc").size == 3)
  }

  test("maskBlocker column expression agrees with the driver-side twin") {
    val df = Seq("Customer#000000042", "x", "ab").toDF("name")
      .withColumn("k", EntityMatch.maskBlocker(col("name")))
    val got = df.select("name", "k").as[(String, Seq[String])]
      .collect().toMap
    def keys(s: String): Seq[String] =
      (1 to s.length).map(p =>
        s"$p|${s.substring(0, p - 1)}*${s.substring(p)}")
    got.foreach { case (n, ks) => assert(ks == keys(n), n) }
  }

  test("link with maskBlocker finds exactly the <=1-substitution pairs " +
    "and never scores a non-near-dup candidate") {
    val master = Seq((1L, "alpha"), (2L, "alphb"), (3L, "gamma"))
      .toDF("m_key", "m_name")
    val dirty = Seq((10L, "alphX"), (11L, "gamXa"), (12L, "zzzzz"))
      .toDF("d_key", "d_name")
    val out = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.maskBlocker, maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    // alphX links BOTH alpha and alphb (each 1 sub away); gamXa links
    // gamma; zzzzz links nothing
    assert(out == Set((10L, 1L, 1), (10L, 2L, 1), (11L, 3L, 1)))
  }

  test("suffixBlocker: single block of the name's last n chars") {
    val df = Seq("Customer#000000042").toDF("name")
      .select(EntityMatch.suffixBlocker(5)(col("name")).as("b"))
    assert(df.as[Seq[String]].head() == Seq("00042"))
  }
}
