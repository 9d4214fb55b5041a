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

  test("LAW: maskBlocker recall on insert/delete corruption is ZERO — " +
    "the documented contract failure, not a silent one") {
    // mask keys preserve the string's LENGTH, so keys of strings whose
    // lengths differ can never collide: indel recall is exactly zero
    // by construction (the scaladoc's "substitution-only" contract).
    def keys(s: String): Set[String] =
      (1 to s.length).map(p =>
        s"$p|${s.substring(0, p - 1)}*${s.substring(p)}").toSet
    val rnd = new scala.util.Random(7)
    val alpha = ('a' to 'z') ++ ('0' to '9')
    for (_ <- 1 to 200) {
      val a = Seq.fill(2 + rnd.nextInt(20))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val pIns = rnd.nextInt(a.length + 1)
      val ins = a.substring(0, pIns) +
        alpha(rnd.nextInt(alpha.length)) + a.substring(pIns)
      val pDel = rnd.nextInt(a.length)
      val del = a.substring(0, pDel) + a.substring(pDel + 1)
      assert((keys(a) & keys(ins)).isEmpty, s"a=$a ins=$ins")
      assert((keys(a) & keys(del)).isEmpty, s"a=$a del=$del")
    }
  }

  test("deletionBlocker: recall-COMPLETE over the whole edit-distance-1 " +
    "ball (substitution, insertion, deletion), 500 seeded cases") {
    // driver-side twin: identity + every 1-char deletion, deduped
    def keys(s: String): Set[String] =
      Set(s) ++ (0 until s.length).map(p =>
        s.substring(0, p) + s.substring(p + 1))
    val rnd = new scala.util.Random(13)
    val alpha = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    for (i <- 1 to 500) {
      val a = Seq.fill(2 + rnd.nextInt(28))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val b = i % 3 match {
        case 0 => // substitution
          val p = rnd.nextInt(a.length)
          val c = Iterator.continually(alpha(rnd.nextInt(alpha.length)))
            .dropWhile(_ == a(p)).next()
          a.updated(p, c)
        case 1 => // insertion
          val p = rnd.nextInt(a.length + 1)
          a.substring(0, p) + alpha(rnd.nextInt(alpha.length)) +
            a.substring(p)
        case _ => // deletion
          val p = rnd.nextInt(a.length)
          a.substring(0, p) + a.substring(p + 1)
      }
      assert((keys(a) & keys(b)).nonEmpty, s"a=$a b=$b")
    }
  }

  test("deletionBlocker column expression agrees with the driver-side " +
    "twin (distinct keys, identity included)") {
    val df = Seq("Customer#000000042", "x", "aab").toDF("name")
      .withColumn("k", EntityMatch.deletionBlocker(col("name")))
    val got = df.select("name", "k").as[(String, Seq[String])]
      .collect().toMap
    def keys(s: String): Seq[String] =
      (s +: (0 until s.length).map(p =>
        s.substring(0, p) + s.substring(p + 1))).distinct
    got.foreach { case (n, ks) => assert(ks == keys(n), n) }
    // repeated chars: deleting either 'a' of "aab" is ONE key
    assert(got("aab").toSet == Set("aab", "ab", "aa"))
  }

  test("link with deletionBlocker finds insert- and delete-corrupted " +
    "pairs the mask blocker misses") {
    val master = Seq((1L, "alpha"), (2L, "gamma")).toDF("m_key", "m_name")
    val dirty = Seq((10L, "alpXha"), (11L, "gmma"), (12L, "zzzzz"))
      .toDF("d_key", "d_name")
    val masked = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.maskBlocker, maxDist = 1)
      .count()
    assert(masked == 0L) // the documented indel blindness
    val out = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.deletionBlocker, maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((10L, 1L, 1), (11L, 2L, 1)))
  }

  test("deletionBlocker2: recall-COMPLETE over the whole edit-distance-2 " +
    "ball — every corruption class pair, 600 seeded cases") {
    // driver-side twin: identity + every 1-deletion + every 2-deletion
    def keys(s: String): Set[String] = {
      val d1 = (0 until s.length).map(p =>
        s.substring(0, p) + s.substring(p + 1))
      val d2 = for (p <- 0 until s.length; q <- p + 1 until s.length)
        yield s.substring(0, p) + s.substring(p + 1, q) + s.substring(q + 1)
      Set(s) ++ d1 ++ d2
    }
    val rnd = new scala.util.Random(29)
    val alpha = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    def edit(s: String, kind: Int): String = kind match {
      case 0 => // substitution
        val p = rnd.nextInt(s.length)
        val c = Iterator.continually(alpha(rnd.nextInt(alpha.length)))
          .dropWhile(_ == s(p)).next()
        s.updated(p, c)
      case 1 => // insertion
        val p = rnd.nextInt(s.length + 1)
        s.substring(0, p) + alpha(rnd.nextInt(alpha.length)) + s.substring(p)
      case _ => // deletion
        val p = rnd.nextInt(s.length)
        s.substring(0, p) + s.substring(p + 1)
    }
    // all 6 unordered class pairs (ss, si, sd, ii, id, dd), cycled
    val classPairs = Seq((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    for (i <- 1 to 600) {
      val a = Seq.fill(3 + rnd.nextInt(27))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val (k1, k2) = classPairs(i % classPairs.length)
      val b = edit(edit(a, k1), k2)
      assert((keys(a) & keys(b)).nonEmpty,
        s"a=$a b=$b classes=($k1,$k2)")
    }
  }

  test("deletionBlocker2 column expression agrees with the driver-side " +
    "twin, and length-1/length-2 edges hold") {
    val df = Seq("Customer#000000042", "x", "ab", "aab").toDF("name")
      .withColumn("k", EntityMatch.deletionBlocker2(col("name")))
    val got = df.select("name", "k").as[(String, Seq[String])]
      .collect().toMap
    def keys(s: String): Seq[String] = {
      val d1 = (0 until s.length).map(p =>
        s.substring(0, p) + s.substring(p + 1))
      val d2 = for (p <- 0 until s.length; q <- p + 1 until s.length)
        yield s.substring(0, p) + s.substring(p + 1, q) + s.substring(q + 1)
      (s +: (d1 ++ d2)).distinct
    }
    got.foreach { case (n, ks) =>
      assert(ks.toSet == keys(n).toSet, n)
      assert(ks == ks.distinct, s"$n: duplicate keys emitted")
    }
    // length 1: no 2-deletion exists; identity + the empty string only
    assert(got("x").toSet == Set("x", ""))
    // length 2: the single 2-deletion is the empty string
    assert(got("ab").toSet == Set("ab", "a", "b", ""))
  }

  test("link with deletionBlocker2 finds distance-2 indel pairs that " +
    "depth 1 misses, and depth 2 subsumes depth 1") {
    val master = Seq((1L, "alphabet"), (2L, "gamma"), (3L, "delta"))
      .toDF("m_key", "m_name")
    val dirty = Seq(
      (10L, "alXphbet"),  // insert X + delete a: ed 2, mixed indel
      (11L, "gma"),       // two deletions: ed 2
      (12L, "dZlta"),     // one substitution: ed 1 (depth-1 territory)
      (13L, "zzzzzzzz"))  // unrelated
      .toDF("d_key", "d_name")
    val d1 = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.deletionBlocker, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // depth 1 DOES bridge the mixed ins+del pair (one deletion per
    // side meets in the middle) but cannot block the double-deletion
    // pair: "gamma" needs TWO deletions to reach any key of "gma"
    assert(d1 == Set((10L, 1L, 2), (12L, 3L, 1)))
    val d2 = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.deletionBlocker2, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(d2 == Set((10L, 1L, 2), (11L, 2L, 2), (12L, 3L, 1)))
  }

  test("suffixBlocker: single block of the name's last n chars") {
    val df = Seq("Customer#000000042").toDF("name")
      .select(EntityMatch.suffixBlocker(5)(col("name")).as("b"))
    assert(df.as[Seq[String]].head() == Seq("00042"))
  }

  test("link candidate budget: a degenerate blocker (constant shared " +
    "key) trips the guard, naming the hot block and the exact count") {
    // every name ends "XYZ" → suffixBlocker(3) sends ALL rows to one
    // block: candidates = 60 x 60 = 3600, occupancy-quadratic — the
    // sf3-style regime in miniature
    val master = (1L to 60L).map(i => (i, f"M$i%04d-XYZ"))
      .toDF("m_key", "m_name")
    val dirty = (1L to 60L).map(i => (i + 100, f"M$i%04d-XYZ"))
      .toDF("d_key", "d_name")
    val e = intercept[IllegalStateException] {
      EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.suffixBlocker(3),
        maxDist = 1, maxCandidates = 1000L)
    }
    // message carries the exact pre-prune candidate count and the
    // degenerate key itself — the forensics a 100 TB operator needs
    assert(e.getMessage.contains("3600 candidate pairs"))
    assert(e.getMessage.contains("'XYZ' -> 3600"))
  }

  test("link candidate budget: LAW — a budget that clears produces the " +
    "same answer as guard-off (the guard is a precondition, not a " +
    "filter), and the default budget clears normal corpora") {
    val master = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("m_key", "m_name")
    val dirty = Seq((10L, "alphA"), (11L, "betaX"), (12L, "zzz"))
      .toDF("d_key", "d_name")
    val guarded = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.deletionBlocker,
        maxDist = 1, maxCandidates = 1000000L)
      .as[(Long, Long, Int)].collect().toSet
    val off = EntityMatch.link(dirty, "d_key", "d_name",
        master, "m_key", "m_name", EntityMatch.deletionBlocker,
        maxDist = 1, maxCandidates = Long.MaxValue)
      .as[(Long, Long, Int)].collect().toSet
    assert(guarded == off)
    assert(guarded == Set((10L, 1L, 1), (11L, 2L, 1)))
  }
}
