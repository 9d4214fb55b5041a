package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  test("identical tables produce an empty report") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    assert(Checksum.compare(df, df, Seq("id")).count() == 0)
  }

  test("missed/extra keys and column mismatches with capped samples") {
    val src = (1 to 100).map(i => (i.toLong, s"s$i", i * 1.0)).toDF("id", "s", "v")
    // drop ids 1..10, add 200, corrupt v for 20 evens, s for id 55
    val dst = (11 to 100).map(i => (i.toLong, if (i == 55) "BAD" else s"s$i",
        if (i % 2 == 0 && i <= 50) i * 2.0 else i * 1.0))
      .toDF("id", "s", "v")
      .unionByName(Seq((200L, "x", 1.0)).toDF("id", "s", "v"))
    val rep = Checksum.compare(src, dst, Seq("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val byKind = rep.map(t => t._1 -> t).toMap
    assert(byKind("missed key")._3 == 10)
    assert(byKind("missed key")._4 == "1,10,2") // 3 smallest, lexical
    assert(byKind("extra key")._3 == 1 && byKind("extra key")._4 == "200")
    assert(byKind("column 'v' mismatch")._3 == 20)
    assert(byKind("column 'v' mismatch")._4 == "12,14,16")
    assert(byKind("column 's' mismatch")._3 == 1)
    assert(byKind("column 's' mismatch")._4 == "55")
  }

  test("repair batch is minimal and applying it converges the target") {
    val src = (1 to 100).map(i => (i.toLong, s"s$i", i * 1.0)).toDF("id", "s", "v")
    val dst = (11 to 100).map(i => (i.toLong, if (i == 55) "BAD" else s"s$i",
        if (i % 2 == 0 && i <= 50) i * 2.0 else i * 1.0))
      .toDF("id", "s", "v")
      .unionByName(Seq((200L, "x", 1.0)).toDF("id", "s", "v"))
    val repair = Checksum.repairBatch(src, dst, Seq("id"))
    val byOp = repair.groupBy("op").count()
      .as[(String, Long)].collect().toMap
    // 10 dropped keys, 1 spurious key, 20 corrupted v + 1 corrupted s
    assert(byOp == Map("insert" -> 10L, "delete" -> 1L, "update" -> 21L))
    // batch is proportional to the drift: 32 rows, not 101
    assert(repair.count() == 32)
    val repaired = Checksum.applyRepair(dst, repair, Seq("id"))
    assert(Checksum.compare(src, repaired, Seq("id")).count() == 0)
    assert(repaired.count() == 100)
    // update rows carry source ORIGINALS, not normalized renderings
    val v55 = repaired.filter(col("id") === 55).select("s").as[String].head()
    assert(v55 == "s55")
  }

  test("schema drift is reported, matching columns still compared") {
    val src = Seq((1L, "a", 5)).toDF("id", "s", "n")
    val dst = Seq((1L, "a", "5", true)).toDF("id", "s", "n", "added")
    val rep = Checksum.compare(src, dst, Seq("id")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rep.contains(("schema mismatch", "column 'added' absent in source")))
    assert(rep.contains(("schema mismatch", "column 'n' type int vs string")))
    // 's' matched on both rows -> no mismatch rows for it
    assert(!rep.exists(_._1.contains("'s' mismatch")))
  }

  test("float comparison rounds to 12 decimal places like the reference") {
    val src = Seq((1L, 1.0), (2L, 1.0)).toDF("id", "v")
    val dst = Seq((1L, 1.0 + 1e-14), (2L, 1.0 + 1e-9)).toDF("id", "v")
    val rep = Checksum.compare(src, dst, Seq("id")).collect()
    assert(rep.length == 1)
    assert(rep.head.getString(3) == "2") // only the 1e-9 drift surfaces
  }

  test("sampled mode compares the same deterministic key subset") {
    val src = (1 to 2000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val dst = src.filter(col("id") =!= 77) // one missing key
    val full = Checksum.compare(src, dst, Seq("id")).collect()
    assert(full.head.getLong(2) == 1)
    val sampled = Checksum.compare(src, dst, Seq("id"), sampleOneIn = Some(4))
    val n = sampled.collect()
    // key 77 is either in the sample (reported) or not (clean) — but
    // never a false positive, and two runs agree exactly
    val again = Checksum.compare(src, dst, Seq("id"), sampleOneIn = Some(4))
    assert(n.map(_.toString).toSeq == again.collect().map(_.toString).toSeq)
    assert(n.forall(r => r.getString(0) == "missed key"))
  }

  test("composite primary keys") {
    val src = Seq((1L, "a", 10), (1L, "b", 20), (2L, "a", 30))
      .toDF("k1", "k2", "v")
    val dst = Seq((1L, "a", 10), (1L, "b", 99)).toDF("k1", "k2", "v")
    val rep = Checksum.compare(src, dst, Seq("k1", "k2")).collect()
      .map(r => (r.getString(0), r.getString(3))).toMap
    assert(rep("missed key") == "2:a")
    assert(rep("column 'v' mismatch") == "1:b")
  }
}
