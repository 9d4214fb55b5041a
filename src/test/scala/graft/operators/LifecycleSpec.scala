package graft.operators

import graft.SparkSpec
import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.functions._

/** [[Lifecycle]]: add/remove/reupload table-set surgery semantics. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/tmp/graft_lifecycle_spec"
  private def clean(): Unit =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)

  private def env(rows: Seq[(Long, String)], table: String, kind: String,
                  lsn: Long) =
    rows.toDF("k", "v").withColumn(E.Table, lit(table))
      .withColumn(E.Kind, lit(kind)).withColumn(E.Lsn, lit(lsn))
      .withColumn(E.Counter, lit(0))

  private def state(table: String) =
    graft.streaming.CdcStream.readState(spark, s"$base/$table")
      .as[(Long, String)].collect().toSet

  test("out-of-set tables drop; addTables snapshots without touching " +
    "existing state; removeTables re-drops") {
    clean()
    var f = Lifecycle.addTables(base, Seq("k"), TableFilter(),
      Seq("a" -> Seq((1L, "a1"), (2L, "a2")).toDF("k", "v")))
    // batch for b BEFORE b is added: must drop
    val applied1 = Lifecycle.applyBatch(
      env(Seq((9L, "LEAK")), "b", E.Insert, 5L), base, Seq("k"), f)
    assert(applied1.isEmpty)
    f = Lifecycle.addTables(base, Seq("k"), f,
      Seq("b" -> Seq((10L, "b1")).toDF("k", "v")))
    assert(f.matches("a") && f.matches("b") && !f.matches("c"))
    assert(state("b") == Set((10L, "b1"))) // no LEAK row
    assert(state("a") == Set((1L, "a1"), (2L, "a2"))) // untouched
    // after removeTables("b"), b batches drop again but state stays
    f = Lifecycle.removeTables(f, Seq("b"))
    assert(!f.matches("b"))
    val applied2 = Lifecycle.applyBatch(
      env(Seq((11L, "late")), "b", E.Insert, 6L), base, Seq("k"), f)
    assert(applied2.isEmpty)
    assert(state("b") == Set((10L, "b1")))
  }

  test("applyBatch merges per table under the filter; reupload " +
    "rebuilds from scratch") {
    clean()
    var f = Lifecycle.addTables(base, Seq("k"), TableFilter(),
      Seq("a" -> Seq((1L, "a1"), (2L, "a2")).toDF("k", "v")))
    Lifecycle.applyBatch(
      env(Seq((2L, "a2x")), "a", E.Update, 7L)
        .unionByName(env(Seq((3L, "a3")), "a", E.Insert, 7L)),
      base, Seq("k"), f)
    assert(state("a") == Set((1L, "a1"), (2L, "a2x"), (3L, "a3")))
    Lifecycle.reupload(spark, base, Seq("k"),
      Seq("a" -> Seq((5L, "fresh")).toDF("k", "v")))
    assert(state("a") == Set((5L, "fresh")))
  }

  test("addTables quotes literal names: dots in table names do not " +
    "become regex wildcards") {
    clean()
    val f = Lifecycle.addTables(base, Seq("k"), TableFilter(),
      Seq("pub.orders" -> Seq((1L, "x")).toDF("k", "v")))
    assert(f.matches("pub.orders"))
    assert(!f.matches("pubXorders"))
    val f2 = Lifecycle.removeTables(f, Seq("pub.orders"))
    assert(!f2.matches("pub.orders"))
    // the quoted exclusion likewise stays literal
    assert(TableFilter(exclude = f2.exclude).matches("pubXorders"))
  }

  test("re-adding a previously removed table under an explicit include " +
    "list lifts its exclusion (the filter must ADMIT what it loads)") {
    clean()
    var f = Lifecycle.addTables(base, Seq("k"), TableFilter(),
      Seq("a" -> Seq((1L, "a1")).toDF("k", "v"),
          "b" -> Seq((10L, "b1")).toDF("k", "v")))
    f = Lifecycle.removeTables(f, Seq("b"))
    assert(!f.matches("b"))
    // re-add: exclusions win over include, so the quoted exclude entry
    // must be lifted or b's events would silently drop while its
    // snapshot reloads — the r12 ADVICE bug
    f = Lifecycle.addTables(base, Seq("k"), f,
      Seq("b" -> Seq((10L, "b1-re")).toDF("k", "v")))
    assert(f.matches("b") && f.matches("a") && !f.matches("c"))
    val applied = Lifecycle.applyBatch(
      env(Seq((11L, "b2")), "b", E.Insert, 8L), base, Seq("k"), f)
    assert(applied == Seq("b"))
    assert(state("b") == Set((10L, "b1-re"), (11L, "b2")))
  }

  test("addTables on a match-all-except filter widens by lifting the " +
    "exclusion, never narrowing include") {
    clean()
    var f = TableFilter(exclude = Seq(java.util.regex.Pattern.quote("b")))
    assert(f.matches("a") && !f.matches("b") && f.matches("zzz"))
    f = Lifecycle.addTables(base, Seq("k"), f,
      Seq("b" -> Seq((1L, "b1")).toDF("k", "v")))
    // b is admitted again AND the filter still matches everything else
    assert(f.matches("b"))
    assert(f.matches("a") && f.matches("zzz"))
    assert(f.include.isEmpty)
  }

  test("addTables lifts BROADER regex excludes that match an added " +
    "table, not only its literal/quoted spellings") {
    clean()
    // a hand-written pattern excluding a whole schema: tmp_.*
    var f = TableFilter(exclude = Seq("tmp_.*"))
    assert(f.matches("orders") && !f.matches("tmp_orders"))
    f = Lifecycle.addTables(base, Seq("k"), f,
      Seq("tmp_orders" -> Seq((1L, "x")).toDF("k", "v")))
    // the broad exclude MATCHED the added table, so it is lifted —
    // otherwise tmp_orders' snapshot loads into state while its
    // replication events are still rejected (silent non-replication)
    assert(f.matches("tmp_orders"), f.toString)
    // an unrelated exclude pattern survives the lift
    var g = TableFilter(exclude = Seq("tmp_.*", "audit_log"))
    g = Lifecycle.addTables(base, Seq("k"), g,
      Seq("tmp_orders" -> Seq((1L, "x")).toDF("k", "v")))
    assert(g.matches("tmp_orders") && !g.matches("audit_log"))
    // a malformed regex exclude must not crash the lift (Try-guarded):
    // it cannot match anything, so it is left in place untouched
    var h = TableFilter(exclude = Seq("[unclosed"))
    h = Lifecycle.addTables(base, Seq("k"), h,
      Seq("t1" -> Seq((1L, "x")).toDF("k", "v")))
    assert(h.exclude == Seq("[unclosed"))
  }
}
