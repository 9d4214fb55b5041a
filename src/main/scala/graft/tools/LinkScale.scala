package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{EntityMatch, Hashing}

/** Scale ladder for [[graft.functions.EntityMatch.link]] (r14 verdict
  * task 8): the r14 rework (banded-once distance, length-band prune,
  * filter-before-dedup, hashed block keys, widen-before-explode) was
  * measured at sf0.1 (25.1 → 3.3 s) and REASONED for scale, but the
  * precision-degenerate candidate regime — structured-identifier
  * corpora where the depth-2 deletion neighborhood goes near-all-pairs
  * — was only measured mid-fix. This tool pins the claim with a
  * committed trajectory: the same dirty-name construction as the
  * `entity_match_edit2` bench row (two hash-driven edits per customer
  * name; see Queries.scala), run at two scales (sf0.1 → fresh-sf1 is
  * masters ×10), reporting the three numbers that tell the story:
  *
  *   - `candidates`: distinct (dirty, master) pairs sharing ≥1 block
  *     key — the population the banded distance streams through
  *     map-side (grows ~quadratically on structured IDs);
  *   - `survivors`: linked pairs within maxDist — the answer-sized
  *     set that is ALL the filter-first spelling ever shuffles;
  *   - `link_sec`: wall of the production operator (measured alone,
  *     in its own run phase — the candidate census is diagnostic
  *     instrumentation and runs AFTER the timed link).
  *
  * Usage: runMain graft.tools.LinkScale <sfDir> [guardOnly]
  *
  * `guardOnly` runs ONLY the r17 occupancy-guard estimate (phase 0) —
  * minutes instead of the sf3 run's ~13-minute link + census, for
  * checking the guard's number against a known census at a scale
  * where re-running the full link is a session's budget.
  */
object LinkScale {
  /** The entity_match_edit2 fixture: two hash-driven edits
    * (insert/delete then delete/insert/substitute) per master name —
    * keep in lockstep with the bench row's spelling (Queries.scala,
    * "entity_match_edit2"). */
  private def dirty(c: DataFrame): DataFrame = {
    val h = Hashing.hex8ToLong(col("c_custkey").cast("string"))
    val len = length(col("c_name"))
    val p = (pmod(shiftright(h, 1), len.cast("long")) + 1).cast("int")
    val del1 = concat(col("c_name").substr(lit(1), p - 1),
      col("c_name").substr(p + 1, len))
    val ins1 = concat(col("c_name").substr(lit(1), p - 1), lit("X"),
      col("c_name").substr(p, len))
    val step1 = c.select(col("c_custkey"),
      when(pmod(h, lit(2)) === 0, del1).otherwise(ins1).as("r1"),
      h.as("__h"))
    val len1 = length(col("r1"))
    val q = (pmod(shiftright(col("__h"), 3), len1.cast("long")) + 1)
      .cast("int")
    val del2 = concat(col("r1").substr(lit(1), q - 1),
      col("r1").substr(q + 1, len1))
    val ins2 = concat(col("r1").substr(lit(1), q - 1), lit("Y"),
      col("r1").substr(q, len1))
    val sub2 = concat(col("r1").substr(lit(1), q - 1), lit("Z"),
      col("r1").substr(q + 1, len1))
    val kind2 = pmod(shiftright(col("__h"), 2), lit(3))
    step1.select((col("c_custkey") + 1000000L).as("d_key"),
      when(kind2 === 0, del2).when(kind2 === 1, ins2).otherwise(sub2)
        .as("d_name"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val c = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"))
    val d = dirty(c)
    val masters = c.count()
    // phase 0 — the r17 guard's occupancy estimate (the number link's
    // default budget compares against), timed separately so the ladder
    // prices the guard itself; at degenerate scales the estimate must
    // land within ~2x of the census's distinct-pair count (it counts
    // per-shared-block rows, the join's true stream size)
    val tg = System.nanoTime()
    val guardEst = EntityMatch.candidateEstimate(d, "d_key", "d_name",
      c, "c_custkey", "c_name", EntityMatch.deletionBlocker2)
    val guardSec = (System.nanoTime() - tg) / 1e9
    println(f"guard_estimate=$guardEst guard_sec=$guardSec%.3f " +
      f"default_budget_trips=${guardEst > 1000000000L}")
    if (args.length > 1 && args(1) == "guardOnly") {
      println(s"""{"tool":"LinkScale","sf":"$sfDir","masters":$masters,""" +
        s""""guard_estimate":$guardEst,"guard_sec":$guardSec,""" +
        s""""mode":"guardOnly"}""")
      spark.stop()
      sys.exit(0)
    }
    // phase 1 — the TIMED production operator, nothing else running;
    // guard OFF so the ladder can measure the degenerate regime the
    // guard exists to refuse. Park-annotated (r17).
    val meter = new graft.ParkMeter()
    val t0 = System.nanoTime()
    val survivors = EntityMatch.link(d, "d_key", "d_name",
      c, "c_custkey", "c_name",
      EntityMatch.deletionBlocker2, maxDist = 2,
      maxCandidates = Long.MaxValue).count()
    val t0e = System.nanoTime()
    val linkSec = (t0e - t0) / 1e9
    val linkPark = meter.overlapSecs(t0, t0e)
    // emit the headline immediately: the census below costs MORE than
    // the link at large scales (it materializes the candidate set the
    // operator exists to avoid), and a truncated run must not lose
    // the timed number it already has
    println(f"link_done masters=$masters survivors=$survivors " +
      f"link_sec=$linkSec%.3f link_park=$linkPark%.3f")
    // phase 2 — diagnostic candidate census (the operator never
    // materializes this set; it exists to SIZE the regime the banded
    // distance streams through). Distinct pairs sharing a block key,
    // same hashed-key spelling as the operator's join.
    val t1 = System.nanoTime()
    def keyed(df: DataFrame, k: String, n: String) =
      df.select(col(k), explode(EntityMatch.deletionBlocker2(col(n)))
        .as("__bk")).select(col(k), xxhash64(col("__bk")).as("__block"))
    val candidates = keyed(d, "d_key", "d_name")
      .join(keyed(c, "c_custkey", "c_name"), "__block")
      .select("d_key", "c_custkey").distinct().count()
    val censusSec = (System.nanoTime() - t1) / 1e9
    def r3(v: Double) = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"tool":"LinkScale","sf":"$sfDir","masters":$masters,""" +
      s""""candidates":$candidates,"survivors":$survivors,""" +
      s""""guard_estimate":$guardEst,"guard_sec":${r3(guardSec)},""" +
      s""""link_sec":${r3(linkSec)},"link_park":${r3(linkPark)},""" +
      s""""census_sec":${r3(censusSec)}}""")
    spark.stop()
    sys.exit(0)
  }
}
