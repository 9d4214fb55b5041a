package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style model-DAG runner — the engine-side core of the reference's
  * dbt transformer (reference: pkg/transformer/registry/dbt/runner.go
  * ships a git checkout to a dbt container pointed at the destination
  * warehouse; the MODEL SEMANTICS that container executes are public
  * dbt-core behavior: `models/<name>.sql` templated with `{{ ref('m') }}` /
  * `{{ source('s','t') }}` / `{{ config(materialized=...) }}`, a
  * dependency DAG derived from the refs, materialized in dependency
  * order).
  *
  * Spark-first materialization strategy:
  *   - `materialized='view'` models become TEMP VIEWS — lazy, so
  *     Catalyst fuses an entire view chain into ONE optimized plan at
  *     the final consumer: filters push down through every intermediate
  *     model and nothing is written between models;
  *   - `materialized='table'` models cut the plan with a parquet write
  *     (the checkpoint for an expensive model shared by many
  *     downstreams — compute once, scan many).
  * No containers and no warehouse round-trip: models run where the
  * data already is.
  */
object Dbt {

  /** One parsed model: raw templated SQL plus the dependencies and
    * sources its template mentions. */
  final case class Model(name: String, rawSql: String, materialized: String,
                         deps: Seq[String], sources: Seq[(String, String)])

  private val RefRe = """\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val SourceRe =
    """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val ConfigRe = """\{\{\s*config\(([^)]*)\)\s*\}\}""".r
  private val MatRe = """materialized\s*=\s*'([^']+)'""".r

  /** Parse one model file: extract materialization (default `view`,
    * like dbt-core), ref edges, and source references. */
  def parseModel(name: String, sql: String): Model = {
    val materialized = ConfigRe.findFirstMatchIn(sql)
      .flatMap(m => MatRe.findFirstMatchIn(m.group(1)).map(_.group(1)))
      .getOrElse("view")
    require(materialized == "view" || materialized == "table",
      s"model $name: materialized='$materialized' unsupported (view|table)")
    Model(name, sql, materialized,
      RefRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct,
      SourceRe.findAllMatchIn(sql)
        .map(m => (m.group(1), m.group(2))).toSeq.distinct)
  }

  /** Load `<dir>/models/<name>.sql` (file basename = model name). */
  def loadProject(dir: String): Seq[Model] = {
    val md = new java.io.File(dir, "models")
    require(md.isDirectory, s"no models/ directory under $dir")
    md.listFiles((_, n) => n.endsWith(".sql")).sortBy(_.getName).toSeq
      .map { f =>
        parseModel(f.getName.stripSuffix(".sql"),
          new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** Deterministic topological order (layered Kahn, names sorted within
    * a layer); rejects unknown refs and cycles with the offending
    * models named. */
  def topoOrder(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    require(byName.size == models.size, "duplicate model names")
    models.foreach(m => m.deps.foreach(d => require(byName.contains(d),
      s"model ${m.name}: unknown ref '$d'")))
    val emitted = scala.collection.mutable.LinkedHashSet[String]()
    while (emitted.size < models.size) {
      val layer = models.map(_.name).filterNot(emitted)
        .filter(n => byName(n).deps.forall(emitted)).sorted
      if (layer.isEmpty) throw new IllegalArgumentException(
        "dbt model cycle among: " +
          models.map(_.name).filterNot(emitted).sorted.mkString(", "))
      emitted ++= layer
    }
    emitted.toSeq.map(byName)
  }

  // per-run view namespace: two dbt projects running in one session
  // (parallel transfers) must not clobber each other's temp views
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def viewOf(run: Long, model: String) = s"dbt_r${run}_$model"
  private def sourceViewOf(run: Long, schema: String, table: String) =
    s"dbt_r${run}_src_${schema}_$table"

  /** Run a model set: resolve sources via `source`, materialize in
    * dependency order, return every model's frame (laziness preserved
    * for views). `targetDir` hosts `materialized='table'` parquet. */
  def run(spark: SparkSession, models: Seq[Model],
          source: (String, String) => DataFrame,
          targetDir: Option[String] = None): Map[String, DataFrame] = {
    val runId = runSeq.incrementAndGet()
    val ordered = topoOrder(models)
    ordered.flatMap(_.sources).distinct.foreach { case (sch, tbl) =>
      source(sch, tbl).createOrReplaceTempView(sourceViewOf(runId, sch, tbl))
    }
    val out = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    ordered.foreach { m =>
      val sql = RefRe.replaceAllIn(
        SourceRe.replaceAllIn(
          ConfigRe.replaceAllIn(m.rawSql, ""),
          mm => sourceViewOf(runId, mm.group(1), mm.group(2))),
        mm => viewOf(runId, mm.group(1)))
      val df0 = spark.sql(sql)
      val df = (m.materialized, targetDir) match {
        case ("table", Some(dir)) =>
          val path = s"$dir/${m.name}"
          df0.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        case _ => df0 // view (or table without a target): stay lazy
      }
      df.createOrReplaceTempView(viewOf(runId, m.name))
      out(m.name) = df
    }
    out.toMap
  }

  /** Run a project directory and return the selected model. */
  def runProject(spark: SparkSession, projectDir: String, select: String,
                 source: (String, String) => DataFrame,
                 targetDir: Option[String] = None): DataFrame = {
    val frames = run(spark, loadProject(projectDir), source, targetDir)
    frames.getOrElse(select, throw new IllegalArgumentException(
      s"model '$select' not in project (${frames.keys.mkString(", ")})"))
  }
}
