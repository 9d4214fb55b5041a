package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The engine's operator unit: a declarative DataFrame -> DataFrame step.
  *
  * Spark-native re-expression of the reference's transformer interface
  * (reference: pkg/abstract/transformer.go:32-48 — `Suitable`,
  * `ResultSchema`, `Apply`). Differences by design:
  *   - `apply` is lazy plan construction (Catalyst optimizes the whole
  *     chain); the reference applies each transformer eagerly per batch.
  *   - per-item error routing becomes a side-output DataFrame
  *     (`errors`), mirroring ErrorsOutput=sink|devnull
  *     (pkg/transformer/abstract.go:50-60).
  */
trait Transformer extends Serializable {
  def name: String

  /** Whether this operator applies to the given table/schema
    * (reference: transformer.go:34 `Suitable`). */
  def suitable(table: String, schema: StructType): Boolean = true

  /** Output schema for a given input schema, without running the plan
    * (reference: transformer.go:36 `ResultSchema`). Default: derive from a
    * plan built over an empty frame — exact and cheap in Spark. */
  def resultSchema(spark: org.apache.spark.sql.SparkSession,
                   in: StructType): StructType =
    apply(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], in)).schema

  def apply(df: DataFrame): DataFrame

  /** Side output of rows this operator rejects (quarantine). None = the
    * operator cannot produce per-row errors. */
  def errors(df: DataFrame): Option[DataFrame] = None
}

/** Ordered chain of transformers, applied only where `suitable`
  * (reference: pkg/middlewares/transformation.go:12-34). */
final case class TransformerChain(steps: Seq[Transformer]) {
  def apply(df: DataFrame, table: String = ""): DataFrame =
    steps.foldLeft(df)((d, t) => if (t.suitable(table, d.schema)) t(d) else d)

  /** Union of every step's quarantine output over the progressively
    * transformed frame (ErrorsOutput=sink analog). */
  def errors(df: DataFrame, table: String = ""): Option[DataFrame] = {
    val (_, errs) = steps.foldLeft((df, List.empty[DataFrame])) {
      case ((d, acc), t) if t.suitable(table, d.schema) =>
        (t(d), t.errors(d).map(_ :: acc).getOrElse(acc))
      case (state, _) => state
    }
    errs.reduceOption(_ unionByName (_, allowMissingColumns = true))
  }
}

/** Include/exclude table filter (reference: pkg/abstract/includeable.go and
  * pkg/transformer/registry/filter/filter.go). Patterns are anchored
  * regexes; empty include list means "all". */
final case class TableFilter(include: Seq[String] = Nil,
                             exclude: Seq[String] = Nil) {
  private def m(p: String, t: String) = s"^(?:$p)$$".r.findFirstIn(t).isDefined
  def matches(table: String): Boolean =
    (include.isEmpty || include.exists(m(_, table))) &&
      !exclude.exists(m(_, table))
}
