package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's canonical scalar type lattice mapped onto Spark types.
  *
  * Reference: pkg/abstract/typesystem/schema.go:48-68 (YT scalar types) and
  * pkg/abstract/changeitem/col_schema.go:14-29 (per-column schema carrier).
  * Spark `StructField.metadata` carries what `ColSchema` carried: primary
  * key flag, original provider type, nested path.
  */
object TypeMapping {
  val PrimaryKeyMeta = "graft.primaryKey"
  val OriginalTypeMeta = "graft.originalType"

  /** YT *serialized* schema spellings differ from the internal lattice:
    * in serialized YT schemas "string" denotes bytes and "utf8" denotes
    * text (ytschema). `ytToSpark` below is the engine's INTERNAL lattice
    * (where "string" is text, matching pkg/abstract/typesystem/schema.go);
    * use this map when decoding a YT-serialized schema. */
  val ytSerializedToSpark: Map[String, DataType] = Map(
    "string" -> BinaryType,
    "utf8" -> StringType,
  )

  /** Decode one column of a YT-SERIALIZED schema (ytschema spellings take
    * precedence over the internal lattice where they differ). The
    * serialized spelling is always recorded in OriginalTypeMeta so
    * [[sparkToYtSerialized]] restores it exactly. */
  def fieldFromYtSerialized(name: String, serialized: String,
                            primaryKey: Boolean = false): StructField = {
    val dt = ytSerializedToSpark.getOrElse(serialized,
      ytToSpark.getOrElse(serialized, StringType))
    val mb = new MetadataBuilder()
      .putBoolean(PrimaryKeyMeta, primaryKey)
      .putString(OriginalTypeMeta, serialized)
    StructField(name, dt, nullable = !primaryKey, metadata = mb.build())
  }

  /** Inverse in SERIALIZED spelling: text -> "utf8", bytes -> "string"
    * (the internal lattice's "string"/"bytes" are not valid ytschema
    * names on the wire). Metadata-recorded spellings win. */
  def sparkToYtSerialized(f: StructField): String =
    if (f.metadata.contains(OriginalTypeMeta))
      f.metadata.getString(OriginalTypeMeta)
    else f.dataType match {
      case StringType => "utf8"
      case BinaryType => "string"
      case dt => sparkToYt(dt)
    }

  /** YT canonical type name -> Spark DataType.
    * uint64 maps to Decimal(20,0): Spark has no unsigned 64-bit integral
    * and silently overflowing to Long would corrupt hash checks. */
  val ytToSpark: Map[String, DataType] = Map(
    "int8" -> ByteType,
    "int16" -> ShortType,
    "int32" -> IntegerType,
    "int64" -> LongType,
    "uint8" -> ShortType,
    "uint16" -> IntegerType,
    "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0),
    "float" -> FloatType,
    "float32" -> FloatType,
    "double" -> DoubleType,
    "float64" -> DoubleType,
    "bytes" -> BinaryType,
    "string" -> StringType,
    "utf8" -> StringType,
    "boolean" -> BooleanType,
    "date" -> DateType,
    "datetime" -> TimestampType,      // second precision at source
    "timestamp" -> TimestampType,     // microsecond precision
    "interval" -> DayTimeIntervalType(),
    "any" -> StringType               // canonical JSON text (sorted keys)
  )

  /** Inverse mapping consulting field metadata first, so uint8/16/32,
    * datetime-vs-timestamp and decimal-vs-uint64 survive a round trip. */
  def sparkToYt(f: StructField): String =
    if (f.metadata.contains(OriginalTypeMeta)) {
      val orig = f.metadata.getString(OriginalTypeMeta)
      if (ytToSpark.contains(orig)) orig else sparkToYt(f.dataType)
    } else sparkToYt(f.dataType)

  /** Spark DataType -> canonical YT name (inverse, lossy on unsigned). */
  def sparkToYt(dt: DataType): String = dt match {
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case d: DecimalType if d.precision == 20 && d.scale == 0 => "uint64"
    case BinaryType => "bytes"
    case StringType => "string"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamp"
    case _: DayTimeIntervalType => "interval"
    case _ => "any"
  }

  def field(name: String, ytType: String, primaryKey: Boolean = false,
            originalType: String = ""): StructField = {
    val mb = new MetadataBuilder()
      .putBoolean(PrimaryKeyMeta, primaryKey)
    // Types whose Spark mapping is lossy must self-record their YT name so
    // sparkToYt(field) can restore them (datetime vs timestamp, uints).
    val lossy = Set("datetime", "uint8", "uint16", "uint32", "float")
    if (originalType.nonEmpty) mb.putString(OriginalTypeMeta, originalType)
    else if (lossy(ytType)) mb.putString(OriginalTypeMeta, ytType)
    StructField(name, ytToSpark.getOrElse(ytType, StringType),
      nullable = !primaryKey, metadata = mb.build())
  }

  def isPrimaryKey(f: StructField): Boolean =
    f.metadata.contains(PrimaryKeyMeta) && f.metadata.getBoolean(PrimaryKeyMeta)

  def primaryKeys(schema: StructType): Seq[String] =
    schema.fields.filter(isPrimaryKey).map(_.name).toSeq

  /** Strictify: cast every value to the canonical representation of its
    * declared type (reference: changeitem/strictify/strictify.go:18-43).
    * In Spark this is analyzer-inserted casts over the whole frame. */
  def strictify(df: DataFrame, target: StructType): DataFrame = {
    val byName = target.fields.map(f => f.name -> f).toMap
    df.select(df.columns.toSeq.map { c =>
      byName.get(c) match {
        // Metadata (PK flags, original types) is applied to EVERY column in
        // the target schema, not only those whose type changes.
        case Some(f) if f.dataType != df.schema(c).dataType =>
          col(c).cast(f.dataType).as(c, f.metadata)
        case Some(f) => col(c).as(c, f.metadata)
        case None => col(c)
      }
    }: _*)
  }
}
