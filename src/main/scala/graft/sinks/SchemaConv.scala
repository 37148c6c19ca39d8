package graft.sinks

import graft.config.{FieldType, TopicSchema}
import org.apache.spark.sql.types._

/** Declared-schema YAML → Spark StructType (reference: src/schema.rs:24-41).
  * Mapping notes: the reference's `float` is 64-bit (src/schema.rs:31) →
  * DoubleType; `timestamp` is millisecond precision (src/schema.rs:32) →
  * TimestampType (Spark stores µs; ms values embed exactly). Every field is
  * nullable (src/schema.rs:73-89). Field order is name-sorted — deterministic
  * where the reference's HashMap order is not (SURVEY.md §1.2).
  */
object SchemaConv {
  def toDataType(t: FieldType): DataType = t match {
    case FieldType.Str       => StringType
    case FieldType.Lng       => LongType
    case FieldType.Int       => IntegerType
    case FieldType.Ts        => TimestampType
    case FieldType.Flt       => DoubleType
    case FieldType.Bool      => BooleanType
    case FieldType.Struct(f) => toStructType(f)
  }

  def toStructType(fields: List[(String, FieldType)]): StructType =
    StructType(fields.map { case (name, t) =>
      StructField(name, toDataType(t), nullable = true)
    })

  def forTopic(s: TopicSchema): StructType = toStructType(s.fields)
}
