package graft.model

/** The riff function envelope — the reference's sole record type.
  *
  * Shape derived from the reference's serde pair
  * (`src/main/java/com/example/demo/MessageDeserializer.java:49-70`,
  * `MessageSerializer.java:42-74`): an opaque binary payload plus a
  * string-keyed multimap of string header values.
  *
  * Spark mapping (SURVEY §1.5): `payload` is `BinaryType`, `headers` is
  * `MapType(StringType, ArrayType(StringType))`. Use `Dataset[RiffMessage]`
  * for typed transforms; the schema below for DataFrame-land.
  */
final case class RiffMessage(
    headers: Map[String, Seq[String]],
    payload: Array[Byte]) {

  // Array[Byte] breaks default equals; tests need structural equality.
  override def equals(other: Any): Boolean = other match {
    case RiffMessage(h, p) =>
      h == headers && java.util.Arrays.equals(p, payload)
    case _ => false
  }
  override def hashCode(): Int =
    headers.hashCode * 31 + java.util.Arrays.hashCode(payload)
}

object RiffMessage {
  import org.apache.spark.sql.types._

  /** StructType of the envelope as it appears in DataFrames. */
  val schema: StructType = StructType(Seq(
    StructField("headers",
      MapType(StringType, ArrayType(StringType, containsNull = false),
        valueContainsNull = false), nullable = true),
    StructField("payload", BinaryType, nullable = true)))
}
