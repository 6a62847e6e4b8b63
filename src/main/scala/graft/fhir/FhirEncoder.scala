package graft.fhir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FHIR R4 resource encoding: raw JSON-string column → strongly-typed
  * nested DataFrame, one schema per resource type. This replaces the
  * reference's Pathling `pc.encode(df, resourceType, column="resource")`
  * (bzkf/fhir-to-lakehouse src/bundle_processor.py:162–166) with an
  * explicit `StructType` registry + `from_json` — the single
  * "UDF-class" operator in the reference, expressed here as a pure
  * Catalyst `JsonToStructs` (codegen-compatible, fully distributed, no
  * driver round-trips).
  *
  * Schema fidelity follows Pathling's conventions where tests observe
  * them: FHIR `date`/`dateTime` stay `StringType` (precision-preserving),
  * FHIR `decimal` → `DecimalType(32, 6)`, recursion truncated. Columns
  * outside the registry are retained losslessly in `resource_json` so no
  * information is dropped by partial schemas (SURVEY.md §2.7).
  */
object FhirEncoder {

  private val codingType = ArrayType(StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType))))

  private val codeableConcept = StructType(Seq(
    StructField("coding", codingType),
    StructField("text", StringType)))

  private val reference = StructType(Seq(
    StructField("reference", StringType),
    StructField("display", StringType)))

  private val identifierType = ArrayType(StructType(Seq(
    StructField("system", StringType),
    StructField("value", StringType))))

  private val humanName = ArrayType(StructType(Seq(
    StructField("use", StringType),
    StructField("family", StringType),
    StructField("given", ArrayType(StringType)),
    StructField("prefix", ArrayType(StringType)))))

  private val address = ArrayType(StructType(Seq(
    StructField("line", ArrayType(StringType)),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postalCode", StringType),
    StructField("country", StringType))))

  private val quantity = StructType(Seq(
    StructField("value", DecimalType(32, 6)),
    StructField("unit", StringType),
    StructField("system", StringType),
    StructField("code", StringType)))

  /** FHIR extensions (enable_extensions=True parity, main.py:107–113):
    * url + common value[x] choices, nested one level (recursion
    * truncated like Pathling truncates the recursive schema).
    */
  private val extensionType = ArrayType(StructType(Seq(
    StructField("url", StringType),
    StructField("valueString", StringType),
    StructField("valueCode", StringType),
    StructField("valueDecimal", DecimalType(32, 6)),
    StructField("extension", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("valueString", StringType),
      StructField("valueDecimal", DecimalType(32, 6)),
      StructField("valueCoding", StructType(Seq(
        StructField("system", StringType),
        StructField("code", StringType),
        StructField("display", StringType)))))))))))

  /** Per-resource-type schemas. Minimum parity columns come from the
    * reference's tests and clustering docs (FIXTURES.md §4): Patient
    * {id, active, birthDate}, Observation {id, effectiveDateTime,
    * subject}, Condition {id, recordedDate, onsetDateTime, subject}.
    */
  val schemas: Map[String, StructType] = Map(
    "Patient" -> StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("active", BooleanType),
      StructField("gender", StringType),
      StructField("birthDate", StringType),
      StructField("deceasedDateTime", StringType),
      StructField("multipleBirthBoolean", BooleanType),
      StructField("identifier", identifierType),
      StructField("name", humanName),
      StructField("address", address),
      StructField("maritalStatus", codeableConcept),
      StructField("extension", extensionType))),
    "Observation" -> StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("status", StringType),
      StructField("effectiveDateTime", StringType),
      StructField("issued", StringType),
      StructField("code", codeableConcept),
      StructField("subject", reference),
      StructField("valueQuantity", quantity))),
    "Condition" -> StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("recordedDate", StringType),
      StructField("onsetDateTime", StringType),
      StructField("abatementDateTime", StringType),
      StructField("clinicalStatus", codeableConcept),
      StructField("verificationStatus", codeableConcept),
      StructField("code", codeableConcept),
      StructField("subject", reference))),
    "Encounter" -> StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("status", StringType),
      StructField("class", StructType(Seq(
        StructField("system", StringType),
        StructField("code", StringType)))),
      StructField("subject", reference))),
    "Procedure" -> StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("status", StringType),
      StructField("performedDateTime", StringType),
      StructField("code", codeableConcept),
      StructField("subject", reference))))

  /** Fallback schema for resource types without a registered schema:
    * id only + raw JSON retention.
    */
  val genericSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType)))

  def schemaFor(resourceType: String): StructType =
    schemas.getOrElse(resourceType, genericSchema)

  /** E1 — encode: parse the raw `resource` JSON-string column of `df`
    * with the type's schema, keep only rows whose embedded
    * `resourceType` matches (Pathling filters too), flatten top-level
    * fields, and retain the raw JSON as `resource_json`.
    */
  def encode(df: DataFrame, resourceType: String,
             column: String = "resource"): DataFrame = {
    val schema = schemaFor(resourceType)
    val parsed = df
      .withColumn("_r", from_json(col(column), schema))
      .filter(col("_r.resourceType") === resourceType)
    val fields = schema.fieldNames.filter(_ != "resourceType").map(f =>
      col(s"_r.`$f`").as(f))
    parsed.select(fields :+ col(column).as("resource_json"): _*)
  }

  /** Schema-drift retention as a typed VARIANT column (Spark 4): the
    * raw resource JSON parses once into the binary variant encoding, so
    * fields the fixed schema never projected stay queryable with
    * `variant_get(col, '$.path', 'type')` — typed access with
    * per-field pushdown instead of re-parsing `resource_json` strings
    * per query. The shredded binary form is also far cheaper to scan
    * at 100 TB than JSON text.
    */
  def withVariant(df: DataFrame, column: String = "resource",
                  as: String = "resource_variant"): DataFrame =
    df.withColumn(as, parse_json(col(column)))
}
