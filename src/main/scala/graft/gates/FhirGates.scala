package graft.gates

import graft.ops.{Curation, Dedup, Multimodal, Similarity, TextStats, TopK}
import graft.tables.ResourceTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkEntry._

/** FHIR gates: the envelope pipeline (P1–P10) and the typed
  * R4 encode surface (E1, 30-type registry + generic backbone).
  *
  * Split out of SparkEntry (round 17, verdict item 8) with ZERO
  * behavior change: same keys, same lambdas, same oracle SQL —
  * SparkEntry composes the per-domain maps back into the driver
  * contract. Helpers/fixtures stay in [[graft.SparkEntry]] (imported
  * above) so memoization remains JVM-global across domains.
  */
private[graft] object FhirGates {

  /** Shadows the imported loader for THIS file's pure-query gates
    * (same rationale as RelationalGates.t): the encode gates
    * synthesize JSON from `orders`/`customer` scans, and spreading
    * the fact-sized read moves the exchange BELOW the `to_json`
    * projection, so the serialize side parallelizes too —
    * FhirEncoder.encode's own spread only covers the parse side (its
    * input already carries the to_json projection). No fixtures, no
    * writes in this file.
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Par.spreadIfLarge(graft.SparkEntry.t(s, dir, name))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.3 W1: latest-wins dedup (row_number, desc order) ----
    "q_window_dedup" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    }),


    // ---- §2.2 P3 explode (the reference's only generator) ----
    "q_explode_wordcount" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
    }),


    // ---- §2.2 P2 from_json (partial fixed schema, resource opaque) ----
    "q_from_json" -> ((s, dir) => {
      events(s, dir)
        .select(from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
    }),


    // ---- §2.2 P5/P6 split + getItem (the request_url parse) ----
    "q_split_part" -> ((s, dir) => {
      events(s, dir)
        .withColumn("request_url",
          concat_ws("/", col("event_type"), col("user_id")))
        .withColumn("parts", split(col("request_url"), "/"))
        .select(col("event_id"), col("request_url"),
          col("parts").getItem(0).as("rtype"),
          col("parts").getItem(1).as("rid"))
    }),


    // ---- §2.2 P8 isin / NOT IN fan-out filter ----
    "q_isin_filter" -> ((s, dir) => {
      events(s, dir)
        .filter(!col("event_type").isin("click", "view"))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    }),


    // ---- VARIANT ingestion: parse JSON once to the binary variant
    //      encoding, typed path access via variant_get ----
    "q_variant_get" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
    }),


    // ---- the FHIR envelope pipeline itself (P1–P6 + W1), fed with
    //      bundles synthesized from the events table; the oracle
    //      computes the expected relational result directly ----
    "q_fhir_pipeline" -> ((s, dir) => {
      val kafkaish = t(s, dir, "events").select(
        to_json(struct(array(struct(
          to_json(struct(
            lit("Patient").as("resourceType"),
            col("user_id").cast(StringType).as("id"))).as("resource"),
          struct(
            when(col("event_type") === "error", "DELETE")
              .otherwise("PUT").as("method"),
            concat_ws("/", lit("Patient"), col("user_id")).as("url"))
            .as("request"))).as("entry"))).as("value"),
        (col("user_id") % 4).cast(IntegerType).as("partition"),
        col("event_id").as("offset"))
      graft.pipeline.BundlePipeline.deduplicate(
          graft.pipeline.BundlePipeline.prepare(kafkaish))
        .select(col("request_url"), col("request_method"),
          col("resource_type"), col("request_resource_id"),
          col("partition").as("msg_partition"),
          col("offset").as("msg_offset"))
    }),


    // ---- full-R4 encode round-trip: rich Patient JSON synthesized
    //      from `customer`, parsed through the widened Pathling-parity
    //      schema (telecom/communication/meta/managingOrganization),
    //      nested fields projected back out. The oracle recomputes the
    //      same values relationally — equality proves the JSON →
    //      typed-struct round trip drops nothing ----
    "q_fhir_encode_wide" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("Patient").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        struct(col("c_custkey").cast(StringType).as("versionId"))
          .as("meta"),
        array(struct(
          lit("phone").as("system"),
          concat(lit("555-"), col("c_custkey").cast(StringType))
            .as("value"),
          lit("home").as("use"))).as("telecom"),
        array(struct(
          struct(
            array(struct(lit("urn:ietf:bcp:47").as("system"),
              lit("en-US").as("code"))).as("coding"),
            lit("English").as("text")).as("language"),
          lit(true).as("preferred"))).as("communication"),
        struct(col("c_mktsegment").as("text")).as("maritalStatus"),
        struct(concat(lit("Organization/"),
          col("c_nationkey").cast(StringType)).as("reference"))
          .as("managingOrganization"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Patient").select(
        col("id"),
        element_at(col("telecom"), 1).getField("value").as("phone"),
        element_at(element_at(col("communication"), 1)
          .getField("language").getField("coding"), 1)
          .getField("code").as("lang_code"),
        col("maritalStatus").getField("text").as("segment"),
        col("managingOrganization").getField("reference").as("org_ref"),
        col("meta").getField("versionId").as("version_id"))
    }),


    // ---- typed encode through one of the round-12 registry additions
    //      (Immunization): nested choice types, decimal(32,6) dose,
    //      protocolApplied backbone — the any-Synthea-type parity leg ----
    "q_fhir_encode_immunization" -> ((s, dir) => {
      val raw = t(s, dir, "orders").select(to_json(struct(
        lit("Immunization").as("resourceType"),
        col("o_orderkey").cast(StringType).as("id"),
        lit("completed").as("status"),
        struct(
          array(struct(lit("http://hl7.org/fhir/sid/cvx").as("system"),
            (col("o_orderkey") % 10).cast(StringType).as("code"),
            col("o_orderpriority").as("display"))).as("coding"),
          col("o_orderstatus").as("text")).as("vaccineCode"),
        struct(concat(lit("Patient/"),
          col("o_custkey").cast(StringType)).as("reference"))
          .as("patient"),
        col("o_orderdate").cast(DateType).as("occurrenceDateTime"),
        lit(true).as("primarySource"),
        struct(col("o_totalprice").as("value"), lit("mL").as("unit"))
          .as("doseQuantity"),
        array(struct(lit("seriesA").as("series"),
          lit(1).as("doseNumberPositiveInt"))).as("protocolApplied")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Immunization").select(
        col("id"), col("status"),
        element_at(col("vaccineCode").getField("coding"), 1)
          .getField("code").as("vax_code"),
        col("vaccineCode").getField("text").as("vax_text"),
        col("patient").getField("reference").as("patient_ref"),
        col("occurrenceDateTime").as("occurred"),
        col("primarySource").as("primary_source"),
        // decimal AS STRING: duckdb's pandas bridge floats decimals,
        // the canonical "1013.700000" rendering compares exactly
        col("doseQuantity").getField("value").cast(StringType)
          .as("dose_value"),
        element_at(col("protocolApplied"), 1)
          .getField("doseNumberPositiveInt").as("dose_number"),
        element_at(col("protocolApplied"), 1)
          .getField("series").as("series"))
    }),


    "q_fhir_encode_foreign" -> ((s, dir) => {
      val raw = t(s, dir, "orders").select(to_json(struct(
        lit("Basic").as("resourceType"),
        col("o_orderkey").cast(StringType).as("id"),
        struct(col("o_orderkey").cast(StringType).as("versionId"),
          lit("2024-01-01T00:00:00Z").as("lastUpdated")).as("meta"),
        lit("en").as("language"),
        array(struct(lit("urn:graft:order").as("system"),
          col("o_orderkey").cast(StringType).as("value")))
          .as("identifier"),
        array(struct(lit("http://graft/status").as("url"),
          col("o_orderstatus").as("valueString"))).as("extension"),
        col("o_orderpriority").as("conclusion"))).as("resource"))
      // Basic is R4's by-design generic resource and stays OUTSIDE
      // the registry (round 17 typed Specimen — this gate's previous
      // foreign type — in the tier-6 set), so it keeps proving the
      // generic-backbone path for ANY unseen type
      graft.fhir.FhirEncoder.encode(raw, "Basic").select(
        col("id"),
        col("meta").getField("versionId").as("version_id"),
        col("meta").getField("lastUpdated").as("last_updated"),
        col("language"),
        element_at(col("identifier"), 1).getField("value")
          .as("ident_value"),
        element_at(col("extension"), 1).getField("valueString")
          .as("status_ext"),
        get_json_object(col("resource_json"), "$.conclusion")
          .as("conclusion"))
    }),


    // ---- round-15 typed registry tier: the six remaining Synthea
    //      default types (reference data/generate-sample-data.sh:22–28
    //      → bundle_processor.py:162–166 encodes via Pathling). One
    //      exact-oracled encode round trip per type; nested choice
    //      types, Money decimal(32,6), 3-level item→detail→subDetail
    //      backbones all proven value-exact against the relational
    //      recomputation ----
    "q_fhir_encode_allergy" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("AllergyIntolerance").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/allergyintolerance-clinical")
            .as("system"),
          lit("active").as("code"))).as("coding")).as("clinicalStatus"),
        lit("allergy").as("type"),
        array(lit("food"), lit("environment")).as("category"),
        when(col("c_acctbal") > 0, "high").otherwise("low")
          .as("criticality"),
        struct(col("c_mktsegment").as("text")).as("code"),
        struct(concat(lit("Patient/"),
          col("c_custkey").cast(StringType)).as("reference"))
          .as("patient"),
        array(struct(
          array(struct(col("c_name").as("text"))).as("manifestation"),
          lit("moderate").as("severity"))).as("reaction")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "AllergyIntolerance").select(
        col("id"),
        element_at(col("clinicalStatus").getField("coding"), 1)
          .getField("code").as("clinical_status"),
        col("type").as("allergy_type"),
        element_at(col("category"), 2).as("category2"),
        col("criticality"),
        col("code").getField("text").as("code_text"),
        col("patient").getField("reference").as("patient_ref"),
        element_at(element_at(col("reaction"), 1)
          .getField("manifestation"), 1).getField("text")
          .as("manifestation_text"),
        element_at(col("reaction"), 1).getField("severity")
          .as("severity"))
    }),


    "q_fhir_encode_careplan" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(to_json(struct(
        lit("CarePlan").as("resourceType"),
        col("p_partkey").cast(StringType).as("id"),
        lit("active").as("status"),
        lit("order").as("intent"),
        array(struct(
          array(struct(lit("http://snomed.info/sct").as("system"),
            (col("p_partkey") % 7).cast(StringType).as("code")))
            .as("coding"),
          col("p_type").as("text"))).as("category"),
        col("p_name").as("title"),
        struct(concat(lit("Patient/"),
          col("p_partkey").cast(StringType)).as("reference"))
          .as("subject"),
        struct(lit("2020-01-01").as("start"),
          lit("2021-01-01").as("end")).as("period"),
        array(struct(struct(
          lit("scheduled").as("status"),
          struct(col("p_brand").as("text")).as("code"),
          struct(col("p_retailprice").as("value"), lit("1/d").as("unit"))
            .as("dailyAmount"),
          col("p_type").as("description")).as("detail")))
          .as("activity"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "CarePlan").select(
        col("id"), col("status"), col("intent"),
        element_at(col("category"), 1).getField("text")
          .as("category_text"),
        element_at(element_at(col("category"), 1).getField("coding"), 1)
          .getField("code").as("category_code"),
        col("title"),
        col("subject").getField("reference").as("subject_ref"),
        col("period").getField("start").as("period_start"),
        element_at(col("activity"), 1).getField("detail")
          .getField("status").as("activity_status"),
        element_at(col("activity"), 1).getField("detail")
          .getField("code").getField("text").as("activity_code_text"),
        element_at(col("activity"), 1).getField("detail")
          .getField("dailyAmount").getField("value").cast(StringType)
          .as("daily_amount"),
        element_at(col("activity"), 1).getField("detail")
          .getField("description").as("activity_desc"))
    }),


    "q_fhir_encode_claim" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("Claim").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit("active").as("status"),
        struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/claim-type")
            .as("system"),
          lit("institutional").as("code"))).as("coding")).as("type"),
        lit("claim").as("use"),
        struct(concat(lit("Patient/"),
          col("s_nationkey").cast(StringType)).as("reference"))
          .as("patient"),
        struct(lit("2023-01-01").as("start"),
          lit("2023-12-31").as("end")).as("billablePeriod"),
        lit("2024-01-01T00:00:00Z").as("created"),
        struct(concat(lit("Practitioner/"),
          col("s_suppkey").cast(StringType)).as("reference"))
          .as("provider"),
        array(struct(lit(1).as("sequence"),
          struct(col("s_name").as("text"))
            .as("diagnosisCodeableConcept"))).as("diagnosis"),
        array(struct(lit(1).as("sequence"), lit(true).as("focal"),
          struct(concat(lit("Coverage/"),
            col("s_suppkey").cast(StringType)).as("reference"))
            .as("coverage"))).as("insurance"),
        array(struct(
          lit(1).as("sequence"),
          struct(concat(lit("svc-"), (col("s_suppkey") % 5)
            .cast(StringType)).as("text")).as("productOrService"),
          struct(col("s_acctbal").as("value"), lit("USD").as("currency"))
            .as("net"),
          array(struct(lit(1).as("sequence"),
            struct(col("s_acctbal").as("value"),
              lit("USD").as("currency")).as("unitPrice"),
            array(struct(lit(1).as("sequence"),
              struct(col("s_acctbal").as("value"),
                lit("USD").as("currency")).as("net"))).as("subDetail")))
            .as("detail"))).as("item"),
        struct(col("s_acctbal").as("value"), lit("USD").as("currency"))
          .as("total"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Claim").select(
        col("id"), col("status"),
        element_at(col("type").getField("coding"), 1).getField("code")
          .as("claim_type"),
        col("use").as("claim_use"),
        col("patient").getField("reference").as("patient_ref"),
        col("billablePeriod").getField("start").as("billable_start"),
        col("provider").getField("reference").as("provider_ref"),
        element_at(col("diagnosis"), 1)
          .getField("diagnosisCodeableConcept").getField("text")
          .as("diagnosis_text"),
        element_at(col("insurance"), 1).getField("focal")
          .as("insurance_focal"),
        element_at(col("item"), 1).getField("productOrService")
          .getField("text").as("item_service"),
        element_at(col("item"), 1).getField("net").getField("value")
          .cast(StringType).as("item_net"),
        element_at(element_at(col("item"), 1).getField("detail"), 1)
          .getField("unitPrice").getField("value").cast(StringType)
          .as("detail_unit_price"),
        element_at(element_at(element_at(col("item"), 1)
          .getField("detail"), 1).getField("subDetail"), 1)
          .getField("net").getField("value").cast(StringType)
          .as("subdetail_net"),
        col("total").getField("value").cast(StringType)
          .as("total_value"),
        col("total").getField("currency").as("currency"))
    }),


    "q_fhir_encode_eob" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("ExplanationOfBenefit").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        lit("active").as("status"),
        lit("claim").as("use"),
        struct(concat(lit("Patient/"),
          col("c_custkey").cast(StringType)).as("reference"))
          .as("patient"),
        lit("2024-02-02T00:00:00Z").as("created"),
        struct(lit("Organization/ins1").as("reference")).as("insurer"),
        struct(concat(lit("Practitioner/"),
          col("c_nationkey").cast(StringType)).as("reference"))
          .as("provider"),
        lit("complete").as("outcome"),
        array(struct(lit(true).as("focal"),
          struct(concat(lit("Coverage/"),
            col("c_custkey").cast(StringType)).as("reference"))
            .as("coverage"))).as("insurance"),
        array(struct(lit(1).as("sequence"),
          struct(col("c_mktsegment").as("text")).as("productOrService"),
          array(struct(struct(lit("submitted").as("text")).as("category"),
            struct(col("c_acctbal").as("value"),
              lit("USD").as("currency")).as("amount")))
            .as("adjudication"))).as("item"),
        array(struct(struct(lit("submitted").as("text")).as("category"),
          struct(col("c_acctbal").as("value"), lit("USD").as("currency"))
            .as("amount"))).as("total"),
        struct(lit("2024-03-01").as("date"),
          struct(col("c_acctbal").as("value"), lit("USD").as("currency"))
            .as("amount")).as("payment"),
        array(struct(struct(col("c_name").as("text")).as("category"),
          array(struct(struct(lit("allowed").as("text")).as("type"),
            lit(10).as("allowedUnsignedInt"))).as("financial")))
          .as("benefitBalance"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "ExplanationOfBenefit").select(
        col("id"), col("status"), col("outcome"),
        col("patient").getField("reference").as("patient_ref"),
        col("provider").getField("reference").as("provider_ref"),
        element_at(col("item"), 1).getField("productOrService")
          .getField("text").as("item_service"),
        element_at(element_at(col("item"), 1).getField("adjudication"), 1)
          .getField("amount").getField("value").cast(StringType)
          .as("item_adj_amount"),
        element_at(col("total"), 1).getField("category").getField("text")
          .as("total_category"),
        element_at(col("total"), 1).getField("amount").getField("value")
          .cast(StringType).as("total_amount"),
        col("payment").getField("date").as("payment_date"),
        element_at(col("benefitBalance"), 1).getField("category")
          .getField("text").as("benefit_category"),
        element_at(element_at(col("benefitBalance"), 1)
          .getField("financial"), 1).getField("allowedUnsignedInt")
          .as("benefit_allowed"))
    }),


    "q_fhir_encode_org" -> ((s, dir) => {
      val raw = t(s, dir, "nation").select(to_json(struct(
        lit("Organization").as("resourceType"),
        col("n_nationkey").cast(StringType).as("id"),
        lit(true).as("active"),
        array(struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/organization-type")
            .as("system"),
          lit("prov").as("code"))).as("coding"))).as("type"),
        col("n_name").as("name"),
        array(lower(col("n_name"))).as("alias"),
        array(struct(lit("phone").as("system"),
          concat(lit("+1-"), col("n_nationkey").cast(StringType))
            .as("value"))).as("telecom"),
        array(struct(col("n_name").as("city"))).as("address"),
        struct(concat(lit("Organization/region-"),
          col("n_regionkey").cast(StringType)).as("reference"))
          .as("partOf"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Organization").select(
        col("id"), col("active"), col("name"),
        element_at(element_at(col("type"), 1).getField("coding"), 1)
          .getField("code").as("org_type"),
        element_at(col("alias"), 1).as("alias1"),
        element_at(col("telecom"), 1).getField("value").as("phone"),
        element_at(col("address"), 1).getField("city").as("city"),
        col("partOf").getField("reference").as("part_of"))
    }),


    "q_fhir_encode_practitioner" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("Practitioner").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit(true).as("active"),
        array(struct(lit("official").as("use"),
          col("s_name").as("family"),
          array(lit("Dr")).as("prefix"),
          split(col("s_name"), "#").as("given"))).as("name"),
        when(col("s_suppkey") % 2 === 0, "female").otherwise("male")
          .as("gender"),
        lit("1980-01-01").as("birthDate"),
        array(struct(
          struct(array(struct(
            lit("http://terminology.hl7.org/CodeSystem/v2-0360")
              .as("system"),
            lit("MD").as("code"))).as("coding")).as("code"),
          struct(concat(lit("Organization/"),
            col("s_nationkey").cast(StringType)).as("reference"))
            .as("issuer"))).as("qualification"),
        array(struct(col("s_name").as("text"))).as("communication")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Practitioner").select(
        col("id"), col("active"),
        element_at(col("name"), 1).getField("family").as("family"),
        element_at(element_at(col("name"), 1).getField("given"), 1)
          .as("given1"),
        col("gender"),
        col("birthDate").as("birth_date"),
        element_at(element_at(col("qualification"), 1).getField("code")
          .getField("coding"), 1).getField("code").as("qual_code"),
        element_at(col("qualification"), 1).getField("issuer")
          .getField("reference").as("issuer_ref"),
        element_at(col("communication"), 1).getField("text")
          .as("comm_text"))
    }),


    // ---- tier-3 typed FHIR encodes (VERDICT r15 item 3): the six
    //      remaining Synthea default-module types, each through the
    //      full JSON round trip (to_json -> FhirEncoder.encode ->
    //      typed projection) with an exact DuckDB oracle. Each gate
    //      exercises a schema corner the others don't: Device the
    //      UDI backbone, Location the 0..1 address + decimal
    //      geo-position, Medication nested Ratio quantities,
    //      Provenance the truncated entity.agent recursion,
    //      SupplyDelivery a choice-typed occurrence, ImagingStudy
    //      three levels of series/instance nesting ----

    "q_fhir_encode_device" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(to_json(struct(
        lit("Device").as("resourceType"),
        col("p_partkey").cast(StringType).as("id"),
        array(struct(
          concat(lit("(01)"), col("p_partkey").cast(StringType))
            .as("deviceIdentifier"),
          lit("https://nhi.fda.gov").as("issuer"),
          concat(lit("(01)"), col("p_partkey").cast(StringType),
            lit("(11)220101")).as("carrierHRF"))).as("udiCarrier"),
        lit("active").as("status"),
        col("p_brand").as("manufacturer"),
        lit("2022-01-01").as("manufactureDate"),
        concat(lit("L-"), col("p_size").cast(StringType))
          .as("lotNumber"),
        concat(lit("SN-"), col("p_partkey").cast(StringType))
          .as("serialNumber"),
        array(struct(col("p_name").as("name"),
          lit("user-friendly-name").as("type"))).as("deviceName"),
        col("p_type").as("modelNumber"),
        struct(array(struct(lit("http://snomed.info/sct").as("system"),
          (col("p_partkey") % 7).cast(StringType).as("code"),
          col("p_type").as("display"))).as("coding")).as("type"),
        struct(concat(lit("Patient/"),
          (col("p_partkey") % 100).cast(StringType)).as("reference"))
          .as("patient"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Device").select(
        col("id"), col("status"),
        element_at(col("udiCarrier"), 1).getField("deviceIdentifier")
          .as("udi_di"),
        element_at(col("udiCarrier"), 1).getField("carrierHRF")
          .as("udi_hrf"),
        col("manufacturer"),
        col("lotNumber").as("lot"),
        col("serialNumber").as("serial"),
        element_at(col("deviceName"), 1).getField("name")
          .as("device_name"),
        col("modelNumber").as("model"),
        element_at(col("type").getField("coding"), 1).getField("code")
          .as("type_code"),
        element_at(col("type").getField("coding"), 1)
          .getField("display").as("type_display"),
        col("patient").getField("reference").as("patient_ref"))
    }),


    "q_fhir_encode_location" -> ((s, dir) => {
      val raw = t(s, dir, "nation").select(to_json(struct(
        lit("Location").as("resourceType"),
        col("n_nationkey").cast(StringType).as("id"),
        lit("active").as("status"),
        col("n_name").as("name"),
        array(lower(col("n_name"))).as("alias"),
        lit("instance").as("mode"),
        array(struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/v3-RoleCode")
            .as("system"),
          lit("HOSP").as("code"))).as("coding"))).as("type"),
        // Location.address is 0..1 (unlike Patient's list)
        struct(col("n_name").as("city"), lit("US").as("country"))
          .as("address"),
        struct(array(struct(lit("bu").as("code"),
          lit("Building").as("display"))).as("coding"))
          .as("physicalType"),
        // quarter-step coordinates stay binary-exact in the double ->
        // json -> decimal round trip, so the oracle's DECIMAL algebra
        // lands on identical digits
        struct(
          (col("n_nationkey") * lit(3.25) - lit(40.0)).as("longitude"),
          (col("n_nationkey") * lit(1.5) - lit(12.0)).as("latitude"))
          .as("position"),
        struct(concat(lit("Organization/"),
          col("n_regionkey").cast(StringType)).as("reference"))
          .as("managingOrganization"),
        array(struct(array(lit("mon"), lit("tue")).as("daysOfWeek"),
          lit(true).as("allDay"))).as("hoursOfOperation")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Location").select(
        col("id"), col("status"), col("name"),
        element_at(col("alias"), 1).as("alias1"),
        element_at(element_at(col("type"), 1).getField("coding"), 1)
          .getField("code").as("loc_type"),
        col("address").getField("city").as("city"),
        col("address").getField("country").as("country"),
        element_at(col("physicalType").getField("coding"), 1)
          .getField("code").as("phys_code"),
        col("position").getField("longitude").cast(StringType)
          .as("longitude"),
        col("position").getField("latitude").cast(StringType)
          .as("latitude"),
        col("managingOrganization").getField("reference")
          .as("org_ref"),
        element_at(element_at(col("hoursOfOperation"), 1)
          .getField("daysOfWeek"), 1).as("day1"),
        element_at(col("hoursOfOperation"), 1).getField("allDay")
          .as("all_day"))
    }),


    "q_fhir_encode_medication" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(to_json(struct(
        lit("Medication").as("resourceType"),
        col("p_partkey").cast(StringType).as("id"),
        struct(array(struct(
          lit("http://www.nlm.nih.gov/research/umls/rxnorm")
            .as("system"),
          (col("p_partkey") % 1000).cast(StringType).as("code"),
          col("p_name").as("display"))).as("coding")).as("code"),
        lit("active").as("status"),
        struct(concat(lit("Organization/"), col("p_brand"))
          .as("reference")).as("manufacturer"),
        struct(array(struct(lit("385055001").as("code"),
          lit("Tablet").as("display"))).as("coding")).as("form"),
        struct(
          struct(col("p_size").cast("double").as("value"),
            lit("mg").as("unit")).as("numerator"),
          struct(lit(1.0).as("value"), lit("TAB").as("unit"))
            .as("denominator")).as("amount"),
        array(struct(
          struct(col("p_type").as("text")).as("itemCodeableConcept"),
          lit(true).as("isActive"),
          struct(
            struct((col("p_size") * lit(0.5)).as("value"),
              lit("mg").as("unit")).as("numerator"),
            struct(lit(1.0).as("value"), lit("TAB").as("unit"))
              .as("denominator")).as("strength"))).as("ingredient"),
        struct(col("p_brand").as("lotNumber"),
          lit("2027-12-31").as("expirationDate")).as("batch")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Medication").select(
        col("id"), col("status"),
        element_at(col("code").getField("coding"), 1).getField("code")
          .as("rx_code"),
        element_at(col("code").getField("coding"), 1)
          .getField("display").as("rx_display"),
        col("manufacturer").getField("reference").as("mfr_ref"),
        element_at(col("form").getField("coding"), 1).getField("code")
          .as("form_code"),
        col("amount").getField("numerator").getField("value")
          .cast(StringType).as("amount_num"),
        col("amount").getField("denominator").getField("unit")
          .as("amount_den_unit"),
        element_at(col("ingredient"), 1)
          .getField("itemCodeableConcept").getField("text")
          .as("ingredient_text"),
        element_at(col("ingredient"), 1).getField("isActive")
          .as("ingredient_active"),
        element_at(col("ingredient"), 1).getField("strength")
          .getField("numerator").getField("value").cast(StringType)
          .as("strength_num"),
        col("batch").getField("lotNumber").as("lot"),
        col("batch").getField("expirationDate").as("expires"))
    }),


    "q_fhir_encode_provenance" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("Provenance").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        array(struct(concat(lit("Patient/"),
          col("s_nationkey").cast(StringType)).as("reference")),
          struct(concat(lit("Encounter/"),
            col("s_suppkey").cast(StringType)).as("reference")))
          .as("target"),
        lit("2024-03-01T10:00:00Z").as("occurredDateTime"),
        lit("2024-03-01T10:05:00Z").as("recorded"),
        struct(array(struct(lit("CREATE").as("code"),
          lit("create").as("display"))).as("coding")).as("activity"),
        array(struct(
          struct(array(struct(lit("author").as("code"))).as("coding"))
            .as("type"),
          struct(concat(lit("Practitioner/"),
            col("s_suppkey").cast(StringType)).as("reference"))
            .as("who"),
          struct(concat(lit("Organization/"),
            col("s_nationkey").cast(StringType)).as("reference"))
            .as("onBehalfOf"))).as("agent"),
        array(struct(lit("source").as("role"),
          struct(concat(lit("DocumentReference/"),
            col("s_suppkey").cast(StringType)).as("reference"))
            .as("what"),
          // the one-level entity.agent recursion the schema keeps
          array(struct(
            struct(concat(lit("Device/"),
              (col("s_suppkey") % 50).cast(StringType))
              .as("reference")).as("who"))).as("agent")))
          .as("entity"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Provenance").select(
        col("id"),
        element_at(col("target"), 1).getField("reference")
          .as("target1"),
        element_at(col("target"), 2).getField("reference")
          .as("target2"),
        col("occurredDateTime").as("occurred"),
        col("recorded"),
        element_at(col("activity").getField("coding"), 1)
          .getField("code").as("activity_code"),
        element_at(element_at(col("agent"), 1).getField("type")
          .getField("coding"), 1).getField("code").as("agent_type"),
        element_at(col("agent"), 1).getField("who")
          .getField("reference").as("agent_who"),
        element_at(col("agent"), 1).getField("onBehalfOf")
          .getField("reference").as("agent_org"),
        element_at(col("entity"), 1).getField("role")
          .as("entity_role"),
        element_at(col("entity"), 1).getField("what")
          .getField("reference").as("entity_what"),
        element_at(element_at(col("entity"), 1).getField("agent"), 1)
          .getField("who").getField("reference").as("entity_agent"))
    }),


    "q_fhir_encode_supplydelivery" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("SupplyDelivery").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit("completed").as("status"),
        struct(concat(lit("Patient/"),
          col("s_nationkey").cast(StringType)).as("reference"))
          .as("patient"),
        struct(array(struct(lit("device").as("code"))).as("coding"))
          .as("type"),
        struct(
          struct(col("s_acctbal").as("value"), lit("{each}").as("unit"))
            .as("quantity"),
          struct(col("s_name").as("text")).as("itemCodeableConcept"))
          .as("suppliedItem"),
        lit("2024-06-01T08:00:00Z").as("occurrenceDateTime"),
        struct(concat(lit("Organization/"),
          col("s_suppkey").cast(StringType)).as("reference"))
          .as("supplier"),
        struct(concat(lit("Location/"),
          col("s_nationkey").cast(StringType)).as("reference"))
          .as("destination"),
        array(struct(concat(lit("Practitioner/"),
          (col("s_suppkey") % 10).cast(StringType)).as("reference")))
          .as("receiver"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "SupplyDelivery").select(
        col("id"), col("status"),
        col("patient").getField("reference").as("patient_ref"),
        element_at(col("type").getField("coding"), 1).getField("code")
          .as("type_code"),
        col("suppliedItem").getField("quantity").getField("value")
          .cast(StringType).as("qty"),
        col("suppliedItem").getField("quantity").getField("unit")
          .as("qty_unit"),
        col("suppliedItem").getField("itemCodeableConcept")
          .getField("text").as("item_text"),
        col("occurrenceDateTime").as("occurred"),
        col("supplier").getField("reference").as("supplier_ref"),
        col("destination").getField("reference").as("dest_ref"),
        element_at(col("receiver"), 1).getField("reference")
          .as("receiver_ref"))
    }),


    "q_fhir_encode_careteam" -> ((s, dir) => {
      val raw = t(s, dir, "nation").select(to_json(struct(
        lit("CareTeam").as("resourceType"),
        col("n_nationkey").cast(StringType).as("id"),
        lit("active").as("status"),
        array(struct(array(struct(
          lit("http://loinc.org").as("system"),
          lit("LA27976-2").as("code"))).as("coding"))).as("category"),
        concat(lit("Team "), col("n_name")).as("name"),
        struct(concat(lit("Patient/"),
          col("n_nationkey").cast(StringType)).as("reference"))
          .as("subject"),
        struct(lit("2024-01-01").as("start")).as("period"),
        array(
          struct(array(struct(col("n_name").as("text"))).as("role"),
            struct(concat(lit("Practitioner/"),
              col("n_nationkey").cast(StringType)).as("reference"))
              .as("member")),
          struct(array(struct(lit("patient").as("text"))).as("role"),
            struct(concat(lit("Patient/"),
              col("n_nationkey").cast(StringType)).as("reference"))
              .as("member"))).as("participant"),
        array(struct(concat(lit("Organization/"),
          col("n_regionkey").cast(StringType)).as("reference")))
          .as("managingOrganization"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "CareTeam").select(
        col("id"), col("status"), col("name"),
        element_at(element_at(col("category"), 1).getField("coding"), 1)
          .getField("code").as("category_code"),
        col("subject").getField("reference").as("subject_ref"),
        col("period").getField("start").as("period_start"),
        element_at(element_at(col("participant"), 1).getField("role"), 1)
          .getField("text").as("role1"),
        element_at(col("participant"), 1).getField("member")
          .getField("reference").as("member1"),
        element_at(col("participant"), 2).getField("member")
          .getField("reference").as("member2"),
        element_at(col("managingOrganization"), 1)
          .getField("reference").as("org_ref"))
    }),


    "q_fhir_encode_medadmin" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("MedicationAdministration").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit("completed").as("status"),
        struct(array(struct(
          lit("http://www.nlm.nih.gov/research/umls/rxnorm")
            .as("system"),
          (col("s_suppkey") % 500).cast(StringType).as("code"),
          col("s_name").as("display"))).as("coding"))
          .as("medicationCodeableConcept"),
        struct(concat(lit("Patient/"),
          col("s_nationkey").cast(StringType)).as("reference"))
          .as("subject"),
        struct(concat(lit("Encounter/"),
          col("s_suppkey").cast(StringType)).as("reference"))
          .as("context"),
        lit("2024-04-01T12:00:00Z").as("effectiveDateTime"),
        array(struct(
          struct(concat(lit("Practitioner/"),
            (col("s_suppkey") % 10).cast(StringType)).as("reference"))
            .as("actor"))).as("performer"),
        struct(concat(lit("MedicationRequest/"),
          col("s_suppkey").cast(StringType)).as("reference"))
          .as("request"),
        struct(
          lit("Once daily").as("text"),
          struct(array(struct(lit("26643006").as("code"),
            lit("Oral route").as("display"))).as("coding")).as("route"),
          struct(col("s_acctbal").as("value"), lit("mg").as("unit"))
            .as("dose")).as("dosage"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "MedicationAdministration")
        .select(
          col("id"), col("status"),
          element_at(col("medicationCodeableConcept")
            .getField("coding"), 1).getField("code").as("rx_code"),
          element_at(col("medicationCodeableConcept")
            .getField("coding"), 1).getField("display")
            .as("rx_display"),
          col("subject").getField("reference").as("subject_ref"),
          col("context").getField("reference").as("context_ref"),
          col("effectiveDateTime").as("effective"),
          element_at(col("performer"), 1).getField("actor")
            .getField("reference").as("performer_ref"),
          col("request").getField("reference").as("request_ref"),
          col("dosage").getField("text").as("dosage_text"),
          element_at(col("dosage").getField("route")
            .getField("coding"), 1).getField("code").as("route_code"),
          col("dosage").getField("dose").getField("value")
            .cast(StringType).as("dose_value"))
    }),


    "q_fhir_encode_docref" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("DocumentReference").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        struct(lit("urn:graft:doc").as("system"),
          col("c_custkey").cast(StringType).as("value"))
          .as("masterIdentifier"),
        lit("current").as("status"),
        lit("final").as("docStatus"),
        struct(array(struct(lit("http://loinc.org").as("system"),
          lit("34133-9").as("code"))).as("coding")).as("type"),
        struct(concat(lit("Patient/"),
          col("c_custkey").cast(StringType)).as("reference"))
          .as("subject"),
        lit("2024-05-01T00:00:00Z").as("date"),
        array(struct(concat(lit("Practitioner/"),
          (col("c_custkey") % 10).cast(StringType)).as("reference")))
          .as("author"),
        struct(concat(lit("Organization/"),
          col("c_nationkey").cast(StringType)).as("reference"))
          .as("custodian"),
        array(struct(
          struct(lit("text/plain; charset=utf-8").as("contentType"),
            concat(lit("note-"), col("c_custkey").cast(StringType))
              .as("title")).as("attachment"),
          struct(lit("urn:ihe:iti:xds:2017:mimeTypeSufficient")
            .as("code")).as("format"))).as("content"),
        struct(
          array(struct(concat(lit("Encounter/"),
            col("c_custkey").cast(StringType)).as("reference")))
            .as("encounter"),
          struct(col("c_mktsegment").as("text")).as("practiceSetting"))
          .as("context"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "DocumentReference").select(
        col("id"), col("status"),
        col("docStatus").as("doc_status"),
        col("masterIdentifier").getField("value").as("master_id"),
        element_at(col("type").getField("coding"), 1).getField("code")
          .as("type_code"),
        col("subject").getField("reference").as("subject_ref"),
        col("date").as("doc_date"),
        element_at(col("author"), 1).getField("reference")
          .as("author_ref"),
        col("custodian").getField("reference").as("custodian_ref"),
        element_at(col("content"), 1).getField("attachment")
          .getField("contentType").as("mime"),
        element_at(col("content"), 1).getField("attachment")
          .getField("title").as("title"),
        element_at(col("content"), 1).getField("format")
          .getField("code").as("format_code"),
        element_at(col("context").getField("encounter"), 1)
          .getField("reference").as("encounter_ref"),
        col("context").getField("practiceSetting").getField("text")
          .as("setting"))
    }),


    "q_fhir_encode_imagingstudy" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("ImagingStudy").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        lit("available").as("status"),
        array(struct(
          lit("http://dicom.nema.org/resources/ontology/DCM")
            .as("system"),
          when(col("c_custkey") % 2 === 0, "CT").otherwise("MR")
            .as("code"))).as("modality"),
        struct(concat(lit("Patient/"),
          col("c_custkey").cast(StringType)).as("reference"))
          .as("subject"),
        lit("2024-02-15T09:30:00Z").as("started"),
        ((col("c_custkey") % 4) + 1).cast(IntegerType)
          .as("numberOfSeries"),
        ((col("c_custkey") % 4 + 1) * 10).cast(IntegerType)
          .as("numberOfInstances"),
        array(struct(array(struct(
          lit("http://snomed.info/sct").as("system"),
          lit("241615005").as("code"))).as("coding")))
          .as("procedureCode"),
        array(struct(
          concat(lit("1.2.840."), col("c_custkey").cast(StringType))
            .as("uid"),
          lit(1).as("number"),
          struct(lit("DX").as("code")).as("modality"),
          col("c_mktsegment").as("description"),
          lit(10).as("numberOfInstances"),
          array(struct(
            concat(lit("1.2.840."), col("c_custkey").cast(StringType),
              lit(".1")).as("uid"),
            struct(lit("1.2.840.10008.5.1.4.1.1.1.1").as("code"))
              .as("sopClass"),
            lit(1).as("number"),
            lit("frame-1").as("title"))).as("instance")))
          .as("series"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "ImagingStudy").select(
        col("id"), col("status"),
        element_at(col("modality"), 1).getField("code")
          .as("modality_code"),
        col("subject").getField("reference").as("subject_ref"),
        col("started"),
        col("numberOfSeries").as("n_series"),
        col("numberOfInstances").as("n_instances"),
        element_at(element_at(col("procedureCode"), 1)
          .getField("coding"), 1).getField("code").as("proc_code"),
        element_at(col("series"), 1).getField("uid").as("series_uid"),
        element_at(col("series"), 1).getField("modality")
          .getField("code").as("series_modality"),
        element_at(col("series"), 1).getField("description")
          .as("series_desc"),
        element_at(element_at(col("series"), 1).getField("instance"), 1)
          .getField("uid").as("instance_uid"),
        element_at(element_at(col("series"), 1).getField("instance"), 1)
          .getField("sopClass").getField("code").as("sop_class"),
        element_at(element_at(col("series"), 1).getField("instance"), 1)
          .getField("title").as("instance_title"))
    }),


    // ---- tier-5 typed FHIR: Goal — target backbone with choice
    //      types (detailQuantity decimals, dueDate) exercised through
    //      from_json against the registered schema ----
    "q_fhir_encode_goal" -> ((s, dir) => {
      val raw = t(s, dir, "nation").select(to_json(struct(
        lit("Goal").as("resourceType"),
        col("n_nationkey").cast(StringType).as("id"),
        lit("active").as("lifecycleStatus"),
        struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/goal-achievement")
            .as("system"),
          lit("in-progress").as("code"))).as("coding"))
          .as("achievementStatus"),
        struct(concat(lit("Goal for "), col("n_name")).as("text"))
          .as("description"),
        struct(concat(lit("Patient/"),
          col("n_nationkey").cast(StringType)).as("reference"))
          .as("subject"),
        lit("2024-01-01").as("startDate"),
        array(struct(
          struct(array(struct(lit("4548-4").as("code"))).as("coding"))
            .as("measure"),
          struct(((col("n_nationkey") % 5) + lit(5))
            .cast(DecimalType(32, 6)).as("value"),
            lit("%").as("unit")).as("detailQuantity"),
          lit("2024-12-31").as("dueDate"))).as("target"),
        array(struct(concat(lit("Condition/"),
          col("n_nationkey").cast(StringType)).as("reference")))
          .as("addresses"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Goal").select(
        col("id"),
        col("lifecycleStatus").as("lifecycle_status"),
        element_at(col("achievementStatus").getField("coding"), 1)
          .getField("code").as("achievement_code"),
        col("description").getField("text").as("description_text"),
        col("subject").getField("reference").as("subject_ref"),
        col("startDate").as("start_date"),
        element_at(element_at(col("target"), 1).getField("measure")
          .getField("coding"), 1).getField("code").as("measure_code"),
        element_at(col("target"), 1).getField("detailQuantity")
          .getField("value").cast(StringType).as("target_value"),
        element_at(col("target"), 1).getField("detailQuantity")
          .getField("unit").as("target_unit"),
        element_at(col("target"), 1).getField("dueDate").as("due_date"),
        element_at(col("addresses"), 1).getField("reference")
          .as("addresses_ref"))
    }),


    // ---- tier-5 typed FHIR: PractitionerRole — availableTime /
    //      notAvailable backbones with time strings kept
    //      precision-preserving ----
    "q_fhir_encode_practitionerrole" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("PractitionerRole").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit(true).as("active"),
        struct(lit("2020-01-01").as("start")).as("period"),
        struct(concat(lit("Practitioner/"),
          (col("s_suppkey") % 10).cast(StringType)).as("reference"))
          .as("practitioner"),
        struct(concat(lit("Organization/"),
          col("s_nationkey").cast(StringType)).as("reference"))
          .as("organization"),
        array(struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/practitioner-role")
            .as("system"),
          lit("doctor").as("code"))).as("coding"))).as("code"),
        array(struct(array(struct(
          lit("394814009").as("code"),
          col("s_name").as("display"))).as("coding"))).as("specialty"),
        array(struct(concat(lit("Location/"),
          col("s_nationkey").cast(StringType)).as("reference")))
          .as("location"),
        array(struct(
          array(lit("mon"), lit("wed"), lit("fri")).as("daysOfWeek"),
          lit(false).as("allDay"),
          lit("09:00:00").as("availableStartTime"),
          lit("17:00:00").as("availableEndTime"))).as("availableTime"),
        array(struct(
          lit("public holidays").as("description"),
          struct(lit("2024-12-24").as("start"),
            lit("2024-12-26").as("end")).as("during")))
          .as("notAvailable"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "PractitionerRole").select(
        col("id"), col("active"),
        col("period").getField("start").as("period_start"),
        col("practitioner").getField("reference").as("practitioner_ref"),
        col("organization").getField("reference").as("org_ref"),
        element_at(element_at(col("code"), 1).getField("coding"), 1)
          .getField("code").as("role_code"),
        element_at(element_at(col("specialty"), 1).getField("coding"), 1)
          .getField("display").as("specialty_display"),
        element_at(col("location"), 1).getField("reference")
          .as("location_ref"),
        element_at(element_at(col("availableTime"), 1)
          .getField("daysOfWeek"), 2).as("day2"),
        element_at(col("availableTime"), 1)
          .getField("availableStartTime").as("avail_start"),
        element_at(col("notAvailable"), 1).getField("description")
          .as("na_desc"),
        element_at(col("notAvailable"), 1).getField("during")
          .getField("end").as("na_end"))
    }),


    // ---- tier-6 typed FHIR: the configured-type long tail. The
    //      reference accepts ANY resource_types config
    //      (settings.py:69–75); bzkf's oncology deployment makes
    //      Specimen / ServiceRequest / MedicationStatement / Coverage
    //      / RelatedPerson realistic traffic. One exact-oracled encode
    //      round trip per type ----
    "q_fhir_encode_specimen" -> ((s, dir) => {
      val raw = t(s, dir, "part").select(to_json(struct(
        lit("Specimen").as("resourceType"),
        col("p_partkey").cast(StringType).as("id"),
        struct(lit("urn:graft:accession").as("system"),
          concat(lit("ACC-"), col("p_partkey").cast(StringType))
            .as("value")).as("accessionIdentifier"),
        lit("available").as("status"),
        struct(array(struct(
          lit("http://snomed.info/sct").as("system"),
          lit("119376003").as("code"),
          col("p_type").as("display"))).as("coding")).as("type"),
        struct(concat(lit("Patient/"),
          (col("p_partkey") % 100).cast(StringType)).as("reference"))
          .as("subject"),
        lit("2024-03-01T08:30:00Z").as("receivedTime"),
        struct(
          lit("2024-03-01T08:00:00Z").as("collectedDateTime"),
          struct(col("p_size").cast(DecimalType(32, 6)).as("value"),
            lit("mL").as("unit")).as("quantity"),
          struct(array(struct(lit("368149001").as("code"))).as("coding"))
            .as("bodySite")).as("collection"),
        array(struct(
          col("p_brand").as("description"),
          struct((col("p_partkey") % 50).cast(DecimalType(32, 6))
            .as("value"), lit("mL").as("unit")).as("capacity")))
          .as("container"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Specimen").select(
        col("id"),
        col("accessionIdentifier").getField("value").as("accession"),
        col("status"),
        element_at(col("type").getField("coding"), 1)
          .getField("display").as("type_display"),
        col("subject").getField("reference").as("subject_ref"),
        col("receivedTime").as("received_time"),
        col("collection").getField("collectedDateTime")
          .as("collected_at"),
        col("collection").getField("quantity").getField("value")
          .cast(StringType).as("coll_qty"),
        element_at(col("collection").getField("bodySite")
          .getField("coding"), 1).getField("code").as("body_site"),
        element_at(col("container"), 1).getField("description")
          .as("container_desc"),
        element_at(col("container"), 1).getField("capacity")
          .getField("value").cast(StringType).as("container_cap"))
    }),


    "q_fhir_encode_servicerequest" -> ((s, dir) => {
      // every 2nd order: the encode round trip is per-row work (json
      // render + full typed parse); half the volume proves the same
      val raw = t(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === 0).select(to_json(struct(
        lit("ServiceRequest").as("resourceType"),
        col("o_orderkey").cast(StringType).as("id"),
        lit("active").as("status"),
        lit("order").as("intent"),
        array(struct(array(struct(
          lit("http://snomed.info/sct").as("system"),
          lit("108252007").as("code"))).as("coding"))).as("category"),
        // %4 splits the kept (even) keys 50/50 — %2 would be constant
        when(col("o_orderkey") % 4 === 0, "routine")
          .otherwise("urgent").as("priority"),
        lit(false).as("doNotPerform"),
        struct(array(struct(lit("15220000").as("code"),
          lit("Laboratory test").as("display"))).as("coding"),
          col("o_orderpriority").as("text")).as("code"),
        struct((col("o_orderkey") % 5 + 1).cast(DecimalType(32, 6))
          .as("value"), lit("unit").as("unit")).as("quantityQuantity"),
        struct(concat(lit("Patient/"),
          col("o_custkey").cast(StringType)).as("reference"))
          .as("subject"),
        col("o_orderdate").cast(StringType).as("occurrenceDateTime"),
        col("o_orderdate").cast(StringType).as("authoredOn"),
        struct(concat(lit("Practitioner/"),
          (col("o_orderkey") % 7).cast(StringType)).as("reference"))
          .as("requester"),
        array(struct(array(struct(lit("183524004").as("code")))
          .as("coding"), concat(lit("Ref: "), col("o_orderstatus"))
          .as("text"))).as("reasonCode")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "ServiceRequest").select(
        col("id"), col("status"), col("intent"),
        element_at(element_at(col("category"), 1).getField("coding"), 1)
          .getField("code").as("category_code"),
        col("priority"), col("doNotPerform").as("do_not_perform"),
        element_at(col("code").getField("coding"), 1)
          .getField("display").as("code_display"),
        col("code").getField("text").as("code_text"),
        col("quantityQuantity").getField("value").cast(StringType)
          .as("qty"),
        col("subject").getField("reference").as("subject_ref"),
        col("occurrenceDateTime").as("occurrence_at"),
        col("authoredOn").as("authored_on"),
        col("requester").getField("reference").as("requester_ref"),
        element_at(element_at(col("reasonCode"), 1)
          .getField("coding"), 1).getField("code").as("reason_code"),
        element_at(col("reasonCode"), 1).getField("text")
          .as("reason_text"))
    }),


    "q_fhir_encode_medstatement" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(to_json(struct(
        lit("MedicationStatement").as("resourceType"),
        col("c_custkey").cast(StringType).as("id"),
        lit("active").as("status"),
        struct(array(struct(lit("inpatient").as("code"))).as("coding"))
          .as("category"),
        struct(array(struct(
          lit("http://www.nlm.nih.gov/research/umls/rxnorm").as("system"),
          (col("c_custkey") % 1000).cast(StringType).as("code"),
          col("c_name").as("display"))).as("coding"))
          .as("medicationCodeableConcept"),
        struct(concat(lit("Patient/"),
          col("c_custkey").cast(StringType)).as("reference"))
          .as("subject"),
        struct(lit("2024-01-01").as("start"),
          lit("2024-06-30").as("end")).as("effectivePeriod"),
        lit("2024-07-01").as("dateAsserted"),
        array(struct(
          lit(1).as("sequence"),
          concat(lit("Take as directed: "), col("c_mktsegment"))
            .as("text"),
          struct(struct(lit(2).as("frequency"),
            lit(1).cast(DecimalType(32, 6)).as("period"),
            lit("d").as("periodUnit")).as("repeat")).as("timing"),
          array(struct(struct(
            (col("c_custkey") % 3 + 1).cast(DecimalType(32, 6))
              .as("value"),
            lit("tablet").as("unit")).as("doseQuantity")))
            .as("doseAndRate"))).as("dosage"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "MedicationStatement").select(
        col("id"), col("status"),
        element_at(col("category").getField("coding"), 1)
          .getField("code").as("category_code"),
        element_at(col("medicationCodeableConcept")
          .getField("coding"), 1).getField("code").as("med_code"),
        element_at(col("medicationCodeableConcept")
          .getField("coding"), 1).getField("display").as("med_display"),
        col("subject").getField("reference").as("subject_ref"),
        col("effectivePeriod").getField("start").as("eff_start"),
        col("effectivePeriod").getField("end").as("eff_end"),
        col("dateAsserted").as("date_asserted"),
        element_at(col("dosage"), 1).getField("text").as("dosage_text"),
        element_at(col("dosage"), 1).getField("timing")
          .getField("repeat").getField("frequency").as("dose_freq"),
        element_at(col("dosage"), 1).getField("timing")
          .getField("repeat").getField("periodUnit").as("dose_unit"),
        element_at(element_at(col("dosage"), 1)
          .getField("doseAndRate"), 1).getField("doseQuantity")
          .getField("value").cast(StringType).as("dose_qty"))
    }),


    "q_fhir_encode_coverage" -> ((s, dir) => {
      val raw = t(s, dir, "supplier").select(to_json(struct(
        lit("Coverage").as("resourceType"),
        col("s_suppkey").cast(StringType).as("id"),
        lit("active").as("status"),
        struct(array(struct(lit("EHCPOL").as("code"))).as("coding"))
          .as("type"),
        concat(lit("SUB-"), col("s_suppkey").cast(StringType))
          .as("subscriberId"),
        struct(concat(lit("Patient/"),
          col("s_suppkey").cast(StringType)).as("reference"))
          .as("beneficiary"),
        struct(array(struct(lit("self").as("code"))).as("coding"))
          .as("relationship"),
        struct(lit("2024-01-01").as("start")).as("period"),
        array(struct(concat(lit("Organization/"),
          col("s_nationkey").cast(StringType)).as("reference"),
          col("s_name").as("display"))).as("payor"),
        array(struct(
          struct(array(struct(lit("group").as("code"))).as("coding"))
            .as("type"),
          concat(lit("GRP-"), (col("s_suppkey") % 10).cast(StringType))
            .as("value"),
          col("s_name").as("name"))).as("class"),
        (col("s_suppkey") % 3 + 1).cast(IntegerType).as("order"),
        lit("provider-network").as("network"),
        array(struct(
          struct(array(struct(lit("copay").as("code"))).as("coding"))
            .as("type"),
          struct((col("s_suppkey") % 20).cast(DecimalType(32, 6))
            .as("value"), lit("USD").as("currency")).as("valueMoney")))
          .as("costToBeneficiary"),
        lit(true).as("subrogation"))).as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "Coverage").select(
        col("id"), col("status"),
        element_at(col("type").getField("coding"), 1)
          .getField("code").as("type_code"),
        col("subscriberId").as("subscriber_id"),
        col("beneficiary").getField("reference").as("beneficiary_ref"),
        element_at(col("relationship").getField("coding"), 1)
          .getField("code").as("relationship_code"),
        col("period").getField("start").as("period_start"),
        element_at(col("payor"), 1).getField("reference")
          .as("payor_ref"),
        element_at(col("payor"), 1).getField("display")
          .as("payor_display"),
        element_at(col("class"), 1).getField("value").as("class_value"),
        element_at(col("class"), 1).getField("name").as("class_name"),
        col("order").as("cov_order"),
        col("network"),
        element_at(col("costToBeneficiary"), 1).getField("valueMoney")
          .getField("value").cast(StringType).as("copay_value"),
        element_at(col("costToBeneficiary"), 1).getField("valueMoney")
          .getField("currency").as("copay_currency"),
        col("subrogation"))
    }),


    "q_fhir_encode_relatedperson" -> ((s, dir) => {
      val raw = t(s, dir, "nation").select(to_json(struct(
        lit("RelatedPerson").as("resourceType"),
        col("n_nationkey").cast(StringType).as("id"),
        lit(true).as("active"),
        struct(concat(lit("Patient/"),
          col("n_nationkey").cast(StringType)).as("reference"))
          .as("patient"),
        array(struct(array(struct(
          lit("http://terminology.hl7.org/CodeSystem/v3-RoleCode")
            .as("system"),
          lit("SPS").as("code"))).as("coding"))).as("relationship"),
        array(struct(lit("official").as("use"),
          col("n_name").as("family"),
          array(lit("Alex"), lit("J")).as("given"))).as("name"),
        array(struct(lit("phone").as("system"),
          concat(lit("+1-555-"),
            lpad(col("n_nationkey").cast(StringType), 4, "0"))
            .as("value"),
          lit("home").as("use"), lit(1).as("rank"))).as("telecom"),
        when(col("n_nationkey") % 2 === 0, "female")
          .otherwise("male").as("gender"),
        lit("1980-05-15").as("birthDate"),
        array(struct(lit("home").as("use"),
          array(concat(col("n_nationkey").cast(StringType),
            lit(" Main St"))).as("line"),
          lit("Springfield").as("city"),
          col("n_name").as("country"))).as("address"),
        struct(lit("2020-01-01").as("start")).as("period"),
        array(struct(
          struct(array(struct(lit("en").as("code"))).as("coding"))
            .as("language"),
          lit(true).as("preferred"))).as("communication")))
        .as("resource"))
      graft.fhir.FhirEncoder.encode(raw, "RelatedPerson").select(
        col("id"), col("active"),
        col("patient").getField("reference").as("patient_ref"),
        element_at(element_at(col("relationship"), 1)
          .getField("coding"), 1).getField("code").as("rel_code"),
        element_at(col("name"), 1).getField("family").as("name_family"),
        element_at(element_at(col("name"), 1).getField("given"), 2)
          .as("given2"),
        element_at(col("telecom"), 1).getField("value")
          .as("telecom_value"),
        element_at(col("telecom"), 1).getField("rank")
          .as("telecom_rank"),
        col("gender"), col("birthDate").as("birth_date"),
        element_at(element_at(col("address"), 1).getField("line"), 1)
          .as("addr_line"),
        element_at(col("address"), 1).getField("city").as("addr_city"),
        element_at(col("address"), 1).getField("country").as("country"),
        element_at(element_at(col("communication"), 1)
          .getField("language").getField("coding"), 1)
          .getField("code").as("comm_lang"),
        element_at(col("communication"), 1).getField("preferred")
          .as("comm_preferred"))
    }),

  )

  def oracleSql: Map[String, String] = Map(

    "q_variant_get" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,


    "q_window_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,


    "q_explode_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word""".stripMargin,


    "q_from_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  count(*) AS cnt
        |FROM events GROUP BY k""".stripMargin,


    "q_split_part" ->
      """SELECT event_id,
        |  concat(event_type, '/', CAST(user_id AS VARCHAR)) AS request_url,
        |  split_part(concat(event_type, '/', CAST(user_id AS VARCHAR)), '/', 1) AS rtype,
        |  split_part(concat(event_type, '/', CAST(user_id AS VARCHAR)), '/', 2) AS rid
        |FROM events""".stripMargin,


    "q_isin_filter" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE event_type NOT IN ('click', 'view') GROUP BY event_type""".stripMargin,


    "q_fhir_pipeline" ->
      """SELECT request_url, request_method, resource_type,
        |  request_resource_id, msg_partition, msg_offset
        |FROM (
        |  SELECT concat('Patient/', CAST(user_id AS VARCHAR)) AS request_url,
        |    CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END
        |      AS request_method,
        |    'Patient' AS resource_type,
        |    CAST(user_id AS VARCHAR) AS request_resource_id,
        |    CAST(user_id % 4 AS INTEGER) AS msg_partition,
        |    event_id AS msg_offset,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY user_id % 4 ASC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,


    "q_fhir_encode_wide" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  concat('555-', CAST(c_custkey AS VARCHAR)) AS phone,
        |  'en-US' AS lang_code,
        |  c_mktsegment AS segment,
        |  concat('Organization/', CAST(c_nationkey AS VARCHAR)) AS org_ref,
        |  CAST(c_custkey AS VARCHAR) AS version_id
        |FROM customer""".stripMargin,


    "q_fhir_encode_immunization" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |  'completed' AS status,
        |  CAST(o_orderkey % 10 AS VARCHAR) AS vax_code,
        |  o_orderstatus AS vax_text,
        |  'Patient/' || CAST(o_custkey AS VARCHAR) AS patient_ref,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS occurred,
        |  TRUE AS primary_source,
        |  CAST(CAST(o_totalprice AS DECIMAL(32,6)) AS VARCHAR) AS dose_value,
        |  CAST(1 AS INTEGER) AS dose_number,
        |  'seriesA' AS series
        |FROM orders""".stripMargin,


    "q_fhir_encode_foreign" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |  CAST(o_orderkey AS VARCHAR) AS version_id,
        |  '2024-01-01T00:00:00Z' AS last_updated,
        |  'en' AS language,
        |  CAST(o_orderkey AS VARCHAR) AS ident_value,
        |  o_orderstatus AS status_ext,
        |  o_orderpriority AS conclusion
        |FROM orders""".stripMargin,


    "q_fhir_encode_allergy" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  'active' AS clinical_status,
        |  'allergy' AS allergy_type,
        |  'environment' AS category2,
        |  CASE WHEN c_acctbal > 0 THEN 'high' ELSE 'low' END AS criticality,
        |  c_mktsegment AS code_text,
        |  'Patient/' || CAST(c_custkey AS VARCHAR) AS patient_ref,
        |  c_name AS manifestation_text,
        |  'moderate' AS severity
        |FROM customer""".stripMargin,


    "q_fhir_encode_careplan" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'order' AS intent,
        |  p_type AS category_text,
        |  CAST(p_partkey % 7 AS VARCHAR) AS category_code,
        |  p_name AS title,
        |  'Patient/' || CAST(p_partkey AS VARCHAR) AS subject_ref,
        |  '2020-01-01' AS period_start,
        |  'scheduled' AS activity_status,
        |  p_brand AS activity_code_text,
        |  CAST(CAST(p_retailprice AS DECIMAL(32,6)) AS VARCHAR) AS daily_amount,
        |  p_type AS activity_desc
        |FROM part""".stripMargin,


    "q_fhir_encode_claim" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'institutional' AS claim_type,
        |  'claim' AS claim_use,
        |  'Patient/' || CAST(s_nationkey AS VARCHAR) AS patient_ref,
        |  '2023-01-01' AS billable_start,
        |  'Practitioner/' || CAST(s_suppkey AS VARCHAR) AS provider_ref,
        |  s_name AS diagnosis_text,
        |  TRUE AS insurance_focal,
        |  'svc-' || CAST(s_suppkey % 5 AS VARCHAR) AS item_service,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS item_net,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS detail_unit_price,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS subdetail_net,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS total_value,
        |  'USD' AS currency
        |FROM supplier""".stripMargin,


    "q_fhir_encode_eob" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'complete' AS outcome,
        |  'Patient/' || CAST(c_custkey AS VARCHAR) AS patient_ref,
        |  'Practitioner/' || CAST(c_nationkey AS VARCHAR) AS provider_ref,
        |  c_mktsegment AS item_service,
        |  CAST(CAST(c_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS item_adj_amount,
        |  'submitted' AS total_category,
        |  CAST(CAST(c_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS total_amount,
        |  '2024-03-01' AS payment_date,
        |  c_name AS benefit_category,
        |  CAST(10 AS INTEGER) AS benefit_allowed
        |FROM customer""".stripMargin,


    "q_fhir_encode_org" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        |  TRUE AS active,
        |  n_name AS name,
        |  'prov' AS org_type,
        |  lower(n_name) AS alias1,
        |  '+1-' || CAST(n_nationkey AS VARCHAR) AS phone,
        |  n_name AS city,
        |  'Organization/region-' || CAST(n_regionkey AS VARCHAR) AS part_of
        |FROM nation""".stripMargin,


    "q_fhir_encode_practitioner" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  TRUE AS active,
        |  s_name AS family,
        |  string_split(s_name, '#')[1] AS given1,
        |  CASE WHEN s_suppkey % 2 = 0 THEN 'female' ELSE 'male' END AS gender,
        |  '1980-01-01' AS birth_date,
        |  'MD' AS qual_code,
        |  'Organization/' || CAST(s_nationkey AS VARCHAR) AS issuer_ref,
        |  s_name AS comm_text
        |FROM supplier""".stripMargin,


    "q_fhir_encode_device" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  '(01)' || CAST(p_partkey AS VARCHAR) AS udi_di,
        |  '(01)' || CAST(p_partkey AS VARCHAR) || '(11)220101' AS udi_hrf,
        |  p_brand AS manufacturer,
        |  'L-' || CAST(p_size AS VARCHAR) AS lot,
        |  'SN-' || CAST(p_partkey AS VARCHAR) AS serial,
        |  p_name AS device_name,
        |  p_type AS model,
        |  CAST(p_partkey % 7 AS VARCHAR) AS type_code,
        |  p_type AS type_display,
        |  'Patient/' || CAST(p_partkey % 100 AS VARCHAR) AS patient_ref
        |FROM part""".stripMargin,


    "q_fhir_encode_location" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  n_name AS name,
        |  lower(n_name) AS alias1,
        |  'HOSP' AS loc_type,
        |  n_name AS city,
        |  'US' AS country,
        |  'bu' AS phys_code,
        |  CAST(CAST(n_nationkey * 3.25 - 40 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS longitude,
        |  CAST(CAST(n_nationkey * 1.5 - 12 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS latitude,
        |  'Organization/' || CAST(n_regionkey AS VARCHAR) AS org_ref,
        |  'mon' AS day1,
        |  TRUE AS all_day
        |FROM nation""".stripMargin,


    "q_fhir_encode_medication" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  CAST(p_partkey % 1000 AS VARCHAR) AS rx_code,
        |  p_name AS rx_display,
        |  'Organization/' || p_brand AS mfr_ref,
        |  '385055001' AS form_code,
        |  CAST(CAST(p_size AS DECIMAL(32,6)) AS VARCHAR) AS amount_num,
        |  'TAB' AS amount_den_unit,
        |  p_type AS ingredient_text,
        |  TRUE AS ingredient_active,
        |  CAST(CAST(p_size * 0.5 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS strength_num,
        |  p_brand AS lot,
        |  '2027-12-31' AS expires
        |FROM part""".stripMargin,


    "q_fhir_encode_provenance" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  'Patient/' || CAST(s_nationkey AS VARCHAR) AS target1,
        |  'Encounter/' || CAST(s_suppkey AS VARCHAR) AS target2,
        |  '2024-03-01T10:00:00Z' AS occurred,
        |  '2024-03-01T10:05:00Z' AS recorded,
        |  'CREATE' AS activity_code,
        |  'author' AS agent_type,
        |  'Practitioner/' || CAST(s_suppkey AS VARCHAR) AS agent_who,
        |  'Organization/' || CAST(s_nationkey AS VARCHAR) AS agent_org,
        |  'source' AS entity_role,
        |  'DocumentReference/' || CAST(s_suppkey AS VARCHAR) AS entity_what,
        |  'Device/' || CAST(s_suppkey % 50 AS VARCHAR) AS entity_agent
        |FROM supplier""".stripMargin,


    "q_fhir_encode_supplydelivery" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  'completed' AS status,
        |  'Patient/' || CAST(s_nationkey AS VARCHAR) AS patient_ref,
        |  'device' AS type_code,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS qty,
        |  '{each}' AS qty_unit,
        |  s_name AS item_text,
        |  '2024-06-01T08:00:00Z' AS occurred,
        |  'Organization/' || CAST(s_suppkey AS VARCHAR) AS supplier_ref,
        |  'Location/' || CAST(s_nationkey AS VARCHAR) AS dest_ref,
        |  'Practitioner/' || CAST(s_suppkey % 10 AS VARCHAR) AS receiver_ref
        |FROM supplier""".stripMargin,


    "q_fhir_encode_careteam" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'Team ' || n_name AS name,
        |  'LA27976-2' AS category_code,
        |  'Patient/' || CAST(n_nationkey AS VARCHAR) AS subject_ref,
        |  '2024-01-01' AS period_start,
        |  n_name AS role1,
        |  'Practitioner/' || CAST(n_nationkey AS VARCHAR) AS member1,
        |  'Patient/' || CAST(n_nationkey AS VARCHAR) AS member2,
        |  'Organization/' || CAST(n_regionkey AS VARCHAR) AS org_ref
        |FROM nation""".stripMargin,


    "q_fhir_encode_medadmin" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  'completed' AS status,
        |  CAST(s_suppkey % 500 AS VARCHAR) AS rx_code,
        |  s_name AS rx_display,
        |  'Patient/' || CAST(s_nationkey AS VARCHAR) AS subject_ref,
        |  'Encounter/' || CAST(s_suppkey AS VARCHAR) AS context_ref,
        |  '2024-04-01T12:00:00Z' AS effective,
        |  'Practitioner/' || CAST(s_suppkey % 10 AS VARCHAR) AS performer_ref,
        |  'MedicationRequest/' || CAST(s_suppkey AS VARCHAR) AS request_ref,
        |  'Once daily' AS dosage_text,
        |  '26643006' AS route_code,
        |  CAST(CAST(s_acctbal AS DECIMAL(32,6)) AS VARCHAR) AS dose_value
        |FROM supplier""".stripMargin,


    "q_fhir_encode_docref" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  'current' AS status,
        |  'final' AS doc_status,
        |  CAST(c_custkey AS VARCHAR) AS master_id,
        |  '34133-9' AS type_code,
        |  'Patient/' || CAST(c_custkey AS VARCHAR) AS subject_ref,
        |  '2024-05-01T00:00:00Z' AS doc_date,
        |  'Practitioner/' || CAST(c_custkey % 10 AS VARCHAR) AS author_ref,
        |  'Organization/' || CAST(c_nationkey AS VARCHAR) AS custodian_ref,
        |  'text/plain; charset=utf-8' AS mime,
        |  'note-' || CAST(c_custkey AS VARCHAR) AS title,
        |  'urn:ihe:iti:xds:2017:mimeTypeSufficient' AS format_code,
        |  'Encounter/' || CAST(c_custkey AS VARCHAR) AS encounter_ref,
        |  c_mktsegment AS setting
        |FROM customer""".stripMargin,


    "q_fhir_encode_imagingstudy" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  'available' AS status,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'CT' ELSE 'MR' END
        |    AS modality_code,
        |  'Patient/' || CAST(c_custkey AS VARCHAR) AS subject_ref,
        |  '2024-02-15T09:30:00Z' AS started,
        |  CAST(c_custkey % 4 + 1 AS INTEGER) AS n_series,
        |  CAST((c_custkey % 4 + 1) * 10 AS INTEGER) AS n_instances,
        |  '241615005' AS proc_code,
        |  '1.2.840.' || CAST(c_custkey AS VARCHAR) AS series_uid,
        |  'DX' AS series_modality,
        |  c_mktsegment AS series_desc,
        |  '1.2.840.' || CAST(c_custkey AS VARCHAR) || '.1' AS instance_uid,
        |  '1.2.840.10008.5.1.4.1.1.1.1' AS sop_class,
        |  'frame-1' AS instance_title
        |FROM customer""".stripMargin,


    "q_fhir_encode_goal" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        |  'active' AS lifecycle_status,
        |  'in-progress' AS achievement_code,
        |  'Goal for ' || n_name AS description_text,
        |  'Patient/' || CAST(n_nationkey AS VARCHAR) AS subject_ref,
        |  '2024-01-01' AS start_date,
        |  '4548-4' AS measure_code,
        |  CAST(CAST(n_nationkey % 5 + 5 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS target_value,
        |  '%' AS target_unit,
        |  '2024-12-31' AS due_date,
        |  'Condition/' || CAST(n_nationkey AS VARCHAR) AS addresses_ref
        |FROM nation""".stripMargin,


    "q_fhir_encode_practitionerrole" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  TRUE AS active,
        |  '2020-01-01' AS period_start,
        |  'Practitioner/' || CAST(s_suppkey % 10 AS VARCHAR)
        |    AS practitioner_ref,
        |  'Organization/' || CAST(s_nationkey AS VARCHAR) AS org_ref,
        |  'doctor' AS role_code,
        |  s_name AS specialty_display,
        |  'Location/' || CAST(s_nationkey AS VARCHAR) AS location_ref,
        |  'wed' AS day2,
        |  '09:00:00' AS avail_start,
        |  'public holidays' AS na_desc,
        |  '2024-12-26' AS na_end
        |FROM supplier""".stripMargin,


    "q_fhir_encode_specimen" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS id,
        |  'ACC-' || CAST(p_partkey AS VARCHAR) AS accession,
        |  'available' AS status,
        |  p_type AS type_display,
        |  'Patient/' || CAST(p_partkey % 100 AS VARCHAR) AS subject_ref,
        |  '2024-03-01T08:30:00Z' AS received_time,
        |  '2024-03-01T08:00:00Z' AS collected_at,
        |  CAST(CAST(p_size AS DECIMAL(32,6)) AS VARCHAR) AS coll_qty,
        |  '368149001' AS body_site,
        |  p_brand AS container_desc,
        |  CAST(CAST(p_partkey % 50 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS container_cap
        |FROM part""".stripMargin,


    "q_fhir_encode_servicerequest" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'order' AS intent,
        |  '108252007' AS category_code,
        |  CASE WHEN o_orderkey % 4 = 0 THEN 'routine'
        |    ELSE 'urgent' END AS priority,
        |  FALSE AS do_not_perform,
        |  'Laboratory test' AS code_display,
        |  o_orderpriority AS code_text,
        |  CAST(CAST(o_orderkey % 5 + 1 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS qty,
        |  'Patient/' || CAST(o_custkey AS VARCHAR) AS subject_ref,
        |  CAST(o_orderdate AS VARCHAR) AS occurrence_at,
        |  CAST(o_orderdate AS VARCHAR) AS authored_on,
        |  'Practitioner/' || CAST(o_orderkey % 7 AS VARCHAR)
        |    AS requester_ref,
        |  '183524004' AS reason_code,
        |  'Ref: ' || o_orderstatus AS reason_text
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,


    "q_fhir_encode_medstatement" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'inpatient' AS category_code,
        |  CAST(c_custkey % 1000 AS VARCHAR) AS med_code,
        |  c_name AS med_display,
        |  'Patient/' || CAST(c_custkey AS VARCHAR) AS subject_ref,
        |  '2024-01-01' AS eff_start,
        |  '2024-06-30' AS eff_end,
        |  '2024-07-01' AS date_asserted,
        |  'Take as directed: ' || c_mktsegment AS dosage_text,
        |  CAST(2 AS INTEGER) AS dose_freq,
        |  'd' AS dose_unit,
        |  CAST(CAST(c_custkey % 3 + 1 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS dose_qty
        |FROM customer""".stripMargin,


    "q_fhir_encode_coverage" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS id,
        |  'active' AS status,
        |  'EHCPOL' AS type_code,
        |  'SUB-' || CAST(s_suppkey AS VARCHAR) AS subscriber_id,
        |  'Patient/' || CAST(s_suppkey AS VARCHAR) AS beneficiary_ref,
        |  'self' AS relationship_code,
        |  '2024-01-01' AS period_start,
        |  'Organization/' || CAST(s_nationkey AS VARCHAR) AS payor_ref,
        |  s_name AS payor_display,
        |  'GRP-' || CAST(s_suppkey % 10 AS VARCHAR) AS class_value,
        |  s_name AS class_name,
        |  CAST(s_suppkey % 3 + 1 AS INTEGER) AS cov_order,
        |  'provider-network' AS network,
        |  CAST(CAST(s_suppkey % 20 AS DECIMAL(32,6)) AS VARCHAR)
        |    AS copay_value,
        |  'USD' AS copay_currency,
        |  TRUE AS subrogation
        |FROM supplier""".stripMargin,


    "q_fhir_encode_relatedperson" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        |  TRUE AS active,
        |  'Patient/' || CAST(n_nationkey AS VARCHAR) AS patient_ref,
        |  'SPS' AS rel_code,
        |  n_name AS name_family,
        |  'J' AS given2,
        |  '+1-555-' || lpad(CAST(n_nationkey AS VARCHAR), 4, '0')
        |    AS telecom_value,
        |  CAST(1 AS INTEGER) AS telecom_rank,
        |  CASE WHEN n_nationkey % 2 = 0 THEN 'female'
        |    ELSE 'male' END AS gender,
        |  '1980-05-15' AS birth_date,
        |  CAST(n_nationkey AS VARCHAR) || ' Main St' AS addr_line,
        |  'Springfield' AS addr_city,
        |  n_name AS country,
        |  'en' AS comm_lang,
        |  TRUE AS comm_preferred
        |FROM nation""".stripMargin,

  )
}
