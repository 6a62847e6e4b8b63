package graft.pipeline

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.fhir.FhirEncoder

/** Typed-registry breadth: the round-15 tier (AllergyIntolerance,
  * CarePlan, Claim, ExplanationOfBenefit, Organization, Practitioner)
  * completes Synthea's default emission set (reference
  * data/generate-sample-data.sh:22–28, encoded via Pathling at
  * bundle_processor.py:162–166). Each test round-trips a hand-written
  * JSON instance through `encode` and asserts the typed nested values,
  * so a schema regression (dropped element, wrong type, collapsed
  * nesting) fails here before the oracle gates see it.
  */
class FhirEncoderSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def one(resourceType: String, json: String) =
    FhirEncoder.encode(Seq(json).toDF("resource"), resourceType)

  test("registry covers the full Synthea default set") {
    val expected = Set("Patient", "Observation", "Condition", "Encounter",
      "Procedure", "Immunization", "MedicationRequest", "DiagnosticReport",
      "AllergyIntolerance", "CarePlan", "Claim", "ExplanationOfBenefit",
      "Organization", "Practitioner",
      // tier 3 (round 16)
      "Device", "Location", "Medication", "Provenance",
      "SupplyDelivery", "ImagingStudy",
      // tier 4 (round 16)
      "CareTeam", "MedicationAdministration", "DocumentReference",
      // tier 5 (round 16)
      "Goal", "PractitionerRole",
      // tier 6 (round 17): the configured-type long tail
      "Specimen", "ServiceRequest", "MedicationStatement",
      "Coverage", "RelatedPerson")
    assert(FhirEncoder.schemas.keySet == expected)
    // unknown types still fall back to the generic backbone
    assert(FhirEncoder.schemaFor("Basic") == FhirEncoder.genericSchema)
  }

  test("Device: UDI carrier backbone and typed refs") {
    val row = one("Device",
      """{"resourceType":"Device","id":"d1","status":"active",
        |"udiCarrier":[{"deviceIdentifier":"(01)123",
        |"carrierHRF":"(01)123(11)220101"}],
        |"manufacturer":"Acme","lotNumber":"L-9",
        |"deviceName":[{"name":"Pump","type":"user-friendly-name"}],
        |"type":{"coding":[{"code":"14106009"}]},
        |"patient":{"reference":"Patient/p1"}}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("id") == "d1")
    val udi = row.getAs[Seq[org.apache.spark.sql.Row]]("udiCarrier")(0)
    assert(udi.getAs[String]("deviceIdentifier") == "(01)123")
    assert(row.getAs[Seq[org.apache.spark.sql.Row]]("deviceName")(0)
      .getAs[String]("name") == "Pump")
    assert(row.getAs[org.apache.spark.sql.Row]("patient")
      .getAs[String]("reference") == "Patient/p1")
  }

  test("Location: decimal geo-position and 0..1 address") {
    val row = one("Location",
      """{"resourceType":"Location","id":"l1","name":"West Wing",
        |"position":{"longitude":-71.0589,"latitude":42.3601},
        |"address":{"city":"Boston","country":"US"},
        |"physicalType":{"coding":[{"code":"wi"}]}}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val pos = row.getAs[org.apache.spark.sql.Row]("position")
    assert(pos.getAs[java.math.BigDecimal]("longitude")
      .compareTo(new java.math.BigDecimal("-71.0589")) == 0)
    assert(row.getAs[org.apache.spark.sql.Row]("address")
      .getAs[String]("city") == "Boston")
  }

  test("Medication: Ratio quantities and batch backbone") {
    val row = one("Medication",
      """{"resourceType":"Medication","id":"m1",
        |"code":{"coding":[{"code":"313782"}]},
        |"amount":{"numerator":{"value":250,"unit":"mg"},
        |"denominator":{"value":1,"unit":"TAB"}},
        |"ingredient":[{"isActive":true,
        |"strength":{"numerator":{"value":125.5,"unit":"mg"},
        |"denominator":{"value":1,"unit":"TAB"}}}],
        |"batch":{"lotNumber":"B7","expirationDate":"2027-12-31"}}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val amt = row.getAs[org.apache.spark.sql.Row]("amount")
    assert(amt.getAs[org.apache.spark.sql.Row]("numerator")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("250")) == 0)
    val ing = row.getAs[Seq[org.apache.spark.sql.Row]]("ingredient")(0)
    assert(ing.getAs[Boolean]("isActive"))
    assert(row.getAs[org.apache.spark.sql.Row]("batch")
      .getAs[String]("lotNumber") == "B7")
  }

  test("Provenance: one-level entity.agent recursion is kept") {
    val row = one("Provenance",
      """{"resourceType":"Provenance","id":"pv1",
        |"target":[{"reference":"Patient/p1"}],
        |"recorded":"2024-03-01T10:05:00Z",
        |"agent":[{"who":{"reference":"Practitioner/x"}}],
        |"entity":[{"role":"source",
        |"what":{"reference":"DocumentReference/d"},
        |"agent":[{"who":{"reference":"Device/dev1"}}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val ent = row.getAs[Seq[org.apache.spark.sql.Row]]("entity")(0)
    assert(ent.getAs[String]("role") == "source")
    assert(ent.getAs[Seq[org.apache.spark.sql.Row]]("agent")(0)
      .getAs[org.apache.spark.sql.Row]("who")
      .getAs[String]("reference") == "Device/dev1")
  }

  test("CareTeam: participant role/member backbone") {
    val row = one("CareTeam",
      """{"resourceType":"CareTeam","id":"ct1","status":"active",
        |"participant":[{"role":[{"text":"doctor"}],
        |"member":{"reference":"Practitioner/x"}},
        |{"role":[{"text":"patient"}],
        |"member":{"reference":"Patient/p"}}],
        |"managingOrganization":[{"reference":"Organization/o"}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val parts = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("participant")
    assert(parts.size == 2)
    assert(parts(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("role")(0)
      .getAs[String]("text") == "doctor")
    assert(parts(1).getAs[org.apache.spark.sql.Row]("member")
      .getAs[String]("reference") == "Patient/p")
  }

  test("MedicationAdministration: dosage choice types (dose quantity, " +
      "rateRatio)") {
    val row = one("MedicationAdministration",
      """{"resourceType":"MedicationAdministration","id":"ma1",
        |"status":"completed",
        |"medicationCodeableConcept":{"coding":[{"code":"313782"}]},
        |"effectiveDateTime":"2024-04-01T12:00:00Z",
        |"dosage":{"text":"IV","dose":{"value":2.5,"unit":"mg"},
        |"rateRatio":{"numerator":{"value":10},
        |"denominator":{"value":1}}}}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val dosage = row.getAs[org.apache.spark.sql.Row]("dosage")
    assert(dosage.getAs[org.apache.spark.sql.Row]("dose")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("2.5")) == 0)
    assert(dosage.getAs[org.apache.spark.sql.Row]("rateRatio")
      .getAs[org.apache.spark.sql.Row]("numerator")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("10")) == 0)
  }

  test("DocumentReference: content attachment/format and context") {
    val row = one("DocumentReference",
      """{"resourceType":"DocumentReference","id":"dr1",
        |"status":"current","masterIdentifier":{"value":"m1"},
        |"content":[{"attachment":{"contentType":"text/plain",
        |"title":"note"},"format":{"code":"fmt"}}],
        |"context":{"encounter":[{"reference":"Encounter/e"}],
        |"practiceSetting":{"text":"GP"}}}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[org.apache.spark.sql.Row]("masterIdentifier")
      .getAs[String]("value") == "m1")
    val c = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("content")(0)
    assert(c.getAs[org.apache.spark.sql.Row]("attachment")
      .getAs[String]("contentType") == "text/plain")
    assert(c.getAs[org.apache.spark.sql.Row]("format")
      .getAs[String]("code") == "fmt")
    assert(row.getAs[org.apache.spark.sql.Row]("context")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("encounter")(0)
      .getAs[String]("reference") == "Encounter/e")
  }

  test("ImagingStudy: series/instance 3-level nesting") {
    val row = one("ImagingStudy",
      """{"resourceType":"ImagingStudy","id":"is1","status":"available",
        |"modality":[{"code":"CT"}],"numberOfSeries":1,
        |"series":[{"uid":"1.2.3","number":1,
        |"modality":{"code":"CT"},
        |"instance":[{"uid":"1.2.3.4",
        |"sopClass":{"code":"1.2.840.10008.5.1.4.1.1.2"},
        |"number":1}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[Int]("numberOfSeries") == 1)
    val series = row.getAs[Seq[org.apache.spark.sql.Row]]("series")(0)
    assert(series.getAs[String]("uid") == "1.2.3")
    assert(series.getAs[Seq[org.apache.spark.sql.Row]]("instance")(0)
      .getAs[org.apache.spark.sql.Row]("sopClass")
      .getAs[String]("code") == "1.2.840.10008.5.1.4.1.1.2")
  }

  test("AllergyIntolerance: reaction/manifestation nesting and choice types") {
    val row = one("AllergyIntolerance",
      """{"resourceType":"AllergyIntolerance","id":"a1",
        |"clinicalStatus":{"coding":[{"code":"active"}]},
        |"type":"allergy","category":["food"],"criticality":"high",
        |"onsetAge":{"value":12.5,"unit":"a"},
        |"reaction":[{"manifestation":[{"text":"hives"}],
        |"severity":"severe","exposureRoute":{"text":"oral"}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("id") == "a1")
    assert(row.getAs[String]("criticality") == "high")
    val reaction = row.getAs[Seq[org.apache.spark.sql.Row]]("reaction")(0)
    assert(reaction.getAs[Seq[org.apache.spark.sql.Row]]("manifestation")(0)
      .getAs[String]("text") == "hives")
    assert(reaction.getAs[String]("severity") == "severe")
    // onsetAge is a Quantity with Pathling's decimal(32,6)
    val onset = row.getAs[org.apache.spark.sql.Row]("onsetAge")
    assert(onset.getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("12.5")) == 0)
  }

  test("CarePlan: activity.detail backbone is fully typed") {
    val row = one("CarePlan",
      """{"resourceType":"CarePlan","id":"c1","status":"active",
        |"intent":"order","period":{"start":"2020-01-01"},
        |"activity":[{"detail":{"kind":"Task","status":"scheduled",
        |"doNotPerform":false,"dailyAmount":{"value":2,"unit":"1/d"},
        |"description":"walk"}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val detail = row.getAs[Seq[org.apache.spark.sql.Row]]("activity")(0)
      .getAs[org.apache.spark.sql.Row]("detail")
    assert(detail.getAs[String]("status") == "scheduled")
    assert(!detail.getAs[Boolean]("doNotPerform"))
    assert(detail.getAs[String]("description") == "walk")

    // the scheduled[x] choice includes the Timing variant
    val timed = one("CarePlan",
      """{"resourceType":"CarePlan","id":"c2","status":"active",
        |"activity":[{"detail":{"status":"scheduled",
        |"scheduledTiming":{"repeat":{"frequency":2,"period":1,
        |"periodUnit":"d"}}}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val rep = timed.getAs[Seq[org.apache.spark.sql.Row]]("activity")(0)
      .getAs[org.apache.spark.sql.Row]("detail")
      .getAs[org.apache.spark.sql.Row]("scheduledTiming")
      .getAs[org.apache.spark.sql.Row]("repeat")
    assert(rep.getAs[Int]("frequency") == 2)
    assert(rep.getAs[String]("periodUnit") == "d")
  }

  test("Claim: item→detail→subDetail 3-level shape with Money decimals") {
    val row = one("Claim",
      """{"resourceType":"Claim","id":"cl1","status":"active",
        |"use":"claim","total":{"value":99.95,"currency":"USD"},
        |"item":[{"sequence":1,"net":{"value":10.5,"currency":"USD"},
        |"detail":[{"sequence":1,"unitPrice":{"value":5.25,"currency":"USD"},
        |"subDetail":[{"sequence":1,"net":{"value":1.75,"currency":"USD"}}]}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val item = row.getAs[Seq[org.apache.spark.sql.Row]]("item")(0)
    val detail = item.getAs[Seq[org.apache.spark.sql.Row]]("detail")(0)
    val sub = detail.getAs[Seq[org.apache.spark.sql.Row]]("subDetail")(0)
    assert(sub.getAs[org.apache.spark.sql.Row]("net")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("1.75")) == 0)
    assert(row.getAs[org.apache.spark.sql.Row]("total")
      .getAs[String]("currency") == "USD")
  }

  test("ExplanationOfBenefit: adjudication, totals and benefitBalance") {
    val row = one("ExplanationOfBenefit",
      """{"resourceType":"ExplanationOfBenefit","id":"e1",
        |"status":"active","outcome":"complete",
        |"item":[{"sequence":1,"adjudication":[{"category":{"text":"submitted"},
        |"amount":{"value":42,"currency":"USD"}}]}],
        |"total":[{"category":{"text":"submitted"},
        |"amount":{"value":42,"currency":"USD"}}],
        |"benefitBalance":[{"category":{"text":"medical"},
        |"financial":[{"type":{"text":"allowed"},"allowedUnsignedInt":7}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("outcome") == "complete")
    val adj = row.getAs[Seq[org.apache.spark.sql.Row]]("item")(0)
      .getAs[Seq[org.apache.spark.sql.Row]]("adjudication")(0)
    assert(adj.getAs[org.apache.spark.sql.Row]("amount")
      .getAs[java.math.BigDecimal]("value").intValueExact == 42)
    val fin = row.getAs[Seq[org.apache.spark.sql.Row]]("benefitBalance")(0)
      .getAs[Seq[org.apache.spark.sql.Row]]("financial")(0)
    assert(fin.getAs[Int]("allowedUnsignedInt") == 7)

    // addItem carries the full detail -> subDetail backbone
    val added = one("ExplanationOfBenefit",
      """{"resourceType":"ExplanationOfBenefit","id":"e2",
        |"status":"active",
        |"addItem":[{"itemSequence":[1],
        |"productOrService":{"text":"svc"},
        |"detail":[{"net":{"value":3.5,"currency":"USD"},
        |"subDetail":[{"net":{"value":1.25,"currency":"USD"}}]}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    val adet = added.getAs[Seq[org.apache.spark.sql.Row]]("addItem")(0)
      .getAs[Seq[org.apache.spark.sql.Row]]("detail")(0)
    assert(adet.getAs[org.apache.spark.sql.Row]("net")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("3.5")) == 0)
    assert(adet.getAs[Seq[org.apache.spark.sql.Row]]("subDetail")(0)
      .getAs[org.apache.spark.sql.Row]("net")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("1.25")) == 0)
  }

  test("Organization and Practitioner: contact/qualification backbones") {
    val orgRow = one("Organization",
      """{"resourceType":"Organization","id":"o1","active":true,
        |"name":"Graft Clinic","alias":["GC"],
        |"partOf":{"reference":"Organization/parent"},
        |"contact":[{"name":{"family":"Ops"},"purpose":{"text":"admin"}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(orgRow.getAs[String]("name") == "Graft Clinic")
    assert(orgRow.getAs[Seq[org.apache.spark.sql.Row]]("contact")(0)
      .getAs[org.apache.spark.sql.Row]("name")
      .getAs[String]("family") == "Ops")

    val pr = one("Practitioner",
      """{"resourceType":"Practitioner","id":"p1","gender":"female",
        |"birthDate":"1980-02-02",
        |"name":[{"family":"Curie","given":["Marie"]}],
        |"qualification":[{"code":{"coding":[{"code":"MD"}]},
        |"issuer":{"reference":"Organization/o1"}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    // birthDate stays a precision-preserving string (Pathling convention)
    assert(pr.schema("birthDate").dataType == StringType)
    assert(pr.getAs[Seq[org.apache.spark.sql.Row]]("qualification")(0)
      .getAs[org.apache.spark.sql.Row]("issuer")
      .getAs[String]("reference") == "Organization/o1")
  }

  test("Goal: target choice types (detailQuantity, dueDate) and " +
      "achievementStatus") {
    val row = one("Goal",
      """{"resourceType":"Goal","id":"g1","lifecycleStatus":"active",
        |"achievementStatus":{"coding":[{"code":"in-progress"}]},
        |"description":{"text":"Lower HbA1c"},
        |"subject":{"reference":"Patient/p"},
        |"startDate":"2024-01-01",
        |"target":[{"measure":{"coding":[{"code":"4548-4"}]},
        |"detailQuantity":{"value":6.5,"unit":"%"},
        |"dueDate":"2024-12-31"},
        |{"detailString":"walk daily","detailBoolean":true,
        |"detailInteger":30}],
        |"addresses":[{"reference":"Condition/c1"}],
        |"outcomeReference":[{"reference":"Observation/obs1"}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("lifecycleStatus") == "active")
    assert(row.getAs[org.apache.spark.sql.Row]("achievementStatus")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding")(0)
      .getAs[String]("code") == "in-progress")
    val targets = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("target")
    assert(targets.size == 2)
    assert(targets(0).getAs[org.apache.spark.sql.Row]("detailQuantity")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("6.5")) == 0)
    assert(targets(0).getAs[String]("dueDate") == "2024-12-31")
    assert(targets(1).getAs[String]("detailString") == "walk daily")
    assert(targets(1).getAs[Boolean]("detailBoolean"))
    assert(targets(1).getAs[Int]("detailInteger") == 30)
    // startDate stays a precision-preserving string
    assert(row.schema("startDate").dataType == StringType)
  }

  test("PractitionerRole: availableTime/notAvailable backbones") {
    val row = one("PractitionerRole",
      """{"resourceType":"PractitionerRole","id":"pr1","active":true,
        |"period":{"start":"2020-01-01"},
        |"practitioner":{"reference":"Practitioner/p1"},
        |"organization":{"reference":"Organization/o1"},
        |"code":[{"coding":[{"code":"doctor"}]}],
        |"specialty":[{"coding":[{"code":"394814009"}]}],
        |"location":[{"reference":"Location/l1"}],
        |"availableTime":[{"daysOfWeek":["mon","wed"],"allDay":false,
        |"availableStartTime":"09:00:00","availableEndTime":"17:00:00"}],
        |"notAvailable":[{"description":"holidays",
        |"during":{"start":"2024-12-24","end":"2024-12-26"}}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[Boolean]("active"))
    assert(row.getAs[org.apache.spark.sql.Row]("practitioner")
      .getAs[String]("reference") == "Practitioner/p1")
    val at = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("availableTime")(0)
    assert(at.getAs[scala.collection.Seq[String]]("daysOfWeek").toSeq == Seq("mon", "wed"))
    assert(at.getAs[String]("availableStartTime") == "09:00:00")
    val na = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("notAvailable")(0)
    assert(na.getAs[String]("description") == "holidays")
    assert(na.getAs[org.apache.spark.sql.Row]("during")
      .getAs[String]("end") == "2024-12-26")
  }

  test("Specimen: collection choice types and container backbone") {
    val row = one("Specimen",
      """{"resourceType":"Specimen","id":"sp1","status":"available",
        |"accessionIdentifier":{"system":"urn:acc","value":"ACC-9"},
        |"type":{"coding":[{"code":"119376003"}]},
        |"subject":{"reference":"Patient/p1"},
        |"receivedTime":"2024-03-01T08:30:00Z",
        |"collection":{"collectedDateTime":"2024-03-01T08:00:00Z",
        |"quantity":{"value":5.5,"unit":"mL"},
        |"bodySite":{"coding":[{"code":"368149001"}]}},
        |"processing":[{"description":"spun",
        |"timeDateTime":"2024-03-01T09:00:00Z"}],
        |"container":[{"description":"red-top",
        |"capacity":{"value":10,"unit":"mL"},
        |"additiveCodeableConcept":{"coding":[{"code":"EDTA"}]}}],
        |"condition":[{"coding":[{"code":"hemolyzed"}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("status") == "available")
    assert(row.getAs[org.apache.spark.sql.Row]("accessionIdentifier")
      .getAs[String]("value") == "ACC-9")
    val coll = row.getAs[org.apache.spark.sql.Row]("collection")
    assert(coll.getAs[String]("collectedDateTime") == "2024-03-01T08:00:00Z")
    assert(coll.getAs[org.apache.spark.sql.Row]("quantity")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("5.5")) == 0)
    val cont = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("container")(0)
    assert(cont.getAs[String]("description") == "red-top")
    assert(cont.getAs[org.apache.spark.sql.Row]("additiveCodeableConcept")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding")(0)
      .getAs[String]("code") == "EDTA")
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("processing")(0)
      .getAs[String]("timeDateTime") == "2024-03-01T09:00:00Z")
  }

  test("ServiceRequest: occurrence/quantity/asNeeded choice types") {
    val row = one("ServiceRequest",
      """{"resourceType":"ServiceRequest","id":"sr1","status":"active",
        |"intent":"order","priority":"urgent","doNotPerform":false,
        |"code":{"coding":[{"code":"15220000"}],"text":"Lab test"},
        |"quantityQuantity":{"value":2,"unit":"unit"},
        |"subject":{"reference":"Patient/p1"},
        |"occurrenceDateTime":"2024-04-01",
        |"occurrenceTiming":{"repeat":{"frequency":1,"period":7,
        |"periodUnit":"d"}},
        |"asNeededBoolean":true,
        |"authoredOn":"2024-03-31",
        |"requester":{"reference":"Practitioner/doc"},
        |"specimen":[{"reference":"Specimen/sp1"}],
        |"patientInstruction":"fast overnight"}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("intent") == "order")
    assert(row.getAs[org.apache.spark.sql.Row]("code")
      .getAs[String]("text") == "Lab test")
    assert(row.getAs[org.apache.spark.sql.Row]("quantityQuantity")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("2")) == 0)
    assert(row.getAs[String]("occurrenceDateTime") == "2024-04-01")
    assert(row.getAs[org.apache.spark.sql.Row]("occurrenceTiming")
      .getAs[org.apache.spark.sql.Row]("repeat")
      .getAs[String]("periodUnit") == "d")
    assert(row.getAs[Boolean]("asNeededBoolean"))
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("specimen")(0)
      .getAs[String]("reference") == "Specimen/sp1")
    assert(row.getAs[String]("patientInstruction") == "fast overnight")
  }

  test("MedicationStatement: medication choice + dosage timing/dose") {
    val row = one("MedicationStatement",
      """{"resourceType":"MedicationStatement","id":"ms1",
        |"status":"active",
        |"medicationCodeableConcept":{"coding":[{"code":"197361"}]},
        |"subject":{"reference":"Patient/p1"},
        |"effectivePeriod":{"start":"2024-01-01","end":"2024-06-30"},
        |"dateAsserted":"2024-07-01",
        |"dosage":[{"sequence":1,"text":"BID",
        |"timing":{"repeat":{"frequency":2,"period":1,"periodUnit":"d"}},
        |"doseAndRate":[{"doseQuantity":{"value":1,"unit":"tablet"}}]}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[org.apache.spark.sql.Row]("medicationCodeableConcept")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding")(0)
      .getAs[String]("code") == "197361")
    assert(row.getAs[org.apache.spark.sql.Row]("effectivePeriod")
      .getAs[String]("end") == "2024-06-30")
    val d = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("dosage")(0)
    assert(d.getAs[String]("text") == "BID")
    assert(d.getAs[org.apache.spark.sql.Row]("timing")
      .getAs[org.apache.spark.sql.Row]("repeat").getAs[Int]("frequency") == 2)
    assert(d.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doseAndRate")(0)
      .getAs[org.apache.spark.sql.Row]("doseQuantity")
      .getAs[String]("unit") == "tablet")
  }

  test("Coverage: class/costToBeneficiary backbones with Money") {
    val row = one("Coverage",
      """{"resourceType":"Coverage","id":"cov1","status":"active",
        |"type":{"coding":[{"code":"EHCPOL"}]},
        |"subscriberId":"SUB-7",
        |"beneficiary":{"reference":"Patient/p1"},
        |"relationship":{"coding":[{"code":"self"}]},
        |"period":{"start":"2024-01-01"},
        |"payor":[{"reference":"Organization/ins"}],
        |"class":[{"type":{"coding":[{"code":"group"}]},
        |"value":"GRP-1","name":"Acme Group"}],
        |"order":2,"network":"in-network",
        |"costToBeneficiary":[{"type":{"coding":[{"code":"copay"}]},
        |"valueMoney":{"value":25.5,"currency":"USD"},
        |"exception":[{"type":{"coding":[{"code":"retired"}]},
        |"period":{"start":"2024-01-01"}}]}],
        |"subrogation":true}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[String]("subscriberId") == "SUB-7")
    val cls = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("class")(0)
    assert(cls.getAs[String]("value") == "GRP-1")
    assert(row.getAs[Int]("order") == 2)
    val ctb = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("costToBeneficiary")(0)
    assert(ctb.getAs[org.apache.spark.sql.Row]("valueMoney")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("25.5")) == 0)
    assert(ctb.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("exception")(0)
      .getAs[org.apache.spark.sql.Row]("period")
      .getAs[String]("start") == "2024-01-01")
    assert(row.getAs[Boolean]("subrogation"))
  }

  test("RelatedPerson: name/telecom/address/communication backbones") {
    val row = one("RelatedPerson",
      """{"resourceType":"RelatedPerson","id":"rp1","active":true,
        |"patient":{"reference":"Patient/p1"},
        |"relationship":[{"coding":[{"code":"SPS"}]}],
        |"name":[{"use":"official","family":"Doe","given":["Jo","A"]}],
        |"telecom":[{"system":"phone","value":"+1-555-0100","rank":1}],
        |"gender":"female","birthDate":"1980-05-15",
        |"address":[{"city":"Springfield","line":["1 Main St"]}],
        |"period":{"start":"2020-01-01"},
        |"communication":[{"language":{"coding":[{"code":"en"}]},
        |"preferred":true}]}"""
        .stripMargin.replace("\n", "")).collect()(0)
    assert(row.getAs[org.apache.spark.sql.Row]("patient")
      .getAs[String]("reference") == "Patient/p1")
    val nm = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("name")(0)
    assert(nm.getAs[String]("family") == "Doe")
    assert(nm.getAs[scala.collection.Seq[String]]("given").toSeq == Seq("Jo", "A"))
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("telecom")(0)
      .getAs[Int]("rank") == 1)
    assert(row.getAs[String]("birthDate") == "1980-05-15")
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("address")(0)
      .getAs[scala.collection.Seq[String]]("line").toSeq == Seq("1 Main St"))
    val comm = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("communication")(0)
    assert(comm.getAs[org.apache.spark.sql.Row]("language")
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("coding")(0)
      .getAs[String]("code") == "en")
    assert(comm.getAs[Boolean]("preferred"))
  }

  test("extension recursion-depth property: typed to exactly depth 2, " +
    "silently schema-truncated beyond, raw JSON retained losslessly") {
    import org.apache.spark.sql.functions.{col, expr}
    // the defined truncation contract (FhirEncoder.extensionType,
    // Pathling-style): level-1 extensions carry url/valueString/
    // valueCode/valueDecimal + ONE nested extension array; level-2
    // structs carry url/valueString/valueDecimal/valueCoding and NO
    // further extension field — deeper nesting is dropped from the
    // typed columns (from_json ignores fields outside the schema) and
    // survives only in resource_json, byte-identical to the input.
    val r = new scala.util.Random(19)
    def extJson(depth: Int, tag: String): String = {
      val nested =
        if (depth > 1) s""","extension":[${extJson(depth - 1, tag + "n")}]"""
        else ""
      s"""{"url":"http://x/$tag","valueString":"s-$tag"$nested}"""
    }
    val cases = (1 to 60).map { i =>
      val d = 1 + r.nextInt(6) // depths 1..6, well past the truncation
      val json = s"""{"resourceType":"Patient","id":"p$i",""" +
        s""""extension":[${extJson(d, s"t$i")}]}"""
      (s"p$i", d, json)
    }
    val df = cases.map { case (_, _, j) => Tuple1(j) }.toDF("resource")
    val enc = FhirEncoder.encode(df, "Patient")
    // the SCHEMA itself truncates: a third extension level is not a
    // column that exists, not a null-filled one
    intercept[org.apache.spark.sql.AnalysisException] {
      enc.select(expr("extension[0].extension[0].extension")).collect()
    }
    val got = enc.select(col("id"),
        expr("extension[0].url").as("u1"),
        expr("extension[0].valueString").as("s1"),
        expr("extension[0].extension[0].url").as("u2"),
        expr("extension[0].extension[0].valueString").as("s2"),
        col("resource_json"))
      .collect().map(r0 => r0.getString(0) -> r0).toMap
    cases.foreach { case (id, d, json) =>
      val row = got(id)
      assert(row.getString(5) == json, s"$id: resource_json not lossless")
      assert(row.getString(1) == s"http://x/t${id.drop(1)}" &&
        row.getString(2) == s"s-t${id.drop(1)}", s"$id: level 1 not typed")
      if (d >= 2) {
        assert(row.getString(3) == s"http://x/t${id.drop(1)}n" &&
          row.getString(4) == s"s-t${id.drop(1)}n",
          s"$id (depth $d): level 2 not typed")
      } else {
        assert(row.isNullAt(3) && row.isNullAt(4),
          s"$id (depth 1): phantom level-2 values")
      }
    }
    // and the dropped depth-3+ content is still queryable through the
    // variant retention path (withVariant), proving "truncated" never
    // means "lost"
    val deep = cases.filter(_._2 >= 3)
    assert(deep.nonEmpty)
    val needle = "\"id\":\"" + deep.head._1 + "\""
    val v = FhirEncoder.withVariant(
        df.filter(col("resource").contains(needle)), "resource")
      .selectExpr("variant_get(resource_variant, " +
        "'$.extension[0].extension[0].extension[0].url', 'string')")
      .collect()(0).getString(0)
    assert(v == s"http://x/t${deep.head._1.drop(1)}nn",
      "variant retention lost the depth-3 extension")
  }
}
