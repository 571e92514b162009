package graft

import graft.etl.Etl
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the parse/clean path (SURVEY.md §5d): arbitrary
  * malformed wire input never throws, and the cleaned output's invariants
  * hold regardless of input shape.
  *
  * Each ScalaCheck trial feeds a whole batch of generated wire values
  * through one Spark job — Spark overhead per trial, not per value.
  */
class EtlSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val jsonString: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(s => s"\"$s\""),
      Gen.const("null"),
      Gen.chooseNum(-1000, 1000).map(_.toString))

  /** Well-formed JSON object with a random subset of the airport keys
    * (NiFi omits absent attributes) plus occasional extra keys. */
  private val validJson: Gen[String] = for {
    keys <- Gen.someOf("id", "icao", "name", "lat", "lon")
    extra <- Gen.oneOf(Seq.empty[String], Seq("zzz"))
    vals <- Gen.listOfN(keys.size + extra.size, jsonString)
  } yield (keys ++ extra).zip(vals)
    .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")

  private val wireValue: Gen[String] = Gen.frequency(
    4 -> validJson,
    2 -> validJson.map(_.dropRight(Gen.chooseNum(1, 10).sample.getOrElse(1))),
    2 -> Gen.asciiPrintableStr,
    1 -> Gen.const(""),
    1 -> Gen.const("[1,2,3]"),
    1 -> Gen.const("{\"lat\":{\"nested\":1},\"lon\":[2]}"))

  private val wireBatch: Gen[List[String]] =
    Gen.listOfN(60, wireValue)

  private def check(p: Prop): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(5), p)
    assert(res.passed, res.status.toString)
  }

  test("parse never throws and preserves row count and schema") {
    check(Prop.forAll(wireBatch) { values =>
      val wire = values.toDF("s").select(encode($"s", "UTF-8").as("value"))
      val parsed = Etl.parse(wire)
      parsed.columns.toSeq == Seq("id", "icao", "name", "lat", "lon") &&
        parsed.count() == values.size
    })
  }

  test("clean output rows always have non-null numeric coords") {
    check(Prop.forAll(wireBatch) { values =>
      val wire = values.toDF("s").select(encode($"s", "UTF-8").as("value"))
      val cleaned = Etl.clean(Etl.parse(wire))
      cleaned.filter($"latitude".isNull || $"longitude".isNull).count() == 0L
    })
  }

  test("toWire ∘ parse is the identity on parsed rows with all fields present") {
    check(Prop.forAll(Gen.listOfN(40, structuredRow)) { rows =>
      val wire = rows.map(_.json).toDF("s").select(encode($"s", "UTF-8").as("value"))
      val parsed = graft.etl.Etl.parse(wire)
        .filter($"id".isNotNull && $"name".isNotNull && $"lat".isNotNull && $"lon".isNotNull)
      val rewired = graft.etl.Etl.toWire(parsed, "id", Seq("id", "icao", "name", "lat", "lon"))
      val reparsed = graft.etl.Etl.parse(
        rewired.select(encode($"value", "UTF-8").as("value")))
      reparsed.collect().toSet == parsed.collect().toSet
    })
  }

  /** Wire rows whose validity is decided at generation time — no
    * re-implementation of engine cast semantics in the expectation. */
  private case class GenRow(json: String, valid: Boolean)

  private val coordGen: Gen[(String, Boolean)] = Gen.frequency(
    5 -> Gen.chooseNum(-89, 89).map(i => (s""""$i"""", true)),
    1 -> Gen.const(("\"\"", false)),          // empty string → null coord
    1 -> Gen.const(("\"bogus\"", false)),     // non-numeric → null coord
    1 -> Gen.const(("null", false)))          // explicit null

  private val structuredRow: Gen[GenRow] = for {
    id <- Gen.chooseNum(0, 999)
    (lat, latOk) <- coordGen
    (lon, lonOk) <- coordGen
    truncate <- Gen.frequency(5 -> false, 1 -> true)
  } yield {
    val j = s"""{"id":"$id","name":"n$id","lat":$lat,"lon":$lon}"""
    if (truncate) GenRow(j.dropRight(5), valid = false)
    else GenRow(j, latOk && lonOk)
  }

  test("clean keeps exactly the generation-time-valid rows") {
    check(Prop.forAll(Gen.listOfN(60, structuredRow)) { rows =>
      val wire = rows.map(_.json).toDF("s")
        .select(encode($"s", "UTF-8").as("value"))
      Etl.clean(Etl.parse(wire)).count() == rows.count(_.valid).toLong
    })
  }

  /** A NiFi-style record whose fields are independently ABSENT — the
    * `AttributesToJSON` `Null Value=false` omission semantics
    * (reference `tp.xml:1296`): an unset attribute simply does not
    * appear in the serialized object. */
  private val nifiRow: Gen[(Option[String], Option[String], Option[String],
      Option[String], Option[String])] = {
    val field: Gen[Option[String]] =
      Gen.frequency(3 -> Gen.alphaNumStr.map(Some(_)), 1 -> Gen.const(None))
    val coordF: Gen[Option[String]] = Gen.frequency(
      3 -> Gen.chooseNum(-89, 89).map(i => Some(i.toString)),
      1 -> Gen.const(None))
    for {
      id <- Gen.chooseNum(0, 999).map(i => Some(i.toString))
      icao <- field; name <- field; lat <- coordF; lon <- coordF
    } yield (id, icao, name, lat, lon)
  }

  test("toWire omits null fields (NiFi Null Value=false) and parse restores them as nulls") {
    // the omission round-trip the r10 verdict asked for: a row with absent
    // attributes serializes WITHOUT those keys (never "k":null), and
    // re-parsing yields the same row with nulls for the omitted keys —
    // the exact producer/consumer contract of the reference's
    // AttributesToJSON → Kafka → from_json path.
    check(Prop.forAll(Gen.listOfN(40, nifiRow)) { rows =>
      val df = rows.toDF("id", "icao", "name", "lat", "lon")
      val wired = Etl.toWire(df, "id", Seq("id", "icao", "name", "lat", "lon"))
      val omissionOk = wired.select("value").as[String].collect()
        .zip(rows).forall { case (j, (id, icao, name, lat, lon)) =>
          Seq("id" -> id, "icao" -> icao, "name" -> name,
            "lat" -> lat, "lon" -> lon).forall { case (k, v) =>
            // alphanumeric values can't fake a "key": token
            v.isDefined == j.contains(s""""$k":""")
          }
        }
      val reparsed = Etl.parse(
        wired.select(encode($"value", "UTF-8").as("value")))
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toString).sorted.toSeq
      omissionOk && canon(reparsed) == canon(df)
    })
  }

  private val byteWire: Gen[Array[Byte]] = Gen.frequency(
    // pure garbage bytes (invalid UTF-8 sequences included)
    2 -> Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
    // well-formed JSON with a raw invalid-UTF-8 byte inside a value
    2 -> Gen.chooseNum(0, 99).map { i =>
      val head = s"""{"id":"$i","name":"n""".getBytes("UTF-8")
      val tail = s"""","lat":"5","lon":"6"}""".getBytes("UTF-8")
      head ++ Array(0xC3.toByte, 0x28.toByte) ++ tail // truncated 2-byte seq
    },
    // valid JSON bytes, as a control group
    1 -> Gen.chooseNum(0, 99).map(i =>
      s"""{"id":"$i","name":"n$i","lat":"5","lon":"6"}""".getBytes("UTF-8")))

  test("non-UTF-8 wire bytes never throw; the clean path's invariants hold") {
    // CAST(binary AS STRING) replaces invalid sequences with U+FFFD, so a
    // record with damage confined to a string field still parses and (with
    // valid coords) survives clean; pure garbage falls out at from_json
    // (null struct) or the coord filter. Either way: no exception, row
    // count preserved through parse, no null coord ever reaches the output.
    check(Prop.forAll(Gen.listOfN(60, byteWire)) { arrs =>
      val wire = arrs.toDF("value")
      val parsed = Etl.parse(wire)
      val cleaned = Etl.clean(parsed)
      parsed.count() == arrs.size.toLong &&
        cleaned.filter($"latitude".isNull || $"longitude".isNull).count() == 0L &&
        // every record with valid coords survives, damage in name or not
        cleaned.count() == arrs.count(a =>
          new String(a, "UTF-8").contains("\"lat\":\"5\"")).toLong
    })
  }

  test("typed-parse variant nulls bad coords inside from_json (§2.9)") {
    // from_json with DoubleType accepts JSON *number* tokens only: a
    // quoted coord ("4.5") is a type mismatch → null field (the NiFi wire
    // quotes all attributes, so the reference's typed variant yields null
    // coords on that wire — the root job's string-schema + explicit cast
    // is the one that handles it)
    val values = Seq(
      """{"id":"1","name":"a","lat":4.5,"lon":-3}""",
      """{"id":"2","name":"b","lat":"4.5","lon":-3}""",
      """{"id":"3","name":"c","lon":7}""")
    val wire = values.toDF("s").select(encode($"s", "UTF-8").as("value"))
    val parsed = Etl.parse(wire, Etl.airportSchemaTyped)
    val rows = parsed.select("id", "lat", "lon").collect().map(r =>
      (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows == Set(
      ("1", Some(4.5), Some(-3.0)),
      ("2", None, Some(-3.0)),
      ("3", None, Some(7.0))))
  }

}
