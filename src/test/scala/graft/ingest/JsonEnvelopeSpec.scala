package graft.ingest

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("score", IntegerType)))

  test("encode → flatten round-trips the record (producer/consumer parity)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("id", "score")
    val back = JsonEnvelope.flatten(JsonEnvelope.encode(df), "value", schema)
    assert(back.columns.toSeq == Seq("id", "score"))
    assert(back.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 2)))
  }

  test("castToString turns a binary envelope column into utf8 (P1)") {
    val df = Seq("""{"id":"z","score":9}""".getBytes("UTF-8")).toDF("value")
    val out = JsonEnvelope.castToString(df).as[String].head()
    assert(out == """{"id":"z","score":9}""")
  }

  test("flatten keeps sibling columns and nulls malformed payloads") {
    val df = Seq((7L, """{"id":"x","score":3}"""), (8L, "oops")).toDF("k", "payload")
    val out = JsonEnvelope.flatten(df, "payload", schema)
    assert(out.columns.toSeq == Seq("k", "id", "score"))
    val rows = out.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(7L).contains("x") && rows(8L).isEmpty)
  }
}
