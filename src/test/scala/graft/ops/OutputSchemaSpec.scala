package graft.ops

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Render-safety gate for EVERY emitted output column (VERDICT r14 #7):
  * the driver's DuckDB compare renders both sides to strings, so any
  * output type whose Spark rendering can drift from DuckDB/Python's is a
  * latent hash mismatch even when the VALUES are identical. The DECIMAL
  * axis of this trap shipped in r13 (and is gated in PlanShapeSpec); this
  * spec closes the remaining axes — timestamp/date formatting, float
  * shortest-repr, binary/array/map/struct rendering — with a single
  * allowlist of emitted types: integral (byte/short/int/long), double,
  * string, boolean, and the sanctioned DECIMAL(<=15,1) funnel.
  *
  * Everything else must be normalized before emission: timestamps →
  * unix_millis BIGINT (the loader rule), dates → DATE-formatted STRING or
  * epoch-day BIGINT, floats → double, binary → hex STRING, nested types →
  * exploded scalar columns. */
class OutputSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  import org.apache.spark.sql.types._

  private def renderSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case DoubleType => true
    case StringType => true
    case BooleanType => true
    case d: DecimalType => d.precision <= 15 && d.scale == 1 // PlanShapeSpec's funnel
    case _ => false
  }

  test("every registered query emits only render-safe output types") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad = SparkEntry.queries(name)(spark, dir).schema.fields
        .filterNot(f => renderSafe(f.dataType))
        .map(f => s"${f.name}:${f.dataType.simpleString}")
      if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"queries emitting render-unsafe output types: ${offenders.mkString("; ")} — " +
        "normalize before emitting (timestamp→unix_millis, date→string, " +
        "float→double, binary→hex, nested→scalars)")
  }

  test("the detector fires on each unsafe axis and passes each safe one") {
    val fixture = spark.range(1).selectExpr(
      "CAST(id AS TIMESTAMP) AS bad_ts",        // tz/format drift
      "CAST('2024-01-01' AS DATE) AS bad_date", // strftime vs iso drift
      "CAST(id AS FLOAT) AS bad_float",         // float32 shortest-repr
      "CAST('x' AS BINARY) AS bad_bin",         // b'...' rendering
      "array(id) AS bad_arr",                   // nested rendering
      "CAST(id AS DECIMAL(38,0)) AS bad_dec",   // the r13 lane
      "id AS ok_long", "CAST(id AS INT) AS ok_int",
      "CAST(id AS DOUBLE) AS ok_double", "CAST(id AS STRING) AS ok_str",
      "id = 0 AS ok_bool", "CAST(id AS DECIMAL(12,1)) AS ok_funnel")
    val flagged = fixture.schema.fields.filterNot(f => renderSafe(f.dataType)).map(_.name)
    assert(flagged.toSeq ==
      Seq("bad_ts", "bad_date", "bad_float", "bad_bin", "bad_arr", "bad_dec"),
      s"detector misclassified: ${flagged.mkString(",")}")
  }
}
