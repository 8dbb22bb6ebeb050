package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Codec law for the LedgerSink framing: write∘read = identity for every
  * supported type over adversarial values — extremes (Long.MinValue, ±∞,
  * NaN), empty and multi-code-point unicode strings, null in any column,
  * zero rows — exercised through the REAL writer/reader pair (the same
  * classes Spark tasks run), not a re-implementation. */
object LedgerCodecProps extends Properties("ledger_codec") {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("v", DoubleType), StructField("b", BooleanType),
    StructField("i", IntegerType)))

  private val longs = Gen.oneOf(Gen.long,
    Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L))
  private val strs = Gen.oneOf(
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("é", "中", "😀", "\n", "\"", "\\", ""))).map(_.mkString),
    Gen.const(""))
  private val dbls = Gen.oneOf(Gen.double,
    Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -0.0, Double.MinPositiveValue))

  private val rowGen: Gen[(Option[Long], Option[String], Option[Double], Option[Boolean], Option[Int])] =
    for {
      k <- Gen.option(longs); s <- Gen.option(strs); v <- Gen.option(dbls)
      b <- Gen.option(Gen.oneOf(true, false)); i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    } yield (k, s, v, b, i)

  private def toInternal(t: (Option[Long], Option[String], Option[Double], Option[Boolean], Option[Int])): InternalRow = {
    val r = new GenericInternalRow(5)
    t._1.fold(r.update(0, null))(v => r.update(0, v))
    t._2.fold(r.update(1, null))(v => r.update(1, UTF8String.fromString(v)))
    t._3.fold(r.update(2, null))(v => r.update(2, v))
    t._4.fold(r.update(3, null))(v => r.update(3, v))
    t._5.fold(r.update(4, null))(v => r.update(4, v))
    r
  }

  private def roundtrip(rows: List[(Option[Long], Option[String], Option[Double], Option[Boolean], Option[Int])]) = {
    val dir = Files.createTempDirectory("ledger_prop").toFile
    try {
      val w = new LedgerWriter(schema, dir.getAbsolutePath, 0, 0L, None)
      rows.foreach(t => w.write(toInternal(t)))
      val msg = w.commit().asInstanceOf[LedgerCommit]
      val rd = new LedgerReader(new File(dir, msg.file), schema, schema)
      val got = Iterator.continually(rd).takeWhile(_.next()).map { r0 =>
        val r = r0.get()
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getUTF8String(1).toString),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4)))
      }.toList
      rd.close()
      (got, msg.rows)
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete(); ()
    }
  }

  private def eqDouble(a: Option[Double], b: Option[Double]): Boolean =
    (a, b) match {
      case (Some(x), Some(y)) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      case (x, y) => x == y
    }

  property("write-then-read is identity (bit-exact doubles, code-point-exact strings)") =
    forAll(Gen.listOfN(30, rowGen).flatMap(Gen.const)) { rows =>
      val (got, n) = roundtrip(rows)
      n == rows.length && got.length == rows.length &&
        got.zip(rows).forall { case (g, w) =>
          g._1 == w._1 && g._2 == w._2 && eqDouble(g._3, w._3) &&
            g._4 == w._4 && g._5 == w._5
        }
    }

  property("empty file reads as zero rows") = {
    val (got, n) = roundtrip(Nil)
    got.isEmpty && n == 0L
  }
}
