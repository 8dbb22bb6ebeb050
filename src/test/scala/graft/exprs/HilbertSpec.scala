package graft.exprs

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The two properties that DEFINE a Hilbert curve (and catch every known
  * variant/rotation bug in the bit transform): the map is a bijection
  * onto [0, n²), and consecutive indices are always 4-neighbor adjacent
  * cells — the property Morton/Z-order lacks and the whole reason the
  * layout prefers Hilbert. Plus the executed round trip both ways. */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("hilbert_index is a bijection and consecutive indices are grid-adjacent (16x16)") {
    graft.functions.registerAll(spark)
    val rows = spark.sql(
      """SELECT d, hilbert_xy(16L, d).x AS x, hilbert_xy(16L, d).y AS y,
        |       hilbert_index(16L, hilbert_xy(16L, d).x, hilbert_xy(16L, d).y) AS back
        |FROM (SELECT explode(sequence(0L, 255L)) AS d)
        |ORDER BY d""".stripMargin).collect()
    assert(rows.length == 256)
    // bijection: d2xy covers every cell exactly once, and xy2d inverts it
    val cells = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(cells.toSet.size == 256)
    rows.foreach(r => assert(r.getLong(3) == r.getLong(0), s"round trip at d=${r.getLong(0)}"))
    // unit-step adjacency along the whole curve
    cells.sliding(2).foreach { case Array((x0, y0), (x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("out-of-grid and non-power-of-two inputs are loud errors, null is null") {
    graft.functions.registerAll(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT hilbert_index(16L, 16L, 0L)").collect()
    }
    assert(e1.getMessage.contains("outside") || e1.getCause != null)
    val e2 = intercept[Exception] {
      spark.sql("SELECT hilbert_index(12L, 1L, 1L)").collect()
    }
    assert(e2.getMessage.contains("power of two") || e2.getCause != null)
    val r = spark.sql("SELECT hilbert_index(16L, CAST(NULL AS BIGINT), 0L)").head()
    assert(r.isNullAt(0))
  }
}
