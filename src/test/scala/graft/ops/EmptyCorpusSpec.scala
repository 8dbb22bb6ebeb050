package graft.ops

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must RUN (possibly to zero rows) on an
  * all-empty corpus — the empty-daily-partition reality of a production
  * pipeline. This pins the hardening guards (zorder bounds, histogram,
  * chi-square cells, vector query-vector/centroid reads): a driver-side
  * `.head`/`.collect` on a relation that can be empty must degrade to an
  * empty result, never throw. */
class EmptyCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val dir: String = {
    val d = "/root/repo/target/fixtures/empty_corpus"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      Tables.table(spark, "/root/testdata/sf0.001", t).limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every registered query runs on an all-empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    assert(failures.isEmpty, s"queries throwing on empty input:\n${failures.mkString("\n")}")
  }
}
