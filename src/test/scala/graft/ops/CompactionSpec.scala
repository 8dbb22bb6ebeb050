package graft.ops

import graft.SparkFixture
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** The row-parity half of q_compact_files is oracle-checked by the driver;
  * this spec asserts the part the oracle cannot see — the file layout:
  * fragmentation produced many files, compaction collapsed them to the
  * byte-derived target count. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(p: String): Seq[Path] =
    Files.list(Paths.get(p)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))

  test("compaction collapses the fragmented layout to the byte-derived file count") {
    SinkQueries.compactSmallFiles(spark, dir).collect()
    val frag = parquetFiles(s"${SinkQueries.OutBase}/frag_docs")
    val compact = parquetFiles(s"${SinkQueries.OutBase}/compact_docs")
    assert(frag.size == 32, s"expected 32 fragment files, got ${frag.size}")
    // sf0.001 documents are far below one 128 MB target file
    assert(compact.size == 1, s"expected 1 compacted file, got ${compact.size}")
    val fragBytes = frag.map(Files.size).sum
    val compactBytes = compact.map(Files.size).sum
    // 32 parquet footers/dictionaries for 50 rows carry real overhead;
    // the compacted file must be strictly smaller in aggregate
    assert(compactBytes < fragBytes,
      s"compacted $compactBytes >= fragmented $fragBytes")
  }
}
