package graft.ops

import graft.SparkFixture
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The bloom filter must actually exist in the written footers and answer
  * membership — otherwise q_parquet_bloom silently degrades to a plain
  * scan and the "IO ∝ hits" claim is vacuous. */
class ParquetBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Each test runs the write itself so it passes standalone — without
    * this, `listFiles()` on the never-written dir returns null and the
    * second test NPEs instead of failing cleanly. */
  private def writtenFiles(): Array[java.io.File] = {
    SinkQueries.parquetBloom(spark, dir).collect() // runs the write
    val listed = new java.io.File(s"${SinkQueries.OutBase}/parquet_bloom").listFiles()
    assert(listed != null, "parquet_bloom output dir missing after write")
    listed.filter(_.getName.endsWith(".parquet"))
  }

  test("written footers carry a bloom filter on l_orderkey that answers membership") {
    val files = writtenFiles()
    assert(files.nonEmpty)
    val conf = new Configuration()
    var sawFilter = false
    var presentHit = false
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == "l_orderkey").get
          val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
          assert(bloom != null, s"no bloom filter in ${f.getName}")
          sawFilter = true
          // a key inside this row group's range must be reported possible
          val minK = cc.getStatistics.genericGetMin.asInstanceOf[java.lang.Long]
          if (bloom.findHash(bloom.hash(minK.longValue()))) presentHit = true
        }
      } finally reader.close()
    }
    assert(sawFilter, "no row group carried a bloom filter")
    assert(presentHit, "bloom filter never acknowledged a present key")
  }

  test("absent probe key is rejected by at least one row group's bloom filter") {
    // 123456789 never occurs (orderkeys are dense from 0); a correct bloom
    // rejects it in MOST groups — require at least one rejection so the
    // skipping path is provably reachable
    val files = writtenFiles()
    val conf = new Configuration()
    var rejected = false
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == "l_orderkey").get
          val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
          if (bloom != null && !bloom.findHash(bloom.hash(123456789L)))
            rejected = true
        }
      } finally reader.close()
    }
    assert(rejected, "no row group rejected the absent key")
  }
}
