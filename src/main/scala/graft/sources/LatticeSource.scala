package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 table for the synthetic parcel lattice — the engine's
  * generator-backed source (the DSv2 rung of the extension ladder, next
  * to the expression/rule/strategy rungs in `GraftSparkExtensions`):
  *
  *   spark.read.format("graft.sources.LatticeSource")
  *     .option("regions", 25).option("sites", 2500).option("keepMod", 7)
  *     .load()
  *
  * yields `(r INT, pos INT, x DOUBLE, y DOUBLE)` — region id, site index
  * (those with `pos % keepMod < 3` when keepMod > 0), and the exact
  * integer-meter site coordinates of the fixture lattice
  * (`GeoFixtures.regionX0/Y0` + 1 km pitch), one InputPartition per
  * region.
  *
  * What it demonstrates over a parquet scan:
  *   - SupportsPushDownFilters: predicates on `r` prune whole
  *     PARTITIONS at planning time (r is constant per partition, so
  *     evaluation at partition granularity is exact); pruned regions
  *     never even generate. Pushed filters are still returned as
  *     residuals, so Spark's own re-evaluation keeps correctness
  *     independent of the pruning (belt and braces — the V1 JDBC
  *     source's convention).
  *   - SupportsPushDownRequiredColumns: the reader materializes only
  *     the pruned schema — `select(count(*))` generates zero field
  *     values per row.
  *
  * At 100 TB the same shape is how a sharded external system (a tile
  * server, a feature store, a range-partitioned KV store) binds into
  * Catalyst: partition-exact pushdown + per-partition readers, no
  * driver materialization anywhere. */
class LatticeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LatticeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    // properties carries the reader options with their ORIGINAL case;
    // normalize through the same case-insensitive view Spark reads with
    val opts = new CaseInsensitiveStringMap(properties)
    new LatticeTable(
      opts.getOrDefault("regions", "25").toInt,
      opts.getOrDefault("sites", "2500").toInt,
      opts.getOrDefault("keepmod", "0").toInt)
  }
}

object LatticeSource {
  val Schema: StructType = StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** Fixture lattice arithmetic — the closed form every oracle replays
    * (see GeoFixtures): 5×5 region grid at 60 km pitch, 1 km site
    * pitch, 50 sites per row. */
  def siteX(r: Int, pos: Int): Double =
    (-6300000L + (r % 5).toLong * 60000L + (pos % 50).toLong * 1000L).toDouble
  def siteY(r: Int, pos: Int): Double =
    (-2000000L + (r / 5).toLong * 60000L + (pos / 50).toLong * 1000L).toDouble
}

private[sources] class LatticeTable(regions: Int, sites: Int, keepMod: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_lattice($regions x $sites, keepMod=$keepMod)"
  override def schema(): StructType = LatticeSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LatticeScanBuilder(regions, sites, keepMod)
}

private[sources] class LatticeScanBuilder(regions: Int, sites: Int, keepMod: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = LatticeSource.Schema

  /** A filter is accepted iff it constrains column `r` in a shape the
    * per-region pruner evaluates exactly; everything else stays with
    * Spark. Accepted filters are ALSO returned as residuals (see class
    * doc). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(LatticeScanBuilder.prunesR)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new LatticeScan(regions, sites, keepMod, pushed, required)
}

private[sources] object LatticeScanBuilder {
  def prunesR(f: Filter): Boolean = f match {
    case EqualTo("r", _: Integer) => true
    case GreaterThan("r", _: Integer) => true
    case GreaterThanOrEqual("r", _: Integer) => true
    case LessThan("r", _: Integer) => true
    case LessThanOrEqual("r", _: Integer) => true
    case In("r", vs) => vs.forall(_.isInstanceOf[Integer])
    case _ => false
  }

  def admits(f: Filter, r: Int): Boolean = f match {
    case EqualTo("r", v: Integer) => r == v.intValue()
    case GreaterThan("r", v: Integer) => r > v.intValue()
    case GreaterThanOrEqual("r", v: Integer) => r >= v.intValue()
    case LessThan("r", v: Integer) => r < v.intValue()
    case LessThanOrEqual("r", v: Integer) => r <= v.intValue()
    case In("r", vs) => vs.exists { case v: Integer => r == v.intValue(); case _ => false }
    case _ => true
  }
}

private[sources] case class LatticePartition(r: Int, sites: Int, keepMod: Int,
                                             fieldIdx: Array[Int])
  extends InputPartition with HasPartitionKey {
  /** Each partition holds exactly one region — report it, so Spark's
    * storage-partitioned machinery can line partitions up without a
    * shuffle. */
  override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](r))
}

private[sources] class LatticeScan(regions: Int, sites: Int, keepMod: Int,
                                   pushed: Array[Filter], required: StructType)
  extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_lattice pushed=[${pushed.mkString(", ")}] read=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  /** The data IS key-grouped by `r` (one region per InputPartition, key
    * reported via [[HasPartitionKey]]): with
    * `spark.sql.sources.v2.bucketing.enabled=true` an aggregation or
    * join keyed on `r` plans with NO Exchange under it — the DSv2
    * storage-partitioned contract (SPARK-37375), the scale device that
    * makes a pre-sharded external system join shuffle-free. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("r")),
      (0 until regions).count(r => pushed.forall(LatticeScanBuilder.admits(_, r))))

  override def planInputPartitions(): Array[InputPartition] = {
    val idx = required.fieldNames.map(LatticeSource.Schema.fieldIndex)
    (0 until regions)
      .filter(r => pushed.forall(LatticeScanBuilder.admits(_, r)))
      .map(r => LatticePartition(r, sites, keepMod, idx): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val lp = p.asInstanceOf[LatticePartition]
        new PartitionReader[InternalRow] {
          private var pos = -1
          override def next(): Boolean = {
            pos += 1
            if (lp.keepMod > 0)
              while (pos < lp.sites && pos % lp.keepMod >= 3) pos += 1
            pos < lp.sites
          }
          override def get(): InternalRow = {
            val vals = lp.fieldIdx.map {
              case 0 => lp.r: Any
              case 1 => pos: Any
              case 2 => LatticeSource.siteX(lp.r, pos): Any
              case 3 => LatticeSource.siteY(lp.r, pos): Any
            }
            new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          }
          override def close(): Unit = ()
        }
      }
    }
}
