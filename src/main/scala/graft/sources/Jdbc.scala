package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** JDBC-shaped source/sink surface mirroring the reference's defining I/O:
  * a bounds-probed, range-partitioned JDBC read
  * (reference: spark_job/process_geodata.py:54-96 — `_read_data_bounds`
  * probing `max/min` then `_read_data_from_db` with
  * partitionColumn/lowerBound/upperBound/numPartitions=100 and
  * fetchsize=10000) and a batched bulk sink
  * (reference: ecs_loader/load_to_postgres.py:168-229 — COPY into a
  * dated staging table).
  *
  * The sandbox has no database, so nothing here opens a connection in
  * tests: the value is the OPTION PLUMBING — the exact option maps Spark's
  * built-in JDBC relation provider consumes. `reader()`/`writer()` return
  * configured builders; `.load()`/`.save()` against a real URL is the only
  * untested step (documented in COVERAGE.md as environment-limited).
  *
  * Scale notes (the 100 TB contract):
  *   - a partitioned read plans `numPartitions` concurrent range queries,
  *     one per executor slot — the bounded-slice pattern the reference
  *     hand-rolls is native to Spark's JDBC source;
  *   - `partitionsFor` derives the partition count from the probed bounds
  *     and a target rows-per-partition, so slice width tracks the data
  *     instead of a hardcoded 100;
  *   - `fetchsize` bounds executor memory per round-trip; `batchsize`
  *     bounds sink-side insert batches exactly like the reference's
  *     buffered COPY.
  */
object Jdbc {

  /** Options for a partitioned JDBC source read. `bounds` + `numPartitions`
    * split `[lowerBound, upperBound]` into equal ranges on
    * `partitionColumn` — Spark issues one WHERE-bounded query per slice. */
  final case class SourceConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      fetchSize: Int = 10000,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Option[Int] = None) {

    require(fetchSize > 0, s"fetchsize must be positive, got $fetchSize")
    // Spark requires the four partitioning options together; catching a
    // partial spec here beats the runtime AnalysisException at .load()
    private val partSpec = Seq(partitionColumn, lowerBound, upperBound, numPartitions)
    require(partSpec.forall(_.isDefined) || partSpec.forall(_.isEmpty),
      "partitionColumn, lowerBound, upperBound, numPartitions must be set together")
    require(numPartitions.forall(_ > 0), s"numPartitions must be positive, got $numPartitions")
    require(lowerBound.zip(upperBound).forall { case (lo, hi) => lo <= hi },
      s"lowerBound must be <= upperBound, got $lowerBound > $upperBound")

    /** The option map Spark's JDBC relation provider consumes. */
    def options: Map[String, String] =
      Map(
        "url" -> url,
        "dbtable" -> table,
        "user" -> user,
        "password" -> password,
        "driver" -> driver,
        "fetchsize" -> fetchSize.toString) ++
      partitionColumn.map("partitionColumn" -> _) ++
      lowerBound.map("lowerBound" -> _.toString) ++
      upperBound.map("upperBound" -> _.toString) ++
      numPartitions.map("numPartitions" -> _.toString)

    /** Copy with the range-partitioning quadruple filled in. */
    def partitionedOn(column: String, lower: Long, upper: Long, parts: Int): SourceConfig =
      copy(partitionColumn = Some(column), lowerBound = Some(lower),
        upperBound = Some(upper), numPartitions = Some(parts))
  }

  /** Options for a batched JDBC sink write (the Spark-native analogue of
    * the reference's pooled COPY loader: batched inserts, explicit
    * isolation, optional TRUNCATE-instead-of-DROP on overwrite). */
  final case class SinkConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      truncate: Boolean = false) {

    require(batchSize > 0, s"batchsize must be positive, got $batchSize")
    require(Set("NONE", "READ_COMMITTED", "READ_UNCOMMITTED", "REPEATABLE_READ",
      "SERIALIZABLE").contains(isolationLevel), s"invalid isolationLevel $isolationLevel")

    def options: Map[String, String] = Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "driver" -> driver,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolationLevel,
      "truncate" -> truncate.toString)
  }

  // bounds probes run against a TABLE (possibly schema-qualified), never a
  // subquery relation — a caller reading from a subquery supplies explicit
  // bounds instead (partitionedOn). Restricting to the identifier grammar
  // is what makes the interpolation below safe; arbitrary subquery text
  // cannot be validated meaningfully.
  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*"
  private val TableRe = s"$IdentRe(\\.$IdentRe)*".r
  private val ColumnRe = IdentRe.r
  private def checkIdent(kind: String, re: scala.util.matching.Regex, v: String): String = {
    require(re.matches(v),
      s"unsafe $kind identifier for SQL interpolation: '$v' (expected a plain or dot-qualified identifier)")
    v
  }

  /** A pushed-down bounds probe: the `dbtable` subquery the reference
    * issues before every partitioned read (process_geodata.py:54-58 —
    * `SELECT max(id), min(id)`). Runs ON the database; the driver reads
    * one row. Identifiers are validated before interpolation; subquery
    * relations are rejected — supply explicit bounds for those.
    *
    * The column is double-quoted: Spark's JDBC sink quotes column names at
    * CREATE TABLE (preserving DataFrame case), while unquoted SQL folds to
    * the database's default case (upper on Derby/Oracle, lower on
    * Postgres) — quoting the exact case is the one spelling that resolves
    * on both a Spark-written and a natively-created table. The table name
    * stays unquoted because Spark interpolates it verbatim on both the
    * write and read paths, so folding is applied consistently. */
  def boundsQuery(table: String, column: String): String = {
    checkIdent("table", TableRe, table)
    checkIdent("column", ColumnRe, column)
    // aliases quoted too, or the database's case folding renames them
    s"""(SELECT max("$column") AS "hi", min("$column") AS "lo" FROM $table) graft_bounds"""
  }

  /** The partitionColumn spelling that matches a Spark-written table:
    * Spark interpolates partitionColumn verbatim into each slice's WHERE,
    * so it needs the same double-quoting as [[boundsQuery]]. */
  def quotedColumn(column: String): String =
    "\"" + checkIdent("column", ColumnRe, column) + "\""

  /** Config for the bounds probe of `cfg` — same connection options, the
    * subquery as the relation, a single partition (one row comes back). */
  def boundsConfig(cfg: SourceConfig, column: String): SourceConfig =
    cfg.copy(table = boundsQuery(cfg.table, column),
      partitionColumn = None, lowerBound = None, upperBound = None,
      numPartitions = None)

  /** Partition count from probed bounds at a target id-range width per
    * slice — replaces the reference's hardcoded numPartitions=100 with a
    * data-derived count (capped so a huge range cannot plan millions of
    * one-row queries). */
  def partitionsFor(lo: Long, hi: Long, targetPerPartition: Long = 1000000L,
                    maxPartitions: Int = 10000): Int = {
    require(targetPerPartition > 0 && lo <= hi)
    // BigInt: a 64-bit id space (snowflake/hash partition columns) makes
    // `hi - lo + 1` wrap in Long, which would silently plan ONE partition
    // for the widest possible table instead of the capped maximum
    val span = BigInt(hi) - BigInt(lo) + 1
    val want = (span + targetPerPartition - 1) / targetPerPartition
    want.min(maxPartitions).max(1).toInt
  }

  /** A configured reader: `reader(spark, cfg).load()` is the full
    * partitioned read. */
  def reader(spark: SparkSession, cfg: SourceConfig): DataFrameReader =
    spark.read.format("jdbc").options(cfg.options)

  /** A configured writer: `writer(df, cfg).mode(...).save()` is the full
    * batched bulk load. */
  def writer(df: DataFrame, cfg: SinkConfig): DataFrameWriter[Row] =
    df.write.format("jdbc").options(cfg.options)
}
