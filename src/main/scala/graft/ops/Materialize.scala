package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Versioned materialization with atomic pointer swap — the Spark-native
  * analogue of the reference's blue-green Postgres publication
  * (reference: ecs_loader/load_to_postgres.py:114-139 versioned DDL +
  * unique index, :234-247 CREATE OR REPLACE VIEW cutover, :269-291 old
  * version GC; pattern documented in README.md:21-28).
  *
  *   - each publish writes a fresh `<table>_<version>/` parquet dir
  *     (never in place — readers of the previous version are undisturbed);
  *   - the unique-key gate is enforced BEFORE the swap, like the
  *     reference's unique index: a duplicate-key publish leaves the
  *     current pointer untouched;
  *   - the "view" is a one-line pointer file renamed into place
  *     atomically (POSIX rename), so readers see old or new, never half.
  */
object Materialize {

  private def pointer(base: String, table: String): Path = Paths.get(base, s"$table.current")

  /** Publish a new version. Returns the version directory written.
    * Fails (and leaves `current` untouched) if `keys` are not unique —
    * the reference's unique-index contract (load_to_postgres.py:134-135). */
  def publish(df: DataFrame, base: String, table: String, version: String,
              keys: Seq[String]): String = {
    val dir = s"$base/${table}_$version"
    val dups = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    if (!dups.isEmpty) {
      throw new IllegalStateException(
        s"unique-key violation on (${keys.mkString(", ")}); refusing to publish $table $version")
    }
    df.write.mode("overwrite").parquet(dir)
    Files.createDirectories(Paths.get(base))
    val tmp = Paths.get(base, s"$table.current.tmp")
    Files.writeString(tmp, dir)
    Files.move(tmp, pointer(base, table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  /** Read whatever version the pointer currently names. */
  def current(spark: SparkSession, base: String, table: String): DataFrame =
    spark.read.parquet(Files.readString(pointer(base, table)).trim)

  /** Drop all but the newest `keep` versions (never the pointed-to one) —
    * the reference's min-dated-table GC (load_to_postgres.py:269-291). */
  def gc(base: String, table: String, keep: Int = 2): Seq[String] = {
    val basePath = Paths.get(base)
    if (!Files.isDirectory(basePath)) return Nil
    val live = Files.readString(pointer(base, table)).trim
    val versions = Files.list(basePath).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"${table}_"))
      .toSeq.sortBy(_.getFileName.toString)
    val doomed = versions.dropRight(keep).filterNot(_.toString == live)
    doomed.foreach { d =>
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    doomed.map(_.toString)
  }
}
