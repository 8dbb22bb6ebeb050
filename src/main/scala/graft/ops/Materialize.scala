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
  * Layout: `<base>/<table>/versions/<version>/` parquet dirs + a
  * `<base>/<table>/current` pointer file (one line: the live version dir).
  * Namespacing versions under the table directory keeps GC from ever
  * touching a sibling table.
  *
  *   - each publish writes a fresh version dir (never in place — readers
  *     of the previous version are undisturbed), then validates the
  *     WRITTEN data, so the input plan executes exactly once;
  *   - the unique-key gate runs BEFORE the swap, like the reference's
  *     unique index: a duplicate-key publish deletes its rejected version
  *     dir and leaves `current` untouched;
  *   - the pointer file is renamed into place atomically (POSIX rename),
  *     so readers see old or new, never half.
  */
object Materialize {

  private def tableDir(base: String, table: String): Path = Paths.get(base, table)
  private def pointer(base: String, table: String): Path = tableDir(base, table).resolve("current")

  /** Failure-notification seam, mirroring the reference's webhook cards
    * on load failure (ecs_loader/load_to_postgres.py:35-80,225-227 —
    * notify-on-COPY-failure). The engine stays transport-agnostic: the
    * default sink logs; an operator wires a real channel (webhook, pager)
    * by passing its own callback to [[publish]]. The callback runs AFTER
    * the failed publish has cleaned up (rejected version dir removed,
    * pointer untouched) and before the error propagates; a throwing
    * callback is swallowed so notification problems never mask the
    * publish failure itself. */
  type FailureHook = (String, String, Throwable) => Unit

  /** Default hook: log to stderr (SURVEY §2.8 "log only"). */
  val logFailure: FailureHook = (table, version, e) =>
    System.err.println(s"[materialize] publish FAILED for $table/$version: ${e.getMessage}")

  /** Publish a new version. Returns the version directory written.
    * Fails (and leaves `current` untouched) if `keys` are not unique in
    * the written data — the reference's unique-index contract
    * (load_to_postgres.py:134-135). Any failure (write, gate, swap) is
    * reported to `onFailure` before the exception propagates. */
  def publish(df: DataFrame, base: String, table: String, version: String,
              keys: Seq[String], onFailure: FailureHook = logFailure): String =
    try publishImpl(df, base, table, version, keys)
    catch {
      case e: Throwable =>
        try onFailure(table, version, e)
        catch { case hookErr: Throwable =>
          System.err.println(s"[materialize] failure hook itself threw: $hookErr") }
        throw e
    }

  private def publishImpl(df: DataFrame, base: String, table: String, version: String,
                          keys: Seq[String]): String = {
    val dirPath = tableDir(base, table).resolve("versions").resolve(version)
    val dir = dirPath.toString
    df.write.mode("overwrite").parquet(dir)
    // gate on the written parquet: one execution of the input plan, and
    // the check sees exactly the bytes a reader would
    val written = df.sparkSession.read.parquet(dir)
    val dups = written.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    if (!dups.isEmpty) {
      // remove the rejected version so it can neither be pointed at nor
      // occupy a gc retention slot
      Files.walk(dirPath).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      throw new IllegalStateException(
        s"unique-key violation on (${keys.mkString(", ")}); refusing to publish $table $version")
    }
    val tmp = tableDir(base, table).resolve("current.tmp")
    Files.writeString(tmp, dir)
    Files.move(tmp, pointer(base, table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  /** Read whatever version the pointer currently names. */
  def current(spark: SparkSession, base: String, table: String): DataFrame =
    spark.read.parquet(Files.readString(pointer(base, table)).trim)

  /** Time-travel read: a specific retained version, independent of the
    * pointer — the rollback/debugging read path that versioned
    * materialization exists to provide (any version gc kept is readable;
    * the pointer only names the DEFAULT one). */
  def version(spark: SparkSession, base: String, table: String, v: String): DataFrame =
    spark.read.parquet(tableDir(base, table).resolve("versions").resolve(v).toString)

  /** Drop all but the `keep` most recently written versions (and never the
    * pointed-to one) — the reference's min-dated-table GC
    * (load_to_postgres.py:269-291). Ordered by modification time, not
    * name: version strings need not sort lexicographically (v10 > v2).
    *
    * `keep` must be >= 2: "never the pointed-to one" protects the version
    * the pointer names NOW, but a reader that resolved `current` just
    * before a publish+gc pair is still scanning the PREVIOUS version —
    * with keep=1 that directory would be deleted mid-read. keep=2 keeps
    * the last pre-swap version alive through one full publish+gc cycle,
    * which bounds reader staleness the same way the reference's GC keeps
    * the prior dated table until the next load. */
  def gc(base: String, table: String, keep: Int = 2): Seq[String] = {
    require(keep >= 2,
      s"gc(keep=$keep): keep must be >= 2 — a reader that resolved 'current' " +
      "before the latest publish may still be reading the previous version")
    val versionsDir = tableDir(base, table).resolve("versions")
    if (!Files.isDirectory(versionsDir)) return Nil
    // no pointer = no successful publish yet (every version is reclaimable)
    val ptr = pointer(base, table)
    val live = if (Files.exists(ptr)) Files.readString(ptr).trim else ""
    val versions = Files.list(versionsDir).iterator().asScala
      .filter(Files.isDirectory(_))
      .toSeq.sortBy(p => Files.getLastModifiedTime(p).toMillis)
    val doomed = versions.dropRight(keep).filterNot(_.toString == live)
    doomed.foreach { d =>
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    doomed.map(_.toString)
  }
}
