package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as a partition-local typed
  * pipeline (`Dataset[T].mapPartitions`) — the Scala analogue of a
  * `mapInPandas` batch-UDF stage.
  *
  * The decode step is a clearly-marked STUB: this container ships no
  * image/audio codecs, so `decodeFrames` derives deterministic fake frames
  * from the payload bytes. Everything around it — the binary schema, the
  * encoder-backed row shape, the batched per-partition iteration, the
  * downstream relational aggregation — is the real 100 TB plumbing: swap
  * `decodeFrames` for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** An ingested media object: opaque bytes + metadata. */
  case class MediaItem(item_id: Long, modality: String, payload: Array[Byte])

  /** Decoded per-item features (fixed-width vector + frame count). */
  case class MediaFeatures(item_id: Long, modality: String, n_bytes: Int,
                           n_frames: Int, mean_level: Double)

  private val FrameBytes = 64

  /** Single source of the 64-byte framing arithmetic: visits every frame
    * as (index, from, until) so decode and sample/resize can never desync
    * on the window boundaries. */
  @inline private def foreachFrame(payload: Array[Byte])(f: (Int, Int, Int) => Unit): Int = {
    val nFrames = (payload.length + FrameBytes - 1) / FrameBytes
    var fi = 0
    while (fi < nFrames) {
      val from = fi * FrameBytes
      f(fi, from, math.min(from + FrameBytes, payload.length))
      fi += 1
    }
    nFrames
  }

  /** STUB decoder — stands in for image decode / audio PCM framing.
    * Deterministic: frames = consecutive 64-byte windows; per-frame level =
    * mean unsigned byte value; item level = mean of frame levels. */
  private def decodeFrames(payload: Array[Byte]): (Int, Double) = {
    if (payload.isEmpty) return (0, 0.0)
    var frameSum = 0.0
    val nFrames = foreachFrame(payload) { (_, from, until) =>
      var s = 0L
      var i = from
      while (i < until) { s += (payload(i) & 0xff); i += 1 }
      frameSum += s.toDouble / (until - from)
    }
    (nFrames, frameSum / nFrames)
  }

  /** Decoded features after frame-sampling + resize. */
  case class SampledFeatures(item_id: Long, modality: String,
                             n_kept: Int, mean_level: Double)

  private val SampleEvery = 3

  /** STUB frame-sample + resize — keeps every `SampleEvery`-th 64-byte
    * frame and "resizes" each kept frame by striding to every 2nd byte
    * (the downsample shape of image resize / audio decimation), then
    * levels as in decodeFrames. Deterministic byte arithmetic, so the
    * oracle mirrors it; swap for a real codec call and nothing else in
    * the pipeline changes. */
  private def sampleResizeLevel(payload: Array[Byte]): (Int, Double) = {
    if (payload.isEmpty) return (0, 0.0)
    var kept = 0; var levelSum = 0.0
    foreachFrame(payload) { (fi, from, until) =>
      if (fi % SampleEvery == 0) {
        var s = 0L; var cnt = 0; var i = from
        while (i < until) { s += (payload(i) & 0xff); cnt += 1; i += 2 }
        levelSum += s.toDouble / cnt
        kept += 1
      }
    }
    (kept, levelSum / kept)
  }

  /** The sampled pipeline: decode → frame-sample → resize → features,
    * still typed, partition-local, shuffle-free until the rollup. */
  def sampledStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.map { m =>
        val (kept, level) = sampleResizeLevel(m.payload)
        SampledFeatures(m.item_id, m.modality, kept, level)
      }
    }
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_kept")).as("sum_kept"),
        round(sum(col("mean_level").cast("decimal(18,9)")).cast("double"), 4).as("sum_level"))
      .orderBy(col("modality"))
  }

  /** Media table synthesized from `documents` (text bytes stand in for
    * image/audio blobs; modality assigned deterministically by source). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Par.fanOut(Tables.documents(spark, dir))
      .select(
        col("doc_id").as("item_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** The batch "decode" stage: typed, partition-local, no shuffle. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (frames, level) = decodeFrames(m.payload)
        MediaFeatures(m.item_id, m.modality, m.payload.length, frames, level)
      }
    }
  }

  /** Per-modality rollup of the decoded features. */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_frames")).as("sum_frames"),
        max(col("n_bytes")).as("max_bytes"),
        round(sum(col("mean_level").cast("decimal(18,9)")).cast("double"), 4).as("sum_level"))
      .orderBy(col("modality"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> (featureStats _),
    "q_mm_sampled" -> (sampledStats _),
  )

  /** The stub decoder is deterministic byte arithmetic over an ASCII
    * payload (verified: every gate-corpus text has length == strlen), so
    * DuckDB can mirror frames/levels exactly: per-frame mean of character
    * codes over 64-byte windows, then the same DECIMAL-sum/round chain. */
  val oracles: Map[String, String] = Map(
    "q_mm_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    strlen(text) AS n_bytes,
        |    CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames,
        |    list_avg(list_transform(range(CAST(ceil(strlen(text) / 64.0) AS BIGINT)),
        |      fi -> list_avg(list_transform(range(least(64, strlen(text) - fi*64)),
        |              i -> ascii(substr(text, CAST(fi*64 + i + 1 AS INT), 1)))))) AS mean_level
        |  FROM documents)
        |SELECT modality, count(*) AS n_items,
        |       CAST(sum(n_frames) AS BIGINT) AS sum_frames,
        |       CAST(max(n_bytes) AS INTEGER) AS max_bytes,
        |       ROUND(CAST(sum(CAST(mean_level AS DECIMAL(18,9))) AS DOUBLE), 4) AS sum_level
        |FROM f GROUP BY modality ORDER BY modality""".stripMargin,
    "q_mm_sampled" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    len(list_filter(range(CAST(ceil(strlen(text)/64.0) AS BIGINT)),
        |        fi -> fi % 3 = 0)) AS n_kept,
        |    list_avg(list_transform(
        |      list_filter(range(CAST(ceil(strlen(text)/64.0) AS BIGINT)), fi -> fi % 3 = 0),
        |      fi -> list_avg(list_transform(
        |        list_filter(range(least(64, strlen(text) - fi*64)), i -> i % 2 = 0),
        |        i -> ascii(substr(text, CAST(fi*64 + i + 1 AS INT), 1)))))) AS mean_level
        |  FROM documents)
        |SELECT modality, count(*) AS n_items,
        |       CAST(sum(n_kept) AS BIGINT) AS sum_kept,
        |       ROUND(CAST(sum(CAST(mean_level AS DECIMAL(18,9))) AS DOUBLE), 4) AS sum_level
        |FROM l GROUP BY modality ORDER BY modality""".stripMargin,
  )
}
