package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import MediaCodec._

/** Multimodal column handling: media as opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as a partition-local typed
  * pipeline (`Dataset[T].mapPartitions`) — the Scala analogue of a
  * `mapInPandas` batch-UDF stage.
  *
  * The decode step is REAL: payloads are genuine uncompressed containers
  * (24-bit BMP images, PCM16 WAV audio, concatenated-P6-PPM video — see
  * [[MediaCodec]]) synthesized deterministically per item, and the
  * feature stage parses the actual byte layout (BMP bottom-up padded
  * rows, RIFF chunk walk, PPM header grammar) back into pixels/samples.
  * The oracle recomputes the expected pixel/sample statistics from the
  * same deterministic generator closed-form — any decode defect (wrong
  * stride, padding miscount, header off-by-one) breaks the hash match.
  *
  * Scale shape: encode and decode are per-row partition-local work with
  * zero shuffle until the final per-modality rollup; at 100 TB the
  * payload column stays opaque bytes in parquet and only the fixed-width
  * feature columns ever reach an exchange.
  */
object Multimodal {

  /** An ingested media object: opaque bytes + metadata. */
  case class MediaItem(item_id: Long, modality: String, payload: Array[Byte])

  /** Decoded per-item features: container size, frame/sample count, and
    * the exact integer level sum over `n_units` decoded units (pixel
    * channel bytes / |PCM| samples) — integer-exact so the rollup's mean
    * is one final division of exact sums. */
  case class MediaFeatures(item_id: Long, modality: String, n_bytes: Int,
                           n_frames: Int, level_sum: Long, n_units: Long)

  /** Video fixture geometry: 8x6 RGB = 144 bytes per frame. */
  private val VidW = 8
  private val VidH = 6
  private val VidFrameBytes = VidW * VidH * 3

  /** Deterministic per-item media synthesis through the REAL encoders. */
  private[ops] def synthesize(id: Long): MediaItem = (id % 3).toInt match {
    case 0 =>
      val w = (8 + id % 9).toInt
      val h = (6 + id % 5).toInt
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        rgb(i * 3) = ((id * 7 + i) % 256).toByte
        rgb(i * 3 + 1) = ((id * 7 + i + 85) % 256).toByte
        rgb(i * 3 + 2) = ((id * 7 + i + 170) % 256).toByte
        i += 1
      }
      MediaItem(id, "image", encodeBmp(ImageData(w, h, rgb)))
    case 1 =>
      val n = (64 + id % 129).toInt
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = ((id * 31 + i * 17) % 2048 - 1024).toShort; i += 1 }
      MediaItem(id, "audio", encodeWav(AudioData(8000, samples)))
    case _ =>
      val nf = (2 + id % 4).toInt
      val frames = Array.tabulate(nf) { fi =>
        val f = new Array[Byte](VidFrameBytes)
        var p = 0
        while (p < VidFrameBytes) { f(p) = ((id * 13 + fi * 101 + p) % 256).toByte; p += 1 }
        f
      }
      MediaItem(id, "video", encodePpmStream(VideoData(VidW, VidH, frames)))
  }

  /** Media table: one real container per document id (modality assigned
    * deterministically), built through the encoders partition-locally. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long].map(synthesize _)
  }

  /** The batch decode stage: typed, partition-local, no shuffle. Parses
    * the real container bytes back into pixels/samples and reduces them
    * to exact integer stats. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        m.modality match {
          case "image" =>
            val img = decodeBmp(m.payload)
            var s = 0L
            img.rgb.foreach(b => s += (b & 0xff))
            MediaFeatures(m.item_id, m.modality, m.payload.length, 1, s, img.rgb.length.toLong)
          case "audio" =>
            val au = decodeWav(m.payload)
            var s = 0L
            au.samples.foreach(v => s += math.abs(v.toInt))
            MediaFeatures(m.item_id, m.modality, m.payload.length,
              au.samples.length, s, au.samples.length.toLong)
          case _ =>
            val vid = decodePpmStream(m.payload)
            var s = 0L
            vid.frames.foreach(_.foreach(b => s += (b & 0xff)))
            MediaFeatures(m.item_id, m.modality, m.payload.length,
              vid.frames.length, s, vid.frames.length.toLong * VidFrameBytes)
        }
      }
    }
  }

  /** Per-modality rollup of the decoded features. `mean_level` is one
    * final double division of exact integer sums — bit-identical in any
    * engine, no rounding funnel needed. */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_frames")).as("sum_frames"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("n_bytes")).as("sum_bytes"),
        (sum(col("level_sum")).cast("double") /
          sum(col("n_units")).cast("double")).as("mean_level"))
      .orderBy(col("modality"))

  /** Sampled/resized features: kept-unit count + exact level sum over
    * the kept units. */
  case class SampledFeatures(item_id: Long, modality: String,
                             n_kept: Int, level_sum: Long, n_units: Long)

  private val SampleEvery = 3

  /** The sampled pipeline — decode, then the modality's standard
    * downsample on the DECODED data (not the container bytes):
    * images resize by taking every 2nd pixel in x and y (nearest-neighbor
    * 2x decimation), audio decimates to every 2nd sample, video keeps
    * every `SampleEvery`-th frame and 2x-decimates the kept frames'
    * bytes. Still typed, partition-local, shuffle-free until the
    * rollup. */
  def sampledStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.map { m =>
        m.modality match {
          case "image" =>
            val img = decodeBmp(m.payload)
            val kw = (img.width + 1) / 2
            val kh = (img.height + 1) / 2
            // the actual resize artifact: a kw x kh RGB image
            val small = new Array[Byte](kw * kh * 3)
            var y = 0
            while (y < kh) {
              var x = 0
              while (x < kw) {
                val src = ((y * 2) * img.width + x * 2) * 3
                val dst = (y * kw + x) * 3
                small(dst) = img.rgb(src)
                small(dst + 1) = img.rgb(src + 1)
                small(dst + 2) = img.rgb(src + 2)
                x += 1
              }
              y += 1
            }
            var s = 0L
            small.foreach(b => s += (b & 0xff))
            SampledFeatures(m.item_id, m.modality, kw * kh, s, small.length.toLong)
          case "audio" =>
            val au = decodeWav(m.payload)
            var s = 0L
            var i = 0
            var kept = 0
            while (i < au.samples.length) { s += math.abs(au.samples(i).toInt); kept += 1; i += 2 }
            SampledFeatures(m.item_id, m.modality, kept, s, kept.toLong)
          case _ =>
            val vid = decodePpmStream(m.payload)
            var s = 0L
            var kept = 0
            var fi = 0
            while (fi < vid.frames.length) {
              if (fi % SampleEvery == 0) {
                val f = vid.frames(fi)
                var p = 0
                while (p < f.length) { s += (f(p) & 0xff); p += 2 }
                kept += 1
              }
              fi += 1
            }
            SampledFeatures(m.item_id, m.modality, kept, s, kept.toLong * (VidFrameBytes / 2))
        }
      }
    }
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_kept")).as("sum_kept"),
        (sum(col("level_sum")).cast("double") /
          sum(col("n_units")).cast("double")).as("mean_level"))
      .orderBy(col("modality"))
  }

  /** Raw-file ingestion via the built-in `binaryFile` source — how an
    * image corpus actually ENTERS Spark (one file per object: path,
    * mtime, length, content), before anything repacks it into parquet.
    * Real BMP files are staged through [[MediaCodec.encodeBmp]] (test
    * scaffolding — the capped id set keeps the fixture a few hundred
    * files; production points the same reader at the object store), read
    * back by the source with a glob filter, ids recovered from paths
    * with `regexp_extract`, and the contents run through the REAL BMP
    * decoder. The oracle replays the generator closed forms, so a defect
    * anywhere in the loop — encoder, source framing (`length` vs actual
    * bytes is cross-checked), path parsing, decoder — breaks the hash.
    *
    * Scale shape: binaryFile scans are embarrassingly parallel (one task
    * per file batch) and decode is partition-local; nothing shuffles but
    * the 5 final aggregates. The known 100 TB caveat is SMALL-FILE
    * listing pressure — the fix is this exact pipeline writing
    * (id, payload) parquet once ([[mediaTable]]'s shape) and all later
    * passes reading that. */
  /** Per-item framed audio analysis — the signal-DSP stage of a media
    * pipeline (VAD / loudness windows / peak picking): decode the REAL
    * PCM16 WAV container, split the sample stream into fixed 32-sample
    * frames, score each frame by its exact integer energy Σs², and keep
    * each item's PEAK frame (argmax, ties to the lowest frame index —
    * a total order). Emission is the per-peak-frame-index rollup, all
    * integer-exact.
    *
    * Scale shape: decode + framing + argmax are per-row partition-local
    * (one pass over the samples, O(1) state per frame); only the 4
    * fixed-width ints per item reach the exchange — the payload bytes
    * never shuffle. The oracle replays the sample GENERATOR, so a codec
    * defect (chunk-walk off-by-one, endianness, sign) breaks the hash. */
  def audioFrameEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 32
    val perItem = mediaTable(spark, dir)
      .filter(col("modality") === "audio")
      .as[MediaItem]
      .mapPartitions { it =>
        it.map { m =>
          val au = decodeWav(m.payload)
          val nf = au.samples.length / frameLen
          var bestF = 0
          var bestE = Long.MinValue
          var total = 0L
          var f = 0
          while (f < nf) {
            var e = 0L
            var j = 0
            while (j < frameLen) {
              val s = au.samples(f * frameLen + j).toLong
              e += s * s
              j += 1
            }
            total += e
            if (e > bestE) { bestE = e; bestF = f }
            f += 1
          }
          (m.item_id, bestF, bestE, total, nf)
        }
      }
      .toDF("item_id", "peak_frame", "peak_energy", "total_energy", "n_frames")
    perItem.groupBy(col("peak_frame").cast("int").as("peak_frame"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("peak_energy")).as("sum_peak_energy"),
        sum(col("total_energy")).as("sum_total_energy"),
        sum(col("n_frames")).as("sum_frames"))
      .orderBy(col("peak_frame"))
  }

  def binaryIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = s"${SinkQueries.OutBase}/binary_ingest"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    new java.io.File(base).mkdirs()
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0 && col("doc_id") < 720)
      .as[Long].collect().sorted
    ids.foreach { id =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base, s"item_$id.bmp"), synthesize(id).payload)
    }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(base)
      .select(regexp_extract(col("path"), "item_(\\d+)\\.bmp$", 1).cast("long").as("item_id"),
        col("length"), col("content"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, len, bytes) =>
        val img = decodeBmp(bytes)
        var s = 0L
        img.rgb.foreach(b => s += (b & 0xff))
        (id, len, bytes.length.toLong, s, img.rgb.length.toLong)
      })
      .toDF("item_id", "src_len", "n_bytes", "level_sum", "n_units")
      .agg(count(lit(1)).as("n_items"),
        sum(col("item_id")).as("sum_ids"),
        sum(col("src_len")).as("sum_src_len"),
        sum(col("n_bytes")).as("sum_bytes"),
        sum(col("level_sum")).as("sum_levels"),
        sum(col("n_units")).as("sum_units"))
  }

  /** Per-image 4×4 patch embedding from DECODED pixels: cell c = Σ gray
    * over the pixels whose integer grid bucket is c (gx = x·4 DIV w,
    * gy = y·4 DIV h) — the "resize to a tiny grid and compare" kernel
    * behind perceptual image retrieval, computed on the real
    * decode-side bytes so a codec defect shifts every downstream score. */
  case class ImageCells(item_id: Long, cells: Array[Long])

  private[ops] def imageCells(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[ImageCells] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.modality == "image")
      .mapPartitions { it =>
        it.map { m =>
          val img = decodeBmp(m.payload)
          val cells = new Array[Long](16)
          var y = 0
          while (y < img.height) {
            var x = 0
            while (x < img.width) {
              val c = (y * 4 / img.height) * 4 + (x * 4 / img.width)
              val p = (y * img.width + x) * 3
              cells(c) += (img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) +
                (img.rgb(p + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          ImageCells(m.item_id, cells)
        }
      }
  }

  /** Probe ids for [[mmRetrieval]] — image-modality ids (≡ 0 mod 3)
    * present at every test scale (doc_id < 500 at sf0.001). */
  private[ops] val RetrievalProbes: Seq[Long] = Seq(0L, 33L, 150L, 300L, 498L)

  /** Multimodal retrieval end to end — the chain a perceptual image
    * search runs: decode the REAL container bytes → 4×4 patch
    * embedding → score every candidate against each probe by integer
    * cos² ppm (dot²·10⁶ DIV (‖a‖²·‖b‖²) — all sums non-negative, so no
    * sign split and no sqrt) → top-3 per probe.
    *
    * Scale shape: the probe side is 5 rows and BROADCASTS; scoring is
    * per-candidate-row scalar work (zip_with/aggregate over 16-long
    * arrays); ranking is the bounded-state `topk_agg` (≤2k pairs of
    * state per probe with map-side partials) — NOT a per-probe
    * row_number window, which would sort every candidate through
    * |probes| window partitions. The oracle replays the generator
    * closed form for the cells, so the decode path is load-bearing. */
  def mmRetrieval(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cells = imageCells(spark, dir).toDF()
    val probes = cells
      .filter(col("item_id").isin(RetrievalProbes: _*))
      .select(col("item_id").as("probe_id"), col("cells").as("pc"))
    val cands = cells.select(col("item_id").as("cand_id"), col("cells").as("cc"))
    // replicate-the-tiny-side join, expressed as a broadcast HASH join on
    // a constant-valued key (not a join-condition-only nested loop): the
    // build side is |probes| rows, the stream side stays where it is, and
    // the != predicate filters post-join — same all-pairs-vs-5 semantics,
    // no BNLJ node. The key must be NON-FOLDABLE (id%1, not lit(1)):
    // ConstantFolding erases a literal key and the join degenerates back
    // to a nested loop.
    cands.withColumn("j", pmod(col("cand_id"), lit(1L)))
      .join(broadcast(probes.withColumn("j", pmod(col("probe_id"), lit(1L)))), "j")
      .drop("j")
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(pc, cc, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
      .withColumn("na", expr(
        "aggregate(transform(pc, x -> x * x), 0L, (a, x) -> a + x)"))
      .withColumn("nb", expr(
        "aggregate(transform(cc, x -> x * x), 0L, (a, x) -> a + x)"))
      .withColumn("cos2_ppm", expr(
        """CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000)
          |     DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)""".stripMargin))
      .groupBy(col("probe_id"))
      .agg(graft.functions.topk_agg(col("cand_id"), col("cos2_ppm"), k).as("tk"))
      .select(col("probe_id"), posexplode(col("tk")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("cand_id"), col("col.score").as("cos2_ppm"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Variant image synthesis for the perceptual-dedup fixture: page
    * identity = doc_id DIV 3 (the urlDedup arithmetic — consecutive doc
    * triples are the SAME picture in three brightness disguises),
    * grayscale sawtooth content from the base id, variant shift
    * (doc_id % 3)·10. Values stay in [0, 219] so the shift NEVER wraps
    * a byte — the invariance [[aHashBits]]'s dedup relies on. */
  private[ops] def synthesizeVariant(id: Long): MediaItem = {
    val base = id / 3
    val w = (8 + base % 9).toInt
    val h = (6 + base % 5).toInt
    val delta = ((id % 3) * 10).toInt
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      // quadratic-phase texture: chosen over the plain (base*7+i)%200
      // sawtooth because it makes the aHash fully discriminative on the
      // fixture (167/167 distinct base hashes at sf0.01 vs 72 for the
      // sawtooth, whose phase shifts mostly preserve threshold patterns)
      val v = (((base * 31 + i * (i + 1 + base % 13)) % 200) + delta).toByte
      rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
      i += 1
    }
    MediaItem(id, "image", encodeBmp(ImageData(w, h, rgb)))
  }

  /** 64-bit average hash (aHash — the classic perceptual image
    * fingerprint) over REAL decoded pixels: 8×8 block grid, bit(y,x) set
    * iff the block's mean gray level exceeds the image mean. All
    * arithmetic is integer (cross-multiplied mean comparison
    * `blockSum·n > total·blockN`), block bounds are the integer-division
    * grid `[y·h/8, (y+1)·h/8)` (empty blocks on images shorter than 8
    * rows compare 0 > 0 = unset — deterministic), and the result is the
    * 64-char '0'/'1' string both engines can build byte-identically
    * (production would pack it to one BIGINT; the string keeps the
    * oracle comparison trivially exact).
    *
    * The invariance that makes this a DEDUP key: adding a constant δ to
    * every pixel shifts block means and the image mean by the same δ,
    * so every bit — and the hash — is UNCHANGED. Brightness-variant
    * near-duplicates therefore collide exactly, no hamming tolerance
    * needed (the banded-hamming extension is q_dedup_simhash's device). */
  private[ops] def aHashBits(img: ImageData): String = {
    val w = img.width; val h = img.height; val n = w * h
    val g = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (img.rgb(i * 3) & 0xff).toLong + (img.rgb(i * 3 + 1) & 0xff) +
        (img.rgb(i * 3 + 2) & 0xff)
      g(i) = v; total += v; i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var y = 0
    while (y < 8) {
      val r0 = y * h / 8; val r1 = (y + 1) * h / 8
      var x = 0
      while (x < 8) {
        val c0 = x * w / 8; val c1 = (x + 1) * w / 8
        var s = 0L; var cnt = 0L
        var r = r0
        while (r < r1) {
          var c = c0
          while (c < c1) { s += g(r * w + c); cnt += 1; c += 1 }
          r += 1
        }
        sb.append(if (s * n > total * cnt) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  /** Perceptual-hash image dedup — near-duplicate IMAGE detection, the
    * multimodal counterpart of the text near-dup family: decode every
    * image (REAL BMP parse), fingerprint it with [[aHashBits]], and
    * collapse hash groups exactly. The fixture's brightness-variant
    * construction means a correct decode + hash pipeline must rediscover
    * the `doc_id DIV 3` page identity (modulo genuine cross-base hash
    * collisions, which the oracle replays rather than assumes away).
    * Emits the dedup budget: images, distinct hashes, duplicates
    * removed, largest group, multi-image groups, and the canonical
    * (min-id) keeper checksum that pins WHICH image each group keeps.
    *
    * Scale shape: synthesis+decode+hash are partition-local typed work
    * (payload bytes never shuffle — only the 64-char hash and the id
    * reach the exchange); the dedup is one hash aggregate with map-side
    * partials and a single-row rollup. */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, aHashBits(decodeBmp(synthesizeVariant(id).payload)))
      })
      .toDF("doc_id", "ahash")
    hashed
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
      .agg(sum(col("cnt")).as("n_images"),
        count(lit(1)).as("n_hashes"),
        (sum(col("cnt")) - count(lit(1))).as("n_dupes_removed"),
        max(col("cnt")).as("max_group"),
        count(when(col("cnt") > 1, lit(1))).as("n_multi_groups"),
        sum(col("keeper")).as("keeper_id_sum"))
  }

  /** Variant audio synthesis for the gain-invariant dedup fixture: clip
    * identity = doc_id DIV 3, variant = exact integer gain 1/2/3 (max
    * amplitude 3·1024 = 3072 — far from int16 clipping, so scaling is
    * EXACT). Quadratic-phase sample law, chosen like the image texture:
    * the plain i·17 sawtooth collapsed the energy contour to 31 distinct
    * signatures over 167 clips; this one gives 167/167 at sf0.01 and an
    * honest 1640/1667 at sf0.1 (the residual collisions are REAL
    * fingerprint limits the oracle replays). */
  private[ops] def synthesizeAudioVariant(id: Long): MediaItem = {
    val base = id / 3
    val gain = (1 + id % 3).toInt
    val n = (64 + base % 129).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) =
        (((base * 131 + i.toLong * (i + 7 + base % 31)) % 2048 - 1024) * gain).toShort
      i += 1
    }
    MediaItem(id, "audio", encodeWav(AudioData(8000, samples)))
  }

  /** Energy-contour audio fingerprint (the shape behind Shazam-class
    * audio matching, reduced to its deterministic core): 4-sample frame
    * |PCM| energies, one bit per frame transition — '1' iff the next
    * frame is strictly louder. A positive gain g scales every frame
    * energy by exactly g (integer samples, no clipping), so EVERY
    * comparison — and the signature — is invariant under the variant
    * transform, the audio analogue of [[aHashBits]]'s brightness
    * invariance. Variable clip length ⇒ variable signature length; the
    * string IS the group key. */
  private[ops] def energyContour(au: AudioData, frame: Int = 4): String = {
    val nf = au.samples.length / frame
    if (nf < 2) return ""
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var s = 0L
      var i = f * frame
      val end = i + frame
      while (i < end) { s += math.abs(au.samples(i).toInt); i += 1 }
      e(f) = s; f += 1
    }
    val sb = new java.lang.StringBuilder(nf - 1)
    f = 0
    while (f < nf - 1) { sb.append(if (e(f + 1) > e(f)) '1' else '0'); f += 1 }
    sb.toString
  }

  /** Gain-invariant AUDIO dedup — [[phashDedup]]'s counterpart for the
    * audio modality: decode every clip (REAL RIFF/WAVE parse),
    * fingerprint its loudness contour, collapse signature groups
    * exactly. Same budget columns and scale shape as the image pass:
    * payload bytes never shuffle, one hash aggregate + single-row
    * rollup. */
  def audioDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, energyContour(decodeWav(synthesizeAudioVariant(id).payload)))
      })
      .toDF("doc_id", "sig")
    hashed
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
      .agg(sum(col("cnt")).as("n_clips"),
        count(lit(1)).as("n_sigs"),
        (sum(col("cnt")) - count(lit(1))).as("n_dupes_removed"),
        max(col("cnt")).as("max_group"),
        count(when(col("cnt") > 1, lit(1))).as("n_multi_groups"),
        sum(col("keeper")).as("keeper_id_sum"))
  }

  /** Variant video synthesis for the frame-rate-invariant dedup fixture:
    * clip identity = doc_id DIV 3; the variant shows each base frame
    * (1 + doc_id % 3) times in a row — the same footage at 1×/2×/3× the
    * frame rate (≤ 15 frames of the fixed 8×6 geometry). Frame content
    * follows a quadratic-phase law over BASE frame index fi, so repeats
    * are byte-identical frames and distinct bases render distinct
    * footage (see the texture comment below). */
  private[ops] def synthesizeVideoVariant(id: Long): MediaItem = {
    val base = id / 3
    val rep = (1 + id % 3).toInt
    val nf = (2 + base % 4).toInt
    val frames = Array.tabulate(nf * rep) { out =>
      val fi = out / rep
      val f = new Array[Byte](VidFrameBytes)
      var p = 0
      // quadratic-phase texture (NOT the plain base·13+fi·101+p law used
      // by the feature fixture): under the linear law bases 256 apart
      // render byte-identical frames, collapsing 1667 sf0.1 clips into
      // 256 signature groups; this law keeps all 1667 distinct
      while (p < VidFrameBytes) {
        f(p) = ((base * 13 + fi * 101 + p * (p + 3 + base % 29)) % 256).toByte
        p += 1
      }
      f
    }
    MediaItem(id, "video", encodePpmStream(VideoData(VidW, VidH, frames)))
  }

  /** Temporal signature of a decoded video: per-frame position-weighted
    * digest Σ (p+1)·byte_p (integer-exact, SQL-replayable — md5-of-bytes
    * is not practical to rebuild relationally), then RUN-LENGTH COLLAPSE
    * of consecutive equal digests, joined with '-'. Showing a frame for
    * longer (any per-frame repeat count) collapses to the same signature
    * — the frame-rate/freeze-frame invariance this dedup keys on. The
    * collapse rule is digest equality on BOTH engines, so a (harmless,
    * replayed) digest collision can never split the two sides. */
  private[ops] def temporalSignature(vid: VideoData): String = {
    val digests = vid.frames.map { f =>
      var s = 0L
      var p = 0
      while (p < f.length) { s += (p + 1).toLong * (f(p) & 0xff); p += 1 }
      s
    }
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < digests.length) {
      if (i == 0 || digests(i) != digests(i - 1)) {
        if (sb.length > 0) sb.append('-')
        sb.append(digests(i))
      }
      i += 1
    }
    sb.toString
  }

  /** Frame-rate-invariant VIDEO dedup — the third modality of the
    * near-dup family ([[phashDedup]] brightness-invariant images,
    * [[audioDedup]] gain-invariant audio): decode every clip (REAL
    * concatenated-P6-PPM parse), reduce it to its run-length-collapsed
    * frame-digest sequence, collapse signature groups exactly. Same
    * budget columns and scale shape: payloads never shuffle, one hash
    * aggregate + single-row rollup. */
  def videoDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, temporalSignature(decodePpmStream(synthesizeVideoVariant(id).payload)))
      })
      .toDF("doc_id", "sig")
    hashed
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
      .agg(sum(col("cnt")).as("n_videos"),
        count(lit(1)).as("n_sigs"),
        (sum(col("cnt")) - count(lit(1))).as("n_dupes_removed"),
        max(col("cnt")).as("max_group"),
        count(when(col("cnt") > 1, lit(1))).as("n_multi_groups"),
        sum(col("keeper")).as("keeper_id_sum"))
  }

  /** End-to-end FILE-based image dedup — [[phashDedup]] with the
    * ingestion half a data owner actually runs (r15 verdict #3): the
    * brightness-variant BMPs are staged as real FILES and re-enter Spark
    * through the `binaryFile` source (path → id recovery → REAL decode →
    * [[aHashBits]] → exact hash collapse), so the dedup is proven over
    * the container-file path, not an in-flight synthesis. The staged set
    * is capped (doc_id < [[FileDedupCap]] — a few hundred files; test
    * scaffolding, same discipline as [[binaryIngest]]); `src_len_ok`
    * cross-checks the source's `length` against the actual byte count so
    * a framing defect in the scan surfaces in the rollup.
    *
    * Scale shape: binaryFile scans are embarrassingly parallel and
    * decode+hash stay partition-local — payload bytes never shuffle,
    * only the 64-char hash and the id reach the exchange; the dedup is
    * one hash aggregate + single-row rollup. The production path at
    * 100 TB repacks (id, payload) into parquet once and reruns the same
    * hash stage over that ([[mediaTable]]'s shape). */
  private[ops] val FileDedupCap = 540L

  def fileDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = s"${SinkQueries.OutBase}/file_dedup"
    // stage and CLEAN on the same filesystem: the write below is plain
    // java.nio, so the pre-delete must be too — FileSystem.get (the
    // configured default FS) would target a different filesystem whenever
    // fs.defaultFS is non-local, leaving stale .bmp files from a prior
    // run to skew n_images (ADVICE r16)
    val baseDir = java.nio.file.Paths.get(base)
    if (java.nio.file.Files.exists(baseDir)) {
      val walk = java.nio.file.Files.walk(baseDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(baseDir)
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") < FileDedupCap)
      .as[Long].collect().sorted
    ids.foreach { id =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base, s"img_$id.bmp"), synthesizeVariant(id).payload)
    }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(base)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length"), col("content"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, len, bytes) =>
        (id, aHashBits(decodeBmp(bytes)), len == bytes.length.toLong)
      })
      .toDF("doc_id", "ahash", "len_ok")
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"),
        min(col("len_ok")).as("grp_len_ok"))
      .agg(sum(col("cnt")).as("n_images"),
        count(lit(1)).as("n_hashes"),
        (sum(col("cnt")) - count(lit(1))).as("n_dupes_removed"),
        max(col("cnt")).as("max_group"),
        count(when(col("cnt") > 1, lit(1))).as("n_multi_groups"),
        sum(col("keeper")).as("keeper_id_sum"),
        coalesce(min(col("grp_len_ok")), lit(true)).as("src_len_ok"))
  }

  /** Seeded container corruption for [[quarantine]]: ids ≡ 5 (mod 13)
    * get their magic bytes zeroed (never decodes past the first check),
    * ids ≡ 9 (mod 13) are truncated to 100 bytes (cuts inside pixel/PCM
    * data for every container the generator emits: the smallest BMP is
    * 222 bytes, WAV data chunks declare ≥128 bytes beyond offset 44, a
    * PPM frame needs 155). Both transforms map to ONE deterministic
    * failure class per id — the closed form the oracle replays. */
  private[ops] def corruptPayload(id: Long, payload: Array[Byte]): Array[Byte] =
    if (id % 13 == 5) {
      val b = payload.clone()
      var i = 0
      while (i < 4 && i < b.length) { b(i) = 0; i += 1 }
      b
    } else if (id % 13 == 9) {
      java.util.Arrays.copyOf(payload, math.min(100, payload.length))
    } else payload

  /** Map a decode failure to its quarantine class. The [[MediaCodec]]
    * decoders throw `require` messages with stable vocabulary; the
    * classifier keys on it: magic/container-identity failures →
    * `bad_magic`, any out-of-data condition → `truncated`, anything
    * else (unsupported profile, geometry change) → `malformed`. */
  private[ops] def classifyDecodeFailure(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse("")
    if (m.contains("magic") || m.contains("RIFF") || m.contains("not a BMP")) "bad_magic"
    else if (m.contains("truncated") || m.contains("overruns") ||
      m.contains("missing data chunk") || m.contains("missing fmt chunk") ||
      m.contains("runs off") || m.contains("empty stream") ||
      m.contains("expected an integer")) "truncated"
    else "malformed"
  }

  /** Corrupt-container QUARANTINE — the malformed-input discipline of a
    * real 100 TB media pass (r15 verdict #4): undecodable bytes must
    * land in a quarantine lane with a reason, never kill the job. A
    * deterministic subset of containers is corrupted
    * ([[corruptPayload]]: magic smash / truncation), every payload runs
    * through the REAL decoder behind a catch, and the rollup audits
    * both lanes per (modality, status): item count, id checksum, and
    * the decoded lane's exact level sum (proving corruption never
    * leaked into the surviving stats). The decode-or-quarantine stage
    * is the binary analogue of [[RelationalQueries.corruptRecords]]'
    * PERMISSIVE JSON lane.
    *
    * Scale shape: synthesis+corruption+decode are partition-local typed
    * work; only (modality, status, id, level_sum) reaches the exchange;
    * one bounded group-key aggregate. MediaCodecSpec pins that each
    * corruption class is CAUGHT (classified), not crashed. */
  def quarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        val m = synthesize(id)
        val payload = corruptPayload(id, m.payload)
        try {
          val levelSum = m.modality match {
            case "image" =>
              val img = decodeBmp(payload)
              var s = 0L; img.rgb.foreach(b => s += (b & 0xff)); s
            case "audio" =>
              val au = decodeWav(payload)
              var s = 0L; au.samples.foreach(v => s += math.abs(v.toInt)); s
            case _ =>
              val vid = decodePpmStream(payload)
              var s = 0L; vid.frames.foreach(_.foreach(b => s += (b & 0xff))); s
          }
          (m.modality, "ok", id, levelSum)
        } catch {
          case scala.util.control.NonFatal(e) =>
            (m.modality, classifyDecodeFailure(e), id, 0L)
        }
      })
      .toDF("modality", "status", "doc_id", "level_sum")
      .groupBy(col("modality"), col("status"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("level_sum")).as("sum_levels"))
      .orderBy(col("modality"), col("status"))
  }

  /** Collision-rate audit for the modality near-dup triplet (r15 verdict
    * #8): each dedup claims an invariance (brightness / gain /
    * frame-rate) and a discrimination (distinct bases ⇒ distinct
    * signatures, modulo honest fingerprint collisions). The unit specs
    * pin the invariance on fixtures; this REGISTERED query audits both
    * directions at corpus scale against the generator's `base = id DIV
    * 3` ground truth, per modality: items, distinct bases, distinct
    * signatures, bases whose variants SPLIT across signatures
    * (invariance violations — exactly 0 for a correct decode+hash
    * path, and the oracle computes that 0 rather than assuming it),
    * bases COLLIDED with another base, and the worst signature group's
    * base count ([[phashDedup]]'s estimator-error pattern, aimed at the
    * false-positive direction).
    *
    * Scale shape: three partition-local decode+hash passes (payloads
    * never shuffle; only (modality, base, sig) rows do), then bounded
    * aggregates: per-(modality,base,sig), per-sig, per-base, and a
    * 3-row rollup. */
  def collisionAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = Par.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        Seq(
          ("image", id / 3,
            aHashBits(decodeBmp(synthesizeVariant(id).payload))),
          ("audio", id / 3,
            energyContour(decodeWav(synthesizeAudioVariant(id).payload))),
          ("video", id / 3,
            temporalSignature(decodePpmStream(synthesizeVideoVariant(id).payload))))
      })
      .toDF("modality", "base", "sig")
    val bs = sigs.groupBy(col("modality"), col("base"), col("sig"))
      .agg(count(lit(1)).as("n_items"))
    val perSig = bs.groupBy(col("modality"), col("sig"))
      .agg(count(lit(1)).as("n_bases_s"))
    val perBase = bs.join(perSig, Seq("modality", "sig"))
      .groupBy(col("modality"), col("base"))
      .agg(sum(col("n_items")).as("n_items_b"),
        count(lit(1)).as("n_sigs_b"),
        max(col("n_bases_s")).as("max_share"))
    perBase.groupBy(col("modality"))
      .agg(sum(col("n_items_b")).as("n_items"),
        count(lit(1)).as("n_bases"),
        count(when(col("n_sigs_b") > 1, lit(1))).as("n_split_bases"),
        count(when(col("max_share") > 1, lit(1))).as("n_collided_bases"))
      .join(perSig.groupBy(col("modality"))
        .agg(count(lit(1)).as("n_sigs"), max(col("n_bases_s")).as("max_bases_per_sig")),
        Seq("modality"))
      .select(col("modality"), col("n_items"), col("n_bases"), col("n_sigs"),
        col("n_split_bases"), col("n_collided_bases"), col("max_bases_per_sig"))
      .orderBy(col("modality"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> (featureStats _),
    "q_mm_phash_dedup" -> (phashDedup _),
    "q_mm_audio_dedup" -> (audioDedup _),
    "q_mm_video_dedup" -> (videoDedup _),
    "q_mm_sampled" -> (sampledStats _),
    "q_binary_ingest" -> (binaryIngest _),
    "q_mm_audio_energy" -> (audioFrameEnergy _),
    "q_mm_retrieval" -> ((s, d) => mmRetrieval(s, d)),
    "q_mm_file_dedup" -> (fileDedup _),
    "q_mm_quarantine" -> (quarantine _),
    "q_mm_collision_audit" -> (collisionAudit _),
  )

  /** The oracle mirrors the deterministic GENERATOR (not the container):
    * the encode→decode round trip happens only on the Spark side, so any
    * codec defect surfaces as a stat mismatch. All per-item stats are
    * exact integers; the single mean division is the last operation. */
  val oracles: Map[String, String] = Map(
    // aHash replayed from the GENERATOR arithmetic per distinct BASE id
    // only: the brightness shift provably never changes a bit (no byte
    // wrap), so hash(doc) = hash(doc DIV 3's content at delta 0) — and
    // genuine cross-base hash collisions are REPLAYED, not assumed away.
    // The encode->decode->hash round trip runs only on the Spark side.
    "q_mm_phash_dedup" ->
      """WITH b AS (SELECT DISTINCT doc_id // 3 AS base FROM documents),
        |geom AS (SELECT base, 8 + base % 9 AS w, 6 + base % 5 AS h FROM b),
        |px AS (
        |  SELECT base, w, h, w * h AS n,
        |    i.range // w AS r, i.range % w AS c,
        |    3 * ((base * 31 + i.range * (i.range + 1 + base % 13)) % 200) AS g
        |  FROM geom, range(0, 160) i WHERE i.range < w * h),
        |tot AS (SELECT base, n, sum(g) AS total FROM px GROUP BY 1, 2),
        |blocks AS (
        |  SELECT base, w, h, y.range AS y, x.range AS x
        |  FROM geom, range(0, 8) y, range(0, 8) x),
        |bs AS (
        |  SELECT p.base, bl.y, bl.x, sum(p.g) AS s, count(*) AS cnt
        |  FROM px p JOIN blocks bl ON bl.base = p.base
        |    AND p.r >= bl.y * bl.h // 8 AND p.r < (bl.y + 1) * bl.h // 8
        |    AND p.c >= bl.x * bl.w // 8 AND p.c < (bl.x + 1) * bl.w // 8
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT bl.base, bl.y * 8 + bl.x AS k,
        |    CASE WHEN coalesce(bs.s, 0) * t.n > t.total * coalesce(bs.cnt, 0)
        |         THEN '1' ELSE '0' END AS bit
        |  FROM blocks bl
        |  LEFT JOIN bs ON bs.base = bl.base AND bs.y = bl.y AND bs.x = bl.x
        |  JOIN tot t ON t.base = bl.base),
        |hs AS (SELECT base, string_agg(bit, '' ORDER BY k) AS ahash
        |       FROM bits GROUP BY base),
        |m AS (SELECT d.doc_id, hs.ahash
        |      FROM documents d JOIN hs ON d.doc_id // 3 = hs.base),
        |grp AS (SELECT ahash, count(*) AS cnt, min(doc_id) AS keeper
        |        FROM m GROUP BY ahash)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_images,
        |  count(*) AS n_hashes,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS n_dupes_removed,
        |  CAST(max(cnt) AS BIGINT) AS max_group,
        |  count(CASE WHEN cnt > 1 THEN 1 END) AS n_multi_groups,
        |  CAST(sum(keeper) AS BIGINT) AS keeper_id_sum
        |FROM grp""".stripMargin,
    // the file-path dedup replays the SAME generator closed form as
    // q_mm_phash_dedup over the capped id set; the encode→file→
    // binaryFile→decode round trip runs only on the Spark side, so a
    // defect in staging, source framing, path parsing, or decode breaks
    // the hash. src_len_ok is the framing cross-check, TRUE by contract.
    "q_mm_file_dedup" ->
      """WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 540),
        |b AS (SELECT DISTINCT doc_id // 3 AS base FROM docs),
        |geom AS (SELECT base, 8 + base % 9 AS w, 6 + base % 5 AS h FROM b),
        |px AS (
        |  SELECT base, w, h, w * h AS n,
        |    i.range // w AS r, i.range % w AS c,
        |    3 * ((base * 31 + i.range * (i.range + 1 + base % 13)) % 200) AS g
        |  FROM geom, range(0, 160) i WHERE i.range < w * h),
        |tot AS (SELECT base, n, sum(g) AS total FROM px GROUP BY 1, 2),
        |blocks AS (
        |  SELECT base, w, h, y.range AS y, x.range AS x
        |  FROM geom, range(0, 8) y, range(0, 8) x),
        |bs AS (
        |  SELECT p.base, bl.y, bl.x, sum(p.g) AS s, count(*) AS cnt
        |  FROM px p JOIN blocks bl ON bl.base = p.base
        |    AND p.r >= bl.y * bl.h // 8 AND p.r < (bl.y + 1) * bl.h // 8
        |    AND p.c >= bl.x * bl.w // 8 AND p.c < (bl.x + 1) * bl.w // 8
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT bl.base, bl.y * 8 + bl.x AS k,
        |    CASE WHEN coalesce(bs.s, 0) * t.n > t.total * coalesce(bs.cnt, 0)
        |         THEN '1' ELSE '0' END AS bit
        |  FROM blocks bl
        |  LEFT JOIN bs ON bs.base = bl.base AND bs.y = bl.y AND bs.x = bl.x
        |  JOIN tot t ON t.base = bl.base),
        |hs AS (SELECT base, string_agg(bit, '' ORDER BY k) AS ahash
        |       FROM bits GROUP BY base),
        |m AS (SELECT d.doc_id, hs.ahash
        |      FROM docs d JOIN hs ON d.doc_id // 3 = hs.base),
        |grp AS (SELECT ahash, count(*) AS cnt, min(doc_id) AS keeper
        |        FROM m GROUP BY ahash)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_images,
        |  count(*) AS n_hashes,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS n_dupes_removed,
        |  CAST(max(cnt) AS BIGINT) AS max_group,
        |  count(CASE WHEN cnt > 1 THEN 1 END) AS n_multi_groups,
        |  CAST(sum(keeper) AS BIGINT) AS keeper_id_sum,
        |  TRUE AS src_len_ok
        |FROM grp""".stripMargin,
    // quarantine lanes replayed closed-form: the corruption rule is id
    // arithmetic (mod 13), each rule maps to ONE deterministic failure
    // class (magic smash → bad_magic before any size field is read;
    // 100-byte truncation cuts inside pixel/PCM data for every container
    // the generator emits → truncated), and the surviving lane's level
    // sums are the q_mm_features generator closed forms
    "q_mm_quarantine" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    CASE WHEN doc_id % 13 = 5 THEN 'bad_magic'
        |         WHEN doc_id % 13 = 9 THEN 'truncated'
        |         ELSE 'ok' END AS status,
        |    CASE WHEN doc_id % 13 IN (5, 9) THEN 0
        |      ELSE CASE CAST(doc_id % 3 AS INT)
        |        WHEN 0 THEN list_sum(list_transform(
        |          range((8 + doc_id % 9) * (6 + doc_id % 5)),
        |          i -> (doc_id * 7 + i) % 256 + (doc_id * 7 + i + 85) % 256
        |               + (doc_id * 7 + i + 170) % 256))
        |        WHEN 1 THEN list_sum(list_transform(range(64 + doc_id % 129),
        |          i -> abs((doc_id * 31 + i * 17) % 2048 - 1024)))
        |        ELSE list_sum(list_transform(range((2 + doc_id % 4) * 144),
        |          j -> (doc_id * 13 + (j // 144) * 101 + (j % 144)) % 256))
        |        END END AS level_sum
        |  FROM documents)
        |SELECT modality, status, count(*) AS n_items,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(level_sum) AS BIGINT) AS sum_levels
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // all three modality signatures replayed per distinct base from the
    // generator closed forms (the same CTEs as the three dedup oracles),
    // then the collision/split audit computed — NOT assumed: the oracle
    // derives n_split_bases = 0 from its own per-base signature
    // uniqueness, so an engine-side invariance break is a hash mismatch
    "q_mm_collision_audit" ->
      """WITH b AS (SELECT DISTINCT doc_id // 3 AS base FROM documents),
        |geom AS (SELECT base, 8 + base % 9 AS w, 6 + base % 5 AS h FROM b),
        |px AS (
        |  SELECT base, w, h, w * h AS n,
        |    i.range // w AS r, i.range % w AS c,
        |    3 * ((base * 31 + i.range * (i.range + 1 + base % 13)) % 200) AS g
        |  FROM geom, range(0, 160) i WHERE i.range < w * h),
        |tot AS (SELECT base, n, sum(g) AS total FROM px GROUP BY 1, 2),
        |blocks AS (
        |  SELECT base, w, h, y.range AS y, x.range AS x
        |  FROM geom, range(0, 8) y, range(0, 8) x),
        |bsx AS (
        |  SELECT p.base, bl.y, bl.x, sum(p.g) AS s, count(*) AS cnt
        |  FROM px p JOIN blocks bl ON bl.base = p.base
        |    AND p.r >= bl.y * bl.h // 8 AND p.r < (bl.y + 1) * bl.h // 8
        |    AND p.c >= bl.x * bl.w // 8 AND p.c < (bl.x + 1) * bl.w // 8
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT bl.base, bl.y * 8 + bl.x AS k,
        |    CASE WHEN coalesce(bsx.s, 0) * t.n > t.total * coalesce(bsx.cnt, 0)
        |         THEN '1' ELSE '0' END AS bit
        |  FROM blocks bl
        |  LEFT JOIN bsx ON bsx.base = bl.base AND bsx.y = bl.y AND bsx.x = bl.x
        |  JOIN tot t ON t.base = bl.base),
        |hs_img AS (SELECT base, string_agg(bit, '' ORDER BY k) AS sig
        |           FROM bits GROUP BY base),
        |nn_a AS (SELECT base, 64 + base % 129 AS n FROM b),
        |sm AS (
        |  SELECT base, i.range // 4 AS f,
        |    abs((base * 131 + i.range * (i.range + 7 + base % 31)) % 2048 - 1024) AS a
        |  FROM nn_a, range(0, 192) i WHERE i.range < (n // 4) * 4),
        |fr_a AS (SELECT base, f, sum(a) AS e FROM sm GROUP BY 1, 2),
        |ctr AS (SELECT base, f, e,
        |          lead(e) OVER (PARTITION BY base ORDER BY f) AS ne
        |        FROM fr_a),
        |hs_aud AS (SELECT base,
        |             string_agg(CASE WHEN ne > e THEN '1' ELSE '0' END, '' ORDER BY f) AS sig
        |           FROM ctr WHERE ne IS NOT NULL GROUP BY base),
        |nn_v AS (SELECT base, 2 + base % 4 AS nf FROM b),
        |fr_v AS (
        |  SELECT base, fi.range AS fi,
        |    sum((p.range + 1) *
        |        ((base * 13 + fi.range * 101
        |          + p.range * (p.range + 3 + base % 29)) % 256)) AS d
        |  FROM nn_v, range(0, 5) fi, range(0, 144) p
        |  WHERE fi.range < nf GROUP BY 1, 2),
        |rle AS (
        |  SELECT base, fi, d,
        |    lag(d) OVER (PARTITION BY base ORDER BY fi) AS pd
        |  FROM fr_v),
        |hs_vid AS (
        |  SELECT base, string_agg(CAST(d AS VARCHAR), '-' ORDER BY fi) AS sig
        |  FROM rle WHERE pd IS NULL OR d <> pd GROUP BY base),
        |sigs AS (
        |  SELECT 'image' AS modality, d.doc_id, h.base, h.sig
        |  FROM documents d JOIN hs_img h ON d.doc_id // 3 = h.base
        |  UNION ALL
        |  SELECT 'audio', d.doc_id, h.base, h.sig
        |  FROM documents d JOIN hs_aud h ON d.doc_id // 3 = h.base
        |  UNION ALL
        |  SELECT 'video', d.doc_id, h.base, h.sig
        |  FROM documents d JOIN hs_vid h ON d.doc_id // 3 = h.base),
        |bsr AS (SELECT modality, base, sig, count(*) AS n_items
        |        FROM sigs GROUP BY 1, 2, 3),
        |per_sig AS (SELECT modality, sig, count(*) AS n_bases_s
        |            FROM bsr GROUP BY 1, 2),
        |per_base AS (
        |  SELECT b2.modality, b2.base, sum(b2.n_items) AS n_items_b,
        |         count(*) AS n_sigs_b, max(s.n_bases_s) AS max_share
        |  FROM bsr b2 JOIN per_sig s
        |    ON s.modality = b2.modality AND s.sig = b2.sig
        |  GROUP BY 1, 2),
        |agg_b AS (
        |  SELECT modality, CAST(sum(n_items_b) AS BIGINT) AS n_items,
        |         count(*) AS n_bases,
        |         count(CASE WHEN n_sigs_b > 1 THEN 1 END) AS n_split_bases,
        |         count(CASE WHEN max_share > 1 THEN 1 END) AS n_collided_bases
        |  FROM per_base GROUP BY 1),
        |agg_s AS (
        |  SELECT modality, count(*) AS n_sigs,
        |         CAST(max(n_bases_s) AS BIGINT) AS max_bases_per_sig
        |  FROM per_sig GROUP BY 1)
        |SELECT a.modality, a.n_items, a.n_bases, s.n_sigs,
        |       a.n_split_bases, a.n_collided_bases, s.max_bases_per_sig
        |FROM agg_b a JOIN agg_s s ON a.modality = s.modality
        |ORDER BY a.modality""".stripMargin,
    // temporal signature replayed from the GENERATOR per distinct base
    // at repeat 1 (repeating a frame collapses under the RLE rule, so
    // the base sequence IS every variant's signature); the digest is the
    // same position-weighted sum both engines compute integer-exact
    "q_mm_video_dedup" ->
      """WITH b AS (SELECT DISTINCT doc_id // 3 AS base FROM documents),
        |nn AS (SELECT base, 2 + base % 4 AS nf FROM b),
        |fr AS (
        |  SELECT base, fi.range AS fi,
        |    sum((p.range + 1) *
        |        ((base * 13 + fi.range * 101
        |          + p.range * (p.range + 3 + base % 29)) % 256)) AS d
        |  FROM nn, range(0, 5) fi, range(0, 144) p
        |  WHERE fi.range < nf GROUP BY 1, 2),
        |rle AS (
        |  SELECT base, fi, d,
        |    lag(d) OVER (PARTITION BY base ORDER BY fi) AS pd
        |  FROM fr),
        |hs AS (
        |  SELECT base, string_agg(CAST(d AS VARCHAR), '-' ORDER BY fi) AS sig
        |  FROM rle WHERE pd IS NULL OR d <> pd GROUP BY base),
        |m AS (SELECT doc_id, hs.sig
        |      FROM documents d JOIN hs ON d.doc_id // 3 = hs.base),
        |grp AS (SELECT sig, count(*) AS cnt, min(doc_id) AS keeper
        |        FROM m GROUP BY sig)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_videos,
        |  count(*) AS n_sigs,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS n_dupes_removed,
        |  CAST(max(cnt) AS BIGINT) AS max_group,
        |  count(CASE WHEN cnt > 1 THEN 1 END) AS n_multi_groups,
        |  CAST(sum(keeper) AS BIGINT) AS keeper_id_sum
        |FROM grp""".stripMargin,
    // energy contour replayed from the GENERATOR per distinct base at
    // gain 1 (gain scales every frame energy exactly, changing no bit);
    // partial tail frames are dropped on both sides (i < (n//4)*4)
    "q_mm_audio_dedup" ->
      """WITH b AS (SELECT DISTINCT doc_id // 3 AS base FROM documents),
        |nn AS (SELECT base, 64 + base % 129 AS n FROM b),
        |sm AS (
        |  SELECT base, i.range // 4 AS f,
        |    abs((base * 131 + i.range * (i.range + 7 + base % 31)) % 2048 - 1024) AS a
        |  FROM nn, range(0, 192) i WHERE i.range < (n // 4) * 4),
        |fr AS (SELECT base, f, sum(a) AS e FROM sm GROUP BY 1, 2),
        |ctr AS (SELECT base, f, e,
        |          lead(e) OVER (PARTITION BY base ORDER BY f) AS ne
        |        FROM fr),
        |hs AS (SELECT base,
        |         string_agg(CASE WHEN ne > e THEN '1' ELSE '0' END, '' ORDER BY f) AS sig
        |       FROM ctr WHERE ne IS NOT NULL GROUP BY base),
        |m AS (SELECT d.doc_id, hs.sig
        |      FROM documents d JOIN hs ON d.doc_id // 3 = hs.base),
        |grp AS (SELECT sig, count(*) AS cnt, min(doc_id) AS keeper
        |        FROM m GROUP BY sig)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_clips,
        |  count(*) AS n_sigs,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS n_dupes_removed,
        |  CAST(max(cnt) AS BIGINT) AS max_group,
        |  count(CASE WHEN cnt > 1 THEN 1 END) AS n_multi_groups,
        |  CAST(sum(keeper) AS BIGINT) AS keeper_id_sum
        |FROM grp""".stripMargin,
    // the retrieval chain replayed from the GENERATOR (never the
    // container): per image the 4x4 cell sums come from the (id*7+i)
    // channel ramp bucketed by the same integer grid; scores and the
    // top-3 rank replay in HUGEINT lanes with the (score desc, cand asc)
    // total order topk_agg guarantees
    "q_mm_retrieval" ->
      """WITH img AS (
        |  SELECT doc_id AS id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT id, w, h, i.range AS i FROM img, range(0, 160) i
        |  WHERE i.range < w * h),
        |cells AS (
        |  SELECT id,
        |    ((i // w) * 4 // h) * 4 + ((i % w) * 4 // w) AS c,
        |    sum((id * 7 + i) % 256 + (id * 7 + i + 85) % 256
        |        + (id * 7 + i + 170) % 256) AS s
        |  FROM px GROUP BY 1, 2),
        |pr AS (SELECT id AS probe_id, c, s FROM cells
        |       WHERE id IN (0, 33, 150, 300, 498)),
        |sc AS (
        |  SELECT pr.probe_id, ca.id AS cand_id,
        |    sum(CAST(pr.s AS HUGEINT) * ca.s) AS dot,
        |    sum(CAST(pr.s AS HUGEINT) * pr.s) AS na,
        |    sum(CAST(ca.s AS HUGEINT) * ca.s) AS nb
        |  FROM pr JOIN cells ca ON pr.c = ca.c AND ca.id != pr.probe_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT probe_id, cand_id,
        |    CAST((dot * dot * 1000000) // (na * nb) AS BIGINT) AS cos2_ppm
        |  FROM sc),
        |ranked AS (
        |  SELECT probe_id, cand_id, cos2_ppm,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cos2_ppm DESC, cand_id ASC) AS rank
        |  FROM scored)
        |SELECT probe_id, CAST(rank AS INTEGER) AS rank, cand_id, cos2_ppm
        |FROM ranked WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    // image-lane generator closed forms over the same capped id set:
    // n_bytes = 54-byte header + h padded rows; level sum replays the
    // (id*7+i) channel ramp; src_len must equal n_bytes (source framing)
    "q_binary_ingest" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    54 + (6 + doc_id % 5) * (((3 * (8 + doc_id % 9) + 3) // 4) * 4) AS n_bytes,
        |    list_sum(list_transform(
        |      range((8 + doc_id % 9) * (6 + doc_id % 5)),
        |      i -> (doc_id * 7 + i) % 256 + (doc_id * 7 + i + 85) % 256
        |           + (doc_id * 7 + i + 170) % 256)) AS level_sum,
        |    (8 + doc_id % 9) * (6 + doc_id % 5) * 3 AS n_units
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 720)
        |SELECT count(*) AS n_items,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       CAST(sum(n_bytes) AS BIGINT) AS sum_src_len,
        |       CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
        |       CAST(sum(level_sum) AS BIGINT) AS sum_levels,
        |       CAST(sum(n_units) AS BIGINT) AS sum_units
        |FROM f""".stripMargin,
    // audio-lane generator replay: samples (id*31 + i*17) % 2048 - 1024,
    // n = 64 + id%129 of them, full 32-sample frames only; per-frame
    // energy sum(s^2), peak = (energy DESC, frame ASC) row 1 — the same
    // total order the Scala argmax (strict >) implements
    "q_mm_audio_energy" ->
      """WITH au AS (
        |  SELECT doc_id AS id, 64 + doc_id % 129 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |fr AS (
        |  SELECT id, f.range AS f,
        |    list_sum(list_transform(range(32),
        |      j -> CAST((id * 31 + (f.range * 32 + j) * 17) % 2048 - 1024 AS BIGINT)
        |           * ((id * 31 + (f.range * 32 + j) * 17) % 2048 - 1024))) AS energy
        |  FROM au, range(0, 6) f WHERE f.range < n // 32),
        |pk AS (
        |  SELECT id, f, energy,
        |    row_number() OVER (PARTITION BY id ORDER BY energy DESC, f ASC) AS rk,
        |    sum(energy) OVER (PARTITION BY id) AS tot,
        |    count(*) OVER (PARTITION BY id) AS nf
        |  FROM fr)
        |SELECT CAST(f AS INTEGER) AS peak_frame,
        |       count(*) AS n_items,
        |       CAST(sum(energy) AS BIGINT) AS sum_peak_energy,
        |       CAST(sum(tot) AS BIGINT) AS sum_total_energy,
        |       CAST(sum(nf) AS BIGINT) AS sum_frames
        |FROM pk WHERE rk = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mm_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN 54 + (6 + doc_id % 5) * (((3 * (8 + doc_id % 9) + 3) // 4) * 4)
        |      WHEN 1 THEN 44 + 2 * (64 + doc_id % 129)
        |      ELSE (2 + doc_id % 4) * 155 END AS n_bytes,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN 1
        |      WHEN 1 THEN 64 + doc_id % 129
        |      ELSE 2 + doc_id % 4 END AS n_frames,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN list_sum(list_transform(
        |        range((8 + doc_id % 9) * (6 + doc_id % 5)),
        |        i -> (doc_id * 7 + i) % 256 + (doc_id * 7 + i + 85) % 256
        |             + (doc_id * 7 + i + 170) % 256))
        |      WHEN 1 THEN list_sum(list_transform(range(64 + doc_id % 129),
        |        i -> abs((doc_id * 31 + i * 17) % 2048 - 1024)))
        |      ELSE list_sum(list_transform(range((2 + doc_id % 4) * 144),
        |        j -> (doc_id * 13 + (j // 144) * 101 + (j % 144)) % 256))
        |      END AS level_sum,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN (8 + doc_id % 9) * (6 + doc_id % 5) * 3
        |      WHEN 1 THEN 64 + doc_id % 129
        |      ELSE (2 + doc_id % 4) * 144 END AS n_units
        |  FROM documents)
        |SELECT modality, count(*) AS n_items,
        |       CAST(sum(n_frames) AS BIGINT) AS sum_frames,
        |       CAST(max(n_bytes) AS INTEGER) AS max_bytes,
        |       CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
        |       CAST(sum(level_sum) AS DOUBLE) / CAST(sum(n_units) AS DOUBLE) AS mean_level
        |FROM f GROUP BY modality ORDER BY modality""".stripMargin,
    "q_mm_sampled" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN ((8 + doc_id % 9 + 1) // 2) * ((6 + doc_id % 5 + 1) // 2)
        |      WHEN 1 THEN (64 + doc_id % 129 + 1) // 2
        |      ELSE (2 + doc_id % 4 + 2) // 3 END AS n_kept,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN list_sum(list_transform(
        |        list_filter(range((8 + doc_id % 9) * (6 + doc_id % 5)),
        |          i -> (i % (8 + doc_id % 9)) % 2 = 0 AND (i // (8 + doc_id % 9)) % 2 = 0),
        |        i -> (doc_id * 7 + i) % 256 + (doc_id * 7 + i + 85) % 256
        |             + (doc_id * 7 + i + 170) % 256))
        |      WHEN 1 THEN list_sum(list_transform(
        |        list_filter(range(64 + doc_id % 129), i -> i % 2 = 0),
        |        i -> abs((doc_id * 31 + i * 17) % 2048 - 1024)))
        |      ELSE list_sum(list_transform(
        |        list_filter(range((2 + doc_id % 4) * 144),
        |          j -> (j // 144) % 3 = 0 AND (j % 144) % 2 = 0),
        |        j -> (doc_id * 13 + (j // 144) * 101 + (j % 144)) % 256))
        |      END AS level_sum,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN ((8 + doc_id % 9 + 1) // 2) * ((6 + doc_id % 5 + 1) // 2) * 3
        |      WHEN 1 THEN (64 + doc_id % 129 + 1) // 2
        |      ELSE ((2 + doc_id % 4 + 2) // 3) * 72 END AS n_units
        |  FROM documents)
        |SELECT modality, count(*) AS n_items,
        |       CAST(sum(n_kept) AS BIGINT) AS sum_kept,
        |       CAST(sum(level_sum) AS DOUBLE) / CAST(sum(n_units) AS DOUBLE) AS mean_level
        |FROM f GROUP BY modality ORDER BY modality""".stripMargin,
  )
}
