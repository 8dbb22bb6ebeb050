package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import MediaCodec._

/** The codecs behind [[Multimodal]]: byte-layout golden vectors,
  * encode→decode round trips (including the layouts' tricky parts — BMP
  * bottom-up padded rows, RIFF chunk walk, PPM header grammar), and loud
  * failure on malformed/unsupported input. */
class MediaCodecSpec extends AnyFunSuite {

  private def rgbPattern(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 256).toByte)

  // ------------------------------------------------------------- BMP

  test("BMP golden header bytes: magic, offsets, geometry, bpp") {
    val img = ImageData(2, 2, rgbPattern(2, 2, 1))
    val b = encodeBmp(img)
    assert(b(0) == 'B' && b(1) == 'M')
    assert(b.length == 54 + 8 * 2) // stride(2)=8, 2 rows
    assert((b(10) & 0xff) == 54) // pixel data offset
    assert((b(14) & 0xff) == 40) // BITMAPINFOHEADER
    assert((b(18) & 0xff) == 2 && (b(22) & 0xff) == 2)
    assert((b(28) & 0xff) == 24) // bpp
  }

  test("BMP round-trips pixels exactly across widths exercising every pad (0..3)") {
    for (w <- 1 to 8; h <- Seq(1, 3)) {
      val img = ImageData(w, h, rgbPattern(w, h, w * 10 + h))
      val back = decodeBmp(encodeBmp(img))
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(img.rgb), s"pixel mismatch at ${w}x$h")
    }
  }

  test("BMP stores rows bottom-up: first data row is the image's LAST row") {
    val img = ImageData(1, 2, Array[Byte](1, 2, 3, 4, 5, 6)) // row0=(1,2,3) row1=(4,5,6)
    val b = encodeBmp(img)
    // data row at offset 54 must be row1, as B,G,R
    assert(b(54) == 6 && b(55) == 5 && b(56) == 4)
  }

  test("BMP decode rejects malformed and unsupported profiles") {
    intercept[IllegalArgumentException](decodeBmp(Array[Byte]('B', 'M', 0)))
    intercept[IllegalArgumentException](decodeBmp(new Array[Byte](54))) // no magic
    val ok = encodeBmp(ImageData(2, 2, rgbPattern(2, 2, 3)))
    val badBpp = ok.clone(); badBpp(28) = 8 // 8-bit paletted
    intercept[IllegalArgumentException](decodeBmp(badBpp))
    intercept[IllegalArgumentException](decodeBmp(ok.take(60))) // truncated pixels
  }

  // ------------------------------------------------------------- WAV

  test("WAV golden header: canonical 44-byte RIFF/WAVE PCM16 mono") {
    val b = encodeWav(AudioData(8000, Array[Short](0, 100, -100)))
    assert(new String(b.take(4)) == "RIFF" && new String(b.slice(8, 12)) == "WAVE")
    assert(new String(b.slice(12, 16)) == "fmt " && new String(b.slice(36, 40)) == "data")
    assert(b.length == 44 + 6)
  }

  test("WAV round-trips samples exactly, including extremes") {
    val s = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 12345)
    val back = decodeWav(encodeWav(AudioData(44100, s)))
    assert(back.sampleRate == 44100)
    assert(back.samples.sameElements(s))
  }

  test("WAV decoder walks past extra chunks before data (real-file shape)") {
    val base = encodeWav(AudioData(8000, Array[Short](7, -7)))
    // splice a LIST chunk between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix RIFF size
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >>> 8).toByte
    spliced(6) = (total >>> 16).toByte; spliced(7) = (total >>> 24).toByte
    val back = decodeWav(spliced)
    assert(back.samples.sameElements(Array[Short](7, -7)))
  }

  test("WAV decode rejects malformed input") {
    intercept[IllegalArgumentException](decodeWav(Array[Byte](1, 2, 3)))
    val stereoish = encodeWav(AudioData(8000, Array[Short](1)))
    stereoish(22) = 2 // channels=2
    intercept[IllegalArgumentException](decodeWav(stereoish))
  }

  // ------------------------------------------------------------- PPM

  test("PPM stream round-trips frames exactly and enforces fixed geometry") {
    val frames = Array.tabulate(3)(fi => rgbPattern(4, 2, fi + 50))
    val stream = encodePpmStream(VideoData(4, 2, frames))
    val back = decodePpmStream(stream)
    assert(back.width == 4 && back.height == 2 && back.frames.length == 3)
    frames.indices.foreach(i => assert(back.frames(i).sameElements(frames(i))))
  }

  test("PPM header grammar: comments and flexible whitespace parse") {
    val rgb = rgbPattern(2, 1, 9)
    val loose = ("P6\n# a comment\n 2\t1\n255\n").getBytes("US-ASCII") ++ rgb
    val back = decodePpmStream(loose)
    assert(back.width == 2 && back.height == 1 && back.frames.head.sameElements(rgb))
  }

  test("PPM decode rejects malformed input") {
    intercept[IllegalArgumentException](decodePpmStream(Array.emptyByteArray))
    intercept[IllegalArgumentException](decodePpmStream("P5\n1 1\n255\nxxx".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      decodePpmStream("P6\n2 2\n255\nshort".getBytes("US-ASCII")))
    // maxval != 255
    intercept[IllegalArgumentException](
      decodePpmStream(("P6\n1 1\n65535\n" + "ab").getBytes("US-ASCII")))
  }

  // ----------------------------------------------- pipeline integration

  test("synthesized fixture items decode back to generator stats (every modality)") {
    for (id <- 0L to 11L) {
      val item = Multimodal.synthesize(id)
      item.modality match {
        case "image" =>
          val img = decodeBmp(item.payload)
          assert(img.width == (8 + id % 9).toInt && img.height == (6 + id % 5).toInt)
          var expected = 0L
          for (i <- 0 until img.width * img.height)
            expected += (id * 7 + i) % 256 + (id * 7 + i + 85) % 256 + (id * 7 + i + 170) % 256
          assert(img.rgb.map(_ & 0xff).map(_.toLong).sum == expected)
        case "audio" =>
          val au = decodeWav(item.payload)
          assert(au.samples.length == (64 + id % 129).toInt)
          for (i <- au.samples.indices)
            assert(au.samples(i) == ((id * 31 + i * 17) % 2048 - 1024).toShort)
        case "video" =>
          val vid = decodePpmStream(item.payload)
          assert(vid.frames.length == (2 + id % 4).toInt)
          assert(vid.width == 8 && vid.height == 6)
          for (fi <- vid.frames.indices; p <- 0 until 144)
            assert((vid.frames(fi)(p) & 0xff) == ((id * 13 + fi * 101 + p) % 256).toInt)
      }
    }
  }

  test("aHash: brightness-shift invariance, variant grouping, and discriminative power") {
    import graft.ops.MediaCodec._
    // the dedup key's load-bearing property: adding delta to every pixel
    // shifts block means and the image mean equally, so no bit changes —
    // proven here over the real encode->decode round trip
    for (base <- Seq(0L, 7L, 41L, 166L)) {
      val hashes = (0 to 2).map { v =>
        val item = Multimodal.synthesizeVariant(base * 3 + v)
        Multimodal.aHashBits(decodeBmp(item.payload))
      }
      assert(hashes.distinct.size == 1, s"base $base variants split: $hashes")
      assert(hashes.head.length == 64 && hashes.head.forall(c => c == '0' || c == '1'))
    }
    // distinct bases must NOT collapse (the quadratic-phase texture was
    // chosen for exactly this; the plain sawtooth gave 72/167)
    val baseHashes = (0L until 167L).map { b =>
      Multimodal.aHashBits(decodeBmp(Multimodal.synthesizeVariant(b * 3).payload))
    }
    assert(baseHashes.distinct.size == baseHashes.size,
      s"cross-base collisions: ${baseHashes.size - baseHashes.distinct.size}")
    // the invariance is not vacuous: aHash deliberately shrugs off a
    // single-pixel bump (that robustness is its point), but INVERTING
    // the image flips block-vs-mean comparisons and must change the hash
    val img = decodeBmp(Multimodal.synthesizeVariant(0L).payload)
    val inverted = img.rgb.map(b => (219 - (b & 0xff)).toByte)
    assert(Multimodal.aHashBits(ImageData(img.width, img.height, inverted)) !=
      Multimodal.aHashBits(img))
  }

  test("energy contour: gain invariance, discriminative power, and loudness sensitivity") {
    import graft.ops.MediaCodec._
    // exact-integer gain scaling multiplies every frame energy by g, so
    // no strict comparison flips — proven over the real WAV round trip
    for (base <- Seq(0L, 13L, 99L, 166L)) {
      val sigs = (0 to 2).map { v =>
        Multimodal.energyContour(decodeWav(
          Multimodal.synthesizeAudioVariant(base * 3 + v).payload))
      }
      assert(sigs.distinct.size == 1, s"base $base variants split: $sigs")
      assert(sigs.head.nonEmpty && sigs.head.forall(c => c == '0' || c == '1'))
    }
    // quadratic-phase law: fully discriminative at the sf0.01 base count
    val sigs = (0L until 167L).map { b =>
      Multimodal.energyContour(decodeWav(Multimodal.synthesizeAudioVariant(b * 3).payload))
    }
    assert(sigs.distinct.size == sigs.size,
      s"cross-base collisions at sf0.01 scale: ${sigs.size - sigs.distinct.size}")
    // sensitivity: NON-uniform loudness change (silencing one frame) must
    // alter the contour — the invariance is to global gain only
    val au = decodeWav(Multimodal.synthesizeAudioVariant(0L).payload)
    val muted = au.samples.clone()
    (4 until 8).foreach(i => muted(i) = 0)
    assert(Multimodal.energyContour(AudioData(au.sampleRate, muted)) !=
      Multimodal.energyContour(au))
  }

  test("temporal signature: frame-rate invariance, discriminative power, order sensitivity") {
    import graft.ops.MediaCodec._
    // showing each frame 1x/2x/3x longer collapses to one signature
    for (base <- Seq(0L, 29L, 100L, 166L)) {
      val sigs = (0 to 2).map { v =>
        Multimodal.temporalSignature(decodePpmStream(
          Multimodal.synthesizeVideoVariant(base * 3 + v).payload))
      }
      assert(sigs.distinct.size == 1, s"base $base variants split: $sigs")
      assert(sigs.head.nonEmpty)
    }
    // distinct bases render distinct footage under the quadratic law
    // (the linear base*13 law made bases 256 apart byte-identical)
    val sigs = (0L until 300L).map { b =>
      Multimodal.temporalSignature(decodePpmStream(
        Multimodal.synthesizeVideoVariant(b * 3).payload))
    }
    assert(sigs.distinct.size == sigs.size,
      s"cross-base collisions: ${sigs.size - sigs.distinct.size}")
    // REORDERING frames must change the signature (invariance is to
    // duration only, not to the temporal order of distinct frames)
    val vid = decodePpmStream(Multimodal.synthesizeVideoVariant(3L).payload)
    assert(vid.frames.length >= 2)
    val swapped = VideoData(vid.width, vid.height, vid.frames.reverse)
    assert(Multimodal.temporalSignature(swapped) != Multimodal.temporalSignature(vid))
  }

  test("every seeded corruption class is CAUGHT and classified, never crashes the decode") {
    // the quarantine contract (r15 verdict #4): for EVERY modality, the
    // magic smash classifies bad_magic and the 100-byte truncation
    // classifies truncated — by catching the decoder's require, not by
    // trusting the seed arithmetic. Ids chosen so each (modality,
    // corruption) cell is exercised: id%3 picks the modality,
    // id%13 ∈ {5, 9} picks the corruption.
    def outcome(id: Long): String = {
      val m = Multimodal.synthesize(id)
      val p = Multimodal.corruptPayload(id, m.payload)
      try {
        m.modality match {
          case "image" => decodeBmp(p)
          case "audio" => decodeWav(p)
          case _       => decodePpmStream(p)
        }
        "ok"
      } catch {
        case scala.util.control.NonFatal(e) => Multimodal.classifyDecodeFailure(e)
      }
    }
    // id % 39 residues give every (modality, corruption) pair:
    // 18≡(0,5) 31≡(1,5) 5≡(2,5) 9≡(0,9) 22≡(1,9) 35≡(2,9)
    assert(outcome(18L) == "bad_magic" && outcome(31L) == "bad_magic" &&
      outcome(5L) == "bad_magic", "magic smash must classify bad_magic in every modality")
    assert(outcome(9L) == "truncated" && outcome(22L) == "truncated" &&
      outcome(35L) == "truncated", "truncation must classify truncated in every modality")
    // untouched ids decode clean
    assert(Seq(0L, 1L, 2L).forall(outcome(_) == "ok"))
  }

  test("feature pipeline runs end-to-end on sf0.001 with real decode") {
    val spark = SparkFixture.spark
    val rows = Multimodal.featureStats(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3) // all three modalities present
    // decoded levels are byte/|PCM| means: strictly positive, bounded
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_level")
      assert(mean > 0.0 && mean < 1024.0, s"implausible mean_level $mean")
    }
  }
}
