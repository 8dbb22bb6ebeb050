package graft.geom

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The closed-form integer-quantization encoder must be bit-equivalent to
  * the canonical interval-halving geohash algorithm (the model here is an
  * independent reimplementation of the subdivision loop), and decodeBounds
  * must invert encode up to cell resolution. */
object GeohashProps extends Properties("geohash") {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Canonical subdivision-loop geohash (textbook algorithm, no shared
    * code with Geohash.encode). */
  private def subdivisionModel(lon: Double, lat: Double, precision: Int): String = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var even = true
    var ch = 0
    var nBits = 0
    val out = new StringBuilder
    while (out.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      even = !even
      nBits += 1
      if (nBits == 5) { out.append(Base32.charAt(ch)); nBits = 0; ch = 0 }
    }
    out.toString
  }

  private val lons = Gen.choose(-180.0, 180.0)
  private val lats = Gen.choose(-90.0, 90.0)
  private val precisions = Gen.choose(1, 12)

  property("closed form == canonical subdivision") =
    forAll(lons, lats, precisions) { (lon, lat, p) =>
      Geohash.encode(lon, lat, p) == subdivisionModel(lon, lat, p)
    }

  property("decodeBounds inverts encode up to cell resolution") =
    forAll(lons, lats, precisions) { (lon, lat, p) =>
      val (lonLo, latLo, lonHi, latHi) = Geohash.decodeBounds(Geohash.encode(lon, lat, p))
      lon >= lonLo && lon <= lonHi && lat >= latLo && lat <= latHi
    }

  property("shared prefix <=> same coarser cell") =
    forAll(lons, lats, precisions) { (lon, lat, p) =>
      val full = Geohash.encode(lon, lat, 12)
      Geohash.encode(lon, lat, p) == full.substring(0, p)
    }
}
