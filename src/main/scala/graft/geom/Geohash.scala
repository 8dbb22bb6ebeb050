package graft.geom

/** Geohash encoding (the base-32 interleaved-bit spatial key Sedona exposes
  * as `ST_GeoHash` — the standard prefix-partitionable bucket key for
  * spatial data at scale: a shared prefix of length p bounds two points to
  * the same ~(180/2^⌈5p/2⌉)° cell, so sorting/partitioning by geohash
  * co-locates spatial neighbours).
  *
  * Implemented in the integer-quantization closed form rather than
  * interval halving: lon/lat are scaled to ⌈5p/2⌉/⌊5p/2⌋-bit cell indices
  * with one multiply+floor each, then bit-interleaved (lon first,
  * MSB-first) and base-32 coded. The closed form is bit-equivalent to the
  * canonical subdivision loop (property-checked in GeohashSpec against an
  * independent interval-halving model) and — unlike the loop — is replayable
  * as plain SQL arithmetic, which is what lets the DuckDB oracle verify the
  * whole query, not just spot vectors. Inputs within one double ulp of a
  * cell boundary could in principle quantize differently from an
  * infinite-precision halving, identically in any engine that evaluates the
  * same IEEE expression.
  */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Max supported precision: 12 chars = 60 interleaved bits (fits Long). */
  val MaxPrecision = 12

  def encode(lon: Double, lat: Double, precision: Int): String = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"st_geohash precision must be in [1, $MaxPrecision], got $precision")
    require(lon >= -180.0 && lon <= 180.0 && lat >= -90.0 && lat <= 90.0,
      s"st_geohash input out of range: ($lon, $lat)")
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val li = cellIndex(lon, -180.0, 360.0, lonBits)
    val la = cellIndex(lat, -90.0, 180.0, latBits)
    var c = 0L
    var i = 0
    while (i < bits) { // interleave MSB-first, longitude leads
      val bit =
        if ((i & 1) == 0) (li >>> (lonBits - 1 - i / 2)) & 1L
        else (la >>> (latBits - 1 - (i - 1) / 2)) & 1L
      c = (c << 1) | bit
      i += 1
    }
    val sb = new java.lang.StringBuilder(precision)
    var j = 0
    while (j < precision) {
      sb.append(Base32.charAt(((c >>> (bits - 5 * (j + 1))) & 31L).toInt))
      j += 1
    }
    sb.toString
  }

  /** floor((v - min) / range * 2^bits), clamped so v = max lands in the
    * top cell (the half-open cell convention of canonical geohash). */
  private def cellIndex(v: Double, min: Double, range: Double, bits: Int): Long = {
    val n = 1L << bits
    val idx = math.floor((v - min) / range * n).toLong
    if (idx >= n) n - 1 else if (idx < 0) 0L else idx
  }

  /** Cell bounds of a geohash string: (lonMin, latMin, lonMax, latMax).
    * Inverse of [[encode]] up to cell resolution; used by tests and by
    * prefix-range pruning (all points in cell g satisfy these bounds). */
  def decodeBounds(hash: String): (Double, Double, Double, Double) = {
    require(hash.nonEmpty && hash.length <= MaxPrecision, s"bad geohash '$hash'")
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var even = true
    hash.foreach { ch =>
      val v = Base32.indexOf(ch.toLower)
      require(v >= 0, s"bad geohash char '$ch'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
    }
    (lonLo, latLo, lonHi, latHi)
  }
}
