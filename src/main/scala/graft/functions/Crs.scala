package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.model.BBox

/** Coordinate reference system transforms (SURVEY.md §2.8 F3, §2.11 X2).
  *
  * Pure-JVM implementations of the projections the reference actually
  * uses (it delegates to pyproj for arbitrary EPSG codes):
  *  - EPSG:3857 Web Mercator (spherical) — the AOI shapefile CRS;
  *  - UTM / Transverse Mercator (Krueger series, ~nm accuracy) — the
  *    GSSHA gage-header export CRS (EPSG:26915 in the reference tests);
  *  - ellipsoidal Lambert azimuthal equal-area — the NASA GLanCE grid
  *    (reference: info/nasa.py:66-70 WKT: lat0=50, lon0=-100, WGS84).
  *
  * Formulas: Snyder, Map Projections — A Working Manual (USGS PP 1395)
  * and Karney/Krueger transverse-mercator series — public domain.
  * All transforms are driver-side scalar math: the engine only ever
  * transforms axis values and bbox corners (metadata-sized), exactly
  * like the reference (utility_functions.py:224-282).
  */
object Crs {

  trait Projection {
    /** (lon, lat) degrees -> projected (x, y) meters. */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** projected (x, y) meters -> (lon, lat) degrees. */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  /** EPSG:3857 (spherical Web Mercator, R = WGS84 semi-major). */
  object WebMercator extends Projection {
    private val R = 6378137.0
    def forward(lon: Double, lat: Double): (Double, Double) =
      (R * lon * D2R, R * math.log(math.tan(math.Pi / 4 + lat * D2R / 2)))
    def inverse(x: Double, y: Double): (Double, Double) =
      (x / R * R2D, (2 * math.atan(math.exp(y / R)) - math.Pi / 2) * R2D)
  }

  /** Transverse Mercator (Krueger series, order n^4) — UTM when
    * lon0 = zone meridian, k0=0.9996, FE=500km.
    */
  final case class TransverseMercator(lon0Deg: Double, k0: Double = 0.9996,
      falseEasting: Double = 500000.0, falseNorthing: Double = 0.0,
      a: Double = 6378137.0, f: Double = 1 / 298.257222101) extends Projection {
    private val n = f / (2 - f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val A = a / (1 + n) * (1 + n2 / 4 + n4 / 64)
    private val alpha = Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440,
      61 * n3 / 240 - 103 * n4 / 140,
      49561 * n4 / 161280)
    private val beta = Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440,
      17 * n3 / 480 - 37 * n4 / 840,
      4397 * n4 / 161280)
    private val delta = Array(
      2 * n - 2 * n2 / 3 - 2 * n3 + 116 * n4 / 45,
      7 * n2 / 3 - 8 * n3 / 5 - 227 * n4 / 45,
      56 * n3 / 15 - 136 * n4 / 35,
      4279 * n4 / 630)
    private val e2sn = 2 * math.sqrt(n) / (1 + n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = (lonDeg - lon0Deg) * D2R
      val phi = latDeg * D2R
      val s = math.sin(phi)
      val t = math.sinh(atanh(s) - e2sn * atanh(e2sn * s))
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = atanh(math.sin(lam) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 4) {
        xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (falseEasting + k0 * A * eta, falseNorthing + k0 * A * xi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - falseNorthing) / (k0 * A)
      val eta = (x - falseEasting) / (k0 * A)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 4) {
        xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 4) { phi += delta(j - 1) * math.sin(2 * j * chi); j += 1 }
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (lon0Deg + lam * R2D, phi * R2D)
    }

    private def atanh(v: Double): Double = 0.5 * math.log((1 + v) / (1 - v))
  }

  /** Ellipsoidal Lambert azimuthal equal-area, oblique aspect
    * (Snyder 1987 §24; the GLanCE30 grid CRS).
    */
  final case class LambertAzimuthalEqualArea(lon0Deg: Double, lat0Deg: Double,
      a: Double = 6378137.0, f: Double = 1 / 298.257223563) extends Projection {
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)
    private val e4 = e2 * e2; private val e6 = e4 * e2

    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private val Rq = a * math.sqrt(qp / 2)
    private val phi1 = lat0Deg * D2R
    private val beta1 = math.asin(q(phi1) / qp)
    private val m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
    private val D = a * m1 / (Rq * math.cos(beta1))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = (lonDeg - lon0Deg) * D2R
      val beta = math.asin(q(latDeg * D2R) / qp)
      val B = Rq * math.sqrt(2 / (1 + math.sin(beta1) * math.sin(beta) +
        math.cos(beta1) * math.cos(beta) * math.cos(lam)))
      val x = B * D * math.cos(beta) * math.sin(lam)
      val y = (B / D) * (math.cos(beta1) * math.sin(beta) -
        math.sin(beta1) * math.cos(beta) * math.cos(lam))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val rho = math.sqrt((x / D) * (x / D) + (D * y) * (D * y))
      if (rho == 0.0) return (lon0Deg, lat0Deg)
      val ce = 2 * math.asin(rho / (2 * Rq))
      val betaP = math.asin(math.cos(ce) * math.sin(beta1) +
        (D * y * math.sin(ce) * math.cos(beta1)) / rho)
      val lam = math.atan2(x * math.sin(ce),
        D * rho * math.cos(beta1) * math.cos(ce) -
          D * D * y * math.sin(beta1) * math.sin(ce))
      // authalic -> geodetic latitude series
      val phi = betaP +
        (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * betaP) +
        (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * betaP) +
        (761 * e6 / 45360) * math.sin(6 * betaP)
      (lon0Deg + lam * R2D, phi * R2D)
    }
  }

  /** The GLanCE30 North-America grid (reference info/nasa.py:66-70). */
  val GlanceNA: Projection = LambertAzimuthalEqualArea(-100.0, 50.0)

  /** EPSG dispatch for the code ranges the reference exercises:
    * 3857; NAD83 UTM 269xx; WGS84 UTM 326xx (N) / 327xx (S).
    */
  def forEpsg(epsg: Int): Option[Projection] = epsg match {
    case 3857 => Some(WebMercator)
    case z if z >= 26901 && z <= 26923 => // NAD83 / GRS80
      Some(TransverseMercator(lon0Deg = -183.0 + 6.0 * (z - 26900)))
    case z if z >= 32601 && z <= 32660 => // WGS84 north
      Some(TransverseMercator(lon0Deg = -183.0 + 6.0 * (z - 32600),
        f = 1 / 298.257223563))
    case z if z >= 32701 && z <= 32760 => // WGS84 south
      Some(TransverseMercator(lon0Deg = -183.0 + 6.0 * (z - 32700),
        falseNorthing = 10000000.0, f = 1 / 298.257223563))
    case 4326 => None // identity: already geographic
    case _ => None
  }

  /** Transform a bbox by its corner points (valid for the monotone,
    * axis-separable or near-axis-aligned cases the reference handles —
    * utility_functions.py:251-282 does the same corner transform).
    */
  def transformBBox(b: BBox, from: Projection): BBox = {
    val corners = Seq(
      from.inverse(b.west, b.south), from.inverse(b.west, b.north),
      from.inverse(b.east, b.south), from.inverse(b.east, b.north))
    BBox(corners.map(_._1).min, corners.map(_._2).min,
         corners.map(_._1).max, corners.map(_._2).max)
  }
}

/** Shapefile AOI bounds (SURVEY.md §2.1 S4; reference:
  * utility_functions.py:125-159 reads the shapefile with geopandas,
  * reprojects to EPSG:4326 and takes `total_bounds`). The bounding box
  * lives in the 100-byte .shp header (ESRI whitepaper, 1998): four
  * little-endian doubles at offsets 36/44/52/60 — no geometry parse
  * needed for bounds.
  */
object ShapefileBounds {

  /** Raw header bbox in the file's own CRS. */
  def rawBounds(path: String): BBox = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 100, s"not a shapefile: $path")
    val bb = ByteBuffer.wrap(bytes, 36, 32).order(ByteOrder.LITTLE_ENDIAN)
    BBox(bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
  }

  /** Parse a .prj WKT into one of the supported projections (None =
    * geographic / unrecognized). Transverse Mercator is fully
    * parameterized: central meridian, scale factor, false easting /
    * northing, AND latitude_of_origin — a nonzero lat_0 (state-plane
    * zones; UTM has lat_0 = 0) shifts the northing datum by the
    * scaled meridian arc at lat_0, folded into an effective false
    * northing FN' = FN − k0·arc(lat_0) so the Krüger inverse (which
    * measures from the equator) recovers the right latitudes.
    */
  def projectionFromPrj(prj: String): Option[Crs.Projection] = {
    // (?i): WKT parameter names are written lowercase by some stacks
    // ("central_meridian", proj/GDAL) and Capitalized by ESRI
    // ("Central_Meridian" — ArcGIS-exported .prj sidecars); the ESRI
    // spelling MUST match or a state-plane file silently projects
    // with lon0=0 / FE=500000 and lands an ocean away
    def param(name: String): Option[Double] =
      s"""(?i)PARAMETER\\["$name",\\s*([-0-9.eE]+)\\]""".r
        .findFirstMatchIn(prj).map(_.group(1).toDouble)
    // projection-NAME detection must be as case-tolerant as the
    // parameter regex: a fully lowercased .prj that still said
    // transverse_mercator would otherwise fall through to None and
    // return raw projected meters as if they were degrees
    val p = prj.toLowerCase(java.util.Locale.ROOT)
    if (p.contains("mercator_auxiliary_sphere") || p.contains("3857"))
      Some(Crs.WebMercator)
    else if (p.contains("lambert_azimuthal"))
      Some(Crs.GlanceNA)
    else if (p.contains("transverse_mercator")) {
      // refuse rather than default: a TM zone without its central
      // meridian is unusable — lon0=0 would yield plausible-looking
      // but wildly wrong coordinates, where None lets the caller keep
      // the raw (unprojected) bounds it can at least recognize
      param("central_meridian").map { lon0 =>
        val tm0 = Crs.TransverseMercator(
          lon0Deg = lon0,
          k0 = param("scale_factor").getOrElse(0.9996),
          falseEasting = param("false_easting").getOrElse(500000.0),
          falseNorthing = 0.0,
          f = if (p.contains("wgs") && p.contains("84")) 1 / 298.257223563
              else 1 / 298.257222101) // GRS80 (NAD83)
        val lat0 = param("latitude_of_origin").getOrElse(0.0)
        val arc0 = if (lat0 == 0.0) 0.0 else tm0.forward(lon0, lat0)._2
        tm0.copy(falseNorthing =
          param("false_northing").getOrElse(0.0) - arc0)
      }
    } else None
  }

  /** Bounds reprojected to EPSG:4326, detecting the CRS from the .prj
    * sidecar: Web Mercator, LAEA, and parameterized Transverse
    * Mercator (UTM and state-plane TM — the reference's gssha_demo
    * watershed ships in NAD83 / UTM 15N) are recognized; else assumed
    * geographic.
    */
  def wgs84Bounds(shpPath: String): BBox = {
    val raw = rawBounds(shpPath)
    val prjPath = shpPath.replaceAll("\\.shp$", ".prj")
    val prj = if (Files.exists(Paths.get(prjPath)))
      Files.readString(Paths.get(prjPath)) else ""
    projectionFromPrj(prj) match {
      case Some(p) => Crs.transformBBox(raw, p)
      case None => raw
    }
  }
}
