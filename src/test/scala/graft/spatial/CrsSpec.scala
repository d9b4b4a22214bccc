package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

class CrsSpec extends AnyFunSuite {

  test("round-trip wgs84 -> sweref -> wgs84 over Sweden < 1e-9 deg") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val lat = 55.0 + rnd.nextDouble() * 14.0 // 55..69
      val lng = 10.5 + rnd.nextDouble() * 13.5 // 10.5..24
      val (e, n) = Crs.wgs84ToSweref(lat, lng)
      val (lat2, lng2) = Crs.swerefToWgs84(e, n)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
      assert(math.abs(lng2 - lng) < 1e-9, s"lng $lng -> $lng2")
    }
  }

  test("central meridian maps to false easting exactly") {
    (0 to 70 by 5).foreach { lat =>
      val (e, _) = Crs.wgs84ToSweref(lat, 15.0)
      assert(math.abs(e - 500000.0) < 1e-6, s"lat=$lat easting=$e")
    }
  }

  test("equator on central meridian maps to northing 0") {
    val (_, n) = Crs.wgs84ToSweref(0.0, 15.0)
    assert(math.abs(n) < 1e-6)
  }

  test("scale factor on central meridian is k0=0.9996") {
    // northing difference per radian of latitude = k0 * meridional
    // radius of curvature M(phi), computed here independently.
    val a = 6378137.0
    val f = 1.0 / 298.257222101
    val e2 = f * (2 - f)
    val lat = 62.0
    val phi = math.toRadians(lat)
    val m = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    val d = 1e-6 // radians
    val (_, n1) = Crs.wgs84ToSweref(math.toDegrees(phi - d / 2), 15.0)
    val (_, n2) = Crs.wgs84ToSweref(math.toDegrees(phi + d / 2), 15.0)
    val k = (n2 - n1) / (m * d)
    assert(math.abs(k - 0.9996) < 1e-6, s"scale=$k")
  }

  test("easting grows east, northing grows north") {
    val (e1, n1) = Crs.wgs84ToSweref(59.0, 14.0)
    val (e2, n2) = Crs.wgs84ToSweref(59.0, 16.0)
    val (_, n3) = Crs.wgs84ToSweref(60.0, 14.0)
    assert(e1 < 500000.0 && e2 > 500000.0)
    assert(math.abs(n2 - n1) < 2000) // same latitude, similar northing
    assert(n3 > n1)
  }

  test("Stockholm lands in the plausible SWEREF99 TM range") {
    // Stockholm ~ (59.3293N, 18.0686E): E ~ 670-680 km, N ~ 6578-6584 km
    val (e, n) = Crs.wgs84ToSweref(59.3293, 18.0686)
    assert(e > 650000 && e < 700000, s"easting=$e")
    assert(n > 6560000 && n < 6600000, s"northing=$n")
  }
}
