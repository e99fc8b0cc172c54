package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Grid

/** Exhaustive + truth-table tests for the grid bijections F4–F9 and
  * validation P8 — the Scala form of the reference's manual roundtrip
  * scripts (`tests/test_dynamic_api.py:26-75`, `tests/test_phase2.py:
  * 76-105`). The index domains are tiny (91/61/72), so the roundtrip
  * "properties" are checked exhaustively rather than sampled. */
class GridSpec extends AnyFunSuite {

  // ---- anchors (the reference's reverse-engineered known points) ----
  test("anchor: (32.5, -70.0) maps to grid[90, 60] (config.py:23)") {
    assert(Grid.latToIndex(32.5) == 90)
    assert(Grid.lonToIndex(-70.0) == 60)
  }

  test("anchor: corners") {
    assert(Grid.latToIndex(55.0) == 0)
    assert(Grid.lonToIndex(-85.0) == 0)
    assert(Grid.indexToLat(0) == 55.0)
    assert(Grid.indexToLon(0) == -85.0)
    assert(Grid.indexToLat(90) == 32.5)
    assert(Grid.indexToLon(60) == -70.0)
  }

  // ---- exhaustive roundtrips over every cell ----
  test("every lat index roundtrips: index -> lat -> index") {
    for (i <- 0 until Grid.LatCells)
      assert(Grid.latToIndex(Grid.indexToLat(i)) == i, s"lat idx $i")
  }

  test("every lon index roundtrips: index -> lon -> index") {
    for (i <- 0 until Grid.LonCells)
      assert(Grid.lonToIndex(Grid.indexToLon(i)) == i, s"lon idx $i")
  }

  test("every time index roundtrips: index -> date -> index") {
    for (i <- 0 until Grid.TimeSteps)
      assert(Grid.dateToIndex(Grid.indexToDate(i)) == i, s"time idx $i")
  }

  test("indices stay in bounds for extreme inputs") {
    for (x <- Seq(-1e9, -100.0, -0.0, 0.0, 12.34, 100.0, 1e9,
                  Double.MinValue, Double.MaxValue)) {
      val li = Grid.latToIndex(x)
      val lo = Grid.lonToIndex(x)
      assert(li >= 0 && li < Grid.LatCells, s"lat($x) = $li")
      assert(lo >= 0 && lo < Grid.LonCells, s"lon($x) = $lo")
    }
  }

  test("snapping is idempotent over a dense off-grid sample") {
    for (lat <- BigDecimal(5.0) to BigDecimal(60.0) by BigDecimal(0.071);
         lon <- Seq(-90.0, -84.9, -77.51, -70.2, -65.0)) {
      val s1 = Grid.snap(lat.toDouble, lon)
      assert(Grid.snap(s1._1, s1._2) == s1, s"snap($lat, $lon)")
    }
  }

  test("clamping: out-of-range coords hit the boundary cells") {
    assert(Grid.latToIndex(60.0) == 0)   // above 55 -> clamp to 55 -> idx 0
    assert(Grid.latToIndex(5.0) == 90)   // below 10 -> clamp -> idx 90
    assert(Grid.lonToIndex(-90.0) == 0)
    assert(Grid.lonToIndex(-60.0) == 60)
  }

  test("banker's rounding at half-cell midpoints matches Python round()") {
    // (55 − 32.625)/0.25 = 89.5 and (55 − 32.375)/0.25 = 90.5 are both
    // exactly representable; Python round() is half-to-even, so both
    // land on the even index 90. math.rint replicates that.
    assert(Grid.latToIndex(32.625) == 90)
    assert(Grid.latToIndex(32.375) == 90)
  }

  // ---- F7 date→index semantics ----
  test("date index: reference truth table") {
    assert(Grid.dateToIndex("1955-01-01") == 0)
    assert(Grid.dateToIndex("1955-01-31") == 0)  // same month
    assert(Grid.dateToIndex("1960-12-31") == 71)
    assert(Grid.dateToIndex("1960-01-01") == 60)
    assert(Grid.dateToIndex("1970-01-01") == 71) // clamp above
    assert(Grid.dateToIndex("1940-06-01") == 0)  // clamp below
  }

  test("F7: ANY parse failure maps to index 0 (config.py:133-135)") {
    assert(Grid.dateToIndex("") == 0)
    assert(Grid.dateToIndex("not-a-date") == 0)
    assert(Grid.dateToIndex("01/16/1960") == 0)
  }

  test("F8: index -> first-of-month date strings") {
    assert(Grid.indexToDate(0) == "1955-01-01")
    assert(Grid.indexToDate(11) == "1955-12-01")
    assert(Grid.indexToDate(12) == "1956-01-01")
    assert(Grid.indexToDate(71) == "1960-12-01")
  }

  // ---- P8 validation truth tables (tests/test_phase2.py:84-89) ----
  test("coordinate validation: valid exemplars") {
    assert(Grid.validateCoords(32.5, -70.0).isRight)
    assert(Grid.validateCoords(10.0, -85.0).isRight)
    assert(Grid.validateCoords(20.0, -77.5).isRight)
  }

  test("coordinate validation: invalid exemplars") {
    assert(Grid.validateCoords(40.0, -100.0).isLeft)  // both out
    assert(Grid.validateCoords(10.0, -30.0).isLeft)   // lon too east
    assert(Grid.validateCoords(33.0, -75.0).isLeft)   // lat above the 32.5 validation max
    assert(Grid.validateCoords(9.9, -75.0).isLeft)
  }

  test("validation bound is 32.5 even though the clamp bound is 55 (deliberate asymmetry)") {
    assert(Grid.validateCoords(40.0, -75.0).isLeft)
    assert(Grid.latToIndex(40.0) == 60) // ...but conversion still works
  }

  test("date-range validation truth table") {
    assert(Grid.validateDates("1955-01-01", "1960-12-31").isRight)
    assert(Grid.validateDates("1960-01-01", "1960-02-01").isRight)
    assert(Grid.validateDates("1954-12-31", "1960-12-31").isLeft) // before start
    assert(Grid.validateDates("1955-01-01", "1961-01-01").isLeft) // after end
    assert(Grid.validateDates("1960-02-01", "1960-01-01").isLeft) // reversed
    assert(Grid.validateDates("bad", "1960-01-01").isLeft)        // format
  }

  test("A9: expected points estimate") {
    assert(Grid.expectedPoints("1960-01-01", "1960-02-01") == 2)
    assert(Grid.expectedPoints("1955-01-01", "1960-12-01") == 72)
    assert(Grid.expectedPoints("1958-06-01", "1958-06-30") == 1)
  }
}

/** The Column-expression variants must agree with the scalar functions
  * everywhere except exact half-cell midpoints (documented rounding
  * difference: half-even scalar vs half-up columnar). */
class GridColumnSpec extends AnyFunSuite with SparkTestSession {
  test("columnar F4/F5/F6 agree with scalar Grid on a dense off-midpoint sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val coords = (for {
      lat <- BigDecimal(5.0) to BigDecimal(60.0) by BigDecimal(0.07)
      lon <- Seq(-90.0, -84.93, -77.507, -70.007, -65.0)
    } yield (lat.toDouble, lon)).toSeq
    val df = coords.toDF("lat", "lon").select(
      col("lat"), col("lon"),
      Grid.latIdxCol(col("lat")).as("li"),
      Grid.lonIdxCol(col("lon")).as("lo"),
      Grid.idxToLatCol(Grid.latIdxCol(col("lat"))).as("slat"),
      Grid.idxToLonCol(Grid.lonIdxCol(col("lon"))).as("slon"))
    df.collect().foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getLong(2) == Grid.latToIndex(lat), s"lat $lat")
      assert(r.getLong(3) == Grid.lonToIndex(lon), s"lon $lon")
      assert(r.getDouble(4) == Grid.snap(lat, lon)._1, s"snap lat $lat")
      assert(r.getDouble(5) == Grid.snap(lat, lon)._2, s"snap lon $lon")
    }
  }

  test("columnar F7 month index agrees with scalar dateToIndex") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dates = Seq("1955-01-15", "1957-06-01", "1960-12-31", "1961-05-02", "1940-01-01")
    val got = dates.toDF("d")
      .select(col("d"), Grid.timeIdxCol(to_timestamp(col("d"))).as("ti"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    dates.foreach(d => assert(got(d) == Grid.dateToIndex(d), d))
  }
}
