package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure coordinate/date bijections of the reference's grid addressing
  * scheme (SURVEY.md §2.8 F4–F9, §2.2 P8; reference `config.py:24–195`).
  *
  * This is metadata math, not data processing: lat/lon/date → grid index
  * and back. The reference grid: lat clamp range 10..55 step 0.25
  * (91 cells, index 0 at 55.0 descending), lon −85..−70 step 0.25
  * (61 cells ascending), time 72 monthly steps 1955-01 → 1960-12.
  *
  * Validation bounds are NARROWER than clamp bounds: the reference
  * validates latitude against [10.0, 32.5] (`config.py:26-28,159`) while
  * `lat_to_grid_index` clamps to [10, 55] (`config.py:83`) — replicated
  * deliberately, asymmetry and all.
  *
  * Rounding note: the reference uses Python `round` (banker's rounding,
  * half-to-even); the scalar functions replicate with `math.rint`. The
  * Column variants use `floor(x+0.5)` (half-up), which is deterministic
  * across Spark and DuckDB; the two disagree only at exact half-cell
  * midpoints (coords at odd multiples of 0.125°), which grid-centered
  * data never produces.
  */
object Grid {
  val LatMax = 55.0; val LatMin = 10.0
  /** Validation max for latitude — reference `config.py:27` ("maximum
    * latitude in dataset"), narrower than the 55.0 clamp ceiling. */
  val ValLatMax = 32.5
  val LonMin = -85.0; val LonMax = -70.0
  val Step = 0.25
  val LatCells = 91; val LonCells = 61
  val TimeSteps = 72 // 1955-01 .. 1960-12
  val BaseYear = 1955
  val DatasetStart = "1955-01-01"
  val DatasetEnd = "1960-12-31"
  val SurfaceDepthIndex = 106

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    math.min(math.max(v, lo), hi)
  private def clampI(v: Int, lo: Int, hi: Int): Int =
    math.min(math.max(v, lo), hi)

  /** F4: latitude → grid index (0 at 55.0N, descending). */
  def latToIndex(lat: Double): Int = {
    val c = clamp(lat, LatMin, LatMax)
    clampI(math.rint((LatMax - c) / Step).toInt, 0, LatCells - 1)
  }

  /** F5: longitude → grid index (0 at −85.0, ascending). */
  def lonToIndex(lon: Double): Int = {
    val c = clamp(lon, LonMin, LonMax)
    clampI(math.rint((c - LonMin) / Step).toInt, 0, LonCells - 1)
  }

  /** F6: grid index → coordinate (cell center). */
  def indexToLat(i: Int): Double = LatMax - i * Step
  def indexToLon(i: Int): Double = LonMin + i * Step

  /** F7: date string (yyyy-MM-dd) → month index since 1955-01, clamped
    * to [0, 71]. The reference maps ANY parse failure to index 0
    * (`config.py:133-135`) — replicated deliberately. */
  def dateToIndex(date: String): Int =
    try {
      val d = java.time.LocalDate.parse(date.take(10))
      clampI((d.getYear - BaseYear) * 12 + (d.getMonthValue - 1), 0, TimeSteps - 1)
    } catch { case _: Exception => 0 }

  /** F8: month index → first-of-month date string. */
  def indexToDate(i: Int): String = {
    val d = java.time.LocalDate.of(BaseYear, 1, 1).plusMonths(i.toLong)
    f"${d.getYear}%04d-${d.getMonthValue}%02d-01"
  }

  /** F9: snap requested coords to the actual grid-cell center. */
  def snap(lat: Double, lon: Double): (Double, Double) =
    (indexToLat(latToIndex(lat)), indexToLon(lonToIndex(lon)))

  /** P8: pre-query coordinate validation (reference `config.py:154-165`;
    * note the [10, 32.5] latitude range, not the clamp range). */
  def validateCoords(lat: Double, lon: Double): Either[String, Unit] =
    if (lat < LatMin || lat > ValLatMax)
      Left(s"latitude $lat outside valid range [$LatMin, $ValLatMax]")
    else if (lon < LonMin || lon > LonMax)
      Left(s"longitude $lon outside valid range [$LonMin, $LonMax]")
    else Right(())

  /** P8: date-range validation (reference `config.py:168-195`): both
    * dates inside the dataset's [1955-01-01, 1960-12-31], start ≤ end,
    * and a month *difference* (not inclusive count) of at most 72. */
  def validateDates(start: String, end: String): Either[String, Unit] = {
    def parse(s: String) =
      try Right(java.time.LocalDate.parse(s.take(10)))
      catch { case _: Exception => Left(s"invalid date format: $s") }
    val ds = java.time.LocalDate.parse(DatasetStart)
    val de = java.time.LocalDate.parse(DatasetEnd)
    for {
      s <- parse(start)
      e <- parse(end)
      _ <- if (s.isBefore(ds)) Left(s"start date $start before dataset start $DatasetStart") else Right(())
      _ <- if (e.isAfter(de)) Left(s"end date $end after dataset end $DatasetEnd") else Right(())
      _ <- if (s.isAfter(e)) Left(s"start date $start after end date $end") else Right(())
      _ <- {
        val monthsDiff = (e.getYear - s.getYear) * 12 + (e.getMonthValue - s.getMonthValue)
        if (monthsDiff > TimeSteps) Left(s"date range too large: $monthsDiff months (max $TimeSteps)")
        else Right(())
      }
    } yield ()
  }

  /** A9: pre-execution cardinality estimate (expected points). */
  def expectedPoints(start: String, end: String): Int =
    dateToIndex(end) - dateToIndex(start) + 1

  // ---------- Column-expression variants (data-parallel form) ----------
  // Same math as the scalar functions, expressed over Columns so the
  // mapping runs inside whole-stage codegen on billions of rows. These
  // are what the carrier query q20_grid_cells executes; GridSpec asserts
  // they agree with the scalar functions away from half-cell midpoints.

  /** F4 over a DOUBLE column → BIGINT index. */
  def latIdxCol(lat: Column): Column = {
    val c = least(greatest(lat, lit(LatMin)), lit(LatMax))
    least(greatest(floor((lit(LatMax) - c) / lit(Step) + lit(0.5)), lit(0.0)),
          lit((LatCells - 1).toDouble)).cast("bigint")
  }

  /** F5 over a DOUBLE column → BIGINT index. */
  def lonIdxCol(lon: Column): Column = {
    val c = least(greatest(lon, lit(LonMin)), lit(LonMax))
    least(greatest(floor((c - lit(LonMin)) / lit(Step) + lit(0.5)), lit(0.0)),
          lit((LonCells - 1).toDouble)).cast("bigint")
  }

  /** F6 over BIGINT index columns → DOUBLE cell-center coords. */
  def idxToLatCol(i: Column): Column = lit(LatMax) - i.cast("double") * lit(Step)
  def idxToLonCol(i: Column): Column = lit(LonMin) + i.cast("double") * lit(Step)

  /** F7 over a TIMESTAMP column → clamped BIGINT month index. */
  def timeIdxCol(ts: Column): Column =
    least(greatest((year(ts) - BaseYear) * 12 + month(ts) - 1, lit(0)),
          lit(TimeSteps - 1)).cast("bigint")

  /** Month-of-cycle index (unclamped month arithmetic mod 72). */
  def monthIdxCol(ts: Column): Column =
    (((year(ts) - BaseYear) * 12 + month(ts) - 1) % TimeSteps).cast("bigint")
}
