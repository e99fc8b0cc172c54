package graft.core

/** Pure coordinate/date bijections of the reference's grid addressing
  * scheme (SURVEY.md §2.8 F4–F9, §2.2 P8; reference `config.py:24–195`).
  *
  * This is metadata math, not data processing: lat/lon/date → grid index
  * and back. The reference grid: lat 10..55 step 0.25 (91 cells, index 0
  * at 55.0 descending), lon −85..−70 step 0.25 (61 cells ascending), time
  * 72 monthly steps 1955-01 → 1960-12.
  *
  * Rounding note: the reference uses Python `round` (banker's rounding,
  * half-to-even); we replicate with `math.rint`. The SQL-checked carrier
  * query (SparkEntry `q20_grid_cells`) instead uses `floor(x+0.5)` on
  * both engines, which is deterministic cross-engine; grid cell centers
  * are x.0/x.25/x.5/x.75 so halves only arise at cell midpoints.
  */
object Grid {
  val LatMax = 55.0; val LatMin = 10.0
  val LonMin = -85.0; val LonMax = -70.0
  val Step = 0.25
  val LatCells = 91; val LonCells = 61
  val TimeSteps = 72 // 1955-01 .. 1960-12
  val BaseYear = 1955

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

  /** P8: pre-query validation (reference `config.py:154-195`). */
  def validateCoords(lat: Double, lon: Double): Either[String, Unit] =
    if (lat < LatMin || lat > LatMax) Left(s"latitude $lat outside [$LatMin, $LatMax]")
    else if (lon < LonMin || lon > LonMax) Left(s"longitude $lon outside [$LonMin, $LonMax]")
    else Right(())

  def validateDates(start: String, end: String): Either[String, Unit] = {
    def parse(s: String) =
      try Right(java.time.LocalDate.parse(s.take(10)))
      catch { case _: Exception => Left(s"unparseable date: $s") }
    for {
      s <- parse(start)
      e <- parse(end)
      _ <- if (s.isAfter(e)) Left(s"start $start after end $end") else Right(())
      _ <- {
        val months = (e.getYear - s.getYear) * 12 + (e.getMonthValue - s.getMonthValue) + 1
        if (months > TimeSteps) Left(s"range $months months exceeds $TimeSteps") else Right(())
      }
    } yield ()
  }

  /** A9: pre-execution cardinality estimate (expected points). */
  def expectedPoints(start: String, end: String): Int =
    dateToIndex(end) - dateToIndex(start) + 1
}
