package graft.functions

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** US equity trading calendar — behavioral port of the reference's
  * `is_market_open` (reference `src/calendar/us_equity.rs:28-122`):
  * weekends; New Year's shifted FORWARD to Monday if on a weekend;
  * MLK (3rd Mon Jan); Washington (3rd Mon Feb); Good Friday (Easter − 2d,
  * anonymous Gregorian computus `us_equity.rs:7-24`); Memorial Day (last
  * Mon May); July 4 (Sat→Fri, Sun→Mon); Labor Day (1st Mon Sep);
  * Thanksgiving (4th Thu Nov); Christmas (Sat→Fri, Sun→Mon); and the five
  * one-off closures (Reagan 2004-06-11, Ford 2007-01-02, Sandy
  * 2012-10-29/30, Bush 2018-12-05, `us_equity.rs:103-115`).
  *
  * Pure JVM function + a scalar UDF. The UDF is driver-registered and
  * deterministic; it sits on dimension-sized inputs (distinct dates), so
  * being outside codegen is irrelevant at scale.
  */
object Calendar {

  /** Anonymous Gregorian Easter computus (same algorithm family as the
    * reference; validated against its golden dates in CalendarSpec). */
  def easter(year: Int): LocalDate = {
    val aa = year % 19; val bb = year / 100; val cc = year % 100
    val dd = bb / 4; val ee = bb % 4; val ff = (bb + 8) / 25
    val gg = (bb - ff + 1) / 3
    val hh = (19 * aa + bb - dd - gg + 15) % 30
    val ii = cc / 4; val kk = cc % 4
    val ll = (32 + 2 * ee + 2 * ii - hh - kk) % 7
    val mm = (aa + 11 * hh + 22 * ll) / 451
    val month = (hh + ll - 7 * mm + 114) / 31
    val day = (hh + ll - 7 * mm + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  def isWeekend(d: LocalDate): Boolean =
    d.getDayOfWeek == DayOfWeek.SATURDAY || d.getDayOfWeek == DayOfWeek.SUNDAY

  private def nthWeekdayOfMonth(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    var d = LocalDate.of(year, month, 1)
    while (d.getDayOfWeek != dow) d = d.plusDays(1)
    d.plusWeeks(n - 1)
  }

  private val oneOffClosures: Set[LocalDate] = Set(
    LocalDate.of(2004, 6, 11), LocalDate.of(2007, 1, 2),
    LocalDate.of(2012, 10, 29), LocalDate.of(2012, 10, 30),
    LocalDate.of(2018, 12, 5))

  def isMarketOpen(date: LocalDate): Boolean = {
    val year = date.getYear
    if (isWeekend(date)) return false

    var newYear = LocalDate.of(year, 1, 1)
    while (isWeekend(newYear)) newYear = newYear.plusDays(1)
    if (date == newYear) return false

    if (date == nthWeekdayOfMonth(year, 1, DayOfWeek.MONDAY, 3)) return false
    if (date == nthWeekdayOfMonth(year, 2, DayOfWeek.MONDAY, 3)) return false
    if (date == easter(year).minusDays(2)) return false

    var memorial = LocalDate.of(year, 5, 31)
    while (memorial.getDayOfWeek != DayOfWeek.MONDAY) memorial = memorial.minusDays(1)
    if (date == memorial) return false

    var july4 = LocalDate.of(year, 7, 4)
    if (july4.getDayOfWeek == DayOfWeek.SATURDAY) july4 = july4.minusDays(1)
    else if (july4.getDayOfWeek == DayOfWeek.SUNDAY) july4 = july4.plusDays(1)
    if (date == july4) return false

    if (date == nthWeekdayOfMonth(year, 9, DayOfWeek.MONDAY, 1)) return false
    if (date == nthWeekdayOfMonth(year, 11, DayOfWeek.THURSDAY, 4)) return false

    var christmas = LocalDate.of(year, 12, 25)
    if (christmas.getDayOfWeek == DayOfWeek.SATURDAY) christmas = christmas.minusDays(1)
    else if (christmas.getDayOfWeek == DayOfWeek.SUNDAY) christmas = christmas.plusDays(1)
    if (date == christmas) return false

    !oneOffClosures.contains(date)
  }

  val isMarketOpenUdf: UserDefinedFunction =
    udf((d: java.sql.Date) => if (d == null) null.asInstanceOf[java.lang.Boolean]
        else java.lang.Boolean.valueOf(isMarketOpen(d.toLocalDate)))

  def isMarketOpenCol(c: Column): Column = isMarketOpenUdf(c)

  def register(spark: SparkSession): Unit =
    spark.udf.register("is_market_open", isMarketOpenUdf)
}
