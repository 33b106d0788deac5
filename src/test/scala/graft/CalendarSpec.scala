package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Calendar

/** Golden dates from the reference's own tests
  * (/root/reference/src/calendar/us_equity.rs:132-177) + properties. */
class CalendarSpec extends AnyFunSuite {

  test("easter computus matches reference golden (2004-04-11)") {
    assert(Calendar.easter(2004) == LocalDate.of(2004, 4, 11))
  }

  test("good friday 2004-04-09 closed") {
    assert(!Calendar.isMarketOpen(LocalDate.of(2004, 4, 9)))
  }

  test("reference golden holidays closed") {
    val closed = Seq(
      LocalDate.of(2004, 1, 19),  // MLK
      LocalDate.of(2004, 2, 16),  // Washington
      LocalDate.of(2004, 9, 6),   // Labor
      LocalDate.of(2004, 11, 25), // Thanksgiving
      LocalDate.of(2004, 12, 25), // Christmas (Saturday)
      LocalDate.of(2004, 12, 24), // Christmas observed (Sat -> Fri)
      LocalDate.of(2004, 6, 11),  // Reagan
      LocalDate.of(2007, 1, 2),   // Ford
      LocalDate.of(2012, 10, 29), LocalDate.of(2012, 10, 30), // Sandy
      LocalDate.of(2018, 12, 5))  // Bush
    closed.foreach(d => assert(!Calendar.isMarketOpen(d), d.toString))
  }

  test("regular weekdays open") {
    Seq(LocalDate.of(2004, 6, 14), LocalDate.of(2018, 12, 6),
        LocalDate.of(2024, 3, 6)).foreach(d =>
      assert(Calendar.isMarketOpen(d), d.toString))
  }

  test("property: weekends always closed (1970-2024 exhaustive)") {
    (0L until 20000L).map(LocalDate.ofEpochDay).foreach { d =>
      if (Calendar.isWeekend(d)) assert(!Calendar.isMarketOpen(d), d.toString)
    }
  }

  test("new year's shifts forward onto Monday") {
    // 2000-01-01 was a Saturday -> observed Monday 2000-01-03 (both closed).
    assert(!Calendar.isMarketOpen(LocalDate.of(2000, 1, 3)))
    assert(Calendar.isMarketOpen(LocalDate.of(2000, 1, 4)))
  }
}
