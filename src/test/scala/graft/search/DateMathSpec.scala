package graft.search

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Pins the date-math grammar on the Solr reference guide's own examples
  * [B solr/core/src/java/org/apache/solr/util/DateMathParser.java;
  * solr/solr-ref-guide/src/working-with-dates.adoc].
  */
class DateMathSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-01-29T13:45:30.123Z")
  private def p(e: String) = DateMath.parse(e, now).toString

  test("NOW is the pinned anchor") {
    assert(p("NOW") == "2024-01-29T13:45:30.123Z")
  }

  test("rounding floors to the unit (Calendar.clear cascade)") {
    assert(p("NOW/HOUR") == "2024-01-29T13:00:00Z")
    assert(p("NOW/DAY") == "2024-01-29T00:00:00Z")
    assert(p("NOW/MONTH") == "2024-01-01T00:00:00Z")
    assert(p("NOW/YEAR") == "2024-01-01T00:00:00Z")
    assert(p("NOW/MINUTE") == "2024-01-29T13:45:00Z")
    assert(p("NOW/SECOND") == "2024-01-29T13:45:30Z")
  }

  test("arithmetic, singular and plural units") {
    assert(p("NOW+2MONTHS") == "2024-03-29T13:45:30.123Z")
    assert(p("NOW-1DAY") == "2024-01-28T13:45:30.123Z")
    assert(p("NOW+30MINUTES") == "2024-01-29T14:15:30.123Z")
    assert(p("NOW+1MILLI") == "2024-01-29T13:45:30.124Z")
  }

  test("sequencing is strictly left to right (ref-guide example pair)") {
    // round-then-subtract vs subtract-then-round differ
    assert(p("NOW/DAY-7DAYS") == "2024-01-22T00:00:00Z")
    assert(p("NOW-7DAYS/DAY") == "2024-01-22T00:00:00Z")
    assert(p("NOW/MONTH+1DAY") == "2024-01-02T00:00:00Z")
    assert(p("NOW+1DAY/MONTH") == "2024-01-01T00:00:00Z")
    // the ref guide's compound: 6 months and 3 days in the future,
    // rounded to midnight
    assert(p("NOW+6MONTHS+3DAYS/DAY") == "2024-08-01T00:00:00Z")
  }

  test("calendar-aware month arithmetic (leap year)") {
    assert(p("NOW+1MONTH") == "2024-02-29T13:45:30.123Z") // clamped to Feb 29
    assert(p("NOW/MONTH+1MONTH") == "2024-02-01T00:00:00Z")
  }

  test("explicit ISO literal anchor with math tail") {
    assert(p("2000-01-01T00:00:00Z+1YEAR/YEAR") == "2001-01-01T00:00:00Z")
    assert(p("2024-06-15T10:20:30Z/DAY") == "2024-06-15T00:00:00Z")
  }

  test("errors are loud: bad unit, bad op, bad literal") {
    intercept[DateMath.DateMathError](DateMath.parse("NOW/FORTNIGHT", now))
    intercept[DateMath.DateMathError](DateMath.parse("NOW*2DAYS", now))
    intercept[DateMath.DateMathError](DateMath.parse("NOW+DAYS", now))
    intercept[DateMath.DateMathError](DateMath.parse("2024-01-01+1DAY", now))
    // DATE is the one reference unit with no plural alias — NOW+1DATES
    // must be rejected (the map is enumerated, not mechanically +"S")
    intercept[DateMath.DateMathError](DateMath.parse("NOW+1DATES", now))
    assert(p("NOW+1DATE") == p("NOW+1DAY"))
    assert(p("NOW+1MILLIS") == p("NOW+1MILLISECONDS"))
  }
}
