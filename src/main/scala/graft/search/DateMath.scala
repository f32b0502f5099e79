package graft.search

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Solr's date-math expression language
  * [B solr/core/src/java/org/apache/solr/util/DateMathParser.java]: a
  * timestamp anchor (`NOW` or an ISO-8601 instant) followed by any
  * sequence of rounding (`/UNIT`, floor to the unit) and arithmetic
  * (`+N UNITS` / `-N UNITS`) steps, evaluated LEFT TO RIGHT — so
  * `NOW/DAY-7DAYS` rounds first and `NOW-7DAYS/DAY` subtracts first,
  * exactly the reference's sequencing. `NOW` is injected by the caller
  * (Solr's `ModifiableSolrParams NOW=` role) so evaluation is a pure
  * function — what makes a date-math range filter deterministic and
  * oracle-able, and what Solr itself does to keep distributed shards
  * consistent: the coordinator pins NOW and forwards it.
  *
  * Units are UTC-calendar, matching the reference's default TimeZone=UTC
  * Calendar arithmetic (DST-less, so MONTH/YEAR carry calendar semantics
  * while DAY and below are fixed-width).
  */
object DateMath {

  /** The EXACT alias set of the reference's CALENDAR_UNITS map — notably
    * `DATE` has no plural form (`NOW+1DATES` must be rejected), while
    * every other unit admits one. Enumerated rather than mechanically
    * pluralized so the grammar is not a silent superset (ADVICE r4).
    */
  private val Units: Map[String, ChronoUnit] = Map(
    "YEAR" -> ChronoUnit.YEARS, "YEARS" -> ChronoUnit.YEARS,
    "MONTH" -> ChronoUnit.MONTHS, "MONTHS" -> ChronoUnit.MONTHS,
    "DAY" -> ChronoUnit.DAYS, "DAYS" -> ChronoUnit.DAYS,
    "DATE" -> ChronoUnit.DAYS,
    "HOUR" -> ChronoUnit.HOURS, "HOURS" -> ChronoUnit.HOURS,
    "MINUTE" -> ChronoUnit.MINUTES, "MINUTES" -> ChronoUnit.MINUTES,
    "SECOND" -> ChronoUnit.SECONDS, "SECONDS" -> ChronoUnit.SECONDS,
    "MILLI" -> ChronoUnit.MILLIS, "MILLIS" -> ChronoUnit.MILLIS,
    "MILLISECOND" -> ChronoUnit.MILLIS,
    "MILLISECONDS" -> ChronoUnit.MILLIS)

  final case class DateMathError(msg: String)
    extends IllegalArgumentException(msg)

  /** Evaluate a full date string: either a bare math expression anchored
    * at `now` (must start with NOW) or an ISO instant literal optionally
    * followed by math (Solr's `2024-01-01T00:00:00Z+1DAY` form).
    */
  def parse(expr: String, now: Instant): Instant = {
    val s = expr.trim
    if (s.startsWith("NOW")) evalMath(s.drop(3), now)
    else {
      // ISO literal up to the first math operator that can't be part of
      // an ISO-8601 instant: '/', or '+'/'-' AFTER the 'Z'/offset end.
      val zi = s.indexOf('Z')
      if (zi < 0)
        throw DateMathError(s"date literal must be UTC 'Z'-terminated: $s")
      val (lit, math) = s.splitAt(zi + 1)
      val base =
        try Instant.parse(lit)
        catch { case e: java.time.format.DateTimeParseException =>
          throw DateMathError(s"bad date literal '$lit': ${e.getMessage}") }
      evalMath(math, base)
    }
  }

  /** Evaluate just the math tail ("/DAY-7DAYS+3HOURS") against a base. */
  def evalMath(math: String, base: Instant): Instant = {
    var zdt = ZonedDateTime.ofInstant(base, ZoneOffset.UTC)
    var i = 0
    val n = math.length
    while (i < n) {
      math.charAt(i) match {
        case '/' =>
          val (unit, next) = readUnit(math, i + 1)
          zdt = truncate(zdt, unit)
          i = next
        case op @ ('+' | '-') =>
          var j = i + 1
          while (j < n && math.charAt(j).isDigit) j += 1
          if (j == i + 1)
            throw DateMathError(s"expected digits after '$op' at $i: $math")
          val amt = math.substring(i + 1, j).toLong
          val (unit, next) = readUnit(math, j)
          zdt = zdt.plus(if (op == '+') amt else -amt, unit)
          i = next
        case c =>
          throw DateMathError(s"unexpected '$c' at $i in date math: $math")
      }
    }
    zdt.toInstant
  }

  private def readUnit(s: String, from: Int): (ChronoUnit, Int) = {
    var j = from
    while (j < s.length && s.charAt(j).isLetter) j += 1
    val name = s.substring(from, j)
    Units.get(name) match {
      case Some(u) => (u, j)
      case None => throw DateMathError(s"unknown date-math unit '$name'")
    }
  }

  /** Floor to the unit — the reference's Calendar.clear() cascade. */
  private def truncate(z: ZonedDateTime, u: ChronoUnit): ZonedDateTime =
    u match {
      case ChronoUnit.YEARS => z.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
      case ChronoUnit.MONTHS => z.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
      case other => z.truncatedTo(other)
    }
}
