package graft.functions

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, Year}
import java.time.format.DateTimeFormatter

/** Input-union datetime parsing (SURVEY.md §2.2 P7 / §2.8 F1; reference:
  * utility_functions.py:31-50): accepts ISO strings (date or datetime),
  * epoch-style `java.sql.Timestamp`, and int years — int years are
  * validated to 1950..current like the reference.
  */
object TimeParse {

  private val formats = Seq(
    DateTimeFormatter.ISO_LOCAL_DATE_TIME,
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"))

  def parse(v: Any): Timestamp = v match {
    case t: Timestamp => t
    case y: Int =>
      val now = Year.now.getValue
      require(y >= 1950 && y <= now, s"int-year must be in 1950..$now, got $y")
      Timestamp.valueOf(LocalDate.of(y, 1, 1).atStartOfDay)
    case s: String =>
      val trimmed = s.trim
      val asDateTime = formats.view.flatMap { f =>
        try Some(LocalDateTime.parse(trimmed, f)) catch { case _: Exception => None }
      }.headOption
      val dt = asDateTime.getOrElse {
        try LocalDate.parse(trimmed).atStartOfDay
        catch { case _: Exception =>
          throw new IllegalArgumentException(s"unparseable datetime: '$s'")
        }
      }
      Timestamp.valueOf(dt)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported datetime input: ${other.getClass.getSimpleName}")
  }
}
