package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** The reference's `{date}` path macro for daily-rotated logs
  * (reference Manager.php:72-89: `str_replace(['{date}'], [$today],
  * $tail['path'])`).
  */
object DatePath {

  private val Fmt = DateTimeFormatter.ISO_LOCAL_DATE // 2022-02-22, as in readme.md

  def isDaily(template: String): Boolean = template.contains("{date}")

  def resolve(template: String, date: LocalDate): String =
    template.replace("{date}", date.format(Fmt))

  /** All concrete paths for an inclusive date range — batch backfill
    * over rotated files.
    */
  def range(template: String, from: LocalDate, to: LocalDate): Seq[String] =
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).map(resolve(template, _)).toSeq
}
