package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Date scalar functions F1/F2/F9 (SURVEY.md §2.4).
 *
 * The reference's `extractYr` formats with pattern "YYYY" — Java *week-year*
 * — so Dec 28-31 can report year+1 (reference: common/dateFormatter.scala:16-19,
 * a latent bug). Default here is the correct `year()`; `weekYear` is kept
 * bug-compatible and pinned by a test (SURVEY.md §7.4 item 4).
 */
object Dates {

  /** F1: "yyyy-MM-dd" string → DATE (reference: common/dateFormatter.scala:11-14). */
  def toDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** F2, corrected semantics: calendar year. */
  def extractYear(c: Column): Column = year(toDate(c))

  /**
   * F2, bug-compatible semantics: `SimpleDateFormat("YYYY")` week-year
   * under the default (US-style) calendar — weeks run Sunday-Saturday and
   * week 1 is the week containing Jan 1, so Dec 26-31 dates falling in the
   * week that spans New Year report year+1. Spark ≥3 refuses the 'Y'
   * pattern outright, so this is computed arithmetically: the week-year is
   * the calendar year of the Saturday that ends the date's week
   * (dayofweek: 1=Sunday … 7=Saturday).
   */
  def weekYear(c: Column): Column = {
    val d = toDate(c)
    year(date_add(d, lit(7) - dayofweek(d)))
  }
}
