package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"colName"` interpolator (the SparkSession-bound
  * `spark.implicits._` version requires a session instance; query builders
  * here are pure functions of (SparkSession, dir), so we provide our own). */
object syntax {
  implicit class ColStr(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
