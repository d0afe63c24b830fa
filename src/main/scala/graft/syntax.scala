package graft

import org.apache.spark.sql.ColumnName

/** Session-free `$"col"` interpolator (the `spark.implicits._` one is bound
  * to a session instance; query builders here take the session as an
  * argument, so a standalone interpolator keeps them pure functions).
  */
object syntax {
  implicit class ColStringContext(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
