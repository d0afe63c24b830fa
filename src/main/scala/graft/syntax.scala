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

  /** [[Checkpoints.cut]] as a chainable method: localCheckpoint by
    * default, reliable `checkpoint` when
    * `spark.graft.iter.checkpointDir` is set (fleet fault tolerance).
    */
  implicit class DatasetCutOps[T](private val ds: org.apache.spark.sql.Dataset[T]) extends AnyVal {
    def cutLineage(eager: Boolean = true): org.apache.spark.sql.Dataset[T] =
      Checkpoints.cut(ds, eager)
  }
}
