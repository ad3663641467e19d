package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator so query definitions can live in
  * plain objects (spark.implicits._ needs a SparkSession instance; column
  * references don't).
  */
package object ops {
  implicit class ColumnInterpolator(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
