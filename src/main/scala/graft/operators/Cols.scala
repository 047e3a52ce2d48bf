package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Shared column-name hygiene for operators that splice caller-supplied
  * names via `col(name)`: an unquoted name parses dots as nested-field
  * paths, so a column literally named `a.b` resolves wrong (the bug fixed
  * in `Cleaning.fillMedian` and `Temporal.asofJoin`). Every raw-name
  * splice in the operator layer goes through [[Cols.qcol]].
  */
private[graft] object Cols {

  /** Backtick-quoted reference to the column literally named `n`. */
  def qcol(n: String): Column = col("`" + n.replace("`", "``") + "`")
}
