package graft.accounting

/** Unit-of-protection declarations for private tables (reference:
  * src/tmlt/analytics/protected_change.py). The protected change determines
  * the neighboring-dataset relation and the input distance d_in.
  */
sealed trait ProtectedChange extends Serializable

/** Neighboring datasets differ by up to `maxRows` added/removed rows
  * (reference protected_change.py:24).
  */
final case class AddMaxRows(maxRows: Int) extends ProtectedChange {
  require(maxRows > 0)
}

/** Shorthand for AddMaxRows(1) (reference protected_change.py:43). */
object AddOneRow {
  def apply(): AddMaxRows = AddMaxRows(1)
}

/** Differ by up to `maxRowsPerGroup` rows in each of up to `maxGroups` groups
  * of `groupingColumn` (reference protected_change.py:57). Under zCDP the
  * total distance is maxRowsPerGroup * sqrt(maxGroups) (L2 credit, reference
  * _neighboring_relation_visitor.py:118-140); under PureDP/ApproxDP it is
  * maxRowsPerGroup * maxGroups.
  */
final case class AddMaxRowsInMaxGroups(
    groupingColumn: String,
    maxGroups: Int,
    maxRowsPerGroup: Int) extends ProtectedChange {
  require(maxGroups > 0 && maxRowsPerGroup > 0)
}

/** Differ by adding/removing all rows of up to `maxIDs` privacy IDs
  * (reference protected_change.py:106). Tables sharing `idSpace` are
  * protected jointly.
  */
final case class AddRowsWithID(
    idColumn: String,
    idSpace: String = "default_id_space",
    maxIDs: Int = 1) extends ProtectedChange {
  require(maxIDs > 0)
}
