package graft.compile

import org.apache.spark.sql.DataFrame

import graft.accounting._
import graft.budget._
import graft.constraints.Constraint
import graft.ir.CatalogSchemas
import graft.types.TableSchema

/** How far apart neighboring inputs of a table can be, in the table's own
  * metric (reference: core metrics produced by
  * _neighboring_relation_visitor.py:90-177).
  */
sealed trait Metric extends Serializable {
  def distance: Rat
}
/** Symmetric difference on rows: neighboring tables differ by `distance` rows. */
final case class RowsMetric(distance: Rat) extends Metric
/** AddRemoveKeys: neighboring tables differ by all rows of `distance` IDs. */
final case class IDsMetric(idColumn: String, idSpace: String, distance: Rat)
    extends Metric

object Metric {
  /** ProtectedChange -> metric + d_in, given the budget kind (zCDP gets the
    * L2 sqrt credit for AddMaxRowsInMaxGroups, reference
    * _neighboring_relation_visitor.py:118-140).
    */
  def fromProtectedChange(pc: ProtectedChange, budget: PrivacyBudget): Metric =
    pc match {
      case AddMaxRows(n) => RowsMetric(Rat(n))
      case AddMaxRowsInMaxGroups(_, groups, perGroup) =>
        budget match {
          case _: RhoZCDPBudget =>
            // L2 distance perGroup * sqrt(groups); rationals cannot hold the
            // sqrt exactly, so round the *squared* budget math instead: we
            // store ceil(perGroup * sqrt(groups)) as a safe upper bound.
            val d = math.ceil(perGroup * math.sqrt(groups.toDouble)).toLong
            RowsMetric(Rat(d))
          case _ => RowsMetric(Rat(groups.toLong * perGroup))
        }
      case AddRowsWithID(idCol, idSpace, maxIDs) =>
        IDsMetric(idCol, idSpace, Rat(maxIDs))
    }
}

/** A private table as the compiler sees it: data + schema + unit of
  * protection + constraints established so far (reference: Catalog +
  * accountant state, _catalog.py:17-129).
  *
  * `viewStability` is the accumulated row-stability of the transformation
  * that produced a view (1 for base tables): d_in(view) = d_in(base) *
  * viewStability under a rows metric.
  */
final case class PrivateTable(
    df: DataFrame,
    schema: TableSchema,
    protectedChange: ProtectedChange,
    constraints: Seq[Constraint] = Nil,
    viewStability: Rat = Rat.one)

final case class Catalog(
    privateTables: Map[String, PrivateTable],
    publicTables: Map[String, DataFrame]) {

  lazy val schemas: CatalogSchemas = CatalogSchemas(
    privateTables.map { case (n, t) => n -> t.schema },
    publicTables.map { case (n, df) => n -> TableSchema.fromSpark(df.schema) })
}
