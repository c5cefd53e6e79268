package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's declarative "merge processor"
  * (`lib/src/context/session.rs:550-656`): a pre-query step that
  * merges registered tables either column-wise (equi-join) or
  * row-wise (union).
  *
  * Column direction (`session.rs:566-631`): base INNER JOIN target on
  * baseKeys = targetKeys; colliding target columns are aliased to
  * `{table}_{col}`; the target's join keys are dropped from the
  * output; the result replaces the base table.
  *
  * Row direction (`session.rs:632-643`): UNION ALL (or UNION
  * DISTINCT) by position — the reference requires equal schemas
  * (DataFusion `union`), so we use `union`, not `unionByName`.
  */
object MergeProcessor {

  /** One column-direction merge target. */
  final case class ColumnTarget(
      table: String, df: DataFrame,
      baseKeys: Seq[String], targetKeys: Seq[String])

  def mergeColumns(base: DataFrame, targets: Seq[ColumnTarget]): DataFrame =
    targets.foldLeft(base) { (acc, t) =>
      require(t.baseKeys.length == t.targetKeys.length,
        s"baseKeys/targetKeys arity mismatch for ${t.table}")
      val accCols = acc.columns.toSet
      // alias colliding non-key target columns to {table}_{col}
      // (reference: session.rs:609-616)
      val renamed = t.df.columns.foldLeft(t.df) { (d, c) =>
        if (!t.targetKeys.contains(c) && accCols.contains(c))
          d.withColumnRenamed(c, s"${t.table}_$c")
        else d
      }
      val cond = t.baseKeys.zip(t.targetKeys)
        .map { case (bk, tk) => acc(bk) === renamed(tk) }
        .reduce(_ && _)
      val joined = acc.join(renamed, cond, "inner")
      // drop the target's key columns (reference: session.rs:617-628)
      val keep = acc.columns.map(acc(_)) ++
        renamed.columns.filterNot(t.targetKeys.contains).map(renamed(_))
      joined.select(keep.toSeq: _*)
    }

  def mergeRows(base: DataFrame, targets: Seq[DataFrame], distinct: Boolean): DataFrame = {
    val unioned = targets.foldLeft(base)(_ union _)
    if (distinct) unioned.distinct() else unioned
  }
}
