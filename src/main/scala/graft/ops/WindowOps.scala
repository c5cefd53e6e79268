package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame helpers for frame modes Spark ≤ 4.1 does not ship.
  *
  * GROUPS frames (SQL:2011; DataFusion supports them, SURVEY §2.B
  * "Window functions" divergence) count peer groups instead of rows
  * or order-value ranges. They reduce exactly to a RANGE frame over
  * `dense_rank()`: dense_rank is constant within a peer group and
  * increments by 1 per group, so
  * `GROUPS BETWEEN a PRECEDING AND b FOLLOWING` over ORDER BY o ≡
  * `RANGE BETWEEN a PRECEDING AND b FOLLOWING` over ORDER BY
  * dense_rank() — same partitioning, one extra narrow column, no
  * extra shuffle (both windows hash-partition on the same keys, so
  * the second window reuses the first's exchange).
  */
object WindowOps {

  /** Append `outCol` = `agg` evaluated over a GROUPS-mode frame
    * `GROUPS BETWEEN precede PRECEDING AND follow FOLLOWING`
    * (partitioned by `partitionBy`, peer groups defined by
    * `orderBy`). `agg` is the bare aggregate column, e.g.
    * `sum(col("x"))`.
    */
  def groupsBetween(
      df: DataFrame,
      partitionBy: Seq[Column], orderBy: Seq[Column],
      agg: Column, precede: Int, follow: Int,
      outCol: String): DataFrame = {
    val peers = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val frame = Window.partitionBy(partitionBy: _*).orderBy(col("__graft_dr"))
      .rangeBetween(-precede.toLong, follow.toLong)
    df.withColumn("__graft_dr", dense_rank().over(peers))
      .withColumn(outCol, agg.over(frame))
      .drop("__graft_dr")
  }
}
