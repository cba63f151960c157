package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k (ranking window). The window partitions by group
  * — fully parallel; each partition keeps a k-row heap during the sort, so
  * the shuffle carries groups, not the global sort.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
