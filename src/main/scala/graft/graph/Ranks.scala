package graft.graph

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global ranking without a single-partition window stage.
  *
  * `row_number().over(Window.orderBy(...))` funnels the whole input
  * through ONE task — fine for k-row dictionaries, an anti-pattern for
  * edge/node-scale inputs. This helper gets the identical 0/1-based
  * dense rank from Spark's range-partitioned distributed sort plus
  * `RDD.zipWithIndex` (one extra count job to compute partition
  * offsets, no data movement beyond the sort itself).
  *
  * The rank is deterministic iff `order` is a TOTAL order (callers tie-
  * break on a unique key, as all in-repo call sites do). The result is
  * `localCheckpoint`ed: zipWithIndex ranks must be frozen before a
  * caller references the frame more than once, and the checkpoint also
  * keeps recomputation from re-running the sort job.
  */
object Ranks {

  /** All columns of `df` plus a Long `rankCol` = `base`, `base`+1, …
    * in ascending `order`. */
  def zipRank(df: DataFrame, order: Seq[Column], rankCol: String,
      base: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(order: _*)
    val schema = sorted.schema.add(StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + base)) },
      schema).localCheckpoint(true)
  }
}
