package graft.ops

import org.apache.spark.sql.{DataFrame, Row, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Sequence packing for LLM pre-training: documents ordered by a
 * deterministic key are virtually concatenated and split into
 * `budget`-sized token chunks; each document is assigned the chunk
 * (`pack_id`) its first token lands in — the standard concat-then-chunk
 * batching scheme. Weights must be non-negative.
 *
 * Two shapes, one contract:
 *  - [[packByBudget]]: a running-sum window PER GROUP (e.g. per language) —
 *    the natural form when packing is already group-local. Parallelism is
 *    bounded by group cardinality; a single giant group funnels through one
 *    task, so for a global order use the second form.
 *  - [[packGlobal]]: two-phase distributed prefix sum (per-partition totals
 *    → driver scan of #partitions numbers → broadcast offsets), the
 *    zipWithIndex scheme of [[graft.recon.Sources.withRowIndex]] carrying a
 *    weight instead of a count. No single-partition stage at any point.
 *
 * The reference has no packing surface — LLM-pipeline extension.
 */
object Packing {

  /**
   * Group-local packing: `pack_id` = (running token count before this row)
   * div budget, running within each `groupCols` partition ordered by
   * `orderCols`. Exact integral division (`div`), never a double `floor` —
   * cumulative sums past 2^53 would lose precision in a double quotient.
   */
  def packByBudget(df: DataFrame, weightCol: String, orderCols: Seq[Column],
      budget: Long, groupCols: Seq[String], outCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn(outCol, expr(s"(__cum - $weightCol) div ${budget}L"))
      .drop("__cum")
  }

  /**
   * Globally-ordered packing with no single-partition stage:
   * range-repartition + in-partition sort by `orderCols`, per-partition
   * weight totals collected (#partitions longs — driver-side scan is O(P),
   * not O(rows)), offsets broadcast, then each partition stamps pack ids
   * from its own running sum. Requires `weightCol` to be LongType and
   * non-negative.
   */
  def packGlobal(df: DataFrame, weightCol: String, orderCols: Seq[Column],
      budget: Long, outCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be LongType (cast token counts to long first)")
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    // one materialization feeds both passes; without the cut the range
    // exchange + sort would execute twice (Catalyst re-runs per consumer)
    val rdd = graft.recon.Checkpoints.cut(sorted).rdd
    val partSums = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach { r =>
          val v = r.getLong(wIdx)
          require(v >= 0L, s"negative weight $v in $weightCol")
          s += v
        }
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = tokens before partition pid
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val stamped = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var cum = bc.value(pid)
      it.map { r =>
        val start = cum
        cum += r.getLong(wIdx)
        Row.fromSeq(r.toSeq :+ (start / budget))
      }
    }
    spark.createDataFrame(stamped, outSchema)
  }
}
