package graft.data

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for pretraining — the concat-and-chunk shape: lay
  * every document's tokens end to end in a deterministic corpus order
  * (the [[Sampling.keyHash]] pseudo-random permutation) and cut the
  * stream into fixed-capacity context windows. Each document maps to
  * its token span: global start offset, first and last chunk index.
  *
  * The global token offset is a PREFIX SUM over a total order — the
  * classic distributed two-phase shape, never a single-partition
  * window: range-sort by (hash, key), sum tokens per partition (a tiny
  * per-partition job), turn those sums into partition offsets on the
  * driver, then stream each partition once adding its offset to a
  * running local sum. Both jobs run over the SAME sorted RDD instance,
  * so they share one range partitioner (the same guarantee
  * zipWithIndex relies on); re-sampled boundaries between separate
  * DataFrame actions would break the offsets, which is why this is an
  * RDD two-phase and not a count+join.
  */
object Packing {

  /** @param df       corpus with a unique `keyCol` and a precomputed
    *                 integer `tokenCol`
    * @param capacity tokens per context window (chunk)
    * @return df columns + `start_offset` (0-based global token
    *         position), `first_chunk`, `last_chunk` (0-based chunk
    *         indexes the document's tokens land in)
    */
  def packChunks(df: DataFrame, keyCol: String, tokenCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val sorted = df.orderBy(Sampling.keyHash(col(keyCol)), col(keyCol))
    val tokenIdx = sorted.schema.fieldIndex(tokenCol)
    def tokensOf(r: Row): Long = r.get(tokenIdx) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(s"non-numeric token count: $other")
    }
    val rdd = sorted.rdd // ONE instance: both jobs share its partitioner
    val partSums = rdd
      .mapPartitionsWithIndex((i, it) => Iterator(i -> it.map(tokensOf).sum))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(i) = tokens before partition i
    val packed = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { r =>
        val n = tokensOf(r)
        val start = cum
        cum += n
        val lastTok = if (n > 0) cum - 1 else start // empty doc: degenerate span at start
        Row.fromSeq(r.toSeq ++ Seq(start, start / capacity, lastTok / capacity))
      }
    }
    spark.createDataFrame(packed,
      sorted.schema
        .add("start_offset", LongType, nullable = false)
        .add("first_chunk", LongType, nullable = false)
        .add("last_chunk", LongType, nullable = false))
  }
}
