package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{Cosine, LshAnn}

/** Embedding-cosine near-duplicate pairs at scale (LLM-pipeline brief):
  * random-hyperplane LSH buckets generate candidate pairs, exact cosine
  * verifies them. The all-pairs product never materializes — candidate
  * volume scales with bucket collisions (tunable via bits/tables), and
  * the exact check runs only on candidates.
  *
  * Approximate by construction: a true pair hashed apart in every
  * table is missed; recall rises with `numTables` (measured in
  * DedupSpec against the exact pair set).
  */
object CosineDedup {

  def pairs(
      embeddings: DataFrame, // (id, vec array<double>)
      minCosine: Double,
      numTables: Int = 16,
      bitsPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val b = LshAnn.withBuckets(embeddings, "vec", numTables, bitsPerTable, dim)
    val long = b.select(
      col("id"), col("vec"),
      explode(array((0 until numTables).map(t =>
        struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    long.as("a")
      .join(long.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"), col("a.vec").as("va"), col("b.vec").as("vb"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), round(Cosine.sim(col("va"), col("vb")), 4).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
