package graft.mm

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched embedding "inference" stage — the `mapPartitions` plumbing
  * of a model-inference step in a Spark pipeline. Real embedding
  * models run one forward pass per fixed-size batch; the
  * production-critical parts are everything AROUND the model: batch
  * assembly inside the partition iterator (no per-row dispatch),
  * output schema (`array<double>` embedding column feeding the
  * ANN/dedup family), and determinism. Like [[Multimodal]]'s decoder,
  * the model itself is swapped for a deterministic stand-in (no model
  * weights in this container): dimension `d` of a text embeds as
  * MD5-derived hash math, which — MD5 being bit-identical across
  * engines — makes the whole stage exactly recomputable by the DuckDB
  * oracle, turning the usual "plumbing-only" stub into a full
  * value-checked operator.
  *
  * `v_d = (md5_60bit(text ‖ ":" ‖ d) mod 2001) / 1000 − 1 ∈ [−1, 1]`
  * where `md5_60bit` is the top 15 hex digits of standard MD5 — the
  * same cross-engine construction as [[graft.text.TextStats]]'s
  * fingerprint and [[graft.data.Sampling]]'s hash buckets.
  *
  * Scale shape: embarrassingly parallel, one pass, zero shuffles; at
  * 100 TB the batch size is tuned to the accelerator and the operator
  * shape is unchanged. Composes directly with
  * [[graft.dedup.SemDedup]] / [[graft.sim.Knn]] (spec-tested).
  */
object Embedder {

  val DefaultBatchSize = 64

  /** `(idCol, embedding array<double>[dim])` — one batched pass. */
  def embed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 8,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    require(dim >= 1 && batchSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch =>
          // one "forward pass" per fixed-size batch: a real model
          // replaces THIS expression; batching, iteration, and schema
          // stay exactly as they are
          batch.map { case (id, text) =>
            (id, Array.tabulate(dim)(d => fakeDim(md, text, d)))
          }
        }
      }
      .toDF(idCol, "embedding")
  }

  /** The deterministic stand-in "model": cross-engine MD5 hash math. */
  private def fakeDim(md: java.security.MessageDigest, text: String, d: Int): Double = {
    md.reset()
    val hex = md.digest((text + ":" + d).getBytes(UTF_8))
      .take(8) // 15 hex digits = 7.5 bytes; take 8 and trim below
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2001L) / 1000.0 - 1.0
  }
}
