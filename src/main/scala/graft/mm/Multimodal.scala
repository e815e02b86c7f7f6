package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (LLM-pipeline brief): media payloads are
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The container has no image/audio codecs, so [[stubDecode]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing — binary
  * schema, batched per-partition processing, typed output — is real and
  * is what a codec would plug into.
  */
object Multimodal {

  /** Wrap a text column as a binary payload with extracted metadata
    * (byte length + leading-bytes "magic" hex), the shape a real
    * media-ingest table would have.
    */
  def asBinary(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        // length() on a binary column counts bytes (octet_length is
        // SQL-only, absent from the Scala functions API)
        length(encode(col(payloadCol), "UTF-8")).as("n_bytes"),
        substring(hex(encode(col(payloadCol), "UTF-8")), 1, 8).as("magic")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB decoder — stands in for image/audio decode + feature
    * extraction (the real codec libraries are absent in this
    * container). Deterministic fake: 8 "features" from the leading
    * payload bytes. Runs via `mapPartitions` over batches, which is the
    * exact call shape a vectorized decode (e.g. Pandas-UDF-style) slots
    * into.
    */
  def stubDecode(binaryDocs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    binaryDocs.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = (0 until 8).map { i =>
            if (i < bytes.length) bytes(i).toFloat / 255f else 0f
          }.toArray
          Row(id, bytes.length, feats)
        }
      }(enc).toDF("doc_id", "n_bytes", "features")
  }
}
