package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2-H): treat media as opaque
  * `binary` columns with a typed metadata struct, and run batched
  * per-partition feature extraction.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment); everything around it — schema, binary
  * column handling, partition-batched extraction via mapPartitions, the
  * downstream aggregation — is the real plumbing a decode UDF would plug
  * into. At scale the extraction is embarrassingly parallel and
  * partition-local; batch size is the rows-per-partition, controlled by
  * `spark.sql.files.maxPartitionBytes` at read time. */
object Multimodal {

  /** Ingest documents as (binary payload, typed metadata). The `text`
    * column stands in for raw media bytes. */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source"),
      col("text").cast("binary").as("blob"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("format"),
        col("lang").as("lang_hint")).as("meta"))

  /** Per-source byte rollup over the ingested binary column. */
  def byteStats(ingested: DataFrame): DataFrame =
    ingested.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))

  final case class MediaFeature(doc_id: Long, source: String,
      f0: Double, f1: Double, f2: Double, f3: Double)

  /** STUB decode: a real implementation would decode the blob (image
    * resize, audio resample, frame sample) here; this deterministic fake
    * derives 4 "features" from the first 16 payload bytes so the
    * plumbing, batching and determinism are testable end-to-end. */
  private def stubDecode(blob: Array[Byte]): Array[Double] = {
    val f = new Array[Double](4)
    var i = 0
    while (i < 16 && i < blob.length) {
      f(i % 4) += (blob(i) & 0xff) / 255.0
      i += 1
    }
    f
  }

  /** Batched per-partition feature extraction over the binary column. */
  def extractFeatures(ingested: DataFrame): Dataset[MediaFeature] = {
    val spark = ingested.sparkSession
    import spark.implicits._
    ingested.select("doc_id", "source", "blob").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, blob) =>
          val f = stubDecode(blob)
          MediaFeature(id, src, f(0), f(1), f(2), f(3))
        }
      }
  }

  /** Per-source mean of extracted features. */
  def featureStats(ingested: DataFrame): DataFrame =
    extractFeatures(ingested).toDF()
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("f0")), 4).as("avg_f0"),
        round(avg(col("f1")), 4).as("avg_f1"),
        round(avg(col("f2")), 4).as("avg_f2"),
        round(avg(col("f3")), 4).as("avg_f3"))
}
