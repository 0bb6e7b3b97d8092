package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.plans.EncodePipeline

/** Streaming ingestion for the encode pipeline: new files landing in a
  * directory are encoded micro-batch by micro-batch into the same
  * data + metadata layout as the batch pipeline.
  *
  * The reference is batch-only (no runtime at all); this is the engine's
  * continuous-ingestion surface. Exactly-once story: the streaming
  * checkpoint provides at-least-once batch replay, and the sink write is
  * the pipeline's idempotent dynamic-partition overwrite + metadata commit,
  * so replays of a failed micro-batch converge (same `__part` → same files).
  */
object StreamingEncode {

  /** start encoding `inDir` (parquet files with `schema`) into `outDir`. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            schema: org.apache.spark.sql.types.StructType, key: String,
            partitions: Int, blockSize: Int = 4096,
            checkpoint: Option[String] = None): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(inDir)
      .writeStream
      .queryName("graft-streaming-encode")
      .option("checkpointLocation", checkpoint.getOrElse(s"$outDir/_checkpoint"))
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // per-batch directories + overwrite ⇒ a replayed micro-batch
          // rewrites exactly its own files (idempotent), never siblings'
          val enc = EncodePipeline.encode(batch, key, partitions, blockSize)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          enc.write.mode("overwrite").parquet(s"$outDir/data/batch=$batchId")
          EncodePipeline.metadata(enc, schema)
            .withColumn("wave", org.apache.spark.sql.functions.lit(batchId.toInt))
            .withColumn("wall_millis", org.apache.spark.sql.functions.lit(0L))
            .withColumn("attempt", org.apache.spark.sql.functions.lit(1))
            .write.mode("overwrite").parquet(s"$outDir/meta/batch=$batchId")
          enc.unpersist()
        }
        ()
      }
      .start()
  }
}
