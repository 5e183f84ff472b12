package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline registered through the driver contract: binary
  * content + typed metadata derived deterministically from the `part`
  * table (32 content bytes = sha256 of the part name — the codec itself
  * is stubbed per the harness contract, the schema/partitioning/batch
  * plumbing is real), then decode→features via partition-batched
  * transform, frame-sample the "videos", and aggregate per media kind.
  * No SQL oracle (mapPartitions features aren't expressible in DuckDB)
  * → rows-only check; the decoder determinism and metadata-pruning
  * properties are unit-tested in MultimodalSpec.
  */
object MultimodalOps {

  val multimodalFeatures: Op = Op.noOracle("q_multimodal_feats") { (spark, dir) =>
    val assets = Tables.part(spark, dir).select(
      col("p_partkey").as("asset_id"),
      unhex(sha2(col("p_name"), 256)).as("content"),
      struct(
        when(col("p_partkey") % 3 === 0, "image")
          .when(col("p_partkey") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        when(col("p_partkey") % 3 === 0, "jpeg")
          .when(col("p_partkey") % 3 === 1, "wav")
          .otherwise("mp4").as("format"),
        (col("p_size") * 20 + 40).cast("int").as("width"),
        (col("p_size") * 12 + 30).cast("int").as("height"),
        (col("p_partkey") % 5000).cast("long").as("duration_ms")).as("media"))
    val feats = Multimodal.extractFeatures(Multimodal.resize(assets, 512))
    val frames = Multimodal.sampleFrames(assets, strideMs = 1000L)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_frames"))
    feats.join(frames, Seq("asset_id"))
      .groupBy(col("media.kind").as("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_frames")).as("total_frames"),
        avg(element_at(col("features"), 1)).as("mean_f0"),
        max(col("media.width")).as("max_width"))
  }
}
