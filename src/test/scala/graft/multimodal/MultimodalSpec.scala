package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("extractFeatures: deterministic fixed-dim vectors, null-safe") {
    val assets = Multimodal.syntheticAssets(spark, 20)
    val feats = Multimodal.extractFeatures(assets)
    val rows = feats.select("asset_id", "features").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length === Multimodal.StubDecoder.FeatureDim)
      assert(math.abs(v.sum - 1.0f) < 1e-3) // L1-normalized histogram
    }
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(assets)
      .select("asset_id", "features").collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq === again.map(_.getSeq[Float](1)).toSeq)
  }

  test("metadata predicates prune without touching bytes") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val images = assets.filter(col("media.kind") === "image")
    assert(images.count() === 10)
    // plan should not reference content for a metadata-only count
    val plan = images.select(col("media.width")).queryExecution
      .optimizedPlan.toString
    assert(!plan.contains("content"))
  }

  test("resize clamps the long side, preserves aspect floor") {
    val assets = Multimodal.syntheticAssets(spark, 10)
    val resized = Multimodal.resize(assets, 64)
    resized.select("media.width", "media.height").collect().foreach { r =>
      assert(r.getInt(0) <= 64 || r.getInt(1) <= 64)
      assert(r.getInt(0) >= 1 && r.getInt(1) >= 1)
    }
  }
}
