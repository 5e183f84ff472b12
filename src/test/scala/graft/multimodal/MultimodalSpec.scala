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

  test("real PNG bytes decode through javax.imageio to pixel features") {
    // 2×2 PNG: two black pixels, one white, one mid-gray — encoded with
    // ImageIO, decoded by the SAME engine path used in extractFeatures
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0xFFFFFF); img.setRGB(1, 1, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    val feats = Multimodal.StubDecoder.decodeToFeatures(bytes)
    assert(feats.length === Multimodal.StubDecoder.FeatureDim)
    // luminance buckets (16 over 0..255): black → 0, white (255) → 15,
    // gray 0x80 → lum 128 → bucket 8
    assert(feats(0) === 0.5f)
    assert(feats(15) === 0.25f)
    assert(feats(8) === 0.25f)
    assert(feats.sum === 1.0f)
    // and through the distributed path: a one-row DataFrame of real bytes
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("asset_id", "content")
    val got = Multimodal.extractFeatures(df)
      .select("features").as[Array[Float]].collect().head
    assert(got.toSeq === feats.toSeq)
    // non-image bytes keep the disclosed byte-histogram fallback
    val junk = Array.tabulate[Byte](32)(i => i.toByte)
    assert(Multimodal.StubDecoder.decodeToFeatures(junk).toSeq ===
      Multimodal.StubDecoder.byteHistogram(junk).toSeq)
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
