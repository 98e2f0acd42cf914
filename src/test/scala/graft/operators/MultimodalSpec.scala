package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("video container round-trips and frame sampling keeps every Nth") {
    val vids = MultimodalOps.synthesizeVideos(spark, 4, frames = 10,
      size = 16).toDF()
    val sampled = MultimodalOps.frameSample(spark, vids, everyN = 3)
    val byVid = sampled.groupBy("video_id")
      .agg(count(lit(1)).as("n"), collect_set("frame_idx").as("idx"))
      .collect()
    assert(byVid.length === 4)
    byVid.foreach { r =>
      assert(r.getLong(1) === 4) // frames 0,3,6,9
      assert(r.getSeq[Int](2).toSet === Set(0, 3, 6, 9))
    }
    // the pattern moves between frames: motion > 0 after the first sample
    val motions = sampled.filter(col("frame_idx") > 0)
      .select("motion").collect().map(_.getDouble(0))
    assert(motions.forall(_ > 0.0))
    // px_mean stays in the normalized pixel range
    val means = sampled.select("px_mean").collect().map(_.getDouble(0))
    assert(means.forall(m => m >= 0.0 && m <= 1.0))
  }

  test("audio features recover the synthetic tone physics") {
    val sr = 8000
    val clips = MultimodalOps.synthesizeAudio(spark, 3, sr, 4096).toDF()
    val feats = MultimodalOps.audioFeatures(spark, clips).collect()
    assert(feats.length === 3)
    feats.foreach { r =>
      val id = r.getString(0)
      val i = id.drop(3).toLong
      val f1 = 220.0 + (i % 20) * 55.0
      val rms = r.getDouble(1)
      val peak = r.getDouble(2)
      val centroid = r.getDouble(4)
      // two-sine RMS: sqrt(0.6^2/2 + 0.25^2/2) ~ 0.4596
      assert(math.abs(rms - math.sqrt(0.18 + 0.03125)) < 0.02, s"$id rms $rms")
      assert(peak <= 1.0 && peak > 0.5)
      // power-weighted centroid: (0.36 f1 + 0.0625 * 1.5 f1) / 0.4225
      // = ~1.074 f1
      assert(math.abs(centroid - 1.0740 * f1) < 0.1 * f1,
        s"$id centroid $centroid f1 $f1")
    }
  }
}
