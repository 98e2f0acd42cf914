package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Stable-codec round trips: the broadcastable state objects must
  * reconstruct from their flat byte form bit-for-bit (reference
  * getstate/setstate parity: `axis.hpp:943-1008`, `rtree.hpp:621-673`,
  * `pybind/binning.hpp:212-244`), independent of Java serialization.
  */
class CodecsSpec extends AnyFunSuite {

  test("Axis codec round-trips regular, irregular and periodic axes") {
    val axes = Seq(
      Axis.regular(0.0, 40.0, 41),
      Axis(Array(0.0, 0.5, 1.7, 4.0, 9.1)),
      Axis(Array.tabulate(360)(_.toDouble - 180.0), period = 360.0))
    for (a <- axes) {
      val b = Codecs.axisFromBytes(Codecs.axisToBytes(a))
      assert(b.values.toSeq == a.values.toSeq)
      assert(b.period == a.period && b.isRegular == a.isRegular &&
        b.isPeriodic == a.isPeriodic && b.step == a.step)
      // behavioral parity on lookups
      for (x <- Seq(-200.5, -0.3, 0.0, 3.9, 40.0, 57.2))
        assert(b.findIndex(x, bounded = false) ==
          a.findIndex(x, bounded = false))
    }
  }

  test("Moments codec round-trips mid-stream state and keeps merging") {
    val m = new Moments()
    (1 to 57).foreach(i => m.add(i * 1.37, 1.0 + (i % 3)))
    val r = Codecs.momentsFromBytes(Codecs.momentsToBytes(m))
    assert(r.count == m.count && r.mean == m.mean && r.m4 == m.m4)
    // a resumed accumulator must keep producing identical statistics
    val rest = new Moments()
    (58 to 100).foreach(i => rest.add(i * 1.37, 1.0 + (i % 3)))
    val direct = new Moments()
    (1 to 100).foreach(i => direct.add(i * 1.37, 1.0 + (i % 3)))
    r.merge(rest)
    assert(math.abs(r.variance() - direct.variance()) < 1e-9)
    assert(math.abs(r.kurtosis - direct.kurtosis) < 1e-9)
  }

  test("KdTree codec round-trips and answers queries identically") {
    val pts = (0 until 500).iterator.map { i =>
      (Array((i * 37 % 101).toDouble, (i * 53 % 97).toDouble,
        (i % 7).toDouble), (i % 13).toDouble, i.toLong)
    }
    val t = KdTree.build(pts, 3)
    val r = KdTree.fromBytes(KdTree.toBytes(t))
    assert(r.size == t.size)
    for (q <- Seq(Array(3.3, 4.4, 1.1), Array(90.0, 5.0, 6.5),
        Array(-2.0, 120.0, 0.0))) {
      assert(r.query(q, 8).toSeq == t.query(q, 8).toSeq)
      assert(r.queryBall(q, 25.0).toSeq == t.queryBall(q, 25.0).toSeq)
    }
  }

  test("TDigest codec is re-serialization stable (checkpoint of a resume)") {
    val td = new TDigest(100)
    (0 until 2000).foreach(i => td.add((i * 31 % 499).toDouble))
    val once = td.toBytes
    val resumed = TDigest.fromBytes(once)
    // writing the RESUMED state again must be byte-identical: snapshots
    // survive arbitrarily many checkpoint/restore generations
    assert(resumed.toBytes.toSeq == once.toSeq)
    assert(resumed.quantile(0.5) == td.quantile(0.5))
  }
}
