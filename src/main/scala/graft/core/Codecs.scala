package graft.core

import java.nio.ByteBuffer

/** Stable, versioned byte codecs for the broadcastable state objects —
  * the engine's analog of the reference's pickle/getstate support
  * (`/root/reference/cxx/include/pyinterp/math/axis.hpp:943-1008` axis
  * serialization, `cxx/include/pyinterp/pybind/binning.hpp:212-244`
  * accumulator state, `geometry/rtree.hpp:621-673` tree packing;
  * [[TDigest.toBytes]] and [[KdTree.toBytes]] are the sketch/tree
  * members of the same family).
  *
  * Java serialization ties checkpointed state to JVM/Spark class file
  * versions; these codecs are flat little-schema buffers, so a pipeline
  * snapshot written by one engine build resumes under another.
  */
object Codecs {

  private val AxisMagic = 0x41584931    // "AXI1"
  private val MomentsMagic = 0x4D4F4D31 // "MOM1"

  def axisToBytes(a: Axis): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 8 * a.size)
    bb.putInt(AxisMagic)
    bb.putDouble(a.period)
    bb.putInt(a.size)
    var i = 0
    while (i < a.size) { bb.putDouble(a.values(i)); i += 1 }
    bb.array()
  }

  def axisFromBytes(bytes: Array[Byte]): Axis = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt == AxisMagic, "not an Axis codec payload")
    val period = bb.getDouble
    val n = bb.getInt
    Axis(Array.fill(n)(bb.getDouble), period)
  }

  def momentsToBytes(m: Moments): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * 8)
    bb.putInt(MomentsMagic)
    bb.putLong(m.count)
    bb.putDouble(m.sumW)
    bb.putDouble(m.mean)
    bb.putDouble(m.min)
    bb.putDouble(m.max)
    bb.putDouble(m.sum)
    bb.putDouble(m.m2)
    bb.putDouble(m.m3)
    bb.putDouble(m.m4)
    bb.array()
  }

  def momentsFromBytes(bytes: Array[Byte]): Moments = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt == MomentsMagic, "not a Moments codec payload")
    new Moments(bb.getLong, bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
  }
}
