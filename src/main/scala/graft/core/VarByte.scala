package graft.core

import java.io.ByteArrayOutputStream

/** Unsigned LEB128-style variable-byte codec.
  *
  * Role model: RUM's delta+varbyte posting compression
  * (reference: src/rumdatapage.c:169-222 writes heap-pointer deltas as
  * varbyte; src/rum.h:871-924 reads them back). We keep the *semantics*
  * (monotone ids stored as varbyte-encoded gaps; payload position deltas
  * likewise) but use a single clean 7-bit-per-byte little-endian codec for
  * everything instead of RUM's page-specific bit layouts.
  */
object VarByte {

  /** Append one varint over the RAW 64-bit pattern (7 bits per byte, high
    * bit = continuation). Negative longs encode as their two's-complement
    * bits (≤10 bytes) — needed because docIds are xxhash64 values spanning
    * the full signed range, and deltas may wrap.
    */
  def writeUInt(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Read one unsigned varint starting at `pos`; returns (value, nextPos). */
  def readUInt(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  /** Encode a non-decreasing (signed order) sequence as first value + gaps
    * (strictly increasing for docIds; ties allowed for the alt-order key
    * slot, where equal addons are legal). Gaps may wrap past Long.MaxValue
    * (e.g. MinValue→MaxValue ids); two's-complement add on decode restores
    * them exactly.
    */
  def encodeDeltas(sorted: Array[Long], allowTies: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      require(i == 0 || (if (allowTies) v >= prev else v > prev),
        s"sequence not ${if (allowTies) "non-decreasing" else "strictly increasing"} at $i")
      writeUInt(out, if (i == 0) v else v - prev)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Decode `n` delta-encoded values. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val res = new Array[Long](n)
    var p = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val (d, np) = readUInt(bytes, p)
      prev = if (i == 0) d else prev + d
      res(i) = prev
      p = np
      i += 1
    }
    res
  }

  /** Encode an array of small non-negative ints (e.g. per-doc tf). */
  def encodeUInts(values: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length)
    var i = 0
    while (i < values.length) { writeUInt(out, values(i).toLong); i += 1 }
    out.toByteArray
  }

  def decodeUInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val res = new Array[Int](n)
    var p = 0
    var i = 0
    while (i < n) {
      val (v, np) = readUInt(bytes, p)
      res(i) = v.toInt
      p = np
      i += 1
    }
    res
  }
}
