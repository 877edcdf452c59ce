package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import breeze.linalg.DenseMatrix

/** NumPy `.npy` binary matrix I/O (SURVEY S12 fidelity; the reference
  * reads/writes per-pulsar proposal covariances as `cov.npy`,
  * enterprise_warp results.py:562 and merges them at results.py:555-577).
  *
  * Format (public NEP-1 spec): magic `\x93NUMPY`, version (1,0), uint16-LE
  * header length, then an ASCII Python-dict header padded with spaces so
  * the data start is 64-byte aligned, then the raw C-order array bytes.
  * Only `<f8` (little-endian float64) payloads are supported — that is the
  * only dtype the reference's covariance path produces — in both C and
  * Fortran element order on read.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Read a 2-D (or 1-D, returned as a single-row matrix) `<f8` array. */
  def read(path: Path): DenseMatrix[Double] = fromBytes(Files.readAllBytes(path))

  def fromBytes(bytes: Array[Byte]): DenseMatrix[Double] = {
    require(bytes.length >= 10 && bytes.take(6).sameElements(Magic),
      "not an npy file (bad magic)")
    val major = bytes(6)
    require(major == 1 || major == 2, s"unsupported npy version $major")
    val (hlen, hoff) =
      if (major == 1)
        ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8), 10)
      else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    val header = new String(bytes, hoff, hlen, "ASCII")
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"npy header missing descr: $header"))
    require(descr == "<f8", s"unsupported npy dtype $descr (only <f8)")
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
      .findFirstMatchIn(header).exists(_.group(1) == "True")
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(sys.error(s"npy header missing shape: $header"))
    val (rows, cols) = shape match {
      case Seq(n)    => (1, n)
      case Seq(r, c) => (r, c)
      case other     => sys.error(s"npy: only 1-D/2-D supported, got $other")
    }
    // Long arithmetic: 2^28 f64 elements overflow an Int byte length to
    // negative (opaque wrap error) and near-misses would silently truncate
    val payload = rows.toLong * cols.toLong * 8L
    require(payload <= Int.MaxValue.toLong - hoff - hlen,
      s"npy payload too large for one in-memory array: ${rows}x$cols f64 = $payload bytes")
    require(bytes.length.toLong >= hoff + hlen + payload,
      s"npy truncated: need ${hoff + hlen + payload} bytes, have ${bytes.length}")
    val data = ByteBuffer.wrap(bytes, hoff + hlen, payload.toInt)
      .order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
    DenseMatrix.tabulate[Double](rows, cols) { (i, j) =>
      data.get(if (fortran) j * rows + i else i * cols + j)
    }
  }

  /** Write a 2-D `<f8` C-order npy (version 1.0, 64-byte-aligned data). */
  def write(path: Path, m: DenseMatrix[Double]): Unit =
    Files.write(path, toBytes(m))

  def toBytes(m: DenseMatrix[Double]): Array[Byte] = {
    val dict =
      s"{'descr': '<f8', 'fortran_order': False, 'shape': (${m.rows}, ${m.cols}), }"
    // pad with spaces so magic(6)+ver(2)+hlen(2)+header is a multiple of 64,
    // header terminated by \n (NEP-1)
    val unpadded = 10 + dict.length + 1
    val padded = ((unpadded + 63) / 64) * 64
    val header = dict + " " * (padded - unpadded) + "\n"
    val out = new ByteArrayOutputStream(padded + m.rows * m.cols * 8)
    val dos = new DataOutputStream(out)
    dos.write(Magic)
    dos.writeByte(1); dos.writeByte(0)
    dos.writeByte(header.length & 0xff); dos.writeByte((header.length >> 8) & 0xff)
    dos.writeBytes(header)
    val buf = ByteBuffer.allocate(m.rows * m.cols * 8).order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until m.rows; j <- 0 until m.cols) buf.putDouble(m(i, j))
    dos.write(buf.array())
    dos.flush()
    out.toByteArray
  }
}
