package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class NpySpec extends AnyFunSuite {

  /** Hand-built byte fixture exactly as numpy.save writes it (v1.0,
    * header padded to a 64-byte boundary) — not produced by our writer,
    * so read is tested against the public format, not our own output. */
  private def numpyFixture(dict: String, doubles: Array[Double]): Array[Byte] = {
    val unpadded = 10 + dict.length + 1
    val padded = ((unpadded + 63) / 64) * 64
    val header = dict + " " * (padded - unpadded) + "\n"
    val buf = ByteBuffer.allocate(10 + header.length + doubles.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("ASCII"))
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(header.length.toShort)
    buf.put(header.getBytes("ASCII"))
    doubles.foreach(buf.putDouble)
    buf.array()
  }

  test("reads a numpy-layout C-order 2x3 fixture") {
    val bytes = numpyFixture(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (2, 3), }",
      Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    val m = Npy.fromBytes(bytes)
    assert(m.rows == 2 && m.cols == 3)
    assert(m(0, 0) == 1.0 && m(0, 2) == 3.0 && m(1, 0) == 4.0 && m(1, 2) == 6.0)
  }

  test("reads fortran_order=True with transposed element layout") {
    // column-major: [1,4,2,5,3,6] reconstructs the same 2x3 matrix
    val bytes = numpyFixture(
      "{'descr': '<f8', 'fortran_order': True, 'shape': (2, 3), }",
      Array(1.0, 4.0, 2.0, 5.0, 3.0, 6.0))
    val m = Npy.fromBytes(bytes)
    assert(m(0, 1) == 2.0 && m(1, 1) == 5.0 && m(1, 2) == 6.0)
  }

  test("reads a 1-D vector as a single-row matrix") {
    val bytes = numpyFixture(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (4,), }",
      Array(0.5, -1.5, 2.5, -3.5))
    val m = Npy.fromBytes(bytes)
    assert(m.rows == 1 && m.cols == 4 && m(0, 3) == -3.5)
  }

  test("write → read round-trip is exact, header is 64-byte aligned") {
    val m = DenseMatrix.tabulate[Double](5, 5)((i, j) => math.sin(i * 7 + j) * 1e3)
    val bytes = Npy.toBytes(m)
    // data start must be a multiple of 64 (NEP-1 alignment)
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + hlen) % 64 == 0)
    val back = Npy.fromBytes(bytes)
    assert(back == m)
  }

  test("file round-trip through a real path") {
    val dir = java.nio.file.Files.createTempDirectory("npy")
    val m = DenseMatrix((1.0, 2.0), (3.0, 4.0))
    val p = dir.resolve("cov.npy")
    Npy.write(p, m)
    assert(Npy.read(p) == m)
  }

  test("covariance Block round-trips through npy bytes") {
    import graft.analytics.Covariance
    val b = Covariance.Block(Seq("a", "b", "c"),
      DenseMatrix((1.0, 0.1, 0.2), (0.1, 2.0, 0.3), (0.2, 0.3, 3.0)))
    val back = Covariance.Block(b.pars, Npy.fromBytes(Npy.toBytes(b.cov)))
    assert(back.pars == b.pars && back.cov == b.cov)
  }

  test("rejects non-npy bytes and non-f8 dtypes") {
    intercept[IllegalArgumentException](Npy.fromBytes(Array[Byte](1, 2, 3)))
    val f4 = numpyFixture(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (1,), }", Array(0.0))
    intercept[IllegalArgumentException](Npy.fromBytes(f4))
  }
}
