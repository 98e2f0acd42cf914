package graft.core

/** Minimal self-contained Fourier kernels for the spectral fill
  * (`/root/reference/cxx/include/pyinterp/math/fft2d.hpp`,
  * `math/dct2d.hpp` roles): arbitrary-length complex FFT (iterative
  * radix-2 + Bluestein chirp-z for non-powers-of-two), and DCT-II /
  * DCT-III pairs built on the 2N even-extension FFT identity. All 2-D
  * transforms are separable row/column passes.
  */
object Fourier {

  /** In-place complex FFT, n = power of two. `invert` applies the inverse
    * WITHOUT normalization (callers scale).
    */
  private def fftPow2(re: Array[Double], im: Array[Double],
                      invert: Boolean): Unit = {
    val n = re.length
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = 2.0 * math.Pi / len * (if (invert) 1.0 else -1.0)
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + half); val vi0 = im(base + k + half)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** Arbitrary-length complex FFT (Bluestein when n is not a power of
    * two). Inverse is normalized by 1/n.
    */
  def fft(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    if (n == 0) return
    if ((n & (n - 1)) == 0) {
      fftPow2(re, im, invert)
    } else {
      // Bluestein: x[k] * chirp -> convolution with conjugate chirp
      val m = nextPow2(2 * n - 1)
      val ar = new Array[Double](m)
      val ai = new Array[Double](m)
      val br = new Array[Double](m)
      val bi = new Array[Double](m)
      val sign = if (invert) 1.0 else -1.0
      var k = 0
      while (k < n) {
        // angle = pi * k^2 / n  (mod 2pi kept stable via Long arithmetic)
        val kk = (k.toLong * k) % (2L * n)
        val ang = math.Pi * kk / n * sign
        val cr = math.cos(ang); val ci = math.sin(ang)
        ar(k) = re(k) * cr - im(k) * ci
        ai(k) = re(k) * ci + im(k) * cr
        br(k) = cr; bi(k) = -ci
        if (k > 0) { br(m - k) = cr; bi(m - k) = -ci }
        k += 1
      }
      fftPow2(ar, ai, invert = false)
      fftPow2(br, bi, invert = false)
      var t = 0
      while (t < m) {
        val rr = ar(t) * br(t) - ai(t) * bi(t)
        ai(t) = ar(t) * bi(t) + ai(t) * br(t)
        ar(t) = rr
        t += 1
      }
      fftPow2(ar, ai, invert = true)
      val inv = 1.0 / m
      k = 0
      while (k < n) {
        val kk = (k.toLong * k) % (2L * n)
        val ang = math.Pi * kk / n * sign
        val cr = math.cos(ang); val ci = math.sin(ang)
        val xr = ar(k) * inv; val xi = ai(k) * inv
        re(k) = xr * cr - xi * ci
        im(k) = xr * ci + xi * cr
        k += 1
      }
    }
    if (invert) {
      val inv = 1.0 / n
      var t = 0
      while (t < n) { re(t) *= inv; im(t) *= inv; t += 1 }
    }
  }

  /** Unnormalized DCT-II: X[k] = sum_n x[n] cos(pi (2n+1) k / (2N)),
    * computed via the 2N even-extension FFT identity.
    */
  def dct2(x: Array[Double]): Array[Double] = {
    val n = x.length
    val re = new Array[Double](2 * n)
    val im = new Array[Double](2 * n)
    var i = 0
    while (i < n) {
      re(i) = x(i)
      re(2 * n - 1 - i) = x(i)
      i += 1
    }
    fft(re, im, invert = false)
    val out = new Array[Double](n)
    var k = 0
    while (k < n) {
      val ang = -math.Pi * k / (2.0 * n)
      out(k) = (re(k) * math.cos(ang) - im(k) * math.sin(ang)) / 2.0
      k += 1
    }
    out
  }

  /** Inverse of [[dct2]] (DCT-III with the matching normalization):
    * dct3(dct2(x)) == x.
    */
  def dct3(xf: Array[Double]): Array[Double] = {
    val n = xf.length
    val re = new Array[Double](2 * n)
    val im = new Array[Double](2 * n)
    re(0) = 2.0 * xf(0)
    var k = 1
    while (k < n) {
      val ang = math.Pi * k / (2.0 * n)
      val er = 2.0 * xf(k) * math.cos(ang)
      val ei = 2.0 * xf(k) * math.sin(ang)
      re(k) = er; im(k) = ei
      re(2 * n - k) = er; im(2 * n - k) = -ei
      k += 1
    }
    // E[N] = 0 already
    fft(re, im, invert = true)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = re(i); i += 1 }
    out
  }

  /** Separable 2-D DCT-II of a row-major (nx x ny) grid, in place. */
  def dct2d(a: Array[Double], nx: Int, ny: Int, inverse: Boolean): Unit = {
    // rows
    val row = new Array[Double](ny)
    var i = 0
    while (i < nx) {
      System.arraycopy(a, i * ny, row, 0, ny)
      val r = if (inverse) dct3(row) else dct2(row)
      System.arraycopy(r, 0, a, i * ny, ny)
      i += 1
    }
    // cols
    val colBuf = new Array[Double](nx)
    var j = 0
    while (j < ny) {
      var k = 0
      while (k < nx) { colBuf(k) = a(k * ny + j); k += 1 }
      val c = if (inverse) dct3(colBuf) else dct2(colBuf)
      k = 0
      while (k < nx) { a(k * ny + j) = c(k); k += 1 }
      j += 1
    }
  }

  /** Separable 2-D complex FFT of a real row-major grid; returns
    * (re, im). Inverse takes (re, im) and writes the real part back.
    */
  def fft2d(re: Array[Double], im: Array[Double], nx: Int, ny: Int,
            invert: Boolean): Unit = {
    val rowR = new Array[Double](ny)
    val rowI = new Array[Double](ny)
    var i = 0
    while (i < nx) {
      System.arraycopy(re, i * ny, rowR, 0, ny)
      System.arraycopy(im, i * ny, rowI, 0, ny)
      fft(rowR, rowI, invert)
      System.arraycopy(rowR, 0, re, i * ny, ny)
      System.arraycopy(rowI, 0, im, i * ny, ny)
      i += 1
    }
    val colR = new Array[Double](nx)
    val colI = new Array[Double](nx)
    var j = 0
    while (j < ny) {
      var k = 0
      while (k < nx) { colR(k) = re(k * ny + j); colI(k) = im(k * ny + j); k += 1 }
      fft(colR, colI, invert)
      k = 0
      while (k < nx) { re(k * ny + j) = colR(k); im(k * ny + j) = colI(k); k += 1 }
      j += 1
    }
  }
}
