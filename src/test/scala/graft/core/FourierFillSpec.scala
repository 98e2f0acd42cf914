package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FourierFillSpec extends AnyFunSuite {

  test("fft round-trips at power-of-two and arbitrary lengths") {
    for (n <- Seq(8, 12, 17, 31)) {
      val re = Array.tabulate(n)(i => math.sin(i * 0.7) + 0.3 * i)
      val im = new Array[Double](n)
      val re0 = re.clone()
      Fourier.fft(re, im, invert = false)
      Fourier.fft(re, im, invert = true)
      for (i <- 0 until n) {
        assert(math.abs(re(i) - re0(i)) < 1e-9, s"n=$n i=$i")
        assert(math.abs(im(i)) < 1e-9)
      }
    }
  }

  test("dct2 matches the direct cosine sum; dct3 inverts it") {
    val n = 9
    val x = Array.tabulate(n)(i => math.cos(i * 1.3) * (i + 1))
    val xf = Fourier.dct2(x)
    for (k <- 0 until n) {
      var s = 0.0
      for (i <- 0 until n)
        s += x(i) * math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n))
      assert(math.abs(xf(k) - s) < 1e-9, s"k=$k")
    }
    val back = Fourier.dct3(xf)
    for (i <- 0 until n) assert(math.abs(back(i) - x(i)) < 1e-9)
  }

  test("dct2d identity filter round-trips a 2-D grid") {
    val nx = 10; val ny = 7
    val a = Array.tabulate(nx * ny)(k => (k * 13 % 31).toDouble)
    val b = a.clone()
    Fourier.dct2d(b, nx, ny, inverse = false)
    Fourier.dct2d(b, nx, ny, inverse = true)
    for (k <- 0 until nx * ny) assert(math.abs(a(k) - b(k)) < 1e-8)
  }

  test("multigrid fill recovers the harmonic plane exactly") {
    val size = 32
    val vals = Array.tabulate(size * size) { k =>
      val i = k / size; val j = k % size
      if (i == 0 || j == 0 || i == size - 1 || j == size - 1)
        (i + 2.0 * j).toDouble
      else Double.NaN
    }
    val (filled, iters, res) =
      FillMultigrid.multigrid(vals, size, size, maxIterations = 300,
        epsilon = 1e-9)
    assert(res < 1e-9, res)
    for (i <- 1 until size - 1; j <- 1 until size - 1)
      assert(math.abs(filled(i * size + j) - (i + 2.0 * j)) < 1e-6,
        s"($i,$j)")
    // multigrid should converge in FAR fewer fine-grid-equivalent
    // iterations than plain Gauss-Seidel needs sweeps
    assert(iters < 300, iters)
  }

  test("multigrid matches gaussSeidel on the same problem") {
    val size = 16
    def holes = Array.tabulate(size * size) { k =>
      val i = k / size; val j = k % size
      if ((i * j) % 7 == 0) ((i * 31 + j * 17) % 23).toDouble
      else Double.NaN
    }
    val (mg, _, _) = FillMultigrid.multigrid(holes, size, size,
      maxIterations = 80, epsilon = 1e-10)
    val (gs, _, _) = Fill.gaussSeidel(holes, size, size,
      maxIterations = 20000, epsilon = 1e-12)
    for (k <- 0 until size * size)
      assert(math.abs(mg(k) - gs(k)) < 1e-4, s"k=$k ${mg(k)} ${gs(k)}")
  }

  test("fft inpaint periodic path preserves DC and fills x-wrapped fields") {
    val size = 16
    val const = Array.tabulate(size * size) { k =>
      if (k % 7 == 2) Double.NaN else -3.5
    }
    val (fc, _, _) = FillMultigrid.fftInpaint(const, size, size,
      periodic = true, sigma = 5.0, maxIterations = 200, epsilon = 1e-9)
    for (k <- 0 until size * size) assert(math.abs(fc(k) + 3.5) < 1e-6)
    // x-periodic wave: recovery must respect the wrap (no edge bias)
    val wave = Array.tabulate(size * size) { k =>
      math.cos(2 * math.Pi * (k / size) / size)
    }
    val holed = wave.clone()
    for (k <- 0 until size * size if k % 9 == 4) holed(k) = Double.NaN
    val (fw, _, _) = FillMultigrid.fftInpaint(holed, size, size,
      periodic = true, sigma = 5.0, maxIterations = 500, epsilon = 1e-9)
    for (k <- 0 until size * size if k % 9 == 4)
      assert(math.abs(fw(k) - wave(k)) < 0.2, s"k=$k ${fw(k)} ${wave(k)}")
  }

  test("fft inpaint fills constant fields exactly and smooth fields close") {
    val size = 24
    val const = Array.tabulate(size * size) { k =>
      if (k % 5 == 2) Double.NaN else 7.25
    }
    val (fc, _, _) = FillMultigrid.fftInpaint(const, size, size,
      sigma = 6.0, maxIterations = 200, epsilon = 1e-9)
    for (k <- 0 until size * size) assert(math.abs(fc(k) - 7.25) < 1e-6)

    val smooth = Array.tabulate(size * size) { k =>
      val i = k / size; val j = k % size
      math.sin(i * 0.3) + math.cos(j * 0.25)
    }
    val holed = smooth.clone()
    for (k <- 0 until size * size if k % 11 == 3) holed(k) = Double.NaN
    val (fs, _, _) = FillMultigrid.fftInpaint(holed, size, size,
      sigma = 8.0, maxIterations = 500, epsilon = 1e-9)
    // corners are the weakest spot of spectral inpainting; assert the
    // interior recovery
    for (k <- 0 until size * size if k % 11 == 3) {
      val i = k / size; val j = k % size
      if (i > 0 && j > 0 && i < size - 1 && j < size - 1)
        assert(math.abs(fs(k) - smooth(k)) < 0.25,
          s"k=$k ${fs(k)} ${smooth(k)}")
    }
  }
}
