package graft.core

/** Multigrid and spectral (FFT/DCT) NaN-filling — the engine's analog of
  * `/root/reference/cxx/include/pyinterp/fill/multi_grid.hpp` (V-cycle
  * geometric multigrid on the 5-point Laplacian, full-weighting
  * restriction, bilinear prolongation, red-black Gauss-Seidel smoother)
  * and `fill/fft_inpaint.hpp` (iterative Gaussian low-pass in frequency
  * space — FFT when x-periodic, DCT otherwise — with known values
  * restored each round).
  *
  * Grids are row-major Array[Double] of shape (nx, ny); NaN marks the
  * unknown cells. Both return (filled, iterations, maxResidual).
  */
object FillMultigrid {

  private val CoarseSolveIterations = 50

  /** Reflection at edges (reference DynamicNeighbors semantics, matching
    * [[Fill.gaussSeidel]]): -1 -> 1, n -> n-2; degenerate n=1 -> 0.
    */
  @inline private def clamp(i: Int, n: Int): Int =
    if (i < 0) math.min(-i, n - 1)
    else if (i >= n) math.max(2 * n - 2 - i, 0)
    else i

  @inline private def wrapOrClamp(i: Int, n: Int, periodic: Boolean): Int =
    if (periodic) ((i % n) + n) % n else clamp(i, n)

  /** One red-black Gauss-Seidel sweep for A u = f,
    * A u = u - 0.25 (u(i-1,j) + u(i+1,j) + u(i,j-1) + u(i,j+1)),
    * updating masked (unknown) cells only.
    */
  private def gsSweep(u: Array[Double], f: Array[Double],
                      mask: Array[Boolean], nx: Int, ny: Int,
                      periodic: Boolean, relax: Double): Unit = {
    var color = 0
    while (color < 2) {
      var i = 0
      while (i < nx) {
        val ix0 = wrapOrClamp(i - 1, nx, periodic)
        val ix1 = wrapOrClamp(i + 1, nx, periodic)
        var j = (i + color) & 1
        while (j < ny) {
          val k = i * ny + j
          if (mask(k)) {
            val jy0 = clamp(j - 1, ny)
            val jy1 = clamp(j + 1, ny)
            val nb = u(ix0 * ny + j) + u(ix1 * ny + j) +
              u(i * ny + jy0) + u(i * ny + jy1)
            val value = f(k) + 0.25 * nb
            u(k) = u(k) + relax * (value - u(k))
          }
          j += 2
        }
        i += 1
      }
      color += 1
    }
  }

  /** r = f - A u at masked cells, 0 elsewhere. */
  private def residual(r: Array[Double], u: Array[Double], f: Array[Double],
                       mask: Array[Boolean], nx: Int, ny: Int,
                       periodic: Boolean): Unit = {
    var i = 0
    while (i < nx) {
      val ix0 = wrapOrClamp(i - 1, nx, periodic)
      val ix1 = wrapOrClamp(i + 1, nx, periodic)
      var j = 0
      while (j < ny) {
        val k = i * ny + j
        if (mask(k)) {
          val nb = u(ix0 * ny + j) + u(ix1 * ny + j) +
            u(i * ny + clamp(j - 1, ny)) + u(i * ny + clamp(j + 1, ny))
          r(k) = f(k) - (u(k) - 0.25 * nb)
        } else r(k) = 0.0
        j += 1
      }
      i += 1
    }
  }

  /** Full-weighting 2x2 restriction (values) and any-of-4 (mask). */
  private def restrictTo(fine: Array[Double], fineMask: Array[Boolean],
                         nx: Int, ny: Int, periodic: Boolean)
      : (Array[Double], Array[Boolean], Int, Int) = {
    val cx = (nx + 1) / 2
    val cy = (ny + 1) / 2
    val cg = new Array[Double](cx * cy)
    val cm = new Array[Boolean](cx * cy)
    var i = 0
    while (i < cx) {
      val jx0 = 2 * i
      val jx1 = wrapOrClamp(2 * i + 1, nx, periodic)
      var j = 0
      while (j < cy) {
        val jy0 = 2 * j
        val jy1 = clamp(2 * j + 1, ny)
        cg(i * cy + j) = 0.25 * (fine(jx0 * ny + jy0) + fine(jx1 * ny + jy0) +
          fine(jx0 * ny + jy1) + fine(jx1 * ny + jy1))
        // deviation from the reference's any-child rule
        // (`multi_grid.hpp:111-140`): a coarse cell stays a Dirichlet
        // anchor (unmasked, e = 0) while ANY child is known. The
        // any-child rule erases every anchor one level down for
        // shell-boundary masks, leaving a singular pure-Neumann level
        // where the smoother drifts on the residual's mean; anchored
        // coarse levels keep the operator nonsingular and the mean error
        // representable, and the local under-correction is absorbed by
        // post-smoothing.
        cm(i * cy + j) = fineMask(jx0 * ny + jy0) &&
          fineMask(jx1 * ny + jy0) && fineMask(jx0 * ny + jy1) &&
          fineMask(jx1 * ny + jy1)
        j += 1
      }
      i += 1
    }
    (cg, cm, cx, cy)
  }

  /** Bilinear prolongation, ADDING into the fine grid. */
  private def prolongAdd(fine: Array[Double], nx: Int, ny: Int,
                         coarse: Array[Double], cx: Int, cy: Int,
                         periodic: Boolean): Unit = {
    var i = 0
    while (i < cx) {
      val ci1 = wrapOrClamp(i + 1, cx, periodic)
      val jx0 = 2 * i
      val jx1 = wrapOrClamp(2 * i + 1, nx, periodic)
      var j = 0
      while (j < cy) {
        val cj1 = clamp(j + 1, cy)
        val c00 = coarse(i * cy + j)
        val c10 = coarse(ci1 * cy + j)
        val c01 = coarse(i * cy + cj1)
        val c11 = coarse(ci1 * cy + cj1)
        val jy0 = 2 * j
        val jy1 = clamp(2 * j + 1, ny)
        fine(jx0 * ny + jy0) += c00
        fine(jx1 * ny + jy0) += (c00 + c10) * 0.5
        fine(jx0 * ny + jy1) += (c00 + c01) * 0.5
        fine(jx1 * ny + jy1) += (c00 + c10 + c01 + c11) * 0.25
        j += 1
      }
      i += 1
    }
  }

  /** A level with NO unmasked (Dirichlet) cell is singular — the constant
    * vector is in the Laplacian's null space and Gauss-Seidel drifts on
    * an incompatible rhs. Project the rhs (and later the solution) to
    * zero mean over masked cells; the error estimate is only defined up
    * to a constant there anyway.
    */
  private def projectIfSingular(a: Array[Double], mask: Array[Boolean])
      : Boolean = {
    var anyKnown = false
    var k = 0
    while (k < mask.length && !anyKnown) { anyKnown = !mask(k); k += 1 }
    if (anyKnown) return false
    var s = 0.0
    k = 0
    while (k < a.length) { s += a(k); k += 1 }
    val mean = s / a.length
    k = 0
    while (k < a.length) { a(k) -= mean; k += 1 }
    true
  }

  private def vCycle(u: Array[Double], f: Array[Double],
                     mask: Array[Boolean], nx: Int, ny: Int,
                     periodic: Boolean, relax: Double, preSmooth: Int,
                     postSmooth: Int, minSize: Int): Unit = {
    val singular = projectIfSingular(f, mask)
    if (nx <= minSize || ny <= minSize) {
      var s = 0
      while (s < CoarseSolveIterations) {
        gsSweep(u, f, mask, nx, ny, periodic, 1.0)
        s += 1
      }
      if (singular) projectIfSingular(u, mask)
      return
    }
    var s = 0
    while (s < preSmooth) { gsSweep(u, f, mask, nx, ny, periodic, relax); s += 1 }
    val r = new Array[Double](nx * ny)
    residual(r, u, f, mask, nx, ny, periodic)
    val (cRhs, cMask, cx, cy) = restrictTo(r, mask, nx, ny, periodic)
    val cErr = new Array[Double](cx * cy)
    vCycle(cErr, cRhs, cMask, cx, cy, periodic, relax, preSmooth,
      postSmooth, minSize)
    val fineErr = new Array[Double](nx * ny)
    prolongAdd(fineErr, nx, ny, cErr, cx, cy, periodic)
    var k = 0
    while (k < u.length) {
      if (mask(k)) u(k) += fineErr(k)
      k += 1
    }
    s = 0
    while (s < postSmooth) { gsSweep(u, f, mask, nx, ny, periodic, relax); s += 1 }
    if (singular) projectIfSingular(u, mask)
  }

  /** Multigrid Laplace fill of NaN cells; `firstGuess` is
    * "zonal_average" (per-y-band mean, the reference config default) or
    * "zero".
    */
  def multigrid(values: Array[Double], nx: Int, ny: Int,
                periodic: Boolean = false, maxIterations: Int = 50,
                epsilon: Double = 1e-8, preSmooth: Int = 3,
                postSmooth: Int = 3,
                firstGuess: String = "zonal_average")
      : (Array[Double], Int, Double) = {
    val u = values.clone()
    val mask = values.map(_.isNaN)
    if (!mask.contains(true)) return (u, 0, 0.0)
    Fill.applyFirstGuess(u, mask, nx, ny, firstGuess)
    val f = new Array[Double](nx * ny)
    val r = new Array[Double](nx * ny)
    var it = 0
    var maxRes = Double.MaxValue
    while (it < maxIterations && maxRes >= epsilon) {
      it += 1
      vCycle(u, f, mask, nx, ny, periodic, 1.0, preSmooth, postSmooth, 4)
      residual(r, u, f, mask, nx, ny, periodic)
      maxRes = 0.0
      var t = 0
      while (t < r.length) {
        val a = math.abs(r(t))
        if (a > maxRes) maxRes = a
        t += 1
      }
    }
    (u, it, maxRes)
  }

  /** Spectral in-painting (`fill/fft_inpaint.hpp:34-135`): iterate
    * {frequency-space Gaussian low-pass; restore known values} until the
    * masked cells stop moving. DCT (symmetric extension) when the grid is
    * not x-periodic, full FFT otherwise.
    */
  def fftInpaint(values: Array[Double], nx: Int, ny: Int,
                 periodic: Boolean = false, sigma: Double = 10.0,
                 maxIterations: Int = 100, epsilon: Double = 1e-6,
                 firstGuess: String = "zonal_average")
      : (Array[Double], Int, Double) = {
    val mask = values.map(_.isNaN)
    if (!mask.contains(true)) return (values.clone(), 0, 0.0)
    val original = new Array[Double](nx * ny)
    val u = new Array[Double](nx * ny)
    var k = 0
    while (k < u.length) {
      original(k) = if (mask(k)) 0.0 else values(k)
      u(k) = values(k)
      k += 1
    }
    Fill.applyFirstGuess(u, mask, nx, ny, firstGuess)
    val sigmaSq = 2.0 * sigma * sigma
    // kernel: FFT uses wrapped frequencies; DCT non-negative ones
    val kernel = new Array[Double](nx * ny)
    var i = 0
    while (i < nx) {
      val fu = if (periodic && i > nx / 2) (i - nx).toDouble else i.toDouble
      var j = 0
      while (j < ny) {
        val fv = if (periodic && j > ny / 2) (j - ny).toDouble else j.toDouble
        kernel(i * ny + j) = math.exp(-(fu * fu + fv * fv) / sigmaSq)
        j += 1
      }
      i += 1
    }
    val prev = new Array[Double](nx * ny)
    var it = 0
    var maxRes = Double.MaxValue
    while (it < maxIterations && maxRes >= epsilon) {
      it += 1
      System.arraycopy(u, 0, prev, 0, u.length)
      if (periodic) {
        val im = new Array[Double](nx * ny)
        Fourier.fft2d(u, im, nx, ny, invert = false)
        var t = 0
        while (t < u.length) { u(t) *= kernel(t); im(t) *= kernel(t); t += 1 }
        Fourier.fft2d(u, im, nx, ny, invert = true)
      } else {
        Fourier.dct2d(u, nx, ny, inverse = false)
        var t = 0
        while (t < u.length) { u(t) *= kernel(t); t += 1 }
        Fourier.dct2d(u, nx, ny, inverse = true)
      }
      maxRes = 0.0
      var t = 0
      while (t < u.length) {
        if (mask(t)) {
          val d = math.abs(u(t) - prev(t))
          if (d > maxRes) maxRes = d
        } else u(t) = original(t)
        t += 1
      }
    }
    (u, it, maxRes)
  }
}
