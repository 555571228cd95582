package graft.functions

/** Cubic spline interpolation with not-a-knot boundary conditions — the
  * same boundary scipy's `interp1d(kind='cubic')` uses (the reference
  * dispatches to it: core_functions.py:381-402), so a global cubic
  * polynomial is reproduced exactly.
  *
  * Solves for knot second-derivatives M via a tridiagonal system with
  * the two not-a-knot corner rows folded in by elimination — O(n) per
  * series (Thomas algorithm), no allocation beyond the coefficient
  * arrays.
  */
object Spline {

  /** Evaluate the spline through (ts, ys) at query points qs (all arrays
    * ascending in ts; qs within [ts.head, ts.last]). n>=4 uses
    * not-a-knot cubic; n==3 quadratic through 3 points; n==2 linear;
    * n==1 constant.
    */
  def cubic(ts: Array[Double], ys: Array[Double], qs: Array[Double]): Array[Double] = {
    val n = ts.length
    require(n >= 1 && ys.length == n)
    requireStrictlyIncreasing(ts)
    if (n == 1) return qs.map(_ => ys(0))
    if (n == 2) return qs.map { q =>
      val w = (q - ts(0)) / (ts(1) - ts(0)); ys(0) + w * (ys(1) - ys(0))
    }
    if (n == 3) return quadratic3(ts, ys, qs)

    val m = solveNotAKnot(ts, ys)
    val out = new Array[Double](qs.length)
    var qi = 0
    while (qi < qs.length) {
      val q = qs(qi)
      val i = interval(ts, q)
      val h = ts(i + 1) - ts(i)
      val a = (ts(i + 1) - q) / h
      val b = (q - ts(i)) / h
      out(qi) = a * ys(i) + b * ys(i + 1) +
        ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) * h * h / 6.0
      qi += 1
    }
    out
  }

  /** True order-2 (quadratic) interpolating spline, matching scipy's
    * `interp1d(kind='quadratic')` = `make_interp_spline(k=2)`: a degree-2
    * B-spline with interior knots at the midpoints of the data sites
    * (first and last midpoint omitted, the even-degree analog of
    * not-a-knot), coefficients from the banded collocation solve
    * B(t_i) c = y_i. O(n) per series like the cubic path.
    */
  def quadratic(ts: Array[Double], ys: Array[Double], qs: Array[Double]): Array[Double] = {
    val n = ts.length
    require(n >= 1 && ys.length == n)
    requireStrictlyIncreasing(ts)
    if (n == 1) return qs.map(_ => ys(0))
    if (n == 2) return qs.map { q =>
      val w = (q - ts(0)) / (ts(1) - ts(0)); ys(0) + w * (ys(1) - ys(0))
    }
    val k = 2
    // knots: [t0,t0,t0, mid_1..mid_{n-3}, t_{n-1},t_{n-1},t_{n-1}]
    // (mid_i = (ts(i)+ts(i+1))/2; the first and last midpoints dropped)
    val knots = new Array[Double](n + 3)
    var i = 0
    while (i < 3) { knots(i) = ts(0); knots(n + i) = ts(n - 1); i += 1 }
    i = 1
    while (i <= n - 3) { knots(i + 2) = 0.5 * (ts(i) + ts(i + 1)); i += 1 }
    val c = collocate(knots, k, ts, ys)
    val out = new Array[Double](qs.length)
    var qi = 0
    while (qi < qs.length) { out(qi) = deBoor(knots, c, k, qs(qi)); qi += 1 }
    out
  }

  /** Duplicate or out-of-order sites would silently divide by zero in
    * the n==2 path and trip the banded solves with an unhelpful message;
    * fail loudly and uniformly instead.
    */
  private def requireStrictlyIncreasing(ts: Array[Double]): Unit = {
    var i = 1
    while (i < ts.length) {
      require(ts(i) > ts(i - 1),
        s"spline sites must be strictly increasing; ts($i)=${ts(i)} <= ts(${i - 1})=${ts(i - 1)}")
      i += 1
    }
  }

  /** Index j with knots(j) <= q < knots(j+1), clamped to [k, m-1] where
    * m = number of basis functions (q == last knot maps to the last span).
    */
  private def span(knots: Array[Double], k: Int, m: Int, q: Double): Int = {
    var lo = k; var hi = m - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (knots(mid) <= q) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Nonzero basis values N_{j-k..j}(q) by the Cox–de Boor triangle. */
  private def basis(knots: Array[Double], k: Int, j: Int, q: Double): Array[Double] = {
    val out = new Array[Double](k + 1)
    out(0) = 1.0
    var d = 1
    while (d <= k) {
      var saved = 0.0
      var r = 0
      while (r < d) {
        val den = knots(j + 1 + r) - knots(j - d + 1 + r)
        val term = if (den == 0.0) 0.0 else out(r) / den
        out(r) = saved + (knots(j + 1 + r) - q) * term
        saved = (q - knots(j - d + 1 + r)) * term
        r += 1
      }
      out(d) = saved
      d += 1
    }
    out
  }

  /** Solve the collocation system (bandwidth k on each side) for the
    * B-spline coefficients. Gaussian elimination without pivoting is
    * stable here: collocation matrices at Schoenberg–Whitney-admissible
    * sites are totally positive (de Boor & Pinkus 1977).
    */
  private def collocate(knots: Array[Double], k: Int,
                        ts: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = ts.length
    val w = 2 * k + 1
    val band = Array.ofDim[Double](n, w) // band(i)(k + col - i)
    val rhs = ys.clone()
    var i = 0
    while (i < n) {
      val j = span(knots, k, n, ts(i))
      val b = basis(knots, k, j, ts(i))
      var r = 0
      while (r <= k) {
        val colIdx = j - k + r
        val off = k + colIdx - i
        require(off >= 0 && off < w, s"collocation bandwidth exceeded at row $i col $colIdx")
        band(i)(off) = b(r)
        r += 1
      }
      i += 1
    }
    // forward elimination (no pivoting), bandwidth k below the diagonal
    i = 0
    while (i < n - 1) {
      val piv = band(i)(k)
      require(math.abs(piv) > 1e-300, s"singular collocation matrix at row $i")
      var r = i + 1
      while (r <= math.min(i + k, n - 1)) {
        val off = k + i - r
        val f = band(r)(off) / piv
        if (f != 0.0) {
          var cc = i
          while (cc <= math.min(i + k, n - 1)) {
            band(r)(k + cc - r) -= f * band(i)(k + cc - i)
            cc += 1
          }
          rhs(r) -= f * rhs(i)
        }
        r += 1
      }
      i += 1
    }
    val c = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = rhs(i)
      var cc = i + 1
      while (cc <= math.min(i + k, n - 1)) { s -= band(i)(k + cc - i) * c(cc); cc += 1 }
      c(i) = s / band(i)(k)
      i -= 1
    }
    c
  }

  /** Evaluate sum_i c_i B_i(q) via the nonzero basis at q's span. */
  private def deBoor(knots: Array[Double], c: Array[Double], k: Int, q: Double): Double = {
    val j = span(knots, k, c.length, q)
    val b = basis(knots, k, j, q)
    var s = 0.0
    var r = 0
    while (r <= k) { s += c(j - k + r) * b(r); r += 1 }
    s
  }

  /** The unique parabola through three points (scipy n==3 cubic falls
    * back similarly since not-a-knot needs 4 knots).
    */
  private def quadratic3(ts: Array[Double], ys: Array[Double], qs: Array[Double]): Array[Double] = {
    val (t0, t1, t2) = (ts(0), ts(1), ts(2))
    qs.map { q =>
      ys(0) * (q - t1) * (q - t2) / ((t0 - t1) * (t0 - t2)) +
      ys(1) * (q - t0) * (q - t2) / ((t1 - t0) * (t1 - t2)) +
      ys(2) * (q - t0) * (q - t1) / ((t2 - t0) * (t2 - t1))
    }
  }

  private def interval(ts: Array[Double], q: Double): Int = {
    var lo = 0; var hi = ts.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (ts(mid) <= q) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Second derivatives M_0..M_{n-1} for not-a-knot boundaries:
    * continuity of the third derivative at t_1 and t_{n-2}.
    */
  private def solveNotAKnot(ts: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = ts.length
    val h = Array.tabulate(n - 1)(i => ts(i + 1) - ts(i))
    // interior equations i=1..n-2:
    //   h(i-1) M(i-1) + 2(h(i-1)+h(i)) M(i) + h(i) M(i+1) = rhs(i)
    val rhs = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      rhs(i) = 6.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
      i += 1
    }
    // not-a-knot rows:
    //   row 0:    h(1) M0 - (h(0)+h(1)) M1 + h(0) M2 = 0
    //   row n-1:  h(n-2) M(n-3) - (h(n-3)+h(n-2)) M(n-2) + h(n-3) M(n-1) = 0
    // Fold row 0 into the i=1 equation to eliminate M2's corner term:
    // express M0 from row 0: M0 = ((h0+h1) M1 - h0 M2) / h1
    // substitute into i=1:  (2(h0+h1) + h0(h0+h1)/h1) M1 + (h1 - h0*h0/h1) M2 = rhs(1)
    val a = new Array[Double](n) // sub-diagonal
    val b = new Array[Double](n) // diagonal
    val c = new Array[Double](n) // super-diagonal
    i = 1
    while (i < n - 1) {
      a(i) = h(i - 1); b(i) = 2.0 * (h(i - 1) + h(i)); c(i) = h(i)
      i += 1
    }
    // fold the first boundary into equation at i=1
    b(1) += h(0) * (h(0) + h(1)) / h(1)
    c(1) -= h(0) * h(0) / h(1)
    a(1) = 0.0
    // fold the last boundary into equation at i=n-2
    val hm1 = h(n - 2); val hm2 = h(n - 3)
    b(n - 2) += hm1 * (hm1 + hm2) / hm2
    a(n - 2) -= hm1 * hm1 / hm2
    c(n - 2) = 0.0
    // Thomas solve over i=1..n-2
    i = 2
    while (i < n - 1) {
      val w = a(i) / b(i - 1)
      b(i) -= w * c(i - 1)
      rhs(i) -= w * rhs(i - 1)
      i += 1
    }
    val m = new Array[Double](n)
    m(n - 2) = rhs(n - 2) / b(n - 2)
    i = n - 3
    while (i >= 1) {
      m(i) = (rhs(i) - c(i) * m(i + 1)) / b(i)
      i -= 1
    }
    // recover boundary second derivatives from the not-a-knot rows
    m(0) = ((h(0) + h(1)) * m(1) - h(0) * m(2)) / h(1)
    m(n - 1) = ((hm1 + hm2) * m(n - 2) - hm1 * m(n - 3)) / hm2
    m
  }
}
