// Measured CPU baseline: a faithful re-implementation of the reference's
// exact-LMM scan hot loop, used by bench.py as the DENOMINATOR of
// vs_baseline (replacing the round-1/2 analytic 20k SNPs/s estimate).
//
// Reference semantics reproduced (cited, not copied):
//  - per-SNP Brent minimization of -REML over log10 lambda in (-5, 5),
//    tol 1e-2, max 50 iterations, warm-started from the previous SNP's
//    optimum and seeded from the null fit
//    (/root/reference/src/stats/lmm.rs:334,1480,
//     RotatedRemlAssocState lmm.rs:52-55).
//  - REML objective on the spectral scale with profiled variance
//    (/root/reference/src/stats/reml.rs:255), gram ridge 1e-6 on the
//    [X g] normal matrix (reml.rs:316-318).
//  - final beta/se: sigma2 = rtwr/(n-p-1), var(beta_g) = sigma2 *
//    (A_ridged^-1)_gg (reml.rs:472 final_beta_se).
//  - row-parallel threads over contiguous SNP chunks (the rayon plan,
//    reml.rs run_rotated_assoc_block_f32), each chunk carrying its own
//    warm-start chain.
//
// The Brent routine is the textbook bounded golden-section/parabolic
// minimizer (Numerical Recipes form) with an initial-point variant, the
// same algorithm family as the reference's brent_minimize_with_init.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr int MAXQ = 16;
constexpr double GRAM_RIDGE = 1e-6;
constexpr double BAD = 1e8;

struct Ctx {
  const double* S;   // (n,) eigenvalues
  const double* Xr;  // (n, p) rotated design incl. intercept
  const double* yr;  // (n,)
  int64_t n;
  int p;
};

struct Pieces {
  double neg_reml;
  double beta_g;
  double var_g;
  bool ok;
};

// Cholesky in place of the lower triangle of A (q x q, row-major).
// Returns false on a non-positive pivot.
static bool chol(double* A, int q, double* logdet) {
  double ld = 0.0;
  for (int j = 0; j < q; ++j) {
    double d = A[j * q + j];
    for (int k = 0; k < j; ++k) d -= A[j * q + k] * A[j * q + k];
    if (!(d > 0.0) || !std::isfinite(d)) return false;
    double lj = std::sqrt(d);
    A[j * q + j] = lj;
    ld += std::log(lj);
    for (int i = j + 1; i < q; ++i) {
      double s = A[i * q + j];
      for (int k = 0; k < j; ++k) s -= A[i * q + k] * A[j * q + k];
      A[i * q + j] = s / lj;
    }
  }
  *logdet = 2.0 * ld;
  return true;
}

// Solve L L' x = b (L lower from chol), in place into x.
static void chol_solve(const double* L, int q, const double* b, double* x) {
  for (int i = 0; i < q; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * q + k] * x[k];
    x[i] = s / L[i * q + i];
  }
  for (int i = q - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < q; ++k) s -= L[k * q + i] * x[k];
    x[i] = s / L[i * q + i];
  }
}

// -REML(log10 lambda) for one SNP; when want_stats, also beta/var of g.
static Pieces eval_snp(const Ctx& c, const float* g, double lg,
                       bool want_stats) {
  Pieces out{BAD, 0.0, 0.0, false};
  const int p = c.p, q = p + 1;
  const int64_t n = c.n;
  double lbd = std::pow(10.0, lg);
  if (!std::isfinite(lbd) || lbd <= 0.0) return out;

  double A[MAXQ * MAXQ] = {0.0};
  double rhs[MAXQ] = {0.0};
  double ayy = 0.0, logdetV = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double v = c.S[i] + lbd;
    if (!(v > 0.0)) return out;
    double w = 1.0 / v;
    logdetV += std::log(v);
    const double* xi = c.Xr + (size_t)i * p;
    double gi = (double)g[i];
    double yi = c.yr[i];
    for (int a = 0; a < p; ++a) {
      double wxa = w * xi[a];
      for (int b = a; b < p; ++b) A[a * q + b] += wxa * xi[b];
      A[a * q + p] += wxa * gi;
      rhs[a] += wxa * yi;
    }
    double wg = w * gi;
    A[p * q + p] += wg * gi;
    rhs[p] += wg * yi;
    ayy += w * yi * yi;
  }
  // symmetrize + keep the unridged copy for the profiled quadratic
  double M[MAXQ * MAXQ];
  for (int a = 0; a < q; ++a)
    for (int b = 0; b < a; ++b) A[a * q + b] = A[b * q + a];
  for (int i = 0; i < q * q; ++i) M[i] = A[i];
  for (int a = 0; a < q; ++a) A[a * q + a] += GRAM_RIDGE;

  double logdetA;
  if (!chol(A, q, &logdetA)) return out;
  double beta[MAXQ];
  chol_solve(A, q, rhs, beta);

  double rtwr = ayy;
  for (int a = 0; a < q; ++a) {
    rtwr -= 2.0 * beta[a] * rhs[a];
    for (int b = 0; b < q; ++b) rtwr += beta[a] * M[a * q + b] * beta[b];
  }
  if (!(rtwr > 0.0) || !std::isfinite(rtwr)) return out;

  double nf = (double)n, pf = (double)q;
  double cst =
      (nf - pf) * (std::log(nf - pf) - 1.0 - std::log(2.0 * M_PI)) / 2.0;
  double reml = cst - 0.5 * ((nf - pf) * std::log(rtwr) + logdetV + logdetA);
  if (!std::isfinite(reml)) return out;
  out.neg_reml = -reml;
  out.ok = true;
  if (want_stats) {
    // (A_ridged^-1)_gg = || L^-1 e_g ||^2
    double z[MAXQ];
    for (int i = 0; i < q; ++i) {
      double s = (i == q - 1) ? 1.0 : 0.0;
      for (int k = 0; k < i; ++k) s -= A[i * q + k] * z[k];
      z[i] = s / A[i * q + i];
    }
    double inv_gg = 0.0;
    for (int i = 0; i < q; ++i) inv_gg += z[i] * z[i];
    double sigma2 = rtwr / (nf - pf);
    out.beta_g = beta[q - 1];
    out.var_g = sigma2 * inv_gg;
  }
  return out;
}

// Textbook bounded Brent minimizer with an initial point.
template <typename F>
static double brent_min(double a, double b, double x0, double tol,
                        int max_iter, F f) {
  const double cgold = 0.3819660;
  const double zeps = 1e-10;
  double x = x0, w = x0, v = x0;
  if (!(x >= a && x <= b)) x = w = v = 0.5 * (a + b);
  double fx = f(x), fw = fx, fv = fx;
  double d = 0.0, e = 0.0;
  for (int it = 0; it < max_iter; ++it) {
    double xm = 0.5 * (a + b);
    double tol1 = tol * std::fabs(x) + zeps;
    double tol2 = 2.0 * tol1;
    if (std::fabs(x - xm) <= tol2 - 0.5 * (b - a)) break;
    bool golden = true;
    if (std::fabs(e) > tol1) {
      double r = (x - w) * (fx - fv);
      double qq = (x - v) * (fx - fw);
      double pp = (x - v) * qq - (x - w) * r;
      qq = 2.0 * (qq - r);
      if (qq > 0.0) pp = -pp;
      qq = std::fabs(qq);
      double etemp = e;
      e = d;
      if (std::fabs(pp) < std::fabs(0.5 * qq * etemp) && pp > qq * (a - x) &&
          pp < qq * (b - x)) {
        d = pp / qq;
        double u = x + d;
        if (u - a < tol2 || b - u < tol2) d = (xm >= x) ? tol1 : -tol1;
        golden = false;
      }
    }
    if (golden) {
      e = (x >= xm) ? a - x : b - x;
      d = cgold * e;
    }
    double u = (std::fabs(d) >= tol1) ? x + d
                                      : x + ((d >= 0.0) ? tol1 : -tol1);
    double fu = f(u);
    if (fu <= fx) {
      if (u >= x) a = x; else b = x;
      v = w; w = x; x = u;
      fv = fw; fw = fx; fx = fu;
    } else {
      if (u < x) a = u; else b = u;
      if (fu <= fw || w == x) {
        v = w; fv = fw; w = u; fw = fu;
      } else if (fu <= fv || v == x || v == w) {
        v = u; fv = fu;
      }
    }
  }
  return x;
}

static void scan_range(const Ctx& c, const float* Gr, int64_t s0, int64_t s1,
                       double lg_init, double tol, int max_iter,
                       double low, double high, double* out_lg,
                       double* out_beta, double* out_se) {
  double warm = lg_init;  // per-chunk warm chain (lmm.rs:134-160)
  for (int64_t s = s0; s < s1; ++s) {
    const float* g = Gr + (size_t)s * c.n;
    auto f = [&](double lg) { return eval_snp(c, g, lg, false).neg_reml; };
    double lg = brent_min(low, high, warm, tol, max_iter, f);
    warm = lg;
    Pieces pc = eval_snp(c, g, lg, true);
    out_lg[s] = lg;
    if (pc.ok && pc.var_g > 0.0 && std::isfinite(pc.var_g)) {
      out_beta[s] = pc.beta_g;
      out_se[s] = std::sqrt(pc.var_g);
    } else {
      out_beta[s] = NAN;
      out_se[s] = NAN;
    }
  }
}

}  // namespace

extern "C" {

// Gr: (m, n) float32 ROTATED genotypes (the reference rotates blocks via
// sgemm before the per-SNP loop; bench.py times that rotation with BLAS).
void jx_baseline_lmm_scan(const double* S, const double* Xr,
                          const double* yr, const float* Gr, int64_t m,
                          int64_t n, int p, double lg_init, int n_threads,
                          double tol, int max_iter, double low, double high,
                          double* out_lg, double* out_beta, double* out_se) {
  if (p + 1 > MAXQ || m <= 0) return;
  Ctx c{S, Xr, yr, n, p};
  if (n_threads < 1) n_threads = 1;
  int64_t chunk = (m + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) {
    int64_t s0 = (int64_t)t * chunk;
    int64_t s1 = std::min<int64_t>(m, s0 + chunk);
    if (s0 >= s1) break;
    ts.emplace_back(scan_range, std::cref(c), Gr, s0, s1, lg_init, tol,
                    max_iter, low, high, out_lg, out_beta, out_se);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
