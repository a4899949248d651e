/* Honest CPU baseline: the reference's sequential per-SNP Gibbs hot loop
 * (hibayes src/Bayes.cpp:586-605) — one ddot + one daxpy of length n per
 * SNP over a dense double genotype, strictly ordered in m.  Compiled with
 * -O3 -march=native the two inner loops vectorise to the same code a good
 * BLAS level-1 (the reference links MKL/OpenBLAS) would emit; level-1 BLAS
 * at these lengths does not multithread, matching the reference's serial
 * sweep.  Used by bench.py for the vs_baseline ratio. */
#include <math.h>
#include <stddef.h>
#include <stdint.h>

void ref_hotloop(const double *X, int64_t n, int64_t m, double *yadj,
                 double *g, const double *xpx, const double *z, int iters)
{
    const double ve = 1.0, varg = 0.01;
    for (int it = 0; it < iters; ++it) {
        for (int64_t j = 0; j < m; ++j) {
            const double *xj = X + (size_t)j * (size_t)n; /* column-major */
            double rhs = 0.0;
            for (int64_t i = 0; i < n; ++i)
                rhs += xj[i] * yadj[i];
            rhs += xpx[j] * g[j];
            const double v = xpx[j] + ve / varg;
            const double gi = rhs / v + sqrt(ve / v) * z[(size_t)it * m + j];
            const double dg = g[j] - gi;
            for (int64_t i = 0; i < n; ++i)
                yadj[i] += dg * xj[i];
            g[j] = gi;
        }
    }
}
