// Native host-side kernels for harmony_tpu.
//
// The TPU owns the iterative compute; what remains host-bound is sparse
// expression-matrix preprocessing at ingest. This is the TPU-native
// framework's counterpart of the reference's C++ utility layer
// (scaleRows_dgc, /root/reference/src/utils.cpp:112-155): row
// standardisation of a CSC genes x cells matrix with zero-aware variance
// (denominator ncol-1, zeros contributing nz * mean^2) and clipping.
//
// Exposed as a plain C ABI for ctypes; built by harmony_tpu.native on
// first use (g++ -O3 -march=native -fopenmp when available). The Python
// caller guarantees well-formed CSC arrays.

#include <cmath>
#include <cstdint>

extern "C" {

// Row means and zero-aware sample standard deviations of a CSC matrix.
// x: nnz values; indices: nnz row ids; indptr: ncol+1 column pointers.
// sd uses the ncol-1 denominator with the zeros contributing
// nz * mean^2 (src/utils.cpp:132-147 semantics).
void csc_row_stats(const double* x, const int64_t* indices,
                   const int64_t* indptr, int64_t nrow, int64_t ncol,
                   double* mean_out, double* sd_out) {
  int64_t* stored = new int64_t[nrow]();
  for (int64_t r = 0; r < nrow; ++r) {
    mean_out[r] = 0.0;
    sd_out[r] = 0.0;
  }
  const int64_t nnz = indptr[ncol];
  for (int64_t j = 0; j < nnz; ++j) {
    mean_out[indices[j]] += x[j];
    stored[indices[j]] += 1;
  }
  for (int64_t r = 0; r < nrow; ++r) mean_out[r] /= (double)ncol;
  for (int64_t j = 0; j < nnz; ++j) {
    const int64_t r = indices[j];
    const double d = x[j] - mean_out[r];
    sd_out[r] += d * d;
  }
  for (int64_t r = 0; r < nrow; ++r) {
    sd_out[r] += (double)(ncol - stored[r]) * mean_out[r] * mean_out[r];
    sd_out[r] = std::sqrt(sd_out[r] / (double)(ncol - 1));
  }
  delete[] stored;
}

// Full scaleRows_dgc: densify + standardise + clip. res is nrow*ncol
// row-major. Mirrors src/utils.cpp:112-155.
void csc_scale_rows(const double* x, const int64_t* indices,
                    const int64_t* indptr, int64_t nrow, int64_t ncol,
                    double thresh, double* res) {
  // (0)+(1) means
  double* mean = new double[nrow]();
  double* sd = new double[nrow]();
  int64_t* stored = new int64_t[nrow]();
  const int64_t nnz = indptr[ncol];
  for (int64_t j = 0; j < nnz; ++j) {
    mean[indices[j]] += x[j];
    stored[indices[j]] += 1;
  }
  for (int64_t r = 0; r < nrow; ++r) mean[r] /= (double)ncol;

  // (2) zero-aware sum of squared deviations
  for (int64_t j = 0; j < nnz; ++j) {
    const int64_t r = indices[j];
    const double d = x[j] - mean[r];
    sd[r] += d * d;
  }
  for (int64_t r = 0; r < nrow; ++r) {
    sd[r] += (double)(ncol - stored[r]) * mean[r] * mean[r];
    sd[r] = std::sqrt(sd[r] / (double)(ncol - 1));
    if (sd[r] == 0.0) sd[r] = 1.0;
  }

  // (3) fill scaled zeros then overwrite stored entries, with clipping
  for (int64_t r = 0; r < nrow; ++r) {
    double v = -mean[r] / sd[r];
    if (v > thresh) v = thresh;
    if (v < -thresh) v = -thresh;
    double* row = res + r * ncol;
    for (int64_t c = 0; c < ncol; ++c) row[c] = v;
  }
  for (int64_t c = 0; c < ncol; ++c) {
    for (int64_t j = indptr[c]; j < indptr[c + 1]; ++j) {
      const int64_t r = indices[j];
      double v = (x[j] - mean[r]) / sd[r];
      if (v > thresh) v = thresh;
      if (v < -thresh) v = -thresh;
      res[r * ncol + c] = v;
    }
  }
  delete[] mean;
  delete[] sd;
  delete[] stored;
}

// Library-size log1p normalisation of CSC counts in place:
// x[j] <- log1p(x[j] / colsum(col(j)) * scale). The ingest hot loop for
// the pbmc pipeline (datasets.pbmc_dataset).
void csc_log_normalize(double* x, const int64_t* indptr, int64_t ncol,
                       double scale) {
  for (int64_t c = 0; c < ncol; ++c) {
    double s = 0.0;
    for (int64_t j = indptr[c]; j < indptr[c + 1]; ++j) s += x[j];
    if (s == 0.0) s = 1.0;
    const double inv = scale / s;
    for (int64_t j = indptr[c]; j < indptr[c + 1]; ++j)
      x[j] = std::log1p(x[j] * inv);
  }
}

}  // extern "C"
