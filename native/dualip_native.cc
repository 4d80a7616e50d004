// Native data-plane for dualip-tpu: synthetic LP generation and BlockCSC
// tile filling.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the host-side
// runtime for ingestion at extreme scale, where the pure-numpy paths go
// O(E log E) through comparison sorts (np.lexsort / np.unique over 250M+
// edges). Here:
//   * the synthetic matching generator (same generative model as
//     benchmark/generate_synthetic_data.py and the reference
//     benchmark/generate_synthetic_data.py:56-164) assembles CSC via an
//     O(E) counting sort on the column id, with per-column row sorts
//     parallelized across a thread pool;
//   * the tile filler scatters CSC column slices into zero-padded (K, L)
//     tile buffers in one parallel pass (the hot step of
//     dualip_tpu/sparse/bcsc.py:_build_tile).
//
// Exposed as a plain C ABI consumed via ctypes
// (dualip_tpu/io/native_loader.py); no Python headers needed.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 2 : static_cast<int>(n);
}

// Parallel for over [0, n) in contiguous chunks.
template <typename F>
void parallel_for(int64_t n, F&& fn, int max_threads = 0) {
  int nt = max_threads > 0 ? max_threads : hardware_threads();
  if (n < 4096 || nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

struct Generated {
  std::vector<int64_t> indptr;      // (ns + 1)
  std::vector<int32_t> rows;        // (nnz) destination ids, sorted per column
  std::vector<double> a_vals;       // (nnz)
  std::vector<double> c_vals;       // (nnz)
  std::vector<double> b_vec;        // (nd)
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Synthetic matching generator
// ---------------------------------------------------------------------------

void* dualip_gen_create(int64_t ns, int64_t nd, double target_sparsity,
                        uint64_t seed, int threads) {
  auto* g = new Generated();

  // Destination/source latent factors (reference generator hyperparameters,
  // generate_synthetic_data.py:56-63).
  std::mt19937_64 master(seed);
  std::lognormal_distribution<double> ln_p(0.0, 1.0), ln_s(0.0, 1.0),
      ln_v(-4.0, 0.75), ln_u(0.0, 0.5);

  std::vector<double> Z(nd), s(nd), v(nd);
  double z_sum = 0.0;
  for (int64_t j = 0; j < nd; ++j) {
    Z[j] = ln_p(master);
    s[j] = ln_s(master);
    v[j] = ln_v(master);
    z_sum += Z[j];
  }
  if (z_sum == 0.0) {
    std::fill(Z.begin(), Z.end(), 1.0);
    z_sum = static_cast<double>(nd);
  }
  std::vector<double> u(ns);
  uint64_t u_seed = master();
  parallel_for(ns, [&](int64_t lo, int64_t hi) {
    // Per-chunk deterministic stream: seed ^ chunk start.
    std::mt19937_64 rng(u_seed ^ static_cast<uint64_t>(lo) * 0x9E3779B97F4A7C15ull);
    std::lognormal_distribution<double> dist(0.0, 0.5);
    for (int64_t i = lo; i < hi; ++i) u[i] = dist(rng);
  }, threads);

  const double avg_degree = target_sparsity * static_cast<double>(nd);

  // Per-destination degrees K_j ~ Poisson(p_j * ns), capped at ns.
  std::vector<int64_t> deg(nd);
  int64_t total = 0;
  for (int64_t j = 0; j < nd; ++j) {
    double expected = Z[j] / z_sum * avg_degree * static_cast<double>(ns);
    std::poisson_distribution<int64_t> pois(expected);
    deg[j] = std::min<int64_t>(pois(master), ns);
    total += deg[j];
  }

  // Edge generation per destination: sample sources with replacement, sort,
  // dedupe (same semantics as the vectorized numpy generator). Parallel over
  // destinations with per-destination deterministic streams.
  std::vector<std::vector<int32_t>> dest_sources(nd);
  std::vector<std::vector<double>> dest_c(nd);
  uint64_t edge_seed = master();
  std::vector<int64_t> col_counts_atomic(ns, 0);
  std::vector<std::unique_ptr<std::atomic<int64_t>>> unused;  // placeholder
  // Use per-thread column count buffers merged later to avoid atomics.
  int nt = threads > 0 ? threads : hardware_threads();
  std::vector<std::vector<int64_t>> col_counts_tls(nt, std::vector<int64_t>(ns, 0));

  {
    std::atomic<int64_t> next_j{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&, t] {
        auto& counts = col_counts_tls[t];
        for (;;) {
          int64_t j = next_j.fetch_add(1);
          if (j >= nd) break;
          int64_t k = deg[j];
          if (k == 0) continue;
          std::mt19937_64 rng(edge_seed ^ (static_cast<uint64_t>(j) * 0xD1B54A32D192ED03ull));
          std::uniform_int_distribution<int64_t> src_dist(0, ns - 1);
          auto& srcs = dest_sources[j];
          srcs.resize(k);
          for (int64_t e = 0; e < k; ++e) srcs[e] = static_cast<int32_t>(src_dist(rng));
          std::sort(srcs.begin(), srcs.end());
          srcs.erase(std::unique(srcs.begin(), srcs.end()), srcs.end());

          std::lognormal_distribution<double> ln_eps(0.0, 0.5);
          auto& cs = dest_c[j];
          cs.resize(srcs.size());
          for (size_t e = 0; e < srcs.size(); ++e) {
            double c_ij = std::min(v[j] * u[srcs[e]] * ln_eps(rng), 0.5);
            cs[e] = c_ij;
            counts[srcs[e]] += 1;
          }
        }
      });
    }
    for (auto& th : pool) th.join();
  }

  // CSC assembly: counting sort on column (source) id — O(E), no comparison
  // sort over the full edge list.
  g->indptr.assign(ns + 1, 0);
  for (int64_t i = 0; i < ns; ++i) {
    int64_t c = 0;
    for (int t = 0; t < nt; ++t) c += col_counts_tls[t][i];
    g->indptr[i + 1] = g->indptr[i] + c;
  }
  int64_t nnz = g->indptr[ns];
  g->rows.resize(nnz);
  g->a_vals.resize(nnz);
  g->c_vals.resize(nnz);

  std::vector<int64_t> cursor(g->indptr.begin(), g->indptr.end() - 1);
  // Iterate destinations in ascending order: within each column, rows
  // (destinations) are then appended in ascending order — already sorted and
  // unique, no per-column sort needed.
  for (int64_t j = 0; j < nd; ++j) {
    const auto& srcs = dest_sources[j];
    const auto& cs = dest_c[j];
    for (size_t e = 0; e < srcs.size(); ++e) {
      int64_t pos = cursor[srcs[e]]++;
      g->rows[pos] = static_cast<int32_t>(j);
      double c_ij = cs[e];
      g->c_vals[pos] = c_ij;
      g->a_vals[pos] = s[j] * c_ij;
    }
  }

  // Non-trivial budgets: greedy per-source best-edge load × U(0.5, 1)
  // (reference :141-164). Parallel over columns with per-thread partials.
  std::vector<std::vector<double>> loads_tls(nt, std::vector<double>(nd, 0.0));
  parallel_for(ns, [&](int64_t lo, int64_t hi) {
    // map chunk -> thread slot by lo
    size_t slot = static_cast<size_t>((lo * nt) / std::max<int64_t>(ns, 1));
    if (slot >= static_cast<size_t>(nt)) slot = nt - 1;
    auto& loads = loads_tls[slot];
    for (int64_t i = lo; i < hi; ++i) {
      int64_t s0 = g->indptr[i], s1 = g->indptr[i + 1];
      if (s0 == s1) continue;
      int64_t best = s0;
      for (int64_t p = s0 + 1; p < s1; ++p)
        if (g->a_vals[p] > g->a_vals[best]) best = p;
      loads[g->rows[best]] += g->a_vals[best];
    }
  }, threads);

  g->b_vec.assign(nd, 0.0);
  std::mt19937_64 rho_rng(master());
  std::uniform_real_distribution<double> rho(0.5, 1.0);
  for (int64_t j = 0; j < nd; ++j) {
    double load = 1e-8;
    for (int t = 0; t < nt; ++t) load += loads_tls[t][j];
    g->b_vec[j] = rho(rho_rng) * load;
  }

  return g;
}

int64_t dualip_gen_nnz(void* handle) {
  return static_cast<Generated*>(handle)->indptr.back();
}

void dualip_gen_export(void* handle, int64_t* indptr, int32_t* rows,
                       double* a_vals, double* c_vals, double* b_vec) {
  auto* g = static_cast<Generated*>(handle);
  std::memcpy(indptr, g->indptr.data(), g->indptr.size() * sizeof(int64_t));
  std::memcpy(rows, g->rows.data(), g->rows.size() * sizeof(int32_t));
  std::memcpy(a_vals, g->a_vals.data(), g->a_vals.size() * sizeof(double));
  std::memcpy(c_vals, g->c_vals.data(), g->c_vals.size() * sizeof(double));
  std::memcpy(b_vec, g->b_vec.data(), g->b_vec.size() * sizeof(double));
}

void dualip_gen_free(void* handle) { delete static_cast<Generated*>(handle); }

// ---------------------------------------------------------------------------
// BlockCSC tile filler
// ---------------------------------------------------------------------------

// Scatter the CSC slices of `cols[0..K_valid)` into zero-padded (K, L)
// row/a/c tile buffers (row-major), plus lengths, global col ids, and an
// optional flat-index map for primal scatter-back. Buffers must be
// preallocated and zeroed (flat_idx filled with -1) by the caller.
void dualip_fill_tile(const int64_t* indptr, const int32_t* row_indices,
                      const float* a_data, const float* c_data,
                      const int64_t* cols, int64_t K_valid, int64_t L,
                      int32_t* rows_out, float* a_out, float* c_out,
                      int32_t* length_out, int32_t* colids_out,
                      int64_t* flat_idx_out, int threads) {
  parallel_for(K_valid, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      int64_t col = cols[k];
      int64_t s0 = indptr[col], s1 = indptr[col + 1];
      int64_t len = s1 - s0;
      length_out[k] = static_cast<int32_t>(len);
      colids_out[k] = static_cast<int32_t>(col);
      int64_t base = k * L;
      for (int64_t e = 0; e < len; ++e) {
        rows_out[base + e] = row_indices[s0 + e];
        a_out[base + e] = a_data[s0 + e];
        c_out[base + e] = c_data[s0 + e];
        if (flat_idx_out) flat_idx_out[base + e] = s0 + e;
      }
    }
  }, threads);
}

// ---------------------------------------------------------------------------
// Benes-network router
// ---------------------------------------------------------------------------

// Routes a bijection src0 on N = 2^n slots through a 2n-1 stage Benes
// network (same looping-argument construction, bit-for-bit, as the numpy
// router in dualip_tpu/ops/butterfly.py::benes_route — cited there).  The
// numpy router vectorizes the 2-coloring with pointer doubling, O(N log^2 N)
// with large temporaries; here cycles are walked directly, O(N log N) with
// small constants, and every per-slot pass parallelizes across the thread
// pool (the cycles of h are confined to independent 2^(b+1)-slot blocks).
//
// src0: input slot feeding each output slot (caller completes the bijection
// and zero-pads, exactly as the numpy router does).  masks_out: (2n-1, N)
// int8, caller-allocated.
void dualip_benes_route(int64_t N, const int32_t* src0, int8_t* masks_out,
                        int threads) {
  int n = 0;
  while ((int64_t(1) << n) < N) ++n;
  int64_t n_stages = 2 * n - 1;

  std::vector<int32_t> src(src0, src0 + N);
  std::vector<int32_t> inv(N), rep(N), color(N), new_src(N);

  for (int t = 0; t < n - 1; ++t) {
    int b = n - 1 - t;
    int32_t D = int32_t(1) << b;
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) inv[src[i]] = static_cast<int32_t>(i);
    }, threads);

    // h(i) = inv[src[i ^ D] ^ D]; its cycles live inside 2^(b+1) blocks.
    int64_t B = int64_t(1) << (b + 1);
    int64_t n_blocks = N / B;
    auto color_block = [&](int64_t blo, int64_t bhi) {
      for (int64_t blk = blo; blk < bhi; ++blk) {
        int64_t base = blk * B;
        // rep[i] = min slot id over the h-orbit of i (walk each orbit twice)
        for (int64_t i = base; i < base + B; ++i) rep[i] = -1;
        for (int64_t i = base; i < base + B; ++i) {
          if (rep[i] >= 0) continue;
          int32_t mn = static_cast<int32_t>(i);
          int32_t j = static_cast<int32_t>(i);
          do {
            if (j < mn) mn = j;
            j = inv[src[j ^ D] ^ D];
          } while (j != static_cast<int32_t>(i));
          do {
            rep[j] = mn;
            j = inv[src[j ^ D] ^ D];
          } while (j != static_cast<int32_t>(i));
        }
        for (int64_t i = base; i < base + B; ++i)
          color[i] = rep[i] > rep[i ^ D] ? 1 : 0;
      }
    };
    if (n_blocks >= 2) {
      parallel_for(n_blocks, color_block, threads);
    } else {
      color_block(0, n_blocks);
    }

    int8_t* m_entry = masks_out + int64_t(t) * N;
    int8_t* m_exit = masks_out + (n_stages - 1 - t) * N;
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        int32_t j = src[i];
        m_entry[j] = static_cast<int8_t>(((j >> b) & 1) != color[i]);
        m_exit[i] = static_cast<int8_t>(((i >> b) & 1) != color[i]);
        int32_t i2 = (static_cast<int32_t>(i) & ~D) | (color[i] << b);
        int32_t j2 = (j & ~D) | (color[i] << b);
        new_src[i2] = j2;
      }
    }, threads);
    std::swap(src, new_src);
  }

  // middle stage (distance 1): remaining disagreement is a pair swap
  int8_t* m_mid = masks_out + int64_t(n - 1) * N;
  parallel_for(N, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      m_mid[i] = static_cast<int8_t>(src[i] != static_cast<int32_t>(i));
  }, threads);
}

int dualip_native_abi_version() { return 2; }

}  // extern "C"
