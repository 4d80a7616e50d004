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
#include <limits>
#include <memory>
#include <random>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 2 : static_cast<int>(n);
}

// Parallel for over [0, n) in contiguous chunks.  `min_n` is the serial
// cutoff: the default 4096 suits per-element bodies; callers whose bodies
// carry coarse-grained work per index (e.g. a whole cache block of router
// stages) should pass a small min_n so even a handful of indices spread
// across threads.
template <typename F>
void parallel_for(int64_t n, F&& fn, int max_threads = 0, int64_t min_n = 4096) {
  int nt = max_threads > 0 ? max_threads : hardware_threads();
  if (n < min_n || nt <= 1) {
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
// The walk is latency-bound (a serial chase of random-access pointers), so
// the dependent-load chain is cut 8x vs the naive construction:
//   * h is materialized per stage (hbuf[i] = inv[src[i^D]^D], an independent
//     gather pass the core pipelines) so each chase step is ONE dependent
//     load instead of two;
//   * each orbit is walked ONCE, recorded into a scratch buffer, and both
//     its own color and its XOR-complement orbit's color are written from
//     the replay: the h-orbit of i^D is exactly {j^D : j in orbit(i)}
//     (adjacent elements of the alternating constraint cycle land in
//     opposite parity classes), so min(orbit(i^D)) = min over the recorded
//     orbit of j^D — no second walk, and the complement orbit is never
//     chased at all.  Fixed points (identity-completed padding slots —
//     see rowmajor.py's identity-preferring completion) short-circuit.
//
namespace benes {

// Tag byte per slot: (epoch << 1) | color.  Epoch advances per stage, so no
// per-stage clear is needed.  The coarse-phase shared tag uses relaxed
// std::atomic<uint8_t> accesses: concurrent writers always store the
// identical value (two threads walking an orbit/its complement compute the
// same min-id pair), so relaxed atomics compile to the same plain byte ops
// while staying standard-clean (no formal data race under TSan).
static inline bool tag_fresh(const uint8_t* tag, int64_t i, uint8_t epoch) {
  return (tag[i] >> 1) == epoch;
}
static inline bool tag_fresh_atomic(const std::atomic<uint8_t>* tag, int64_t i,
                                    uint8_t epoch) {
  return (tag[i].load(std::memory_order_relaxed) >> 1) == epoch;
}

// One routing stage on slots [base, base+M) of src (M = 2^(b+1)..N, a
// whole number of independent 2^(b+1) cycle blocks).  inv/hbuf/tag are
// M-sized scratch indexed LOCALLY (i - base); masks/new_src absolute.
// `kcut`: number of cycle-cut chains for the orbit walk (1 = plain serial
// chase; >1 spreads K marked points around each orbit with h^K jump tables
// and walks K independent dependency chains — the chase is latency-bound,
// so K concurrent chains run ~K× faster until the memory system saturates).
struct StageScratch {
  std::vector<int32_t> inv, hbuf, hk;  // hk: h^K jump table (coarse only)
  std::vector<uint8_t> tag;
  std::vector<int32_t> record;
  uint8_t epoch = 0;
  void ensure(int64_t M, bool with_hk) {
    if ((int64_t)inv.size() < M) {
      inv.resize(M);
      hbuf.resize(M);
      tag.assign(M, 0);
      epoch = 0;
    }
    if (with_hk && (int64_t)hk.size() < M) hk.resize(M);
  }
};

}  // namespace benes

}  // extern "C"

namespace {

// Mask output policies for the router.  The int8 sink writes the classic
// (2n-1, N) dense masks; the packed sink ORs bits straight into
// (ceil(S/8), N) uint8 bit-planes (stage s -> bit s&7 of plane s>>3, the
// exact _packbits_stages/plan-cache format) — at the canonical N=2^29 the
// dense form is 30.6 GB of transient RSS that the packed form never
// allocates.  Race-freedom of the packed |= without atomics: within one
// coarse stage the entry writes hit unique bytes (j = src[i] is a
// bijection) and the exit writes hit unique bytes (i); entry row t and
// exit row S-1-t live in DIFFERENT planes whenever S-1-2t >= 8, which
// holds for every coarse stage at block_log2 >= 4 (fine-phase writes are
// single-threaded per block and block byte ranges never overlap).
struct MaskSink8 {
  int8_t* out;
  int64_t N;
  inline void set(int64_t stage, int64_t i, int v) const {
    out[stage * N + i] = static_cast<int8_t>(v);
  }
};
struct MaskSinkPacked {
  uint8_t* out;  // (ceil(S/8), N), caller-zeroed
  int64_t N;
  inline void set(int64_t stage, int64_t i, int v) const {
    if (v) out[(stage >> 3) * N + i] |= static_cast<uint8_t>(1u << (stage & 7));
  }
};

// Routes a bijection src0 on N = 2^n slots through a 2n-1 stage Benes
// network (same looping-argument construction, bit-for-bit, as the numpy
// router in dualip_tpu/ops/butterfly.py::benes_route — cited there).  The
// numpy router vectorizes the 2-coloring with pointer doubling, O(N log^2 N)
// with large temporaries; here cycles are walked directly and the work is
// split into two phases shaped by the memory hierarchy:
//
//   * COARSE stages (cycle blocks 2^(b+1) > the fine block size): full-N
//     passes.  The orbit walk is a latency-bound serial pointer chase, so
//     it is cut three ways: h is materialized (hbuf[i] = inv[src[i^D]^D])
//     so each step is ONE dependent load; each orbit is walked ONCE and
//     colors for both it and its XOR-complement orbit are written from the
//     recorded walk (the h-orbit of i^D is exactly {j^D : j in orbit(i)},
//     so min(orbit(i^D)) falls out of the same walk); and K=16 marked
//     points are spread around each long orbit via an h^16 jump table,
//     giving 16 independent dependency chains per thread (each chain walks
//     stride-16 from its mark until it reaches any mark — together they
//     cover the orbit exactly once for any gcd(16, L)).
//   * FINE stages (all remaining b, plus the middle stage): processed
//     block-by-block, each 2^bf-slot block running ALL its remaining
//     stages while resident in cache — one pass over HBM instead of one
//     per stage.  Blocks are independent (the Benes recursion confines
//     later cycles inside them) and parallelize across threads.
//
// Fixed points (identity-completed padding slots — see rowmajor.py's
// identity-preferring completion) short-circuit in O(1) everywhere.
//
// src0: input slot feeding each output slot (caller completes the bijection
// and zero-pads, exactly as the numpy router does).  sink: mask output
// policy (MaskSink8 / MaskSinkPacked above).  block_log2: fine-phase block
// size (working set ~17 B/slot must fit the per-thread share of LLC; <=0
// picks the default).
template <class Sink>
void benes_route_impl(int64_t N, const int32_t* src0, Sink sink,
                      int threads, int block_log2) {
  int n = 0;
  while ((int64_t(1) << n) < N) ++n;
  int64_t n_stages = 2 * n - 1;
  int nt = threads > 0 ? threads : hardware_threads();
  // Default sized for per-core L2 (~4 MB here): a 2^16-slot block's working
  // set (src+inv+hbuf+tag ~13 B/slot = ~850 KB) stays cache-resident per
  // thread; measured faster than L3-sized blocks on this host at N=2^26
  // (fine phase 11 s vs 44 s at 2^22 — virtualized LLC undercuts lscpu).
  if (block_log2 <= 0) block_log2 = 16;
  int bf = std::min(block_log2, n);
  constexpr int K = 16;  // cycle-cut chains (and the h^K jump stride)

  std::vector<int32_t> src(src0, src0 + N);
  std::vector<int32_t> new_src(N);

  // ---- coarse phase: stages with cycle blocks 2^(b+1) > 2^bf ------------
  std::vector<int32_t> inv, hbuf, hk;
  // Shared across walker threads: relaxed atomics (identical-value writes;
  // see benes::tag_fresh).  value-initialized to 0 by the () in new[].
  std::unique_ptr<std::atomic<uint8_t>[]> tag;
  int t = 0;
  if (n > bf) {  // the coarse loop runs iff the first stage's 2^n block > 2^bf
    inv.resize(N);
    hbuf.resize(N);
    hk.resize(N);
    tag.reset(new std::atomic<uint8_t>[N]());
  }
  std::vector<std::vector<int32_t>> scratch(nt);
  for (; t < n - 1 && (n - 1 - t) + 1 > bf; ++t) {
    int b = n - 1 - t;
    int32_t D = int32_t(1) << b;
    uint8_t epoch = static_cast<uint8_t>((t & 0x7F) + 1);
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) inv[src[i]] = static_cast<int32_t>(i);
    }, threads);
    // h(i) = inv[src[i ^ D] ^ D]; its cycles live inside 2^(b+1) blocks.
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) hbuf[i] = inv[src[i ^ D] ^ D];
    }, threads);
    // h^K jump table by repeated squaring (4 gather passes for K=16);
    // fixed points stay fixed, so the passes are cheap on identity tails.
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) hk[i] = hbuf[hbuf[i]];  // h^2
    }, threads);
    for (int sq = 0; sq < 3; ++sq) {  // h^4, h^8, h^16
      parallel_for(N, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) new_src[i] = hk[hk[i]];
      }, threads);
      std::swap(hk, new_src);
    }

    // Orbit coloring.  Threads claim unvisited orbit starts from disjoint
    // scan ranges; races (two threads walking an orbit and/or its
    // complement concurrently) are benign — both compute the identical
    // min-id pair, so every tag write is idempotent, and a lost mark only
    // costs a duplicate walk.
    std::atomic<int> tid_counter{0};
    parallel_for(N, [&](int64_t lo, int64_t hi) {
      int tid = tid_counter.fetch_add(1);
      auto& sc = scratch[tid % nt];
      for (int64_t i = lo; i < hi; ++i) {
        if (benes::tag_fresh_atomic(tag.get(), i, epoch)) continue;
        int32_t first = static_cast<int32_t>(i);
        int32_t j = hbuf[i];
        if (j == first) {  // fixed point: orbit {i}, complement {i^D}
          tag[i].store(static_cast<uint8_t>((epoch << 1) | ((i >> b) & 1)),
                       std::memory_order_relaxed);
          continue;
        }
        // Marked points: first, h(first), ..., h^(K-1)(first).
        int32_t marks[K];
        int nm = 1;
        marks[0] = first;
        int32_t mn = first, mnc = first ^ D;
        sc.clear();
        sc.push_back(first);
        bool tiny = false;
        for (; nm < K; ++nm) {
          if (j == first) {  // orbit length < K: fully recorded already
            tiny = true;
            break;
          }
          marks[nm] = j;
          sc.push_back(j);
          if (j < mn) mn = j;
          if ((j ^ D) < mnc) mnc = j ^ D;
          j = hbuf[j];
        }
        if (!tiny) {
          // K chains, stride h^K, each runs until it reaches ANY mark;
          // round-robin so ~K cache misses are in flight at once.
          int32_t cur[K];
          bool live[K];
          int n_live = K;
          for (int k = 0; k < K; ++k) {
            cur[k] = hk[marks[k]];
            live[k] = true;
          }
          while (n_live > 0) {
            for (int k = 0; k < K; ++k) {
              if (!live[k]) continue;
              int32_t v = cur[k];
              bool is_mark = false;
              for (int q = 0; q < K; ++q) is_mark |= (v == marks[q]);
              if (is_mark) {
                live[k] = false;
                --n_live;
                continue;
              }
              sc.push_back(v);
              if (v < mn) mn = v;
              if ((v ^ D) < mnc) mnc = v ^ D;
              cur[k] = hk[v];
            }
          }
        }
        uint8_t col = static_cast<uint8_t>(mn > mnc);
        uint8_t tv = static_cast<uint8_t>((epoch << 1) | col);
        uint8_t tw = static_cast<uint8_t>((epoch << 1) | (1 - col));
        for (int32_t v : sc) {
          tag[v].store(tv, std::memory_order_relaxed);
          tag[v ^ D].store(tw, std::memory_order_relaxed);
        }
      }
    }, threads);

    parallel_for(N, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        int32_t j = src[i];
        int32_t color = tag[i].load(std::memory_order_relaxed) & 1;
        sink.set(t, j, ((j >> b) & 1) != color);
        sink.set(n_stages - 1 - t, i, ((i >> b) & 1) != color);
        int32_t i2 = (static_cast<int32_t>(i) & ~D) | (color << b);
        int32_t j2 = (j & ~D) | (color << b);
        new_src[i2] = j2;
      }
    }, threads);
    std::swap(src, new_src);
  }

  // ---- fine phase: every remaining stage, block-resident ----------------
  // After the coarse stages, cycles are confined to 2^bfi blocks
  // (bfi = b_next + 1): each block runs stages b = bfi-1 .. 1 plus the
  // middle stage entirely in cache, writing its absolute slices of the
  // entry/exit mask rows.
  int t0_fine = t;
  int bfi = (t0_fine < n - 1) ? (n - 1 - t0_fine) + 1 : std::min(n, 1);
  int64_t B = int64_t(1) << bfi;
  int64_t n_blocks = N / B;
  if (n_blocks == 0) {
    n_blocks = 1;
    B = N;
  }
  {
    std::vector<benes::StageScratch> per_thread(nt);
    std::atomic<int> tid_counter{0};
    parallel_for(n_blocks, [&](int64_t blo, int64_t bhi) {
      int tid = tid_counter.fetch_add(1) % nt;
      auto& ss = per_thread[tid];
      ss.ensure(B, false);
      auto& sc = scratch[tid];
      for (int64_t blk = blo; blk < bhi; ++blk) {
        int64_t base = blk * B;
        int32_t* sb = src.data() + base;
        for (int tt = t0_fine; tt < n - 1; ++tt) {
          int b = n - 1 - tt;
          int32_t D = int32_t(1) << b;
          uint8_t epoch = static_cast<uint8_t>((tt & 0x7F) + 1);
          if (ss.epoch >= epoch && tt == t0_fine) {
            // new block reusing scratch: restart the epoch sequence
            std::memset(ss.tag.data(), 0, B);
          }
          for (int64_t i = 0; i < B; ++i) ss.inv[sb[i] - base] = static_cast<int32_t>(i);
          for (int64_t i = 0; i < B; ++i)
            ss.hbuf[i] = ss.inv[(sb[i ^ D] - base) ^ D];
          for (int64_t i = 0; i < B; ++i) {
            if (benes::tag_fresh(ss.tag.data(), i, epoch)) continue;
            int32_t first = static_cast<int32_t>(i);
            int32_t j = ss.hbuf[i];
            if (j == first) {
              ss.tag[i] = static_cast<uint8_t>((epoch << 1) | ((i >> b) & 1));
              continue;
            }
            sc.clear();
            int32_t mn = first, mnc = first ^ D;
            sc.push_back(first);
            for (; j != first; j = ss.hbuf[j]) {
              sc.push_back(j);
              if (j < mn) mn = j;
              if ((j ^ D) < mnc) mnc = j ^ D;
            }
            uint8_t col = static_cast<uint8_t>(mn > mnc);
            uint8_t tv = static_cast<uint8_t>((epoch << 1) | col);
            uint8_t tw = static_cast<uint8_t>((epoch << 1) | (1 - col));
            for (int32_t v : sc) {
              ss.tag[v] = tv;
              ss.tag[v ^ D] = tw;
            }
          }
          for (int64_t i = 0; i < B; ++i) {
            int32_t j = sb[i] - static_cast<int32_t>(base);
            int32_t color = ss.tag[i] & 1;
            sink.set(tt, base + j, ((j >> b) & 1) != color);
            sink.set(n_stages - 1 - tt, base + i, ((i >> b) & 1) != color);
            int32_t i2 = (static_cast<int32_t>(i) & ~D) | (color << b);
            int32_t j2 = (j & ~D) | (color << b);
            ss.inv[i2] = j2 + static_cast<int32_t>(base);  // reuse inv as new_src
          }
          std::memcpy(sb, ss.inv.data(), B * sizeof(int32_t));
          ss.epoch = epoch;
        }
        // middle stage (distance 1): remaining disagreement is a pair swap
        for (int64_t i = 0; i < B; ++i)
          sink.set(n - 1, base + i, sb[i] != static_cast<int32_t>(base + i));
      }
      // min_n=2: each index is a whole cache block carrying every remaining
      // stage's work, so parallelize even when n_blocks < the per-element
      // cutoff (all N < 2^28 at the default block_log2=16).
    }, threads, /*min_n=*/2);
  }
}

}  // namespace

extern "C" {

// Classic dense-mask entry point: masks_out is (2n-1, N) int8.
void dualip_benes_route(int64_t N, const int32_t* src0, int8_t* masks_out,
                        int threads, int block_log2) {
  benes_route_impl(N, src0, MaskSink8{masks_out, N}, threads, block_log2);
}

// Packed entry point: planes_out is (ceil((2n-1)/8), N) uint8 bit-planes,
// caller-ZEROED (bits are only ever set).  Same masks bit-for-bit as the
// dense form after _packbits_stages; never materializes the (2n-1, N)
// array (30.6 GB at the canonical N=2^29).  block_log2 is clamped to >= 4:
// the no-atomics |= writes rely on every coarse stage's entry/exit rows
// living in different planes (see MaskSinkPacked).
void dualip_benes_route_packed(int64_t N, const int32_t* src0,
                               uint8_t* planes_out, int threads,
                               int block_log2) {
  if (block_log2 <= 0) block_log2 = 16;
  if (block_log2 < 4) block_log2 = 4;
  benes_route_impl(N, src0, MaskSinkPacked{planes_out, N}, threads, block_log2);
}

// ---------------------------------------------------------------------------
// Streaming synthetic generator: O(num_sources) RSS at any nnz
// ---------------------------------------------------------------------------
//
// The buffered generator above holds the per-destination edge lists AND the
// assembled CSC in RAM (~39 B/nnz — 97 GB at the scaling grid's 2.5B-nnz
// row).  The streaming variant exploits that every destination's edge list
// comes from its own deterministic RNG stream (edge_seed ^ j*const), so the
// edges can be REGENERATED instead of stored:
//
//   pass A (count): sample each destination's sources, count per-column
//     degrees into a shared atomic array — no edge is kept;
//   pass B (fill):  re-sample in destination batches (bounded edge count),
//     then scatter each batch serially in ascending destination order
//     straight into caller-provided (memmapped) CSC arrays; ascending-j
//     scatter keeps rows sorted and unique within each column, and the
//     greedy best-edge load for budgets is folded into the same sweep.
//
// Peak malloc'd state is O(ns): u factors + cursor + best-edge trackers
// (~29 B/source) + one batch of edges.  Output values are written float32
// (the memmap cache tier's dtype).  Deterministic for a given seed
// regardless of thread count (the buffered generator's u-draws were
// thread-chunked; here u uses a fixed 2^20 chunk).

namespace {

struct StreamGen {
  int64_t ns, nd;
  int threads;
  std::vector<double> s, v;    // (nd) destination factors
  std::vector<double> u;       // (ns) source affinities
  std::vector<int64_t> deg;    // (nd) per-destination sample counts
  uint64_t edge_seed, rho_seed;
};

// Re-derive destination j's source list (sorted, unique) from its stream.
// The rng is left positioned after the source draws so pass B can continue
// with the eps draws — identical to the buffered generator's draw order.
inline void stream_sample_sources(const StreamGen* g, int64_t j,
                                  std::mt19937_64& rng,
                                  std::vector<int32_t>& srcs) {
  srcs.clear();
  int64_t k = g->deg[j];
  if (k == 0) return;
  rng.seed(g->edge_seed ^ (static_cast<uint64_t>(j) * 0xD1B54A32D192ED03ull));
  std::uniform_int_distribution<int64_t> src_dist(0, g->ns - 1);
  srcs.resize(k);
  for (int64_t e = 0; e < k; ++e) srcs[e] = static_cast<int32_t>(src_dist(rng));
  std::sort(srcs.begin(), srcs.end());
  srcs.erase(std::unique(srcs.begin(), srcs.end()), srcs.end());
}

}  // namespace

void* dualip_gen_stream_create(int64_t ns, int64_t nd, double target_sparsity,
                               uint64_t seed, int threads) {
  auto* g = new StreamGen();
  g->ns = ns;
  g->nd = nd;
  g->threads = threads;

  // Same master draw order as dualip_gen_create: Z/s/v interleaved per
  // destination, u_seed, degrees, edge_seed — then the rho seed.
  std::mt19937_64 master(seed);
  std::lognormal_distribution<double> ln_p(0.0, 1.0), ln_s(0.0, 1.0),
      ln_v(-4.0, 0.75);
  std::vector<double> Z(nd);
  double z_sum = 0.0;
  g->s.resize(nd);
  g->v.resize(nd);
  for (int64_t j = 0; j < nd; ++j) {
    Z[j] = ln_p(master);
    g->s[j] = ln_s(master);
    g->v[j] = ln_v(master);
    z_sum += Z[j];
  }
  if (z_sum == 0.0) {
    std::fill(Z.begin(), Z.end(), 1.0);
    z_sum = static_cast<double>(nd);
  }

  g->u.resize(ns);
  uint64_t u_seed = master();
  const int64_t UCH = int64_t{1} << 20;  // fixed chunk: thread-count invariant
  parallel_for((ns + UCH - 1) / UCH, [&](int64_t clo, int64_t chi) {
    for (int64_t ci = clo; ci < chi; ++ci) {
      int64_t lo = ci * UCH, hi = std::min(ns, lo + UCH);
      std::mt19937_64 rng(u_seed ^ static_cast<uint64_t>(lo) * 0x9E3779B97F4A7C15ull);
      std::lognormal_distribution<double> dist(0.0, 0.5);
      for (int64_t i = lo; i < hi; ++i) g->u[i] = dist(rng);
    }
  }, threads, /*min_n=*/1);

  const double avg_degree = target_sparsity * static_cast<double>(nd);
  g->deg.resize(nd);
  for (int64_t j = 0; j < nd; ++j) {
    double expected = Z[j] / z_sum * avg_degree * static_cast<double>(ns);
    std::poisson_distribution<int64_t> pois(expected);
    g->deg[j] = std::min<int64_t>(pois(master), ns);
  }
  g->edge_seed = master();
  g->rho_seed = master();
  return g;
}

// Pass A: per-column degree counts into counts_out[1..ns] (counts_out[0]=0,
// so an in-place prefix sum by the caller turns the buffer into indptr).
// Returns total nnz.
int64_t dualip_gen_stream_count(void* handle, int64_t* counts_out) {
  auto* g = static_cast<StreamGen*>(handle);
  const int64_t ns = g->ns, nd = g->nd;
  std::unique_ptr<std::atomic<int32_t>[]> counts(new std::atomic<int32_t>[ns]);
  parallel_for(ns, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      counts[i].store(0, std::memory_order_relaxed);
  }, g->threads);

  int nt = g->threads > 0 ? g->threads : hardware_threads();
  std::atomic<int64_t> next_j{0};
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&] {
      std::vector<int32_t> srcs;
      std::mt19937_64 rng;
      for (;;) {
        int64_t j = next_j.fetch_add(1);
        if (j >= nd) break;
        stream_sample_sources(g, j, rng, srcs);
        for (int32_t i : srcs)
          counts[i].fetch_add(1, std::memory_order_relaxed);
      }
    });
  }
  for (auto& th : pool) th.join();

  counts_out[0] = 0;
  int64_t nnz = 0;
  for (int64_t i = 0; i < ns; ++i) {
    int64_t c = counts[i].load(std::memory_order_relaxed);
    counts_out[i + 1] = c;
    nnz += c;
  }
  return nnz;
}

// Pass B: regenerate edges in destination batches of <= batch_edges samples
// and scatter into the caller's CSC arrays (rows/a/c sized nnz; typically
// memmaps).  indptr is the prefix-summed output of pass A.  b_out (nd,
// float64) receives the greedy-load budgets.
void dualip_gen_stream_fill(void* handle, const int64_t* indptr,
                            int32_t* rows_out, float* a_out, float* c_out,
                            double* b_out, int64_t batch_edges) {
  auto* g = static_cast<StreamGen*>(handle);
  const int64_t ns = g->ns, nd = g->nd;
  if (batch_edges <= 0) batch_edges = int64_t{1} << 25;

  std::vector<int64_t> cursor(indptr, indptr + ns);
  std::vector<double> best_a(ns, -std::numeric_limits<double>::infinity());
  std::vector<int32_t> best_dest(ns, -1);

  int nt = g->threads > 0 ? g->threads : hardware_threads();
  std::vector<std::vector<int32_t>> batch_srcs;
  std::vector<std::vector<double>> batch_c;

  int64_t j0 = 0;
  while (j0 < nd) {
    // batch = [j0, j1): bounded by sampled-edge count
    int64_t j1 = j0, acc = 0;
    while (j1 < nd && (acc == 0 || acc + g->deg[j1] <= batch_edges)) {
      acc += g->deg[j1];
      ++j1;
    }
    int64_t bsz = j1 - j0;
    batch_srcs.resize(bsz);
    batch_c.resize(bsz);

    // parallel re-sample: each destination's stream is independent
    std::atomic<int64_t> next{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&] {
        std::mt19937_64 rng;
        for (;;) {
          int64_t bi = next.fetch_add(1);
          if (bi >= bsz) break;
          int64_t j = j0 + bi;
          auto& srcs = batch_srcs[bi];
          stream_sample_sources(g, j, rng, srcs);
          std::lognormal_distribution<double> ln_eps(0.0, 0.5);
          auto& cs = batch_c[bi];
          cs.resize(srcs.size());
          for (size_t e = 0; e < srcs.size(); ++e)
            cs[e] = std::min(g->v[j] * g->u[srcs[e]] * ln_eps(rng), 0.5);
        }
      });
    }
    for (auto& th : pool) th.join();

    // serial scatter in ascending j: rows stay sorted+unique per column,
    // and the strict-> best-edge update keeps the FIRST max (the buffered
    // generator's tie rule)
    for (int64_t bi = 0; bi < bsz; ++bi) {
      int64_t j = j0 + bi;
      const auto& srcs = batch_srcs[bi];
      const auto& cs = batch_c[bi];
      for (size_t e = 0; e < srcs.size(); ++e) {
        int32_t i = srcs[e];
        int64_t pos = cursor[i]++;
        rows_out[pos] = static_cast<int32_t>(j);
        double c_ij = cs[e];
        c_out[pos] = static_cast<float>(c_ij);
        double a_ij = g->s[j] * c_ij;
        a_out[pos] = static_cast<float>(a_ij);
        if (a_ij > best_a[i]) {
          best_a[i] = a_ij;
          best_dest[i] = static_cast<int32_t>(j);
        }
      }
    }
    j0 = j1;
  }

  std::vector<double> loads(nd, 0.0);
  for (int64_t i = 0; i < ns; ++i)
    if (best_dest[i] >= 0) loads[best_dest[i]] += best_a[i];
  std::mt19937_64 rho_rng(g->rho_seed);
  std::uniform_real_distribution<double> rho(0.5, 1.0);
  for (int64_t j = 0; j < nd; ++j) b_out[j] = rho(rho_rng) * (loads[j] + 1e-8);
}

void dualip_gen_stream_free(void* handle) {
  delete static_cast<StreamGen*>(handle);
}

int dualip_native_abi_version() { return 5; }

}  // extern "C"
