// hnsw_baseline: a from-scratch single-threaded HNSW index (CPU).
//
// Purpose: an honest, in-process stand-in for the reference's CPU vector
// engine (Qdrant's Rust HNSW, reference docker-compose.yml:2-9) so bench.py
// can report a *real* recall/QPS baseline on this host instead of a NumPy
// brute-force strawman. Implemented directly from the published algorithm
// (Malkov & Yashunin, "Efficient and robust approximate nearest neighbor
// search using Hierarchical Navigable Small World graphs", 2016): Alg. 1
// (insert), Alg. 2 (search-layer), Alg. 4 (neighbor-selection heuristic).
//
// Similarity: inner product over unit vectors == cosine, matching the
// engine's COSINE collections. Single-threaded by design (the bench host
// has 1 vCPU; Qdrant on this host would be single-threaded too).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Hnsw {
  int dim;
  int max_elements;
  int M;        // neighbors per node on layers > 0
  int M0;       // neighbors on layer 0 (2*M, per the paper's recommendation)
  int ef_construction;
  double mult;  // level multiplier 1/ln(M)
  std::mt19937 rng;

  int count = 0;
  int entry = -1;
  int max_level = -1;

  std::vector<float> data;             // [max_elements * dim]
  std::vector<int> levels;             // node -> top level
  // links[l][node] = neighbor list (flat, capped at M or M0).
  std::vector<std::vector<std::vector<int>>> links;

  const float* vec(int id) const { return data.data() + (size_t)id * dim; }

  float dot(const float* a, const float* b) const {
    // Four independent accumulators so the compiler can vectorize the
    // reduction without -ffast-math (strict float semantics block
    // single-accumulator loops from using SIMD).
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int i = 0;
    for (; i + 4 <= dim; i += 4) {
      s0 += a[i] * b[i];
      s1 += a[i + 1] * b[i + 1];
      s2 += a[i + 2] * b[i + 2];
      s3 += a[i + 3] * b[i + 3];
    }
    float s = (s0 + s1) + (s2 + s3);
    for (; i < dim; i++) s += a[i] * b[i];
    return s;
  }

  int cap_for(int level) const { return level == 0 ? M0 : M; }

  std::vector<std::vector<int>>& layer(int l) {
    while ((int)links.size() <= l)
      links.emplace_back(max_elements);
    return links[l];
  }

  // Algorithm 2: greedy best-first search on one layer. Returns up to ef
  // (similarity, id) pairs, highest similarity first.
  std::vector<std::pair<float, int>> search_layer(const float* q, int ep,
                                                  int ef, int l,
                                                  std::vector<int>& visited,
                                                  int visit_tag) {
    // max-heap of candidates by similarity; min-heap of results.
    std::priority_queue<std::pair<float, int>> cand;
    std::priority_queue<std::pair<float, int>,
                        std::vector<std::pair<float, int>>,
                        std::greater<>> result;
    float d0 = dot(q, vec(ep));
    cand.push({d0, ep});
    result.push({d0, ep});
    visited[ep] = visit_tag;
    auto& lks = layer(l);
    while (!cand.empty()) {
      auto [sim, c] = cand.top();
      if (sim < result.top().first && (int)result.size() >= ef) break;
      cand.pop();
      for (int nb : lks[c]) {
        if (visited[nb] == visit_tag) continue;
        visited[nb] = visit_tag;
        float s = dot(q, vec(nb));
        if ((int)result.size() < ef || s > result.top().first) {
          cand.push({s, nb});
          result.push({s, nb});
          if ((int)result.size() > ef) result.pop();
        }
      }
    }
    std::vector<std::pair<float, int>> out;
    out.reserve(result.size());
    while (!result.empty()) { out.push_back(result.top()); result.pop(); }
    std::reverse(out.begin(), out.end());  // best first
    return out;
  }

  // Algorithm 4: heuristic neighbor selection — keep a candidate only if it
  // is closer to the query than to every already-selected neighbor
  // (diversifies links across cluster boundaries).
  std::vector<int> select_neighbors(const float* q,
                                    std::vector<std::pair<float, int>>& cand,
                                    int m) {
    std::vector<int> out;
    for (auto& [sim, id] : cand) {  // cand is best-first
      if ((int)out.size() >= m) break;
      bool good = true;
      for (int sel : out) {
        if (dot(vec(id), vec(sel)) > sim) { good = false; break; }
      }
      if (good) out.push_back(id);
    }
    // Fill remaining slots with skipped candidates (keepPrunedConnections).
    if ((int)out.size() < m) {
      for (auto& [sim, id] : cand) {
        if ((int)out.size() >= m) break;
        if (std::find(out.begin(), out.end(), id) == out.end())
          out.push_back(id);
      }
    }
    return out;
  }

  std::vector<int> visited_buf;
  int visit_tag = 0;

  void add(const float* v) {
    int id = count++;
    std::memcpy(data.data() + (size_t)id * dim, v, dim * sizeof(float));
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    double u = std::max(unif(rng), 1e-12);
    int level = (int)(-std::log(u) * mult);
    levels[id] = level;
    layer(level);  // ensure layers exist

    if (entry < 0) {
      entry = id;
      max_level = level;
      return;
    }
    if ((int)visited_buf.size() < max_elements)
      visited_buf.assign(max_elements, 0);

    int ep = entry;
    // Greedy descent on layers above the node's level.
    for (int l = max_level; l > level; l--) {
      bool changed = true;
      float best = dot(v, vec(ep));
      while (changed) {
        changed = false;
        for (int nb : layer(l)[ep]) {
          float s = dot(v, vec(nb));
          if (s > best) { best = s; ep = nb; changed = true; }
        }
      }
    }
    // Insert on layers min(level, max_level) .. 0.
    for (int l = std::min(level, max_level); l >= 0; l--) {
      ++visit_tag;
      auto cand = search_layer(v, ep, ef_construction, l, visited_buf,
                               visit_tag);
      auto nbs = select_neighbors(v, cand, cap_for(l));
      auto& lks = layer(l);
      lks[id] = nbs;
      // Back-links with pruning.
      for (int nb : nbs) {
        auto& nl = lks[nb];
        nl.push_back(id);
        int cap = cap_for(l);
        if ((int)nl.size() > cap) {
          std::vector<std::pair<float, int>> c;
          c.reserve(nl.size());
          const float* nv = vec(nb);
          for (int x : nl) c.push_back({dot(nv, vec(x)), x});
          std::sort(c.begin(), c.end(),
                    [](auto& a, auto& b) { return a.first > b.first; });
          nl = select_neighbors(nv, c, cap);
        }
      }
      if (!cand.empty()) ep = cand[0].second;
    }
    if (level > max_level) { max_level = level; entry = id; }
  }

  int search(const float* q, int k, int ef, int* out_ids, float* out_sims) {
    if (entry < 0) return 0;
    if ((int)visited_buf.size() < max_elements)
      visited_buf.assign(max_elements, 0);
    int ep = entry;
    for (int l = max_level; l > 0; l--) {
      bool changed = true;
      float best = dot(q, vec(ep));
      while (changed) {
        changed = false;
        for (int nb : layer(l)[ep]) {
          float s = dot(q, vec(nb));
          if (s > best) { best = s; ep = nb; changed = true; }
        }
      }
    }
    ++visit_tag;
    auto res = search_layer(q, ep, std::max(ef, k), 0, visited_buf,
                            visit_tag);
    int n = std::min((int)res.size(), k);
    for (int i = 0; i < n; i++) {
      out_ids[i] = res[i].second;
      out_sims[i] = res[i].first;
    }
    return n;
  }
};

}  // namespace

extern "C" {

void* hnsw_create(int dim, int max_elements, int M, int ef_construction,
                  unsigned seed) {
  auto* h = new Hnsw();
  h->dim = dim;
  h->max_elements = max_elements;
  h->M = M;
  h->M0 = 2 * M;
  h->ef_construction = ef_construction;
  h->mult = 1.0 / std::log((double)M);
  h->rng.seed(seed);
  h->data.resize((size_t)max_elements * dim);
  h->levels.resize(max_elements, 0);
  return h;
}

void hnsw_free(void* p) { delete (Hnsw*)p; }

void hnsw_add_batch(void* p, const float* vecs, int n) {
  auto* h = (Hnsw*)p;
  for (int i = 0; i < n && h->count < h->max_elements; i++)
    h->add(vecs + (size_t)i * h->dim);
}

int hnsw_search(void* p, const float* q, int k, int ef, int* out_ids,
                float* out_sims) {
  return ((Hnsw*)p)->search(q, k, ef, out_ids, out_sims);
}

int hnsw_size(void* p) { return ((Hnsw*)p)->count; }

// ---- graph-only serialization --------------------------------------------
// Saves LINKS + levels, not vectors: bench corpora are deterministic
// (generated from a fixed PRNG key), so the loader re-fills `data` from the
// caller-provided vectors and only verifies a checksum. This keeps a 100k x
// 384 efc=200 graph cache ~25 MB instead of ~180 MB, cheap enough to commit
// so later bench runs skip the ~30 min single-thread build.

static const uint32_t kMagic = 0x484e5357;  // "HNSW"
static const uint32_t kVersion = 2;

// Checksum sampled STRIDED across the whole [count*dim] range (4096 probes),
// not a prefix: a corpus change anywhere must invalidate the cache, not
// just one that touches the first few rows.
static double data_checksum(const float* data, size_t total) {
  size_t nprobe = std::min(total, (size_t)4096);
  if (nprobe == 0) return 0.0;
  size_t stride = total / nprobe;
  if (stride == 0) stride = 1;
  double s = 0.0;
  for (size_t i = 0; i < nprobe; i++) s += data[i * stride];
  return s;
}

int hnsw_save_graph(void* p, const char* path) {
  auto* h = (Hnsw*)p;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  double csum = data_checksum(h->data.data(), (size_t)h->count * h->dim);
  uint32_t hdr[8] = {kMagic, kVersion, (uint32_t)h->dim,
                     (uint32_t)h->count, (uint32_t)h->M,
                     (uint32_t)h->ef_construction, (uint32_t)h->entry,
                     (uint32_t)h->max_level};
  bool ok = std::fwrite(hdr, sizeof(hdr), 1, f) == 1 &&
            std::fwrite(&csum, sizeof(csum), 1, f) == 1 &&
            std::fwrite(h->levels.data(), sizeof(int), h->count, f) ==
                (size_t)h->count;
  for (int l = 0; ok && l <= h->max_level; l++) {
    auto& lks = h->layer(l);
    for (int i = 0; ok && i < h->count; i++) {
      uint32_t sz = (uint32_t)lks[i].size();
      ok = std::fwrite(&sz, sizeof(sz), 1, f) == 1 &&
           (sz == 0 ||
            std::fwrite(lks[i].data(), sizeof(int), sz, f) == (size_t)sz);
    }
  }
  std::fclose(f);
  return ok ? 0 : -1;
}

void* hnsw_load_graph(const char* path, const float* vecs, int n, int dim,
                      int max_elements) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t hdr[8];
  double csum = 0.0;
  if (std::fread(hdr, sizeof(hdr), 1, f) != 1 || hdr[0] != kMagic ||
      hdr[1] != kVersion || (int)hdr[2] != dim || (int)hdr[3] != n ||
      std::fread(&csum, sizeof(csum), 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  double want = data_checksum(vecs, (size_t)n * dim);
  if (std::fabs(want - csum) > 1e-3 * (std::fabs(csum) + 1.0)) {
    std::fclose(f);  // corpus changed: cache invalid
    return nullptr;
  }
  // Structural validation: a truncated or bit-flipped cache must return
  // nullptr (-> rebuild fallback), never hand search() an out-of-range id
  // that becomes an OOB read/write.
  if ((int)hdr[6] >= n || (int)hdr[7] < 0 || (int)hdr[7] > 64 ||
      hdr[4] == 0 || hdr[4] > 1024) {
    std::fclose(f);
    return nullptr;
  }
  auto* h = (Hnsw*)hnsw_create(dim, std::max(max_elements, n), (int)hdr[4],
                               (int)hdr[5], 42);
  h->count = n;
  h->entry = (int)hdr[6];
  h->max_level = (int)hdr[7];
  std::memcpy(h->data.data(), vecs, (size_t)n * dim * sizeof(float));
  bool ok = std::fread(h->levels.data(), sizeof(int), n, f) == (size_t)n;
  for (int i = 0; ok && i < n; i++)
    ok = h->levels[i] >= 0 && h->levels[i] <= h->max_level;
  for (int l = 0; ok && l <= h->max_level; l++) {
    auto& lks = h->layer(l);
    for (int i = 0; ok && i < n; i++) {
      uint32_t sz = 0;
      ok = std::fread(&sz, sizeof(sz), 1, f) == 1 && sz <= (uint32_t)(h->M0 + 1) * 4;
      if (ok && sz) {
        lks[i].resize(sz);
        ok = std::fread(lks[i].data(), sizeof(int), sz, f) == (size_t)sz;
        for (uint32_t j = 0; ok && j < sz; j++)
          ok = lks[i][j] >= 0 && lks[i][j] < n;
      }
    }
  }
  std::fclose(f);
  if (!ok) { delete h; return nullptr; }
  return h;
}

}  // extern "C"
