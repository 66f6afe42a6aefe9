// Fast ORBvoc.txt parser (C++, exposed via ctypes).
//
// TPU-native counterpart of the reference's vocabulary text load
// (reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:241
// loadFromTextFile), which dominates its startup (SURVEY.md §3.1 calls
// the ~1M-word parse out as SLOW). The reference parses with C++ stream
// extraction per token; this loader memory-maps the file and scans with
// branch-light integer/float parsing, filling flat arrays the Python
// side turns into the array-form vocabulary (vocab/vocabulary.py
// _assemble_from_flat).
//
// Format per node line: parent_id is_leaf d0..d31 weight
// Header line: k L scoring_id weighting_id
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct VocabData {
  int32_t k;
  int32_t depth;
  int64_t n_nodes;
  int32_t* parents;   // (n,)
  uint8_t* is_leaf;   // (n,)
  uint8_t* desc;      // (n,32)
  double* weights;    // (n,)
};

static inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
  return p;
}

static inline const char* parse_i64(const char* p, const char* end, int64_t* out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && *p == '-') { neg = true; ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  *out = neg ? -v : v;
  return p;
}

static inline const char* parse_f64(const char* p, const char* end, double* out) {
  p = skip_ws(p, end);
  char* q = nullptr;
  *out = strtod(p, &q);
  return q ? q : p;
}

// Parse the whole file. Returns nullptr on failure. Caller frees with
// vocab_free().
VocabData* vocab_load(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  size_t size = (size_t)st.st_size;
  const char* data =
      (const char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return nullptr;
  const char* p = data;
  const char* end = data + size;

  int64_t k = 0, depth = 0, s1 = 0, s2 = 0;
  p = parse_i64(p, end, &k);
  p = parse_i64(p, end, &depth);
  p = parse_i64(p, end, &s1);
  p = parse_i64(p, end, &s2);
  if (k <= 0 || depth <= 0 || k > 1024 || depth > 16) {
    munmap((void*)data, size);
    return nullptr;
  }

  // Upper bound on node count: geometric series; grow arrays on demand.
  int64_t cap = 1 << 20;
  int64_t n = 0;
  int32_t* parents = (int32_t*)malloc(cap * sizeof(int32_t));
  uint8_t* leaf = (uint8_t*)malloc(cap);
  uint8_t* desc = (uint8_t*)malloc(cap * 32);
  double* weights = (double*)malloc(cap * sizeof(double));

  while (true) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (n == cap) {
      cap *= 2;
      parents = (int32_t*)realloc(parents, cap * sizeof(int32_t));
      leaf = (uint8_t*)realloc(leaf, cap);
      desc = (uint8_t*)realloc(desc, cap * 32);
      weights = (double*)realloc(weights, cap * sizeof(double));
    }
    int64_t parent = 0, is_leaf_v = 0, byte = 0;
    p = parse_i64(p, end, &parent);
    p = parse_i64(p, end, &is_leaf_v);
    for (int b = 0; b < 32; ++b) {
      p = parse_i64(p, end, &byte);
      desc[n * 32 + b] = (uint8_t)byte;
    }
    double wgt = 0.0;
    p = parse_f64(p, end, &wgt);
    parents[n] = (int32_t)parent;
    leaf[n] = (uint8_t)is_leaf_v;
    weights[n] = wgt;
    ++n;
  }
  munmap((void*)data, size);

  VocabData* out = (VocabData*)malloc(sizeof(VocabData));
  out->k = (int32_t)k;
  out->depth = (int32_t)depth;
  out->n_nodes = n;
  out->parents = parents;
  out->is_leaf = leaf;
  out->desc = desc;
  out->weights = weights;
  return out;
}

void vocab_free(VocabData* v) {
  if (!v) return;
  free(v->parents);
  free(v->is_leaf);
  free(v->desc);
  free(v->weights);
  free(v);
}

}  // extern "C"
