// Single-node libnuma shim (no dev headers in the image): malloc-backed
// allocation, one fake NUMA node. Subset used by the reference (SURVEY.md
// §2.1 NUMA-aware adjacency; core/graph.hpp:346-411).
#ifndef NSL_FAKE_NUMA_H
#define NSL_FAKE_NUMA_H

#include <cstdlib>
#include <cstring>
#include <unistd.h>

struct bitmask {
  unsigned long size;
  unsigned long *maskp;
};

static inline int numa_available(void) { return 0; }
static inline int numa_num_configured_nodes(void) { return 1; }
static inline int numa_num_configured_cpus(void) {
  long n = sysconf(_SC_NPROCESSORS_ONLN);
  return n > 0 ? (int)n : 1;
}
static inline void *numa_alloc_onnode(size_t size, int) {
  return calloc(1, size);
}
static inline void *numa_alloc_interleaved(size_t size) {
  return calloc(1, size);
}
static inline void *numa_realloc(void *old_addr, size_t,
                                 size_t new_size) {
  return realloc(old_addr, new_size);
}
static inline void numa_free(void *start, size_t) { free(start); }
static inline int numa_run_on_node(int) { return 0; }
static inline int numa_tonode_memory(void *, size_t, int) { return 0; }
static inline struct bitmask *numa_parse_nodestring(const char *) {
  static struct bitmask bm = {0, 0};
  return &bm;
}
static inline void numa_set_interleave_mask(struct bitmask *) {}

#endif  // NSL_FAKE_NUMA_H
