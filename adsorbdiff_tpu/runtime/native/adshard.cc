// adshard: native columnar shard reader + padded-batch collator.
//
// TPU-native replacement for the reference's C-backed data path (the
// reference reads pickled torch_geometric objects out of LMDB — py-lmdb wraps
// the lmdb C library; ref: adsorbdiff/datasets/lmdb_dataset.py:30-223).  Here
// the host-side hot path is batch assembly: gathering S ragged systems and
// writing them into padded [B, N, ...] buffers every step.  This file mmaps
// the raw .adbin shard format (written by adsorbdiff_tpu.data.native) and
// fills caller-provided padded buffers with a thread pool, exposed to Python
// via ctypes (no pybind11 in this image).
//
// .adbin layout (little-endian):
//   magic "ADSB" | uint32 version | uint64 n_systems | uint64 total_atoms
//   offsets  int64 [n_systems + 1]
//   natoms   int32 [n_systems]
//   cell     f32   [n_systems, 3, 3]
//   sid      int64 [n_systems]
//   fid      int64 [n_systems]
//   energy   f32   [n_systems]
//   y_relaxed f32  [n_systems]
//   has_forces uint8
//   pos          f32 [total_atoms, 3]
//   atomic_numbers int32 [total_atoms]
//   tags         int32 [total_atoms]
//   fixed        uint8 [total_atoms]
//   pos_relaxed  f32 [total_atoms, 3]
//   forces       f32 [total_atoms, 3]          (iff has_forces)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

struct Shard {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n_systems = 0;
  uint64_t total_atoms = 0;
  const int64_t* offsets = nullptr;
  const int32_t* natoms = nullptr;
  const float* cell = nullptr;
  const int64_t* sid = nullptr;
  const int64_t* fid = nullptr;
  const float* energy = nullptr;
  const float* y_relaxed = nullptr;
  bool has_forces = false;
  const float* pos = nullptr;
  const int32_t* atomic_numbers = nullptr;
  const int32_t* tags = nullptr;
  const uint8_t* fixed = nullptr;
  const float* pos_relaxed = nullptr;
  const float* forces = nullptr;
};

}  // namespace

extern "C" {

void* adb_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* s = new Shard();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(mem);
  s->size = st.st_size;

  const uint8_t* p = s->base;
  if (memcmp(p, "ADSB", 4) != 0) { delete s; return nullptr; }
  p += 4;
  uint32_t version; memcpy(&version, p, 4); p += 4;
  if (version != 1) { delete s; return nullptr; }
  memcpy(&s->n_systems, p, 8); p += 8;
  memcpy(&s->total_atoms, p, 8); p += 8;

  s->offsets = reinterpret_cast<const int64_t*>(p); p += 8 * (s->n_systems + 1);
  s->natoms = reinterpret_cast<const int32_t*>(p); p += 4 * s->n_systems;
  s->cell = reinterpret_cast<const float*>(p); p += 4 * 9 * s->n_systems;
  s->sid = reinterpret_cast<const int64_t*>(p); p += 8 * s->n_systems;
  s->fid = reinterpret_cast<const int64_t*>(p); p += 8 * s->n_systems;
  s->energy = reinterpret_cast<const float*>(p); p += 4 * s->n_systems;
  s->y_relaxed = reinterpret_cast<const float*>(p); p += 4 * s->n_systems;
  s->has_forces = (*p != 0); p += 1;
  s->pos = reinterpret_cast<const float*>(p); p += 4 * 3 * s->total_atoms;
  s->atomic_numbers = reinterpret_cast<const int32_t*>(p); p += 4 * s->total_atoms;
  s->tags = reinterpret_cast<const int32_t*>(p); p += 4 * s->total_atoms;
  s->fixed = reinterpret_cast<const uint8_t*>(p); p += s->total_atoms;
  s->pos_relaxed = reinterpret_cast<const float*>(p); p += 4 * 3 * s->total_atoms;
  if (s->has_forces) { s->forces = reinterpret_cast<const float*>(p); p += 4 * 3 * s->total_atoms; }
  if (static_cast<size_t>(p - s->base) > s->size) { delete s; return nullptr; }
  return s;
}

void adb_close(void* handle) {
  auto* s = static_cast<Shard*>(handle);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

int64_t adb_num_systems(void* handle) {
  return static_cast<Shard*>(handle)->n_systems;
}

void adb_natoms(void* handle, int32_t* out) {
  auto* s = static_cast<Shard*>(handle);
  memcpy(out, s->natoms, 4 * s->n_systems);
}

// Fill padded [B, max_atoms, ...] buffers for the given system indices.
// All out_* buffers must be zero-initialized by the caller except where noted;
// atom_mask is written as uint8. Returns 0 on success, -1 on bad input.
int adb_fill_batch(
    void* handle, const int64_t* indices, int64_t b, int64_t max_atoms,
    float* out_pos, int32_t* out_z, int32_t* out_tags, uint8_t* out_fixed,
    float* out_cell, int32_t* out_natoms, uint8_t* out_mask,
    int32_t* out_sid, int32_t* out_fid, float* out_energy, float* out_y_relaxed,
    float* out_pos_relaxed, float* out_forces, int n_threads) {
  auto* s = static_cast<Shard*>(handle);
  for (int64_t i = 0; i < b; ++i) {
    int64_t gi = indices[i];
    if (gi < 0 || gi >= static_cast<int64_t>(s->n_systems)) return -1;
    if (s->natoms[gi] > max_atoms) return -1;
  }

  auto fill_one = [&](int64_t i) {
    const int64_t gi = indices[i];
    const int64_t a = s->offsets[gi];
    const int32_t n = s->natoms[gi];
    memcpy(out_pos + i * max_atoms * 3, s->pos + a * 3, 4 * 3 * n);
    memcpy(out_z + i * max_atoms, s->atomic_numbers + a, 4 * n);
    memcpy(out_tags + i * max_atoms, s->tags + a, 4 * n);
    memcpy(out_fixed + i * max_atoms, s->fixed + a, n);
    memcpy(out_cell + i * 9, s->cell + gi * 9, 4 * 9);
    out_natoms[i] = n;
    memset(out_mask + i * max_atoms, 1, n);
    out_sid[i] = static_cast<int32_t>(s->sid[gi]);
    out_fid[i] = static_cast<int32_t>(s->fid[gi]);
    out_energy[i] = s->energy[gi];
    out_y_relaxed[i] = s->y_relaxed[gi];
    memcpy(out_pos_relaxed + i * max_atoms * 3, s->pos_relaxed + a * 3, 4 * 3 * n);
    if (out_forces && s->has_forces) {
      memcpy(out_forces + i * max_atoms * 3, s->forces + a * 3, 4 * 3 * n);
    }
  };

  if (n_threads <= 1 || b < 4) {
    for (int64_t i = 0; i < b; ++i) fill_one(i);
  } else {
    std::vector<std::thread> pool;
    const int nt = std::min<int64_t>(n_threads, b);
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&, t]() {
        for (int64_t i = t; i < b; i += nt) fill_one(i);
      });
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

int adb_has_forces(void* handle) {
  return static_cast<Shard*>(handle)->has_forces ? 1 : 0;
}

}  // extern "C"
