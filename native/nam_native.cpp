// nam_native: C++ host dataplane for the TPU amp-modeling engine.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native runtime
// around it — the host-side pieces that must not become the bottleneck when
// feeding thousands of real-time 48 kHz streams to a chip (SURVEY.md §7 hard
// part #3). It provides:
//
//   - a fast WAV codec (PCM 16/24/32-bit and IEEE float32) — the analog of
//     the reference's AudioDSPTools WAV layer (reference: tools/render.cpp
//     uses dsp::wav::Load / SaveWavFloat32)
//   - batch (de)interleaving between per-stream audio and the engine's
//     lane-aligned (C, T, B) device layout — the hot per-block transform on
//     the host feed path
//   - a lock-free single-producer single-consumer block ring for handing
//     audio blocks between real-time audio threads and the dispatch thread —
//     the host-side analog of the reference's allocation-free RT contract
//     (reference: tools/test/allocation_tracking.cpp)
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (neuralampmodelercore_tpu/utils/native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ===========================================================================
// Batch (de)interleaving
// ===========================================================================

// streams: B pointers to T floats each  ->  out: (T, B) flat (t-major), the
// trailing two axes of the engine's (C=1, T, B) input layout.
void nam_interleave_tb(const float** streams, int64_t b, int64_t t, float* out)
{
  for (int64_t ti = 0; ti < t; ti++)
  {
    float* dst = out + ti * b;
    for (int64_t bi = 0; bi < b; bi++)
      dst[bi] = streams[bi][ti];
  }
}

// in: (T, B) flat -> B per-stream buffers of T floats.
void nam_deinterleave_tb(const float* in, int64_t b, int64_t t, float** streams)
{
  for (int64_t ti = 0; ti < t; ti++)
  {
    const float* src = in + ti * b;
    for (int64_t bi = 0; bi < b; bi++)
      streams[bi][ti] = src[bi];
  }
}

// Contiguous (B, T) array -> (T, B) transpose (blocked for cache locality).
void nam_transpose_bt_tb(const float* in, int64_t b, int64_t t, float* out)
{
  const int64_t BS = 32;
  for (int64_t b0 = 0; b0 < b; b0 += BS)
  {
    const int64_t b1 = b0 + BS < b ? b0 + BS : b;
    for (int64_t t0 = 0; t0 < t; t0 += BS)
    {
      const int64_t t1 = t0 + BS < t ? t0 + BS : t;
      for (int64_t bi = b0; bi < b1; bi++)
        for (int64_t ti = t0; ti < t1; ti++)
          out[ti * b + bi] = in[bi * t + ti];
    }
  }
}

void nam_transpose_tb_bt(const float* in, int64_t b, int64_t t, float* out)
{
  const int64_t BS = 32;
  for (int64_t t0 = 0; t0 < t; t0 += BS)
  {
    const int64_t t1 = t0 + BS < t ? t0 + BS : t;
    for (int64_t b0 = 0; b0 < b; b0 += BS)
    {
      const int64_t b1 = b0 + BS < b ? b0 + BS : b;
      for (int64_t ti = t0; ti < t1; ti++)
        for (int64_t bi = b0; bi < b1; bi++)
          out[bi * t + ti] = in[ti * b + bi];
    }
  }
}

// ===========================================================================
// WAV sample conversion (decode into float32 in [-1, 1], encode back)
// ===========================================================================

void nam_decode_pcm16(const int16_t* in, int64_t n, float* out)
{
  const float s = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; i++)
    out[i] = in[i] * s;
}

void nam_decode_pcm24(const uint8_t* in, int64_t n, float* out)
{
  const float s = 1.0f / 8388608.0f; // 2^23
  for (int64_t i = 0; i < n; i++)
  {
    int32_t v = (int32_t)in[3 * i] | ((int32_t)in[3 * i + 1] << 8) | ((int32_t)in[3 * i + 2] << 16);
    if (v >= (1 << 23))
      v -= (1 << 24);
    out[i] = v * s;
  }
}

void nam_decode_pcm32(const int32_t* in, int64_t n, float* out)
{
  const double s = 1.0 / 2147483648.0; // 2^31
  for (int64_t i = 0; i < n; i++)
    out[i] = (float)(in[i] * s);
}

void nam_encode_pcm16(const float* in, int64_t n, int16_t* out)
{
  for (int64_t i = 0; i < n; i++)
  {
    float v = in[i] * 32768.0f;
    if (v > 32767.0f)
      v = 32767.0f;
    if (v < -32768.0f)
      v = -32768.0f;
    out[i] = (int16_t)v;
  }
}

// ===========================================================================
// Lock-free SPSC block ring
// ===========================================================================
//
// Fixed capacity of fixed-size float blocks; producer (audio callback)
// pushes, consumer (dispatch thread) pops. Allocation-free after creation;
// acquire/release ordering matches the reference's staged-swap discipline
// (reference: NAM/wavenet/slimmable.cpp:309-348).

struct NamBlockRing
{
  int64_t capacity;   // number of slots (power of two)
  int64_t block_len;  // floats per slot
  std::atomic<int64_t> head{0}; // next write
  std::atomic<int64_t> tail{0}; // next read
  std::vector<float> storage;
};

NamBlockRing* nam_ring_create(int64_t capacity, int64_t block_len)
{
  // round capacity up to a power of two
  int64_t cap = 1;
  while (cap < capacity)
    cap <<= 1;
  auto* r = new NamBlockRing();
  r->capacity = cap;
  r->block_len = block_len;
  r->storage.assign((size_t)(cap * block_len), 0.0f);
  return r;
}

void nam_ring_destroy(NamBlockRing* r)
{
  delete r;
}

int64_t nam_ring_size(const NamBlockRing* r)
{
  return r->head.load(std::memory_order_acquire) - r->tail.load(std::memory_order_acquire);
}

// Returns 1 on success, 0 if full.
int nam_ring_push(NamBlockRing* r, const float* block)
{
  const int64_t head = r->head.load(std::memory_order_relaxed);
  const int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity)
    return 0;
  float* dst = r->storage.data() + (head & (r->capacity - 1)) * r->block_len;
  std::memcpy(dst, block, (size_t)r->block_len * sizeof(float));
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Returns 1 on success, 0 if empty.
int nam_ring_pop(NamBlockRing* r, float* block)
{
  const int64_t tail = r->tail.load(std::memory_order_relaxed);
  const int64_t head = r->head.load(std::memory_order_acquire);
  if (head == tail)
    return 0;
  const float* src = r->storage.data() + (tail & (r->capacity - 1)) * r->block_len;
  std::memcpy(block, src, (size_t)r->block_len * sizeof(float));
  r->tail.store(tail + 1, std::memory_order_release);
  return 1;
}

// ===========================================================================
// Ring pool: per-stream SPSC rings + fused batch assembly/demux
// ===========================================================================
//
// The farm's hot per-block host work is gathering one block from every
// stream's input ring into the engine's (T, B) device layout and scattering
// the (T, B) output back. Doing that as pop-loop + separate transpose walks
// the batch twice; the pool fuses the queue copy with the layout transform
// (one pass, block-tiled for cache locality). Per-stream push/pop stay
// lock-free SPSC so audio threads feed concurrently with the dispatch
// thread — the host-side analog of the reference's allocation-free RT
// contract (reference: tools/test/allocation_tracking.cpp).

struct NamRingPool
{
  int64_t n_streams;
  int64_t capacity; // slots per stream (power of two)
  int64_t block_len;
  std::vector<std::atomic<int64_t>> head; // per stream
  std::vector<std::atomic<int64_t>> tail;
  std::vector<float> storage; // (stream, slot, block_len)

  NamRingPool(int64_t n, int64_t cap, int64_t bl)
    : n_streams(n), capacity(cap), block_len(bl), head(n), tail(n),
      storage((size_t)(n * cap * bl), 0.0f)
  {
    for (int64_t i = 0; i < n; i++)
    {
      head[i].store(0, std::memory_order_relaxed);
      tail[i].store(0, std::memory_order_relaxed);
    }
  }

  float* slot(int64_t stream, int64_t idx)
  {
    return storage.data() + ((stream * capacity + (idx & (capacity - 1))) * block_len);
  }
};

NamRingPool* nam_pool_create(int64_t n_streams, int64_t capacity, int64_t block_len)
{
  int64_t cap = 1;
  while (cap < capacity)
    cap <<= 1;
  return new NamRingPool(n_streams, cap, block_len);
}

void nam_pool_destroy(NamRingPool* p)
{
  delete p;
}

int64_t nam_pool_size(const NamRingPool* p, int64_t stream)
{
  return p->head[stream].load(std::memory_order_acquire)
         - p->tail[stream].load(std::memory_order_acquire);
}

int nam_pool_push(NamRingPool* p, int64_t stream, const float* block)
{
  const int64_t head = p->head[stream].load(std::memory_order_relaxed);
  const int64_t tail = p->tail[stream].load(std::memory_order_acquire);
  if (head - tail >= p->capacity)
    return 0;
  std::memcpy(p->slot(stream, head), block, (size_t)p->block_len * sizeof(float));
  p->head[stream].store(head + 1, std::memory_order_release);
  return 1;
}

int nam_pool_pop(NamRingPool* p, int64_t stream, float* block)
{
  const int64_t tail = p->tail[stream].load(std::memory_order_relaxed);
  const int64_t head = p->head[stream].load(std::memory_order_acquire);
  if (head == tail)
    return 0;
  std::memcpy(block, p->slot(stream, tail), (size_t)p->block_len * sizeof(float));
  p->tail[stream].store(tail + 1, std::memory_order_release);
  return 1;
}

// Push the same range of T samples to many streams at once (bulk feeders /
// bench producers): in is (n, T) for streams [first, first+n).
int64_t nam_pool_push_range(NamRingPool* p, int64_t first, int64_t n, const float* in)
{
  int64_t ok = 0;
  for (int64_t s = 0; s < n; s++)
    ok += nam_pool_push(p, first + s, in + s * p->block_len);
  return ok;
}

// Consumer-side fused assembly: pop one block per stream directly into the
// (T, B) device layout (zeros for empty streams). Returns #streams fed.
int64_t nam_pool_pop_all_tb(NamRingPool* p, float* out_tb)
{
  const int64_t B = p->n_streams, T = p->block_len;
  const int64_t BS = 32;
  int64_t fed = 0;
  for (int64_t b0 = 0; b0 < B; b0 += BS)
  {
    const int64_t b1 = b0 + BS < B ? b0 + BS : B;
    // per-tile source pointers (slot data or null)
    const float* src[32];
    for (int64_t bi = b0; bi < b1; bi++)
    {
      const int64_t tail = p->tail[bi].load(std::memory_order_relaxed);
      const int64_t head = p->head[bi].load(std::memory_order_acquire);
      src[bi - b0] = (head == tail) ? nullptr : p->slot(bi, tail);
    }
    for (int64_t t0 = 0; t0 < T; t0 += BS)
    {
      const int64_t t1 = t0 + BS < T ? t0 + BS : T;
      for (int64_t bi = b0; bi < b1; bi++)
      {
        const float* s = src[bi - b0];
        if (s)
          for (int64_t ti = t0; ti < t1; ti++)
            out_tb[ti * B + bi] = s[ti];
        else
          for (int64_t ti = t0; ti < t1; ti++)
            out_tb[ti * B + bi] = 0.0f;
      }
    }
    for (int64_t bi = b0; bi < b1; bi++)
    {
      if (src[bi - b0])
      {
        p->tail[bi].fetch_add(1, std::memory_order_release);
        fed++;
      }
    }
  }
  return fed;
}

// Producer-side fused demux: scatter a (T, B) result into per-stream rings.
// Returns #streams whose ring had room.
int64_t nam_pool_push_all_tb(NamRingPool* p, const float* in_tb)
{
  const int64_t B = p->n_streams, T = p->block_len;
  const int64_t BS = 32;
  int64_t ok = 0;
  for (int64_t b0 = 0; b0 < B; b0 += BS)
  {
    const int64_t b1 = b0 + BS < B ? b0 + BS : B;
    float* dst[32];
    for (int64_t bi = b0; bi < b1; bi++)
    {
      const int64_t head = p->head[bi].load(std::memory_order_relaxed);
      const int64_t tail = p->tail[bi].load(std::memory_order_acquire);
      dst[bi - b0] = (head - tail >= p->capacity) ? nullptr : p->slot(bi, head);
    }
    for (int64_t t0 = 0; t0 < T; t0 += BS)
    {
      const int64_t t1 = t0 + BS < T ? t0 + BS : T;
      for (int64_t bi = b0; bi < b1; bi++)
      {
        float* d = dst[bi - b0];
        if (d)
          for (int64_t ti = t0; ti < t1; ti++)
            d[ti] = in_tb[ti * B + bi];
      }
    }
    for (int64_t bi = b0; bi < b1; bi++)
    {
      if (dst[bi - b0])
      {
        p->head[bi].fetch_add(1, std::memory_order_release);
        ok++;
      }
    }
  }
  return ok;
}

// ===========================================================================
// Epoch mailbox: zero-copy dataplane for the stream farm
// ===========================================================================
//
// Round-3 measurement: the RingPool dataplane's fused assembly/demux passes
// run on the single dispatch thread and cost 5.6 ms/block at B=4096/T=128 —
// over the 2.67 ms audio deadline (BENCH_r03.json farm section). The fix is
// architectural: stop doing per-block layout work on the dispatch thread at
// all.
//
//   - Producers (audio threads) write their block DIRECTLY into the device
//     layout: slab[epoch % depth] is a (C, T, B) float array and stream s
//     owns column s. The transpose cost rides the many producer threads,
//     where it parallelizes; the per-column write touches the same total
//     bytes the old assembly pass did.
//   - Silent streams cost nothing on the host: each (slot, stream) cell
//     carries the epoch that last wrote it; dispatch builds a B-float
//     {0,1} mask from those flags (one acquire load per stream) and the
//     DEVICE multiplies the input by the mask — stale column data is
//     finite old audio, so masked columns are exact zeros.
//   - Demux is publication: the fetched (C, T, B) output array is handed to
//     consumers by reference; each consumer reads its own column.
//
// The dispatch thread's per-block host work collapses to the flag scan
// (~B loads) plus the H2D enqueue. Ordering: producers write data, then
// store the cell flag with release; the dispatch scan loads with acquire.
// A producer that lagged behind the real-time epoch cursor catches up via
// next_epoch (its stale write lands in a slot whose flag no longer matches,
// so the mask zeroes it — a late block is a dropped block, as in any
// real-time system, and the fed count makes it observable).

struct NamMailbox
{
  int64_t n_streams;   // B
  int64_t depth;       // slots (power of two)
  int64_t block_floats; // C*T floats per stream per block
  std::vector<float> slabs;                  // depth * (C*T, B)
  std::vector<std::atomic<int64_t>> filled;  // (slot, stream) -> epoch, else -1
  std::vector<std::atomic<int64_t>> seq;     // per-stream next epoch to write
  std::atomic<int64_t> next_epoch{0};        // next epoch dispatch will assemble
  std::atomic<int64_t> consumed{-1};         // newest epoch whose slab is free

  NamMailbox(int64_t b, int64_t d, int64_t bf)
    : n_streams(b), depth(d), block_floats(bf),
      slabs((size_t)(d * bf * b), 0.0f), filled((size_t)(d * b)), seq((size_t)b)
  {
    for (auto& f : filled)
      f.store(-1, std::memory_order_relaxed);
    for (auto& s : seq)
      s.store(0, std::memory_order_relaxed);
  }

  float* slab(int64_t epoch) { return slabs.data() + (epoch & (depth - 1)) * block_floats * n_streams; }
};

NamMailbox* nam_mbox_create(int64_t n_streams, int64_t depth, int64_t block_floats)
{
  int64_t d = 1;
  while (d < depth)
    d <<= 1;
  return new NamMailbox(n_streams, d, block_floats);
}

void nam_mbox_destroy(NamMailbox* m)
{
  delete m;
}

float* nam_mbox_slab_ptr(NamMailbox* m, int64_t slot)
{
  return m->slabs.data() + slot * m->block_floats * m->n_streams;
}

// Producer: write stream s's next block (C*T floats, channel-major) into its
// column of the current epoch's slab. Returns the epoch written, or -1 if
// the mailbox is full (producer more than depth-1 epochs ahead — cannot
// happen for real-time producers, which instead catch UP via next_epoch).
int64_t nam_mbox_push(NamMailbox* m, int64_t stream, const float* block)
{
  const int64_t B = m->n_streams;
  int64_t e = m->seq[stream].load(std::memory_order_relaxed);
  const int64_t next = m->next_epoch.load(std::memory_order_acquire);
  if (e < next) // lagged: a block for an already-assembled epoch would be
    e = next;   // masked out anyway; deliver into the next live epoch
  if (e - m->consumed.load(std::memory_order_acquire) > m->depth - 1)
    return -1;
  float* col = m->slab(e) + stream;
  for (int64_t t = 0; t < m->block_floats; t++)
    col[t * B] = block[t];
  m->filled[(e & (m->depth - 1)) * B + stream].store(e, std::memory_order_release);
  m->seq[stream].store(e + 1, std::memory_order_relaxed);
  return e;
}

// Bulk producer: (n, C*T) blocks for streams [first, first+n) — one feeder
// thread's stripe. Column-tiled so writes stay cache-resident.
int64_t nam_mbox_push_range(NamMailbox* m, int64_t first, int64_t n, const float* blocks)
{
  int64_t ok = 0;
  for (int64_t s = 0; s < n; s++)
  {
    if (nam_mbox_push(m, first + s, blocks + s * m->block_floats) >= 0)
      ok++;
  }
  return ok;
}

// Dispatch: scan epoch e's fill flags into a {0,1} float mask; returns the
// number of streams fed. Publishes e+1 as the next live epoch first, so
// producers that catch up land in a future epoch, never a consumed one.
int64_t nam_mbox_assemble(NamMailbox* m, int64_t epoch, float* mask_out)
{
  m->next_epoch.store(epoch + 1, std::memory_order_release);
  const int64_t B = m->n_streams;
  const std::atomic<int64_t>* f = m->filled.data() + (epoch & (m->depth - 1)) * B;
  int64_t fed = 0;
  for (int64_t s = 0; s < B; s++)
  {
    const bool hit = f[s].load(std::memory_order_acquire) == epoch;
    mask_out[s] = hit ? 1.0f : 0.0f;
    fed += hit;
  }
  return fed;
}

void nam_mbox_mark_consumed(NamMailbox* m, int64_t epoch)
{
  m->consumed.store(epoch, std::memory_order_release);
}

int64_t nam_mbox_next_epoch(NamMailbox* m)
{
  return m->next_epoch.load(std::memory_order_acquire);
}

// Consumer: gather stream s's column from a published (C*T, B) output array.
void nam_mbox_gather(const float* out_tb, int64_t b, int64_t block_floats, int64_t stream,
                     float* dst)
{
  const float* col = out_tb + stream;
  for (int64_t t = 0; t < block_floats; t++)
    dst[t] = col[t * b];
}

int nam_native_abi_version()
{
  return 3;
}

// Embedded marker so the Python loader can check the on-disk library's ABI
// WITHOUT dlopen-ing it: glibc dedupes dlopen by pathname, so probing a
// stale library in-process would pin the stale image for the process
// lifetime even after a successful rebuild (utils/native.py _needs_rebuild).
// volatile + used keeps the literal in the emitted .so at any -O level.
extern const volatile char nam_native_abi_marker[] __attribute__((used)) =
    "NAM_NATIVE_ABI=2";

} // extern "C"
