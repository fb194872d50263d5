// Native host-side hot loops for BESS batch construction.
//
// The per-step CPU work — gathering (h, r, t) columns for every shard-pair
// partition, pre-transposing tails for the device AllToAll
// (reference besskge/batch_sampler.py:163-167), and drawing balanced random
// negatives (reference besskge/negative_sampler.py:104-132) — runs here
// GIL-free and cache-friendly, replacing the reference's poptorch async
// dataloader worker processes. Exposed to Python via ctypes
// (besskge_tpu/native.py); built by the repo Makefile.
//
// Layout contracts mirror the numpy implementations exactly; see
// besskge_tpu/batch_sampler.py and negative_sampler.py.

#include <cstdint>
#include <cstring>

namespace {

// pcg32: small fast deterministic RNG (public-domain algorithm).
struct Pcg32 {
  uint64_t state;
  uint64_t inc;
  explicit Pcg32(uint64_t seed, uint64_t seq = 0xda3e39cb94b95bdbULL) {
    state = 0u;
    inc = (seq << 1u) | 1u;
    next();
    state += seed;
    next();
  }
  inline uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31u));
  }
  // Unbiased bounded draw (Lemire).
  inline uint32_t bounded(uint32_t bound) {
    uint64_t m = static_cast<uint64_t>(next()) * bound;
    uint32_t lo = static_cast<uint32_t>(m);
    if (lo < bound) {
      uint32_t t = (-bound) % bound;
      while (lo < t) {
        m = static_cast<uint64_t>(next()) * bound;
        lo = static_cast<uint32_t>(m);
      }
    }
    return static_cast<uint32_t>(m >> 32);
  }
};

}  // namespace

extern "C" {

// Gather (h, r, t) for an ht_shardpair batch and emit tails pre-transposed:
//   head/rel out: (bps, S, S, ppp)   tail out: (bps, S, S, ppp) with
//   tail[b, t, h, p] = triples[sample_idx[b, h, t, p]].tail
void bess_assemble_hrt(const int32_t* triples,      // (n_triple, 3)
                       const int64_t* sample_idx,   // (bps, S, S, ppp)
                       int64_t bps, int64_t S, int64_t ppp,
                       int32_t* head, int32_t* rel, int32_t* tail_t) {
  const int64_t part = S * ppp;        // one (h, *) slab
  const int64_t batch = S * part;      // one micro-batch
  for (int64_t b = 0; b < bps; ++b) {
    for (int64_t h = 0; h < S; ++h) {
      for (int64_t t = 0; t < S; ++t) {
        const int64_t* idx = sample_idx + b * batch + h * part + t * ppp;
        int32_t* hd = head + b * batch + h * part + t * ppp;
        int32_t* rl = rel + b * batch + h * part + t * ppp;
        int32_t* tl = tail_t + b * batch + t * part + h * ppp;  // transposed
        for (int64_t p = 0; p < ppp; ++p) {
          const int32_t* row = triples + 3 * idx[p];
          hd[p] = row[0];
          rl[p] = row[1];
          tl[p] = row[2];
        }
      }
    }
  }
}

// Same for h_shard/t_shard partitioning (no transpose):
//   sample_idx (bps, S, bs) -> head/rel/tail (bps, S, bs).
void bess_assemble_hrt_flat(const int32_t* triples,
                            const int64_t* sample_idx,
                            int64_t n, int32_t* head, int32_t* rel,
                            int32_t* tail) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* row = triples + 3 * sample_idx[i];
    head[i] = row[0];
    rel[i] = row[1];
    tail[i] = row[2];
  }
}

// Balanced random negative draws: out (bps, S_src, S_dest, B, n_neg) of
// local row ids uniform in [0, shard_counts[src]).
void bess_random_negatives(uint64_t seed, const int64_t* shard_counts,
                           int64_t bps, int64_t S, int64_t B, int64_t n_neg,
                           int32_t* out) {
  const int64_t per_src = S * B * n_neg;
  for (int64_t b = 0; b < bps; ++b) {
    for (int64_t src = 0; src < S; ++src) {
      Pcg32 rng(seed + static_cast<uint64_t>(b) * 0x9e3779b97f4a7c15ULL,
                static_cast<uint64_t>(src) + 1);
      const uint32_t bound = static_cast<uint32_t>(shard_counts[src]);
      int32_t* dst = out + (b * S + src) * per_src;
      for (int64_t k = 0; k < per_src; ++k) {
        dst[k] = static_cast<int32_t>(rng.bounded(bound));
      }
    }
  }
}

// Padded-epoch triple selection (RigidShardedBatchSampler.sample_triples):
//   take[b, h, t, p] = padded_idx[h, t, order[b * ppp + p]]
//   mask[b, h, t, p] = order[b * ppp + p] < counts[h, t]
void bess_rigid_take(const int64_t* padded_idx,  // (S, S, padded_len)
                     const int64_t* counts,      // (S, S)
                     const int64_t* order,       // (bps * ppp,)
                     int64_t bps, int64_t S, int64_t ppp, int64_t padded_len,
                     int64_t* take, uint8_t* mask) {
  for (int64_t b = 0; b < bps; ++b) {
    for (int64_t h = 0; h < S; ++h) {
      for (int64_t t = 0; t < S; ++t) {
        const int64_t* src = padded_idx + (h * S + t) * padded_len;
        const int64_t cnt = counts[h * S + t];
        int64_t base = ((b * S + h) * S + t) * ppp;
        for (int64_t p = 0; p < ppp; ++p) {
          const int64_t o = order[b * ppp + p];
          take[base + p] = src[o];
          mask[base + p] = o < cnt ? 1 : 0;
        }
      }
    }
  }
}

}  // extern "C"
