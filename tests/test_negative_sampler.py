"""Unit tests for sharded negative samplers (host-side numpy).

Mirrors the reference test strategy
(/root/reference/tests/test_negative_sampler.py): the device AllToAll is
simulated by permuting the (shard_source, shard_dest) axes of the sampler
output, then we check ranges / types / exact candidate recovery.
"""

import numpy as np
import pytest

from besskge_tpu.negative_sampler import (
    RandomShardedNegativeSampler,
    TripleBasedShardedNegativeSampler,
    TypeBasedShardedNegativeSampler,
)
from besskge_tpu.sharding import Sharding

SEED = 17
N_ENTITY = 380
N_SHARD = 4
BPS = 2
PPP = 12  # positives per partition
N_NEG = 30

TYPE_OFFSETS = np.array([0, 90, 220])


@pytest.fixture(scope="module")
def sharding():
    return Sharding.create(N_ENTITY, N_SHARD, seed=SEED, type_offsets=TYPE_OFFSETS)


@pytest.fixture(scope="module")
def sample_idx():
    rng = np.random.default_rng(SEED)
    return rng.integers(1000, size=(BPS, N_SHARD, N_SHARD, PPP))


def simulate_all_to_all(negs: np.ndarray) -> np.ndarray:
    """(bps, src, dest, B, n) -> (bps, dest, src, B, n): what each consumer
    device sees after the exchange."""
    return negs.transpose(0, 2, 1, 3, 4)


@pytest.mark.parametrize("corruption_scheme", ["h", "t", "ht"])
@pytest.mark.parametrize("flat", [True, False])
def test_random_sampler_ranges(sharding, sample_idx, corruption_scheme, flat):
    ns = RandomShardedNegativeSampler(
        n_negative=N_NEG,
        sharding=sharding,
        seed=SEED,
        corruption_scheme=corruption_scheme,
        local_sampling=False,
        flat_negative_format=flat,
    )
    negs = ns(sample_idx)["negative_entities"]
    if flat:
        b = 2 if corruption_scheme == "ht" else 1
    else:
        b = N_SHARD * PPP
    assert negs.shape == (BPS, N_SHARD, N_SHARD, b, N_NEG)
    # Local ids on the source shard stay within that shard's real entities.
    for s in range(N_SHARD):
        assert negs[:, s].max() < sharding.shard_counts[s]
        assert negs[:, s].min() >= 0


@pytest.mark.parametrize("corruption_scheme", ["h", "t", "ht"])
@pytest.mark.parametrize("local_sampling", [False, True])
def test_type_based_sampler(sharding, corruption_scheme, local_sampling):
    rng = np.random.default_rng(SEED + 2)
    n_triple = 1000
    triples_h = rng.integers(N_ENTITY, size=n_triple)
    triples_t = rng.integers(N_ENTITY, size=n_triple)
    bounds = np.concatenate([TYPE_OFFSETS, [N_ENTITY]])
    h_type = np.digitize(triples_h, TYPE_OFFSETS) - 1
    t_type = np.digitize(triples_t, TYPE_OFFSETS) - 1
    triple_types = np.stack([h_type, t_type], axis=1).astype(np.int32)

    ns = TypeBasedShardedNegativeSampler(
        triple_types=triple_types,
        n_negative=N_NEG,
        sharding=sharding,
        corruption_scheme=corruption_scheme,
        local_sampling=local_sampling,
        seed=SEED,
    )
    sample_idx = rng.integers(n_triple, size=(BPS, N_SHARD, N_SHARD, PPP))
    negs = ns(sample_idx)["negative_entities"]
    assert negs.shape == (BPS, N_SHARD, N_SHARD, N_SHARD * PPP, N_NEG)

    # Expected type of each corrupted slot, in the flattened consumer batch.
    types = triple_types[sample_idx]  # (bps, shard, shard, ppp, 2)
    cut = PPP // 2
    if corruption_scheme == "h":
        expect = types[..., 0]
    elif corruption_scheme == "t":
        expect = types[..., 1]
    else:
        expect = np.concatenate(
            [types[..., :cut, 0], types[..., cut:, 1]], axis=-1
        )
    expect = expect.reshape(BPS, N_SHARD, N_SHARD * PPP)

    if local_sampling:
        # Negatives scored on the sampling shard: (bps, src, dest, B, n) has
        # types of the SRC shard's own batch.
        got = negs  # consumer == axis 1
        owner_axis = 1
    else:
        got = simulate_all_to_all(negs)  # consumer == axis 1 after exchange
        owner_axis = 2  # entities still live on the (now) axis-2 shard

    for consumer in range(N_SHARD):
        for other in range(N_SHARD):
            src = other if not local_sampling else consumer
            block = got[:, consumer, other]  # (bps, B, n) local ids on src
            glob = sharding.shard_and_idx_to_entity[src, block]
            ty = np.digitize(glob, TYPE_OFFSETS) - 1
            want = expect[:, consumer if not local_sampling else src]
            np.testing.assert_array_equal(ty, want[:, :, None] * np.ones_like(ty))
            assert glob.max() < N_ENTITY
    del owner_axis, bounds


@pytest.mark.parametrize("corruption_scheme", ["h", "t", "ht"])
@pytest.mark.parametrize("flat", [True, False])
def test_triple_based_sampler_recovers_candidates(
    sharding, sample_idx, corruption_scheme, flat
):
    """After the simulated AllToAll + mask + sort_idx, the exact predefined
    candidate set of every triple must be recovered."""
    rng = np.random.default_rng(SEED + 3)
    n_outer = 1 if flat else 1000
    neg_h = rng.integers(N_ENTITY, size=(n_outer, N_NEG)).astype(np.int32)
    neg_t = rng.integers(N_ENTITY, size=(n_outer, N_NEG)).astype(np.int32)

    ns = TripleBasedShardedNegativeSampler(
        neg_h,
        neg_t,
        sharding,
        corruption_scheme=corruption_scheme,
        seed=SEED,
        return_sort_idx=True,
    )
    out = ns(sample_idx)
    negs, mask, sort_idx = (
        out["negative_entities"],
        out["negative_mask"],
        out["negative_sort_idx"],
    )
    pad = ns.padded_shard_length
    b = (2 if corruption_scheme == "ht" else 1) if flat else N_SHARD * PPP
    assert negs.shape == (BPS, N_SHARD, N_SHARD, b, pad)
    assert mask.shape == (BPS, N_SHARD, b, N_SHARD, pad)
    assert sort_idx.shape == (BPS, N_SHARD, N_SHARD * PPP, N_NEG)

    received = simulate_all_to_all(negs)  # (bps, consumer, src, b, pad)
    cut = PPP // 2
    for step in range(BPS):
        for consumer in range(N_SHARD):
            # Globalize: entry from src shard s holds local ids of s.
            glob = sharding.shard_and_idx_to_entity[
                np.arange(N_SHARD)[:, None, None], received[step, consumer]
            ]  # (src, b, pad)
            glob = glob.transpose(1, 0, 2).reshape(b, N_SHARD * pad)
            m = mask[step, consumer].reshape(b, N_SHARD * pad)
            for row in range(b):
                real = glob[row][m[row]]
                # Which triple and which side does this row serve?
                if flat:
                    if corruption_scheme == "ht":
                        source = neg_h[0] if row == 0 else neg_t[0]
                        srt = (
                            sort_idx[step, consumer, 0]
                            if row == 0
                            else sort_idx[step, consumer, -1]
                        )
                    else:
                        source = neg_h[0] if corruption_scheme == "h" else neg_t[0]
                        srt = sort_idx[step, consumer, 0]
                else:
                    part, offset = divmod(row, PPP)
                    tri = sample_idx[step, consumer, part, offset]
                    if corruption_scheme == "h" or (
                        corruption_scheme == "ht" and offset < cut
                    ):
                        source = neg_h[tri]
                    else:
                        source = neg_t[tri]
                    srt = sort_idx[step, consumer, row]
                np.testing.assert_array_equal(real, source[srt])


def test_triple_based_mask_on_gather(sharding, sample_idx):
    rng = np.random.default_rng(SEED + 4)
    neg_t = rng.integers(N_ENTITY, size=(1, N_NEG)).astype(np.int32)
    ns = TripleBasedShardedNegativeSampler(
        None,
        neg_t,
        sharding,
        corruption_scheme="t",
        seed=SEED,
        mask_on_gather=True,
    )
    out = ns(sample_idx)
    # Gather layout: mask aligned with negative_entities (per source shard).
    assert out["negative_mask"].shape == out["negative_entities"].shape
    counts, _ = ns.shard_negatives(neg_t)
    for s in range(N_SHARD):
        np.testing.assert_array_equal(
            out["negative_mask"][:, s].sum(-1), counts[0, s]
        )
