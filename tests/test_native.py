"""Native (C++) host hot loops vs their numpy reference implementations."""

import numpy as np
import pytest

from besskge_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_assemble_hrt_matches_numpy():
    rng = np.random.default_rng(0)
    n_triple, bps, s, ppp = 500, 2, 4, 6
    triples = rng.integers(0, 100, size=(n_triple, 3)).astype(np.int32)
    sample_idx = rng.integers(0, n_triple, size=(bps, s, s, ppp))
    head, rel, tail = native.assemble_hrt(triples, sample_idx)
    hrt = triples[sample_idx]
    np.testing.assert_array_equal(head, hrt[..., 0])
    np.testing.assert_array_equal(rel, hrt[..., 1])
    np.testing.assert_array_equal(
        tail, np.ascontiguousarray(hrt[..., 2].transpose(0, 2, 1, 3))
    )


def test_assemble_hrt_flat():
    rng = np.random.default_rng(1)
    triples = rng.integers(0, 50, size=(200, 3)).astype(np.int32)
    sample_idx = rng.integers(0, 200, size=(3, 4, 8))
    head, rel, tail = native.assemble_hrt(triples, sample_idx)
    hrt = triples[sample_idx]
    np.testing.assert_array_equal(head, hrt[..., 0])
    np.testing.assert_array_equal(tail, hrt[..., 2])


def test_random_negatives_properties():
    counts = np.asarray([10, 25, 17, 25], np.int64)
    out = native.random_negatives(42, counts, 2, 4, 3, 64)
    assert out.shape == (2, 4, 4, 3, 64)
    for s in range(4):
        block = out[:, s]
        assert block.min() >= 0 and block.max() < counts[s]
        # Roughly uniform coverage.
        assert len(np.unique(block)) == counts[s]
    # Deterministic in the seed.
    out2 = native.random_negatives(42, counts, 2, 4, 3, 64)
    np.testing.assert_array_equal(out, out2)
    out3 = native.random_negatives(43, counts, 2, 4, 3, 64)
    assert not np.array_equal(out, out3)


def test_rigid_take_matches_numpy():
    rng = np.random.default_rng(2)
    s, padded_len, bps, ppp = 4, 30, 2, 5
    padded_idx = rng.integers(0, 1000, size=(s, s, padded_len))
    counts = rng.integers(1, padded_len, size=(s, s)).astype(np.int64)
    order = rng.permutation(padded_len)[: bps * ppp].astype(np.int64)
    take, mask = native.rigid_take(padded_idx, counts, order, bps, ppp)
    # Numpy reference (batch_sampler.RigidShardedBatchSampler.sample_triples).
    take_np = padded_idx[..., order]  # (s, s, bps*ppp)
    mask_np = order[None, None, :] < counts[..., None]
    take_np = np.moveaxis(
        take_np.reshape(s, s, bps, ppp), -2, 0
    )
    mask_np = np.moveaxis(mask_np.reshape(s, s, bps, ppp), -2, 0)
    np.testing.assert_array_equal(take, take_np)
    np.testing.assert_array_equal(mask, mask_np)
