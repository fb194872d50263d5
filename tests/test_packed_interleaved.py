"""Triplet-interleaved packed entity tables (round 5).

``RowSGDM(interleaved=True)`` on a row-pair-packed table stores the fp32
momentum INSIDE the packed store: per packed row ``p`` the triplet-major
``(3P, D)`` buffer holds ``[packed 16-bit param pair | momentum row 2p |
momentum row 2p+1]`` (momentum rows are fp32 bit patterns in the 32-bit
storage dtype). The sparse update then writes a touched packed row's params
AND both momenta with ONE (3, D) scatter DMA — the non-interleaved packed
path issues one packed-param DMA plus one fp32-momentum DMA per touched
LOGICAL row, and the scatter is scalar-core issue-bound (BASELINE.md
roofline). These tests pin:

* widen/split round-trips and triplet-aware gathers
  (:func:`besskge_tpu.packed.interleave_packed_momentum` /
  ``split_packed_interleaved`` / ``take_rows(tripled=...)``);
* bit-level trajectory equivalence with the separate-buffer packed
  ``RowSGDM`` for bf16 and fp16 storage, SR on and off;
* the duplicate-safe (3, D)-block merge semantics
  (:func:`besskge_tpu.packed.merge_packed_triplet_writes`);
* end-to-end mesh training + checkpoint byte-compatibility with a
  non-interleaved packed run.

Reference context: the capacity recipe these layouts serve is
``/root/reference/notebooks/3_wikikg2_fp16.ipynb`` cells 14-24 (fp16
entity weights + SGDM); the triplet store has no reference counterpart
(IPU SRAM updates tables densely in place).
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import optax
import pytest

import besskge_tpu.packed as pk
from besskge_tpu.optim import RowSGDM


def _make_tab(rng, n, d, half):
    t32 = rng.normal(size=(n, d)).astype(np.float32)
    return pk.pack_table(jnp.asarray(t32).astype(half))


def test_widen_split_roundtrip_and_reads():
    rng = np.random.default_rng(0)
    n, d = 24, 128
    for half in (jnp.bfloat16, jnp.float16):
        packed = _make_tab(rng, n, d, half)
        mom = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        trip = pk.interleave_packed_momentum(packed, mom)
        assert trip.shape == (3 * n // 2, d)
        assert trip.dtype == packed.dtype
        back_p, back_m = pk.split_packed_interleaved(trip)
        np.testing.assert_array_equal(np.asarray(back_p), np.asarray(packed))
        np.testing.assert_array_equal(np.asarray(back_m), np.asarray(mom))
        # triplet-aware logical-row gathers equal plain packed gathers
        idx = jnp.asarray(rng.integers(n, size=(3, 7)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(pk.take_rows(trip, idx, n_logical=n).astype(jnp.float32)),
            np.asarray(pk.take_rows(packed, idx).astype(jnp.float32)),
        )
        # contiguous windows too (even start/width, the packed contract)
        got = pk.take_contiguous_rows(trip, jnp.int32(4), 8, n_logical=n)
        want = pk.take_contiguous_rows(packed, jnp.int32(4), 8)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)),
        )
        # zero-momentum widen
        trip0 = pk.interleave_packed_momentum(packed)
        _, m0 = pk.split_packed_interleaved(trip0)
        assert not np.asarray(m0).any()


def test_widen_validates_shapes():
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="row-pair-packed"):
        pk.interleave_packed_momentum(jnp.zeros((8, 32), jnp.float32))
    packed = _make_tab(rng, 8, 32, jnp.bfloat16)
    with pytest.raises(ValueError, match="logical-major"):
        pk.interleave_packed_momentum(packed, jnp.zeros((3, 32), jnp.float32))
    with pytest.raises(ValueError, match="triplet-major"):
        pk.split_packed_interleaved(packed)  # 4 rows: not divisible by 3
    with pytest.raises(ValueError, match="tripled"):
        pk.take_rows(jnp.zeros((9, 32), jnp.float32), jnp.array([0]), tripled=True)


def test_init_validates_triplet_height():
    row = RowSGDM(learning_rate=0.1, momentum=0.9, interleaved=True)
    packed = _make_tab(np.random.default_rng(2), 16, 128, jnp.bfloat16)
    with pytest.raises(ValueError, match="interleave_packed_momentum"):
        row.init(packed, n_logical=16)  # plain packed: not widened
    row.init(pk.interleave_packed_momentum(packed), n_logical=16)  # ok
    with pytest.raises(ValueError, match="triplet-major"):
        row.init(packed[:4], n_logical=None)  # 4 rows: parity check fails


@pytest.mark.parametrize("half", ["bf16", "fp16"])
@pytest.mark.parametrize("sr", [True, False])
def test_triplet_trajectory_matches_separate_buffers(half, sr):
    """The interleaved packed update applies the identical arithmetic
    (same dedup, same momentum rule, same SR hash) — trajectories must
    match the separate-buffer packed RowSGDM bit-for-bit."""
    rng = np.random.default_rng(3)
    n, d = 24, 128
    hd = jnp.bfloat16 if half == "bf16" else jnp.float16
    packed0 = _make_tab(rng, n, d, hd)

    def run(interleaved):
        opt = RowSGDM(
            learning_rate=0.05, momentum=0.9, weight_decay=0.01,
            stochastic_rounding=sr, interleaved=interleaved,
        )
        table = (
            pk.interleave_packed_momentum(packed0) if interleaved else packed0
        )
        state = opt.init(table, n_logical=n)
        for step in range(5):
            srng = np.random.default_rng(100 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(
                srng.normal(size=(12, d)).astype(np.float32)
            )
            table, state = opt.update_rows(table, state, idx, grads)
        if interleaved:
            p, m = pk.split_packed_interleaved(table)
            return np.asarray(p), np.asarray(m)
        return np.asarray(table), np.asarray(state["m"])

    p_sep, m_sep = run(False)
    p_int, m_int = run(True)
    np.testing.assert_array_equal(p_int, p_sep)
    np.testing.assert_array_equal(m_int, m_sep)


def test_merge_triplet_writes_semantics():
    """Direct merge check vs a numpy simulation: sibling pairs, duplicate
    runs, lone rows; momentum rows of untouched siblings keep the store's
    current value, and all occurrences of one packed row are
    byte-identical."""
    rng = np.random.default_rng(4)
    n, d = 16, 128
    tab32 = rng.normal(size=(n, d)).astype(np.float32)
    packed = pk.pack_table(jnp.asarray(tab32))
    mom0 = rng.normal(size=(n, d)).astype(np.float32)
    store = pk.interleave_packed_momentum(packed, jnp.asarray(mom0))

    # sorted logical writes with duplicate-identical content: rows 2&3
    # (full sibling pair), 6 twice (duplicate run), 11 alone
    idx = np.array([2, 3, 6, 6, 11], np.int32)
    uniq, first = np.unique(idx, return_index=True)
    new16 = rng.normal(size=(len(idx), d)).astype(np.float32)
    for u, f in zip(uniq, first):  # duplicates carry identical content
        new16[idx == u] = new16[f]
    new_mom = rng.normal(size=(len(idx), d)).astype(np.float32)
    for u, f in zip(uniq, first):
        new_mom[idx == u] = new_mom[f]

    phys, out = pk.merge_packed_triplet_writes(
        store, jnp.asarray(idx), jnp.asarray(new16), jnp.asarray(new_mom)
    )
    phys = np.asarray(phys)
    out = np.asarray(out).reshape(len(idx), 3, d)
    np.testing.assert_array_equal(phys, 3 * (idx // 2))
    # duplicate slots byte-identical
    np.testing.assert_array_equal(out[2], out[3])

    # simulate: logical table and momentum buffer after the writes
    want_tab = tab32.astype(ml_dtypes.bfloat16)
    want_mom = mom0.copy()
    for k, i in enumerate(idx):
        want_tab[i] = new16[k].astype(ml_dtypes.bfloat16)
        want_mom[i] = new_mom[k]

    # apply the block writes (first occurrence of each packed row)
    store_np = np.array(store)
    for k in range(len(idx)):
        p = phys[k] // 3
        store_np[3 * p: 3 * p + 3] = np.asarray(out[k])
    got_p, got_m = pk.split_packed_interleaved(jnp.asarray(store_np))
    got_tab = pk.unpack_table_host(np.asarray(got_p), n)
    np.testing.assert_array_equal(got_tab, want_tab)
    np.testing.assert_array_equal(np.asarray(got_m), want_mom)


def test_end_to_end_triplet_training_on_mesh_and_checkpoint(tmp_path):
    """Full BESS train step with a triplet-interleaved packed table on the
    8-device mesh via the Trainer's auto-widening, vs the separate-buffer
    packed run: identical losses and final tables; checkpoints are
    byte-compatible across the two layouts."""
    from besskge_tpu.batch_sampler import RigidShardedBatchSampler
    from besskge_tpu.bess import EmbeddingMovingBessKGE
    from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
    from besskge_tpu.dataset import KGDataset
    from besskge_tpu.loss import LogSigmoidLoss
    from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
    from besskge_tpu.parallel import make_shard_mesh
    from besskge_tpu.scoring import TransE
    from besskge_tpu.sharding import PartitionedTripleSet, Sharding
    from besskge_tpu.trainer import build_train_step, init_optimizer_state

    rng = np.random.default_rng(7)
    n_entity, n_rel, n_train, n_shard = 200, 5, 256, 4
    triples = np.stack(
        [
            rng.integers(n_entity, size=n_train),
            rng.integers(n_rel, size=n_train),
            rng.integers(n_entity, size=n_train),
        ],
        axis=1,
    ).astype(np.int32)
    ds = KGDataset(
        n_entity=n_entity, n_relation_type=n_rel, entity_dict=None,
        relation_dict=None, type_offsets=None, triples={"train": triples},
        original_triple_ids={"train": np.arange(n_train)},
        neg_heads=None, neg_tails=None,
    )
    sharding = Sharding.create(n_entity, n_shard, seed=7)
    pts = PartitionedTripleSet.create_from_dataset(ds, "train", sharding)
    mesh = make_shard_mesh(n_shard)

    def run(interleaved):
        score_fn = TransE(
            negative_sample_sharing=True, scoring_norm=1,
            sharding=sharding, n_relation_type=n_rel,
            embedding_size=128, seed=7,
        )
        score_fn.dtype = jnp.bfloat16
        score_fn.packed_entity_storage = True
        ns = RandomShardedNegativeSampler(
            4, sharding, 7, "ht",
            local_sampling=False, flat_negative_format=True,
        )
        bs = RigidShardedBatchSampler(
            pts, ns, shard_bs=16, batches_per_step=2, seed=7
        )
        bess = EmbeddingMovingBessKGE(
            negative_sampler=ns, score_fn=score_fn,
            loss_fn=LogSigmoidLoss(
                margin=3.0, negative_adversarial_sampling=False
            ),
            axis_name="shard",
        )
        opt = optax.sgd(0.05)
        row = RowSGDM(
            learning_rate=0.05, momentum=0.9, interleaved=interleaved
        )
        params = {
            k: jnp.asarray(v) for k, v in score_fn.initial_params().items()
        }
        if interleaved:
            params["entity_embedding"] = pk.interleave_packed_momentum(
                params["entity_embedding"]
            )
        n_logical = sharding.n_shard * sharding.max_entity_per_shard
        opt_state = init_optimizer_state(
            opt, params, mesh, row, n_logical=n_logical
        )
        step_fn = build_train_step(bess, opt, mesh, row, donate=False)
        loader = bs.get_dataloader(shuffle=False)
        losses = []
        for _, batch in zip(range(3), loader):
            params, opt_state, out = step_fn(
                params, opt_state,
                {k: jnp.asarray(v) for k, v in batch.items()},
            )
            losses.append(float(np.sum(out["loss"])))
        return params, opt_state, losses

    p_sep, s_sep, l_sep = run(False)
    p_int, s_int, l_int = run(True)
    np.testing.assert_allclose(l_int, l_sep, rtol=1e-6)
    tab_int, mom_int = pk.split_packed_interleaved(p_int["entity_embedding"])
    # Two different compiled programs: allow a couple of ulps of FMA
    # contraction noise on the 16-bit params (same bound as the plain
    # pair-interleave test); momentum compared in fp32.
    a = np.asarray(tab_int).view(np.uint32)
    b = np.asarray(p_sep["entity_embedding"]).view(np.uint32)
    lo = np.abs((a & 0xFFFF).astype(np.int64) - (b & 0xFFFF).astype(np.int64))
    hi = np.abs((a >> 16).astype(np.int64) - (b >> 16).astype(np.int64))
    assert max(lo.max(), hi.max()) <= 4
    np.testing.assert_allclose(
        np.asarray(mom_int), np.asarray(s_sep["entity"]["m"]),
        rtol=1e-5, atol=1e-7,
    )

    # checkpoint: triplet save -> plain packed on disk + fp32 momentum
    path = tmp_path / "ck.npz"
    save_checkpoint(
        path,
        {k: np.asarray(v) for k, v in p_int.items()},
        opt_state=jax.tree.map(np.asarray, s_int),
        sharding=sharding,
        step=3,
        interleaved_entity=True,
    )
    params_p, opt_p, _, meta = load_checkpoint(path)
    assert meta["step"] == 3
    np.testing.assert_array_equal(
        params_p["entity_embedding"], np.asarray(tab_int)
    )
    np.testing.assert_array_equal(
        opt_p["entity"]["m"], np.asarray(mom_int)
    )
    # interleaved load rebuilds the exact triplet store
    params_i, opt_i, _, _ = load_checkpoint(path, interleave_entity=True)
    np.testing.assert_array_equal(
        params_i["entity_embedding"], np.asarray(p_int["entity_embedding"])
    )
    assert "m" not in opt_i["entity"]


def test_packed_checkpoint_reshard_roundtrip(tmp_path):
    """Re-sharding a packed checkpoint must not push the raw 32-bit words
    through the float32 permutation (bit patterns above 2^24 do not
    survive the astype) — the packed store is unpacked to logical 16-bit
    rows, permuted exactly, and re-packed under the new sharding; the
    logical-major fp32 momentum buffer reshards alongside (it has 2x the
    packed table's rows, so the shape matcher must catch both)."""
    from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
    from besskge_tpu.sharding import Sharding

    rng = np.random.default_rng(11)
    n_entity, d = 61, 128
    sh4 = Sharding.create(n_entity, 4, seed=1)
    sh2 = Sharding.create(n_entity, 2, seed=2)
    n_rows4 = 4 * sh4.max_entity_per_shard
    for half_np in (np.float16, ml_dtypes.bfloat16):
        tab16 = rng.normal(size=(n_rows4, d)).astype(half_np)
        packed = pk.pack_table_host(tab16.astype(np.float32))
        mom = rng.normal(size=(n_rows4, d)).astype(np.float32)
        path = tmp_path / f"pk_{np.dtype(half_np).name}.npz"
        save_checkpoint(
            path, {"entity_embedding": packed},
            opt_state={"entity": {"m": mom}}, sharding=sh4,
        )
        p2, o2, sh_out, _ = load_checkpoint(path, new_sharding=sh2)
        out = p2["entity_embedding"]
        assert out.dtype == packed.dtype
        assert out.shape == (2 * sh2.max_entity_per_shard // 2, d)
        # per-entity logical rows survive exactly
        flat_old = pk.unpack_table_host(packed, n_rows4)[
            sh4.entity_to_shard * sh4.max_entity_per_shard + sh4.entity_to_idx
        ]
        n_rows2 = 2 * sh2.max_entity_per_shard
        flat_new = pk.unpack_table_host(np.ascontiguousarray(out), n_rows2)[
            sh2.entity_to_shard * sh2.max_entity_per_shard + sh2.entity_to_idx
        ]
        np.testing.assert_array_equal(
            flat_new[:n_entity], flat_old[:n_entity]
        )
        m_old = mom[
            sh4.entity_to_shard * sh4.max_entity_per_shard + sh4.entity_to_idx
        ]
        m_new = o2["entity"]["m"][
            sh2.entity_to_shard * sh2.max_entity_per_shard + sh2.entity_to_idx
        ]
        np.testing.assert_array_equal(m_new[:n_entity], m_old[:n_entity])
        # and back to the original sharding: bit-exact round trip for
        # every REAL entity (padding rows — IDs >= n_entity — are not
        # preserved across reshards, by design)
        path2 = tmp_path / "pk_back.npz"
        save_checkpoint(
            path2, {"entity_embedding": out},
            opt_state={"entity": {"m": o2["entity"]["m"]}}, sharding=sh2,
        )
        p3, o3, _, _ = load_checkpoint(path2, new_sharding=sh4)
        flat_back = pk.unpack_table_host(
            np.ascontiguousarray(p3["entity_embedding"]), n_rows4
        )[sh4.entity_to_shard * sh4.max_entity_per_shard + sh4.entity_to_idx]
        np.testing.assert_array_equal(
            flat_back[:n_entity], flat_old[:n_entity]
        )
        m_back = o3["entity"]["m"][
            sh4.entity_to_shard * sh4.max_entity_per_shard + sh4.entity_to_idx
        ]
        np.testing.assert_array_equal(m_back[:n_entity], m_old[:n_entity])
