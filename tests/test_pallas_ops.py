"""Pallas kernels vs reference implementations (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from besskge_tpu.ops.pallas_distance import l1_distance_matrix


def test_l1_distance_matrix_interpret():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(37, 100)).astype(np.float32)
    b = rng.normal(size=(211, 100)).astype(np.float32)
    got = np.asarray(
        l1_distance_matrix(jnp.asarray(a), jnp.asarray(b), interpret=True)
    )
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_l1_distance_matrix_aligned_shapes():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 64)).astype(np.float32)
    b = rng.normal(size=(256, 64)).astype(np.float32)
    got = np.asarray(
        l1_distance_matrix(jnp.asarray(a), jnp.asarray(b), interpret=True)
    )
    expected = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def _l1_grads_expected(a, b, g):
    sign = np.sign(a[:, None, :] - b[None, :, :])
    da = (g[:, :, None] * sign).sum(1)
    db = -(g[:, :, None] * sign).sum(0)
    return da, db


def test_l1_distance_grads_interpret():
    from besskge_tpu.ops.pallas_distance import l1_distance_grads

    rng = np.random.default_rng(3)
    # Non-divisible B and N exercise the zero-padded (self-masking) tiles.
    a = rng.normal(size=(37, 100)).astype(np.float32)
    b = rng.normal(size=(211, 100)).astype(np.float32)
    g = rng.normal(size=(37, 211)).astype(np.float32)
    da, db = l1_distance_grads(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(g), interpret=True
    )
    eda, edb = _l1_grads_expected(a, b, g)
    np.testing.assert_allclose(np.asarray(da), eda, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), edb, rtol=1e-5, atol=1e-5)


def test_l1_distance_grads_multi_tile_accumulation():
    from besskge_tpu.ops.pallas_distance import l1_distance_grads

    rng = np.random.default_rng(4)
    # > 1 tile in BOTH grid dims so the output-revisit accumulation runs.
    a = rng.normal(size=(256, 64)).astype(np.float32)
    b = rng.normal(size=(384, 64)).astype(np.float32)
    g = rng.normal(size=(256, 384)).astype(np.float32)
    da, db = l1_distance_grads(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(g), interpret=True
    )
    eda, edb = _l1_grads_expected(a, b, g)
    np.testing.assert_allclose(np.asarray(da), eda, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), edb, rtol=1e-5, atol=1e-4)


def test_l1_distance_grads_matches_autodiff_of_broadcast():
    """End-to-end: the custom-VJP pair (pallas fwd + pallas bwd) agrees with
    jax.grad of the plain broadcast formula on a scalar loss."""
    from besskge_tpu.ops import distance as dist_mod

    rng = np.random.default_rng(5)
    a = rng.normal(size=(24, 32)).astype(np.float32)
    b = rng.normal(size=(40, 32)).astype(np.float32)
    w = rng.normal(size=(24, 40)).astype(np.float32)

    def loss_pallas(a_, b_):
        # interpret-mode pallas fwd; bwd goes through l1_distance_grads
        return jnp.sum(w * dist_mod._l1_tpu(a_, b_))

    def loss_ref(a_, b_):
        return jnp.sum(w * dist_mod._l1_broadcast(a_, b_))

    # interpret mode: patch the kernels' interpret flag via closures, and
    # zero the size gate so the kernel path is forced.
    import besskge_tpu.ops.pallas_distance as pd

    orig_mat, orig_grads = pd.l1_distance_matrix, pd.l1_distance_grads
    orig_gate = dist_mod._PALLAS_MIN_ELEMS
    pd_interp_mat = lambda a_, b_: orig_mat(a_, b_, interpret=True)
    pd_interp_grads = lambda a_, b_, g_: orig_grads(a_, b_, g_, interpret=True)
    pd.l1_distance_matrix = pd_interp_mat
    pd.l1_distance_grads = pd_interp_grads
    dist_mod._PALLAS_MIN_ELEMS = 0
    try:
        ga, gb = jax.grad(loss_pallas, argnums=(0, 1))(
            jnp.asarray(a), jnp.asarray(b)
        )
        ra, rb = jax.grad(loss_ref, argnums=(0, 1))(
            jnp.asarray(a), jnp.asarray(b)
        )
    finally:
        pd.l1_distance_matrix = orig_mat
        pd.l1_distance_grads = orig_grads
        dist_mod._PALLAS_MIN_ELEMS = orig_gate
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5,
                               atol=1e-5)


def test_l1_distance_matrix_batched_interpret():
    from besskge_tpu.ops.pallas_distance import l1_distance_matrix_batched

    rng = np.random.default_rng(6)
    # Non-divisible B/N + a batch dim: each group has its own candidates.
    a = rng.normal(size=(3, 37, 48)).astype(np.float32)
    b = rng.normal(size=(3, 211, 48)).astype(np.float32)
    got = np.asarray(
        l1_distance_matrix_batched(jnp.asarray(a), jnp.asarray(b),
                                   interpret=True)
    )
    exp = np.abs(a[:, :, None, :] - b[:, None, :, :]).sum(-1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-4)


def test_l1_distance_grads_batched_interpret():
    from besskge_tpu.ops.pallas_distance import l1_distance_grads_batched

    rng = np.random.default_rng(7)
    a = rng.normal(size=(2, 256, 64)).astype(np.float32)
    b = rng.normal(size=(2, 288, 64)).astype(np.float32)
    g = rng.normal(size=(2, 256, 288)).astype(np.float32)
    da, db = l1_distance_grads_batched(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(g), interpret=True
    )
    for gi in range(2):
        eda, edb = _l1_grads_expected(a[gi], b[gi], g[gi])
        np.testing.assert_allclose(np.asarray(da[gi]), eda, rtol=1e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(db[gi]), edb, rtol=1e-5,
                                   atol=1e-4)


def test_l1_batched_vmap_rule_matches_broadcast():
    """vmap of the TPU L1 dispatch routes through the custom-vmap rule; the
    result (whichever kernel the gate picks) must match the per-group
    broadcast formula, gradients included."""
    from besskge_tpu.ops import distance as dist_mod
    import besskge_tpu.ops.pallas_distance as pd

    rng = np.random.default_rng(8)
    a = rng.normal(size=(4, 24, 32)).astype(np.float32)
    b = rng.normal(size=(4, 40, 32)).astype(np.float32)
    w = rng.normal(size=(4, 24, 40)).astype(np.float32)

    orig = (pd.l1_distance_matrix_batched, pd.l1_distance_grads_batched,
            dist_mod._PALLAS_MIN_ELEMS_BATCHED)
    pd.l1_distance_matrix_batched = (
        lambda a_, b_: orig[0](a_, b_, interpret=True))
    pd.l1_distance_grads_batched = (
        lambda a_, b_, g_: orig[1](a_, b_, g_, interpret=True))
    dist_mod._PALLAS_MIN_ELEMS_BATCHED = 0  # force the batched-kernel path
    try:
        def loss(fn, a_, b_):
            return jnp.sum(jnp.asarray(w) * jax.vmap(fn)(a_, b_))

        va, (ga, gb) = jax.value_and_grad(
            lambda a_, b_: loss(dist_mod._l1_tpu, a_, b_), argnums=(0, 1)
        )(jnp.asarray(a), jnp.asarray(b))
        vr, (ra, rb) = jax.value_and_grad(
            lambda a_, b_: loss(dist_mod._l1_broadcast, a_, b_),
            argnums=(0, 1),
        )(jnp.asarray(a), jnp.asarray(b))
    finally:
        (pd.l1_distance_matrix_batched, pd.l1_distance_grads_batched,
         dist_mod._PALLAS_MIN_ELEMS_BATCHED) = orig
    np.testing.assert_allclose(float(va), float(vr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5,
                               atol=1e-5)


def test_l1_tpu_vjp_inside_vmap():
    """The trainer's exact composition — ``vmap`` over micro-batches, each
    computing a ``jax.vjp`` that routes through the L1 dispatch. custom_vmap
    alone does not support reverse-mode AD; the custom_vjp-outside /
    custom_vmap-inside structure must survive this."""
    from besskge_tpu.ops import distance as dist_mod
    import besskge_tpu.ops.pallas_distance as pd

    rng = np.random.default_rng(9)
    a = rng.normal(size=(3, 16, 32)).astype(np.float32)
    b = rng.normal(size=(3, 24, 32)).astype(np.float32)
    w = rng.normal(size=(3, 16, 24)).astype(np.float32)

    orig = (pd.l1_distance_matrix_batched, pd.l1_distance_grads_batched,
            dist_mod._PALLAS_MIN_ELEMS_BATCHED)
    pd.l1_distance_matrix_batched = (
        lambda a_, b_: orig[0](a_, b_, interpret=True))
    pd.l1_distance_grads_batched = (
        lambda a_, b_, g_: orig[1](a_, b_, g_, interpret=True))
    dist_mod._PALLAS_MIN_ELEMS_BATCHED = 0
    try:
        def mb(fn, a_, b_, w_):
            out, vjp = jax.vjp(fn, a_, b_)
            da, db = vjp(w_)
            return jnp.sum(out * w_), da, db

        va, ga, gb = jax.jit(jax.vmap(
            lambda a_, b_, w_: mb(dist_mod._l1_tpu, a_, b_, w_)
        ))(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
        vr, ra, rb = jax.jit(jax.vmap(
            lambda a_, b_, w_: mb(dist_mod._l1_broadcast, a_, b_, w_)
        ))(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
    finally:
        (pd.l1_distance_matrix_batched, pd.l1_distance_grads_batched,
         dist_mod._PALLAS_MIN_ELEMS_BATCHED) = orig
    np.testing.assert_allclose(np.asarray(va), np.asarray(vr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# scatter_rows (in-place row writes, ops/pallas_scatter.py)
# ---------------------------------------------------------------------------

from besskge_tpu.ops.pallas_adamw import dense_adamw_update  # noqa: E402
from besskge_tpu.ops.pallas_scatter import scatter_rows  # noqa: E402


def _scatter_expected(table, idx, rows):
    out = table.copy()
    out[idx] = rows.astype(table.dtype)
    return out


def test_scatter_rows_basic():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(64, 128)).astype(np.float32)
    idx = np.array([3, 17, 0, 63, 40, 41, 42, 43], dtype=np.int32)
    rows = rng.normal(size=(8, 128)).astype(np.float32)
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    np.testing.assert_array_equal(got, _scatter_expected(table, idx, rows))


def test_scatter_rows_padding_remainder():
    # R=5 is not a multiple of the DMA-unroll factor: the kernel pads with a
    # repeat of the last (idx, row) pair, which must be idempotent.
    rng = np.random.default_rng(3)
    table = rng.normal(size=(32, 256)).astype(np.float32)
    idx = np.array([1, 30, 7, 7, 12], dtype=np.int32)
    rows = rng.normal(size=(5, 256)).astype(np.float32)
    rows[2] = rows[3]  # duplicates carry identical content by contract
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    np.testing.assert_array_equal(got, _scatter_expected(table, idx, rows))


def test_scatter_rows_duplicate_indices_identical_rows():
    rng = np.random.default_rng(4)
    table = rng.normal(size=(16, 128)).astype(np.float32)
    idx = np.array([5, 5, 5, 5, 9, 9, 2, 2], dtype=np.int32)
    rows = np.empty((8, 128), dtype=np.float32)
    for k, i in enumerate(idx):
        rows[k] = float(i) + np.arange(128, dtype=np.float32)
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    np.testing.assert_array_equal(got, _scatter_expected(table, idx, rows))


def test_scatter_rows_3d_block_form():
    # The mesh path passes the per-device (1, n_rows, D) block unreshaped so
    # XLA alias analysis survives; the kernel indexes out_ref.at[0, row].
    rng = np.random.default_rng(5)
    table = rng.normal(size=(1, 48, 128)).astype(np.float32)
    idx = np.array([0, 47, 13, 21], dtype=np.int32)
    rows = rng.normal(size=(4, 128)).astype(np.float32)
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    expected = table.copy()
    expected[0, idx] = rows
    np.testing.assert_array_equal(got, expected)


def test_scatter_rows_dtype_cast():
    rng = np.random.default_rng(6)
    table = rng.normal(size=(24, 128)).astype(np.float32)
    idx = np.array([2, 3, 4, 5], dtype=np.int32)
    rows = rng.normal(size=(4, 128)).astype(np.float64)  # cast to table dtype
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    np.testing.assert_array_equal(got, _scatter_expected(table, idx, rows))


def test_scatter_rows_many_rows_pipeline_depth():
    # More rows than the DMA pipeline depth (_W=16) exercises semaphore reuse
    # and the drain loop.
    rng = np.random.default_rng(7)
    table = rng.normal(size=(128, 128)).astype(np.float32)
    idx = rng.permutation(128)[:60].astype(np.int32)
    rows = rng.normal(size=(60, 128)).astype(np.float32)
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True)
    )
    np.testing.assert_array_equal(got, _scatter_expected(table, idx, rows))


def test_scatter_rows_skip_dups_garbage_dup_slots():
    # skip_dups contract: idx SORTED, only the first slot of each run is
    # written — later slots' rows may be arbitrary garbage.
    rng = np.random.default_rng(8)
    table = rng.normal(size=(64, 128)).astype(np.float32)
    idx = np.array([1, 1, 1, 5, 9, 9, 30, 30, 30, 30, 41, 63], np.int32)
    rows = np.full((12, 128), np.nan, dtype=np.float32)  # garbage everywhere
    expected = table.copy()
    first = {}
    for k, i in enumerate(idx):
        if int(i) not in first:
            rows[k] = rng.normal(size=128)
            expected[i] = rows[k]
            first[int(i)] = k
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(rows),
                     interpret=True, skip_dups=True)
    )
    np.testing.assert_array_equal(got, expected)


def test_scatter_rows_skip_dups_pairs_and_padding():
    # slice_rows=2 (pair-major interleaved layout) + a non-multiple-of-_U
    # length, whose padding repeats the last pair and must be skipped.
    rng = np.random.default_rng(9)
    table = rng.normal(size=(64, 128)).astype(np.float32)
    phys = np.array([2, 2, 10, 10, 10, 40, 62], np.int32)  # even, sorted
    pair_rows = np.full((14, 128), np.inf, dtype=np.float32)
    expected = table.copy()
    seen = set()
    for k, i in enumerate(phys):
        if int(i) not in seen:
            pair_rows[2 * k : 2 * k + 2] = rng.normal(size=(2, 128))
            expected[i : i + 2] = pair_rows[2 * k : 2 * k + 2]
            seen.add(int(i))
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(phys),
                     jnp.asarray(pair_rows), interpret=True, slice_rows=2,
                     skip_dups=True)
    )
    np.testing.assert_array_equal(got, expected)


def test_scatter_rows_skip_dups_long_pipeline():
    # Longer than the DMA window: duplicates inside the steady-state loop
    # (traced predicate) and across the fill/drain boundaries.
    rng = np.random.default_rng(10)
    table = rng.normal(size=(256, 128)).astype(np.float32)
    base = np.sort(rng.integers(0, 256, size=96)).astype(np.int32)
    rows = np.full((96, 128), -np.inf, dtype=np.float32)
    expected = table.copy()
    seen = set()
    for k, i in enumerate(base):
        if int(i) not in seen:
            rows[k] = rng.normal(size=128)
            expected[i] = rows[k]
            seen.add(int(i))
    got = np.asarray(
        scatter_rows(jnp.asarray(table), jnp.asarray(base), jnp.asarray(rows),
                     interpret=True, skip_dups=True)
    )
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# dense_adamw_update (fused in-place AdamW, ops/pallas_adamw.py)
# ---------------------------------------------------------------------------


def _adamw_expected(p, mu, nu, g, t, lr, b1, b2, eps, wd):
    g32 = g.astype(np.float32)
    p32 = p.astype(np.float32)
    mu = b1 * mu + (1 - b1) * g32
    nu = b2 * nu + (1 - b2) * g32 * g32
    mu_hat = mu / (1 - b1**t)
    nu_hat = nu / (1 - b2**t)
    upd = lr * (mu_hat / (np.sqrt(nu_hat) + eps) + wd * p32)
    return (p32 - upd).astype(p.dtype), mu, nu


def _run_adamw(p, mu, nu, g, t, **kw):
    out = dense_adamw_update(
        jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), jnp.asarray(g),
        jnp.asarray(t, dtype=jnp.int32), interpret=True, **kw
    )
    return [np.asarray(x) for x in out]


def test_dense_adamw_matches_formula():
    rng = np.random.default_rng(8)
    m, d = 512, 128  # exactly one tile
    p = rng.normal(size=(m, d)).astype(np.float32)
    mu = rng.normal(size=(m, d)).astype(np.float32) * 0.1
    nu = (rng.normal(size=(m, d)).astype(np.float32) * 0.1) ** 2
    g = rng.normal(size=(m, d)).astype(np.float32)
    kw = dict(lr=1e-2, b1=0.9, b2=0.999, eps=1e-8, wd=0.01)
    got_p, got_mu, got_nu = _run_adamw(p, mu, nu, g, t=3, **kw)
    exp_p, exp_mu, exp_nu = _adamw_expected(p, mu, nu, g, 3, **kw)
    np.testing.assert_allclose(got_mu, exp_mu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_nu, exp_nu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_p, exp_p, rtol=1e-5, atol=1e-6)


def test_dense_adamw_ragged_final_tile():
    # m=700 -> grid of 2 tiles of 512, final tile ragged (188 rows): the
    # masked writes must not corrupt rows beyond the table.
    rng = np.random.default_rng(9)
    m, d = 700, 128
    p = rng.normal(size=(m, d)).astype(np.float32)
    mu = np.zeros((m, d), np.float32)
    nu = np.zeros((m, d), np.float32)
    g = rng.normal(size=(m, d)).astype(np.float32)
    kw = dict(lr=5e-3, b1=0.9, b2=0.999, eps=1e-8, wd=0.0)
    got_p, got_mu, got_nu = _run_adamw(p, mu, nu, g, t=1, **kw)
    exp_p, exp_mu, exp_nu = _adamw_expected(p, mu, nu, g, 1, **kw)
    np.testing.assert_allclose(got_mu, exp_mu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_nu, exp_nu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_p, exp_p, rtol=1e-5, atol=1e-6)


def test_dense_adamw_bf16_param():
    rng = np.random.default_rng(10)
    m, d = 512, 128
    p = rng.normal(size=(m, d)).astype(jnp.bfloat16)
    mu = np.zeros((m, d), np.float32)
    nu = np.zeros((m, d), np.float32)
    g = rng.normal(size=(m, d)).astype(np.float32)
    kw = dict(lr=1e-2, b1=0.9, b2=0.999, eps=1e-8, wd=0.0)
    out = dense_adamw_update(
        jnp.asarray(p), jnp.asarray(mu), jnp.asarray(nu), jnp.asarray(g),
        jnp.asarray(2, dtype=jnp.int32), interpret=True, **kw
    )
    assert out[0].dtype == jnp.bfloat16
    exp_p, exp_mu, _ = _adamw_expected(
        np.asarray(p, dtype=np.float32), mu, nu, g, 2, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out[0], dtype=np.float32), exp_p, rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(out[1]), exp_mu, rtol=1e-6, atol=1e-6)


def test_dense_adamw_multi_step_trajectory():
    # Three consecutive kernel steps track the numpy trajectory.
    rng = np.random.default_rng(11)
    m, d = 600, 128  # ragged
    p = rng.normal(size=(m, d)).astype(np.float32)
    mu = np.zeros((m, d), np.float32)
    nu = np.zeros((m, d), np.float32)
    kw = dict(lr=1e-2, b1=0.9, b2=0.999, eps=1e-8, wd=0.004)
    pe, me, ne = p.copy(), mu.copy(), nu.copy()
    for t in range(1, 4):
        g = rng.normal(size=(m, d)).astype(np.float32)
        p, mu, nu = _run_adamw(p, mu, nu, g, t=t, **kw)
        pe, me, ne = _adamw_expected(pe, me, ne, g, t, **kw)
    np.testing.assert_allclose(p, pe, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mu, me, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nu, ne, rtol=1e-5, atol=1e-6)


def test_l1_scores_chunkmax_interpret():
    """Fused scores+chunk-max kernel: masked negated distances and exact
    per-128-column maxima, across padding/alignment edge shapes."""
    from besskge_tpu.ops.pallas_distance import l1_scores_chunkmax

    rng = np.random.default_rng(4)
    for B, N, d in [(8, 128, 16), (37, 1536, 96), (130, 1152, 64)]:
        a = rng.normal(size=(B, d)).astype(np.float32)
        b = rng.normal(size=(N, d)).astype(np.float32)
        valid = rng.random(N) > 0.3
        s, cm = l1_scores_chunkmax(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid),
            interpret=True,
        )
        dist = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
        want = -dist + (-50000.0) * (~valid)[None, :]
        np.testing.assert_allclose(np.asarray(s), want, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(cm), want.reshape(B, N // 128, 128).max(-1),
            rtol=1e-5, atol=1e-3,
        )


def test_l1_scores_chunkmax_all_invalid_column_block():
    """A fully-masked chunk must never win the merge: its max is the
    sentinel."""
    from besskge_tpu.ops.pallas_distance import l1_scores_chunkmax

    rng = np.random.default_rng(5)
    B, N, d = 16, 512, 32
    a = rng.normal(size=(B, d)).astype(np.float32)
    b = rng.normal(size=(N, d)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[128:256] = False  # entire second chunk invalid
    s, cm = l1_scores_chunkmax(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid), interpret=True
    )
    cm = np.asarray(cm)
    assert (cm[:, 1] < -40000.0).all()
    assert (cm[:, [0, 2, 3]] > -40000.0).all()


def test_l1_scores_chunkmax_xla_fallback_matches():
    """ops.distance.l1_scores_chunkmax XLA fallback == Mosaic interpreter."""
    from besskge_tpu.ops import distance as dist_mod

    rng = np.random.default_rng(6)
    B, N, d = 24, 640, 48
    a = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    valid = jnp.asarray(rng.random(N) > 0.5)
    old = dist_mod._FUSED_L1_MODE
    try:
        dist_mod._FUSED_L1_MODE = "xla"
        s1, c1 = dist_mod.l1_scores_chunkmax(a, b, valid)
        dist_mod._FUSED_L1_MODE = "pallas_interpret"
        s2, c2 = dist_mod.l1_scores_chunkmax(a, b, valid)
    finally:
        dist_mod._FUSED_L1_MODE = old
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-3)


# ---------------------------------------------------------------------------
# scatter_rows_multi (fused multi-buffer row writes)
# ---------------------------------------------------------------------------

from besskge_tpu.ops.pallas_scatter import scatter_rows_multi  # noqa: E402


def test_scatter_rows_multi_two_buffers():
    rng = np.random.default_rng(7)
    t0 = rng.normal(size=(64, 128)).astype(np.float32)
    t1 = rng.normal(size=(40, 128)).astype(np.float32)
    i0 = np.array([3, 17, 0, 63, 40], dtype=np.int32)
    i1 = np.array([1, 2, 3, 4, 39], dtype=np.int32)
    r0 = rng.normal(size=(5, 128)).astype(np.float32)
    r1 = rng.normal(size=(5, 128)).astype(np.float32)
    o0, o1 = scatter_rows_multi(
        (jnp.asarray(t0), jnp.asarray(t1)),
        (jnp.asarray(i0), jnp.asarray(i1)),
        (jnp.asarray(r0), jnp.asarray(r1)),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(o0), _scatter_expected(t0, i0, r0))
    np.testing.assert_array_equal(np.asarray(o1), _scatter_expected(t1, i1, r1))


def test_scatter_rows_multi_three_buffers_unequal_lengths_and_3d():
    # AdamW shape: params (3-D mesh block) + two fp32 moment buffers; index
    # lists of different lengths get idempotent repeat-padding per buffer.
    rng = np.random.default_rng(8)
    t0 = rng.normal(size=(1, 32, 128)).astype(np.float32)
    t1 = rng.normal(size=(64, 128)).astype(np.float32)
    t2 = rng.normal(size=(64, 128)).astype(np.float32)
    i0 = np.array([0, 31, 5], dtype=np.int32)
    i1 = np.array([2, 3, 4, 5, 6, 7, 8], dtype=np.int32)
    i2 = np.array([62, 63], dtype=np.int32)
    r0 = rng.normal(size=(3, 128)).astype(np.float32)
    r1 = rng.normal(size=(7, 128)).astype(np.float32)
    r2 = rng.normal(size=(2, 128)).astype(np.float32)
    o0, o1, o2 = scatter_rows_multi(
        tuple(map(jnp.asarray, (t0, t1, t2))),
        tuple(map(jnp.asarray, (i0, i1, i2))),
        tuple(map(jnp.asarray, (r0, r1, r2))),
        interpret=True,
    )
    e0 = t0.copy()
    e0[0, i0] = r0
    np.testing.assert_array_equal(np.asarray(o0), e0)
    np.testing.assert_array_equal(np.asarray(o1), _scatter_expected(t1, i1, r1))
    np.testing.assert_array_equal(np.asarray(o2), _scatter_expected(t2, i2, r2))


def test_scatter_rows_multi_packed_plus_moment():
    # SGDM-on-packed shape: uint32 packed param storage written with packed
    # indices, fp32 momentum with logical indices, one fused kernel.
    import besskge_tpu.packed as pk

    rng = np.random.default_rng(9)
    tab16 = rng.normal(size=(20, 128)).astype(np.float16)
    packed = pk.pack_table(jnp.asarray(tab16))
    mom = rng.normal(size=(20, 128)).astype(np.float32)
    logical = np.array([4, 5, 11], dtype=np.int32)
    new16 = rng.normal(size=(3, 128)).astype(np.float16)
    p_idx, p_rows = pk.merge_packed_row_writes(
        packed, jnp.asarray(logical), jnp.asarray(new16, jnp.float32)
    )
    m_rows = rng.normal(size=(3, 128)).astype(np.float32)
    o_tab, o_mom = scatter_rows_multi(
        (packed, jnp.asarray(mom)),
        (p_idx, jnp.asarray(logical)),
        (p_rows, jnp.asarray(m_rows)),
        interpret=True,
    )
    exp = tab16.copy()
    exp[logical] = new16
    np.testing.assert_array_equal(
        np.asarray(pk.unpack_table(o_tab, 20)), exp
    )
    np.testing.assert_array_equal(
        np.asarray(o_mom), _scatter_expected(mom, logical, m_rows)
    )


def test_scatter_rows_multi_skip_dups_independent_runs():
    # Buffers dedup independently: buffer 0's runs differ from buffer 1's.
    # Dup slots carry garbage per the skip_dups contract.
    rng = np.random.default_rng(11)
    t0 = rng.normal(size=(64, 128)).astype(np.float32)
    t1 = rng.normal(size=(64, 128)).astype(np.float32)
    i0 = np.array([2, 2, 7, 7, 7, 8, 50, 50, 51], np.int32)
    i1 = np.array([0, 1, 1, 1, 1, 9, 9, 60, 60], np.int32)
    r0 = np.full((9, 128), np.nan, dtype=np.float32)
    r1 = np.full((9, 128), np.nan, dtype=np.float32)
    e0, e1 = t0.copy(), t1.copy()
    for idx, rows, exp in ((i0, r0, e0), (i1, r1, e1)):
        seen = set()
        for k, i in enumerate(idx):
            if int(i) not in seen:
                rows[k] = rng.normal(size=128)
                exp[i] = rows[k]
                seen.add(int(i))
    o0, o1 = scatter_rows_multi(
        (jnp.asarray(t0), jnp.asarray(t1)),
        (jnp.asarray(i0), jnp.asarray(i1)),
        (jnp.asarray(r0), jnp.asarray(r1)),
        interpret=True,
        skip_dups=True,
    )
    np.testing.assert_array_equal(np.asarray(o0), e0)
    np.testing.assert_array_equal(np.asarray(o1), e1)


# ---------------------------------------------------------------------------
# gather_rows (pipelined row reads, ops/pallas_scatter.py)
# ---------------------------------------------------------------------------

from besskge_tpu.ops.pallas_scatter import gather_rows  # noqa: E402


def test_gather_rows_basic_and_padding():
    rng = np.random.default_rng(12)
    table = rng.normal(size=(64, 128)).astype(np.float32)
    idx = np.array([3, 17, 0, 63, 40], np.int32)  # R=5: exercises _U padding
    got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx),
                                 interpret=True))
    np.testing.assert_array_equal(got, table[idx])


def test_gather_rows_pairs_3d():
    rng = np.random.default_rng(13)
    table = rng.normal(size=(1, 64, 128)).astype(np.float32)
    phys = np.array([0, 10, 10, 62], np.int32)
    got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(phys),
                                 interpret=True, slice_rows=2))
    want = table[0][(phys[:, None] + np.arange(2)).ravel()]
    np.testing.assert_array_equal(got, want)


def test_gather_rows_skip_dups_first_of_run_only():
    rng = np.random.default_rng(14)
    table = rng.normal(size=(256, 128)).astype(np.float32)
    idx = np.sort(rng.integers(0, 128, size=96)).astype(np.int32) * 2
    got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx),
                                 interpret=True, slice_rows=2,
                                 skip_dups=True))
    first = np.concatenate([[True], idx[1:] != idx[:-1]])
    sel = np.repeat(first, 2)
    want = table[(idx[:, None] + np.arange(2)).ravel()]
    np.testing.assert_array_equal(got[sel], want[sel])


# ---------------------------------------------------------------------------
# fused_pair_sgdm (gather + SGDM math + scatter in one kernel)
# ---------------------------------------------------------------------------

from besskge_tpu.ops.pallas_row_sgdm import fused_pair_sgdm  # noqa: E402


def _sgdm_pairs_expected(table, logical, grads, lr, mom, wd):
    out = table.copy()
    seen = set()
    for k, i in enumerate(logical):
        i = int(i)
        if i in seen:
            continue
        seen.add(i)
        p, m = out[2 * i].astype(np.float64), out[2 * i + 1].astype(np.float64)
        g = grads[k].astype(np.float64)
        if wd:
            g = g + wd * p
        m = mom * m + g
        out[2 * i] = (p - lr * m).astype(np.float32)
        out[2 * i + 1] = m.astype(np.float32)
    return out


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_fused_pair_sgdm_matches_reference_math(wd):
    rng = np.random.default_rng(21)
    n = 64
    table = rng.normal(size=(2 * n, 128)).astype(np.float32)
    logical = np.sort(rng.integers(0, n, size=24)).astype(np.int32)
    grads = rng.normal(size=(24, 128)).astype(np.float32)
    # duplicate-identical grads per the dedup contract
    for k in range(1, 24):
        if logical[k] == logical[k - 1]:
            grads[k] = grads[k - 1]
    got = np.asarray(
        fused_pair_sgdm(
            jnp.asarray(table), jnp.asarray(2 * logical), jnp.asarray(grads),
            lr=0.05, momentum=0.9, weight_decay=wd, interpret=True,
        )
    )
    want = _sgdm_pairs_expected(table, logical, grads, 0.05, 0.9, wd)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_pair_sgdm_multi_block_and_3d():
    # R spans several k_block grid steps (K is min(512, R) so force many
    # blocks with a tiny R per block via padding behavior: use R=1040).
    rng = np.random.default_rng(22)
    n = 1024
    table = rng.normal(size=(1, 2 * n, 128)).astype(np.float32)
    logical = np.sort(rng.integers(0, n, size=1040)).astype(np.int32)
    grads = rng.normal(size=(1040, 128)).astype(np.float32)
    order = np.argsort(logical, kind="stable")
    for k in range(1, 1040):
        if logical[k] == logical[k - 1]:
            grads[k] = grads[k - 1]
    del order
    got = np.asarray(
        fused_pair_sgdm(
            jnp.asarray(table), jnp.asarray(2 * logical), jnp.asarray(grads),
            lr=0.01, momentum=0.95, interpret=True,
        )
    )
    want = _sgdm_pairs_expected(table[0], logical, grads, 0.01, 0.95, 0.0)
    np.testing.assert_allclose(got[0], want, rtol=1e-6, atol=1e-6)


def test_fused_pair_sgdm_traced_lr_schedule():
    rng = np.random.default_rng(23)
    n = 32
    table = rng.normal(size=(2 * n, 128)).astype(np.float32)
    logical = np.sort(rng.integers(0, n, size=16)).astype(np.int32)
    grads = rng.normal(size=(16, 128)).astype(np.float32)
    for k in range(1, 16):
        if logical[k] == logical[k - 1]:
            grads[k] = grads[k - 1]
    lr = jnp.float32(0.003) * 2.0  # traced scalar
    got = np.asarray(
        fused_pair_sgdm(
            jnp.asarray(table), jnp.asarray(2 * logical), jnp.asarray(grads),
            lr=lr, momentum=0.9, interpret=True,
        )
    )
    want = _sgdm_pairs_expected(table, logical, grads, 0.006, 0.9, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gather_rows_ragged_window_rounds_down():
    """A caller-supplied window not on the _U grid must not hang/corrupt the
    fill/steady/drain pipeline (round-4 advisor finding): it is rounded down
    to a multiple of the unroll factor."""
    rng = np.random.default_rng(15)
    table = rng.normal(size=(512, 128)).astype(np.float32)
    idx = rng.integers(0, 512, size=200).astype(np.int32)
    for w in (13, 9, 100):
        got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(idx),
                                     interpret=True, window=w))
        np.testing.assert_array_equal(got, table[idx])
