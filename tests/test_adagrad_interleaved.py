"""Interleaved RowAdagrad entity tables (round 5).

The Adagrad accumulator is a single per-row state buffer, so
``RowAdagrad(interleaved=True)`` reuses :class:`besskge_tpu.optim.RowSGDM`'s
storage layouts verbatim — pair-major ``(2N, D)`` fp32 or triplet-major
``(3P, D)`` packed — with ``[param | accumulator]`` block DMAs. These tests
pin bit-exact trajectory equivalence with the separate-buffer path and the
checkpoint byte-compatibility (the on-disk state key is ``opt/entity/acc``,
matching a non-interleaved Adagrad run).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import besskge_tpu.packed as pk
from besskge_tpu.optim import (
    RowAdagrad,
    interleave_momentum,
    split_interleaved,
)


@pytest.mark.parametrize("storage", ["fp32", "packed_bf16", "packed_fp16"])
def test_interleaved_trajectory_matches_separate(storage):
    rng = np.random.default_rng(3)
    n, d = 24, 128
    tab32 = rng.normal(size=(n, d)).astype(np.float32)
    if storage == "fp32":
        tab0 = jnp.asarray(tab32)
    else:
        hd = jnp.bfloat16 if storage == "packed_bf16" else jnp.float16
        tab0 = pk.pack_table(jnp.asarray(tab32).astype(hd))

    def run(interleaved):
        opt = RowAdagrad(learning_rate=0.05, interleaved=interleaved)
        if interleaved:
            table = (
                pk.interleave_packed_momentum(tab0)
                if pk.is_packed(tab0) else interleave_momentum(tab0)
            )
        else:
            table = tab0
        state = opt.init(table, n_logical=n)
        for step in range(5):
            srng = np.random.default_rng(100 + step)
            idx = jnp.asarray(srng.integers(n, size=12).astype(np.int32))
            grads = jnp.asarray(
                srng.normal(size=(12, d)).astype(np.float32)
            )
            table, state = opt.update_rows(table, state, idx, grads)
        if interleaved:
            if pk.is_packed(table):
                p, a = pk.split_packed_interleaved(table)
            else:
                p, a = split_interleaved(table)
            return np.asarray(p), np.asarray(a)
        return np.asarray(table), np.asarray(state["acc"])

    p_sep, a_sep = run(False)
    p_int, a_int = run(True)
    np.testing.assert_array_equal(p_int, p_sep)
    np.testing.assert_array_equal(a_int, a_sep)


def test_checkpoint_key_is_acc(tmp_path):
    """The de-interleaved on-disk layout stores the accumulator under
    opt/entity/acc — byte-compatible with a non-interleaved Adagrad run —
    and loads back in either layout."""
    from besskge_tpu.checkpoint import load_checkpoint, save_checkpoint
    from besskge_tpu.sharding import Sharding

    rng = np.random.default_rng(5)
    n, d = 16, 128
    tab = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    acc = jnp.asarray(abs(rng.normal(size=(n, d))).astype(np.float32))
    wide = interleave_momentum(tab, momentum=acc)
    sh = Sharding.create(n, 1, seed=0)
    path = tmp_path / "ada.npz"
    save_checkpoint(
        path,
        {"entity_embedding": np.asarray(wide)},
        opt_state={"entity": {"count": np.int32(4)}},
        sharding=sh,
        interleaved_entity="adagrad",
    )
    params_p, opt_p, _, _ = load_checkpoint(path)
    np.testing.assert_array_equal(
        params_p["entity_embedding"], np.asarray(tab)
    )
    np.testing.assert_array_equal(opt_p["entity"]["acc"], np.asarray(acc))
    assert "m" not in opt_p["entity"]
    params_i, opt_i, _, _ = load_checkpoint(
        path, interleave_entity="adagrad"
    )
    np.testing.assert_array_equal(
        params_i["entity_embedding"], np.asarray(wide)
    )
    assert "acc" not in opt_i["entity"]


def test_init_validation():
    row = RowAdagrad(learning_rate=0.1, interleaved=True)
    with pytest.raises(ValueError, match="interleave_momentum"):
        row.init(jnp.zeros((8, 32), jnp.float32), n_logical=8)
    row.init(jnp.zeros((16, 32), jnp.float32), n_logical=8)  # widened ok
    with pytest.raises(ValueError, match="fp32"):
        row.init(jnp.zeros((16, 32), jnp.bfloat16), n_logical=8)
    packed = pk.pack_table(jnp.zeros((16, 128), jnp.bfloat16))
    with pytest.raises(ValueError, match="interleave_packed_momentum"):
        row.init(packed, n_logical=16)
    row.init(pk.interleave_packed_momentum(packed), n_logical=16)  # ok
