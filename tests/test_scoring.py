"""Tests for the score-function family.

Golden checks vs closed-form numpy for the core models, plus the
self-consistency invariant used throughout the BESS tests: scoring the true
tails/heads as "candidates" must reproduce ``score_triple`` on the diagonal
(reference analog: ``/root/reference/tests/test_bess.py:152-275``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from besskge_tpu.scoring import (
    BoxE,
    ComplEx,
    ConvE,
    DistMult,
    InterHT,
    PairRE,
    RotatE,
    TranS,
    TransE,
    TripleRE,
)
from besskge_tpu.sharding import Sharding

N_ENTITY = 60
N_RELATION = 7
BATCH = 16
EMB = 8


@pytest.fixture(scope="module")
def sharding():
    return Sharding.create(n_entity=N_ENTITY, n_shard=4, seed=0)


def _make(model_cls, sharding, sharing, **kw):
    common = dict(
        negative_sample_sharing=sharing,
        sharding=sharding,
        n_relation_type=N_RELATION,
        embedding_size=EMB,
        seed=11,
    )
    if model_cls not in (DistMult, ComplEx, ConvE):
        common["scoring_norm"] = kw.pop("scoring_norm", 2)
    if model_cls is ConvE:
        common.update(embedding_height=2, embedding_width=4)
    common.update(kw)
    return model_cls(**common)


def _batch_embeddings(model, params, seed=5):
    """Random (h, r, t) ids and their gathered embeddings."""
    rng = np.random.default_rng(seed)
    ent = np.asarray(params["entity_embedding"])
    flat = ent.reshape(-1, ent.shape[-1])
    h_id = rng.integers(0, flat.shape[0], BATCH)
    t_id = rng.integers(0, flat.shape[0], BATCH)
    r_id = rng.integers(0, N_RELATION, BATCH)
    return (
        jnp.asarray(flat[h_id]),
        jnp.asarray(r_id.astype(np.int32)),
        jnp.asarray(flat[t_id]),
    )


ALL_MODELS = [
    TransE,
    RotatE,
    PairRE,
    TripleRE,
    DistMult,
    ComplEx,
    BoxE,
    InterHT,
    TranS,
]


@pytest.mark.parametrize("model_cls", ALL_MODELS)
@pytest.mark.parametrize("sharing", [False, True])
def test_diagonal_consistency(model_cls, sharing, sharding):
    """score_tails/score_heads on the batch's own tails/heads must match
    score_triple on the diagonal."""
    model = _make(model_cls, sharding, sharing)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)

    direct = np.asarray(model.score_triple(params, h, r, t))
    assert direct.shape == (BATCH,)
    assert np.all(np.isfinite(direct))

    if sharing:
        tails = t[None]  # (1, BATCH, d) -> pool of BATCH candidates
        heads = h[None]
    else:
        tails = jnp.broadcast_to(t[None], (BATCH, BATCH, t.shape[-1]))
        heads = jnp.broadcast_to(h[None], (BATCH, BATCH, h.shape[-1]))

    st = np.asarray(model.score_tails(params, h, r, tails))
    sh = np.asarray(model.score_heads(params, heads, r, t))
    assert st.shape == (BATCH, BATCH)
    np.testing.assert_allclose(np.diag(st), direct, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.diag(sh), direct, rtol=2e-4, atol=2e-4)


def test_transe_golden(sharding):
    model = _make(TransE, sharding, False)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)
    rel = np.asarray(params["relation_embedding"])[np.asarray(r)]
    expected = -np.linalg.norm(np.asarray(h) + rel - np.asarray(t), axis=-1)
    np.testing.assert_allclose(
        np.asarray(model.score_triple(params, h, r, t)),
        expected,
        rtol=1e-4,
        atol=1e-5,
    )


def test_transe_l1(sharding):
    model = _make(TransE, sharding, False, scoring_norm=1)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)
    rel = np.asarray(params["relation_embedding"])[np.asarray(r)]
    expected = -np.abs(np.asarray(h) + rel - np.asarray(t)).sum(-1)
    np.testing.assert_allclose(
        np.asarray(model.score_triple(params, h, r, t)),
        expected,
        rtol=1e-4,
        atol=1e-5,
    )
    # Sharing path (cdist) for L1.
    model_s = _make(TransE, sharding, True, scoring_norm=1)
    st = np.asarray(model_s.score_tails(params, h, r, t[None]))
    np.testing.assert_allclose(
        np.diag(st), expected, rtol=1e-4, atol=1e-5
    )


def test_distmult_golden(sharding):
    model = _make(DistMult, sharding, False)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)
    rel = np.asarray(params["relation_embedding"])[np.asarray(r)]
    expected = (np.asarray(h) * rel * np.asarray(t)).sum(-1)
    np.testing.assert_allclose(
        np.asarray(model.score_triple(params, h, r, t)),
        expected,
        rtol=1e-4,
        atol=1e-6,
    )


def test_complex_golden(sharding):
    model = _make(ComplEx, sharding, False)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)
    d = EMB

    def to_c(x):
        x = np.asarray(x)
        return x[..., :d] + 1j * x[..., d:]

    rel = np.asarray(params["relation_embedding"])[np.asarray(r)]
    rel_c = rel[..., :d] + 1j * rel[..., d:]
    expected = np.real(np.sum(to_c(h) * rel_c * np.conj(to_c(t)), axis=-1))
    np.testing.assert_allclose(
        np.asarray(model.score_triple(params, h, r, t)),
        expected,
        rtol=1e-4,
        atol=1e-5,
    )
    # Head scores must use the conjugated relation.
    sh = np.asarray(model.score_heads(params, h[None], r, t))
    np.testing.assert_allclose(np.diag(sh), expected, rtol=1e-4, atol=1e-5)


def test_rotate_golden(sharding):
    model = _make(RotatE, sharding, False)
    params = {k: jnp.asarray(v) for k, v in model.initial_params().items()}
    h, r, t = _batch_embeddings(model, params)
    d = EMB
    phases = np.asarray(params["relation_embedding"])[np.asarray(r)]
    h_c = np.asarray(h)[..., :d] + 1j * np.asarray(h)[..., d:]
    t_c = np.asarray(t)[..., :d] + 1j * np.asarray(t)[..., d:]
    diff = h_c * np.exp(1j * phases) - t_c
    expected = -np.sqrt((np.abs(diff) ** 2).sum(-1))
    np.testing.assert_allclose(
        np.asarray(model.score_triple(params, h, r, t)),
        expected,
        rtol=1e-4,
        atol=1e-5,
    )


def test_conve_diag_consistency(sharding):
    model = _make(ConvE, sharding, False)
    params = {
        k: jnp.asarray(v) if not isinstance(v, dict) else {
            kk: jnp.asarray(vv) for kk, vv in v.items()
        }
        for k, v in model.initial_params().items()
    }
    h, r, t = _batch_embeddings(model, params)
    direct = np.asarray(model.score_triple(params, h, r, t))
    assert np.all(np.isfinite(direct))
    tails = jnp.broadcast_to(t[None], (BATCH, BATCH, t.shape[-1]))
    st = np.asarray(model.score_tails(params, h, r, tails))
    np.testing.assert_allclose(np.diag(st), direct, rtol=1e-4, atol=1e-4)
    with pytest.raises(NotImplementedError):
        model.score_heads(params, h[None], r, t)


def test_triplere_v2_offset(sharding):
    base = _make(TripleRE, sharding, False, normalize_entities=False)
    v2 = _make(TripleRE, sharding, False, normalize_entities=False, u=0.5)
    params = {k: jnp.asarray(v) for k, v in base.initial_params().items()}
    h, r, t = _batch_embeddings(base, params)
    s0 = np.asarray(base.score_triple(params, h, r, t))
    s1 = np.asarray(v2.score_triple(params, h, r, t))
    assert not np.allclose(s0, s1)


def test_update_sharding_preserves_rows(sharding):
    model = _make(TransE, sharding, False)
    params = model.initial_params()
    old_flat = params["entity_embedding"].reshape(
        4, sharding.max_entity_per_shard, -1
    )[sharding.entity_to_shard, sharding.entity_to_idx]
    new_sharding = Sharding.create(n_entity=N_ENTITY, n_shard=2, seed=9)
    new_params = model.update_sharding(params, new_sharding)
    new_flat = new_params["entity_embedding"].reshape(
        2, new_sharding.max_entity_per_shard, -1
    )[new_sharding.entity_to_shard, new_sharding.entity_to_idx]
    np.testing.assert_allclose(old_flat, new_flat)
    assert model.sharding is new_sharding


def test_initial_params_device_matches_shapes(sharding):
    import jax
    from besskge_tpu.parallel import make_shard_mesh

    model = _make(RotatE, sharding, True)
    host = model.initial_params()
    mesh = make_shard_mesh(4)
    dev = model.initial_params_device(mesh)
    assert dev["entity_embedding"].shape == host["entity_embedding"].shape
    assert dev["relation_embedding"].shape == host["relation_embedding"].shape
    # Sharded placement on the mesh axis.
    assert len(dev["entity_embedding"].sharding.device_set) == 4
    ent = np.asarray(dev["entity_embedding"])
    # RotatE defaults: KGE_uniform entities (|x| <= 1/row), rotation phases.
    assert np.abs(ent).max() <= 1.0 / ent.shape[-1] + 1e-6
    rel = np.asarray(dev["relation_embedding"])
    assert rel.min() >= 0 and rel.max() < 2 * np.pi


def test_initial_params_device_conve(sharding):
    model = _make(ConvE, sharding, False)
    dev = model.initial_params_device()
    host = model.initial_params()
    assert set(dev) == set(host)
    for k in dev:
        if isinstance(host[k], dict):
            assert set(dev[k]) == set(host[k])
