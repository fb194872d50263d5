"""Deterministic ogbl-biokg-like fixture for offline downstream-quality runs.

The real ogbl-biokg loader (:func:`besskge_tpu.dataset.build_ogbl_biokg`,
mirroring reference ``besskge/dataset.py:241-296``) needs network access to
download OGB data. This sandbox has none, so quality parity is measured on a
*re-distribution fixture*: a synthetic KG that reproduces ogbl-biokg's
published shape —

- 93,773 entities in the 5 published types with their exact sizes
  (disease 10,687 / drug 10,533 / function 45,085 / protein 17,499 /
  side-effect 9,969), type-contiguous IDs like the real loader produces;
- 51 relation types over plausible (head_type, tail_type) pairs
  (38 drug-drug + 7 protein-protein + 6 cross-type — the real relation
  inventory; per-relation triple counts are an approximation);
- 4,762,678 / 162,886 / 162,870 train/valid/test triples;
- official-style eval negatives: 500 type-matched negative heads and 500
  negative tails per eval triple.

Structure is *planted*: a ground-truth RotatE model is sampled, and each
triple's tail is the argmax of the planted score over ``k_candidates``
random type-matched entities. This makes the task exactly realizable by the
training recipe under test, with a difficulty knob: against ``n_neg``
uniform type-matched negatives, the planted model's expected (analytic)
MRR is ``(1 - (1-p)^(n_neg+1)) / ((n_neg+1) * p)`` with
``p = 1/(k_candidates+1)`` — ``k_candidates=1280``, ``n_neg=500`` puts the
oracle ceiling at ≈0.83, i.e. the real dataset's 0.818 quality bar. A
recipe/convention bug (sampling distribution, loss scaling, score sign)
shows up as a trained-vs-oracle MRR gap.

Candidate scoring runs on the default JAX backend (TPU at full scale; the
tests use ``scale`` ≪ 1 on CPU). Everything is deterministic in ``seed``
for a fixed backend.
"""

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
from numpy.typing import NDArray

from besskge_tpu.dataset import KGDataset

__all__ = [
    "BIOKG_TYPE_COUNTS",
    "BIOKG_SPLIT_SIZES",
    "PlantedRotatE",
    "build_biokg_fixture",
    "oracle_mrr",
]

#: Published ogbl-biokg entity-type sizes (sum = 93,773).
BIOKG_TYPE_COUNTS: Dict[str, int] = {
    "disease": 10_687,
    "drug": 10_533,
    "function": 45_085,
    "protein": 17_499,
    "sideeffect": 9_969,
}

#: Published split sizes (train, valid, test).
BIOKG_SPLIT_SIZES: Tuple[int, int, int] = (4_762_678, 162_886, 162_870)

#: Official eval protocol: 500 negative heads + 500 negative tails.
N_EVAL_NEGATIVE = 500


def _relation_spec() -> Tuple[Tuple[str, str, float], ...]:
    """(head_type, tail_type, trainfraction) for the 51 relations.

    The type-pair inventory matches ogbl-biokg (38 drug-drug interaction
    relations, 7 protein-protein relations, 6 cross-type relations); the
    mass split across families is a documented approximation of the
    published counts, with a geometric within-family profile so relation
    frequencies span orders of magnitude like the real data.
    """
    spec = []

    def family(head, tail, n, mass):
        w = 0.82 ** np.arange(n)
        w = mass * w / w.sum()
        spec.extend((head, tail, float(f)) for f in w)

    family("drug", "drug", 38, 0.56)
    family("protein", "protein", 7, 0.13)
    family("function", "function", 1, 0.20)
    family("protein", "function", 1, 0.06)
    family("drug", "sideeffect", 1, 0.03)
    family("disease", "protein", 1, 0.015)
    family("drug", "protein", 1, 0.004)
    family("drug", "disease", 1, 0.001)
    assert len(spec) == 51
    return tuple(spec)


def oracle_mrr(k_candidates: int, n_negative: int = N_EVAL_NEGATIVE) -> float:
    """Analytic expected MRR of the planted model against uniform
    type-matched negatives (tie/collision effects ignored)."""
    p = 1.0 / (k_candidates + 1)
    n = n_negative + 1
    return float((1.0 - (1.0 - p) ** n) / (n * p))


@dataclasses.dataclass
class PlantedRotatE:
    """The generator's ground-truth model: blocked-complex entity rows and
    relation phases, scored as ``-||h ∘ e^{i r} − t||_1`` (matching
    :class:`besskge_tpu.scoring.RotatE` with ``scoring_norm=1``)."""

    entity: NDArray[np.float32]  # (n_entity, 2*emb)
    phase: NDArray[np.float32]  # (n_relation, emb)

    def score(self, h, r, t) -> NDArray[np.float32]:
        """Planted scores for (h, r, t) index triples (host math)."""
        import jax.numpy as jnp

        from besskge_tpu.utils import complex_rotation

        hr = complex_rotation(jnp.asarray(self.entity[h]), jnp.asarray(self.phase[r]))
        return np.asarray(-jnp.abs(hr - self.entity[t]).sum(-1))

    def rank_against(self, triples, negatives, corrupt: str) -> NDArray[np.int32]:
        """1-based rank of each true triple against its negative pool
        (``corrupt`` = "h" or "t"), worst tie-breaking to match
        :class:`besskge_tpu.metric.Evaluation`'s default."""
        h, r, t = triples[:, 0], triples[:, 1], triples[:, 2]
        pos = self.score(h, r, t)
        ranks = np.ones(len(triples), np.int64)
        for j in range(0, negatives.shape[1], 125):
            neg = negatives[:, j : j + 125]
            b, k = neg.shape
            hh = np.repeat(h, k) if corrupt == "t" else neg.reshape(-1)
            tt = neg.reshape(-1) if corrupt == "t" else np.repeat(t, k)
            s = self.score(hh, np.repeat(r, k), tt).reshape(b, k)
            ranks += (s >= pos[:, None]).sum(1)
        return ranks.astype(np.int32)


def _make_argmax_tails():
    """Build the on-device planted-score argmax picker (jitted ONCE).

    The picker draws each triple's ``k_candidates`` type-matched candidates
    *on device* from (t_lo, t_n) relation bounds — only (B,) heads/relations
    cross host→device, not a (B, K) candidate matrix — scores them against
    the planted model in bf16 over chunks (bounding the B × chunk × 2emb
    broadcast), and returns the per-triple argmax tail.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from besskge_tpu.utils import complex_rotation

    @functools.partial(jax.jit, static_argnums=(7, 8))
    def pick(e_tab, ph_tab, hh, rr, t_lo, t_n, key, k_candidates, cand_chunk):
        hr = complex_rotation(
            jnp.take(e_tab, hh, axis=0), jnp.take(ph_tab, rr, axis=0)
        ).astype(jnp.bfloat16)
        lo = jnp.take(t_lo, rr)
        n_ty = jnp.take(t_n, rr)
        n_chunk = (k_candidates + cand_chunk - 1) // cand_chunk

        def chunk(carry, ck):
            best, best_id = carry
            u = jax.random.uniform(ck, (hh.shape[0], cand_chunk))
            c_ids = (lo[:, None] + (u * n_ty[:, None]).astype(jnp.int32)).astype(
                jnp.int32
            )
            emb = jnp.take(e_tab, c_ids, axis=0).astype(jnp.bfloat16)
            s = -jnp.abs(hr[:, None, :] - emb).sum(-1, dtype=jnp.float32)
            m = s.max(1)
            am = jnp.take_along_axis(c_ids, s.argmax(1)[:, None], axis=1)[:, 0]
            upd = m > best
            return (jnp.where(upd, m, best), jnp.where(upd, am, best_id)), None

        init = (
            jnp.full(hh.shape, -jnp.inf, jnp.float32),
            jnp.zeros(hh.shape, jnp.int32),
        )
        (best, best_id), _ = jax.lax.scan(chunk, init, jax.random.split(key, n_chunk))
        return best_id

    return pick


_ARGMAX_TAILS = None


def _jax_key(seed: int, part: str):
    """Deterministic PRNG key for a split's candidate draws."""
    import jax

    part_id = {"train": 1, "valid": 2, "test": 3}.get(part, 9)
    return jax.random.PRNGKey((seed * 1_000_003 + part_id) & 0x7FFFFFFF)


def _split_key(key):
    import jax

    k1, k2 = jax.random.split(key)
    return k1, k2


def _argmax_tails(entity, phase, h, r, t_lo, t_n, key, k_candidates,
                  cand_chunk: int = 256):
    """Planted-score argmax over on-device-drawn candidates (see
    :func:`_make_argmax_tails`); returns the (B,) chosen tails."""
    global _ARGMAX_TAILS
    if _ARGMAX_TAILS is None:
        _ARGMAX_TAILS = _make_argmax_tails()
    return np.asarray(
        _ARGMAX_TAILS(entity, phase, h, r, t_lo, t_n, key, k_candidates, cand_chunk)
    )


def build_biokg_fixture(
    seed: int = 0,
    scale: float = 1.0,
    k_candidates: int = 1280,
    batch: int = 4096,
    n_eval_negative: int = N_EVAL_NEGATIVE,
    return_planted: bool = False,
):
    """Build the biokg-like fixture dataset (see module docstring).

    :param scale: shrink factor for entity-type sizes and split sizes
        (tests use e.g. ``0.01``; quality runs use ``1.0``).
    :param k_candidates: per-triple candidate-set size for the planted
        argmax; controls the oracle MRR ceiling (:func:`oracle_mrr`).
    :param batch: triples scored per device dispatch during generation.
    :param return_planted: also return the :class:`PlantedRotatE` generator
        (for oracle-MRR measurement).
    """
    import jax.numpy as jnp

    emb = 64
    rng = np.random.default_rng(seed)
    counts = {
        k: max(int(round(v * scale)), n_eval_negative + 2 if scale < 1 else v)
        for k, v in BIOKG_TYPE_COUNTS.items()
    }
    type_offsets: Dict[str, int] = {}
    off = 0
    for k in sorted(counts):
        type_offsets[k] = off
        off += counts[k]
    n_entity = off
    spec = _relation_spec()
    n_relation = len(spec)

    planted = PlantedRotatE(
        entity=rng.uniform(-1.0, 1.0, size=(n_entity, 2 * emb)).astype(np.float32),
        phase=rng.uniform(0.0, 2 * np.pi, size=(n_relation, emb)).astype(np.float32),
    )
    e_dev = jnp.asarray(planted.entity)
    p_dev = jnp.asarray(planted.phase)

    split_sizes = [max(int(round(s * scale)), 64) for s in BIOKG_SPLIT_SIZES]
    rel_frac = np.array([w for _, _, w in spec])
    rel_frac = rel_frac / rel_frac.sum()

    # Per-relation head/tail type bounds, indexable by relation ID.
    h_lo = np.array([type_offsets[h] for h, _, _ in spec], np.int64)
    h_n = np.array([counts[h] for h, _, _ in spec], np.int64)
    t_lo = np.array([type_offsets[t] for _, t, _ in spec], np.int64)
    t_n = np.array([counts[t] for _, t, _ in spec], np.int64)

    triples: Dict[str, NDArray[np.int32]] = {}
    neg_heads: Dict[str, NDArray[np.int32]] = {}
    neg_tails: Dict[str, NDArray[np.int32]] = {}
    for part, n_part in zip(("train", "valid", "test"), split_sizes):
        r_all = rng.choice(n_relation, size=n_part, p=rel_frac).astype(np.int32)
        h_all = (
            h_lo[r_all] + rng.integers(0, h_n[r_all], endpoint=False)
        ).astype(np.int32)
        t_all = np.empty(n_part, np.int32)
        t_lo_dev = jnp.asarray(t_lo, jnp.int32)
        t_n_dev = jnp.asarray(t_n, jnp.int32)
        key = _jax_key(seed, part)
        for i in range(0, n_part, batch):
            s = slice(i, min(i + batch, n_part))
            # Candidates are drawn on device (uniform type-matched, with
            # replacement): a full-split candidate matrix would be tens of
            # GB of host RAM / host→device traffic at scale 1. Last batch
            # is padded to `batch` so the picker compiles exactly once.
            hh = h_all[s]
            pad = batch - hh.size
            key, sub = _split_key(key)
            picked = _argmax_tails(
                e_dev, p_dev,
                jnp.asarray(np.pad(hh, (0, pad), mode="edge")),
                jnp.asarray(np.pad(r_all[s], (0, pad), mode="edge")),
                t_lo_dev, t_n_dev, sub, k_candidates,
            )
            t_all[s] = picked[: hh.size]
        triples[part] = np.stack([h_all, r_all, t_all], axis=1)
        if part == "train":
            continue
        # Official-style negatives: uniform type-matched, true entity
        # rejected (the real protocol's negatives are guaranteed false).
        nh = np.empty((n_part, n_eval_negative), np.int32)
        nt = np.empty((n_part, n_eval_negative), np.int32)
        for rid, (h_ty, t_ty, _) in enumerate(spec):
            m = r_all == rid
            nm = int(m.sum())
            if not nm:
                continue
            for buf, ty, true in (
                (nh, h_ty, h_all[m]),
                (nt, t_ty, t_all[m]),
            ):
                lo, n_ty = type_offsets[ty], counts[ty]
                draw = lo + rng.integers(
                    n_ty - 1, size=(nm, n_eval_negative)
                ).astype(np.int32)
                # Collision-free trick: remap draws >= true up by one.
                draw += (draw >= true[:, None]).astype(np.int32)
                buf[m] = draw
        neg_heads[part], neg_tails[part] = nh, nt

    ds = KGDataset(
        n_entity=n_entity,
        n_relation_type=n_relation,
        entity_dict=None,
        relation_dict=[f"{h}-{t}-{i}" for i, (h, t, _) in enumerate(spec)],
        type_offsets=type_offsets,
        triples=triples,
        original_triple_ids={
            p: np.arange(len(v), dtype=np.int64) for p, v in triples.items()
        },
        neg_heads=neg_heads,
        neg_tails=neg_tails,
    )
    return (ds, planted) if return_planted else ds
