"""Tests for KGDataset construction, typing, and persistence."""

import numpy as np
import pandas as pd
import pytest

from besskge_tpu.dataset import KGDataset


def _raw(n=300, ents=40, rels=5, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            rng.integers(ents, size=n),
            rng.integers(rels, size=n),
            rng.integers(ents, size=n),
        ],
        1,
    ).astype(np.int32)


def test_from_triples_split_partition():
    data = _raw()
    ds = KGDataset.from_triples(data, split=(0.6, 0.2, 0.2), seed=3)
    sizes = {k: v.shape[0] for k, v in ds.triples.items()}
    assert sum(sizes.values()) == data.shape[0]
    assert sizes["train"] == int(0.6 * data.shape[0])
    # Original ids map each part's triples back to the input rows.
    for part, trip in ds.triples.items():
        np.testing.assert_array_equal(data[ds.original_triple_ids[part]], trip)
    # Parts are disjoint.
    all_ids = np.concatenate(list(ds.original_triple_ids.values()))
    assert len(np.unique(all_ids)) == data.shape[0]


def test_from_dataframe_single_with_types():
    rng = np.random.default_rng(1)
    ents = [f"e{i}" for i in range(30)]
    types = {e: ("drug" if i < 12 else "protein") for i, e in enumerate(ents)}
    rows = {
        "h": rng.choice(ents, 200),
        "r": rng.choice(["binds", "treats"], 200),
        "t": rng.choice(ents, 200),
    }
    df = pd.DataFrame(rows)
    ds = KGDataset.from_dataframe(
        df, "h", "r", "t", entity_types=types, split=(0.8, 0.1, 0.1)
    )
    assert ds.n_entity == 30 and ds.n_relation_type == 2
    # Type-contiguous IDs: all drugs before all proteins.
    assert set(ds.type_offsets) == {"drug", "protein"}
    cut = ds.type_offsets["protein"]
    assert cut == 12
    for eid, label in enumerate(ds.entity_dict):
        assert (types[label] == "drug") == (eid < cut)
    # ht_types derives per-triple types from the offsets.
    ht = ds.ht_types
    for part, trip in ds.triples.items():
        expected_h = (trip[:, 0] >= cut).astype(np.int32)
        np.testing.assert_array_equal(ht[part][:, 0], expected_h)


def test_from_dataframe_fixed_split():
    rng = np.random.default_rng(2)
    ents = [f"n{i}" for i in range(20)]
    mk = lambda n: pd.DataFrame(
        {
            "h": rng.choice(ents, n),
            "r": rng.choice(["a", "b", "c"], n),
            "t": rng.choice(ents, n),
        }
    )
    parts = {"train": mk(100), "valid": mk(20), "test": mk(10)}
    ds = KGDataset.from_dataframe(parts, "h", "r", "t")
    assert {k: v.shape[0] for k, v in ds.triples.items()} == {
        "train": 100, "valid": 20, "test": 10,
    }
    # Label round trip.
    trip = ds.triples["valid"][0]
    assert ds.entity_dict[trip[0]] == parts["valid"]["h"].iloc[0]
    assert ds.relation_dict[trip[1]] == parts["valid"]["r"].iloc[0]


def test_save_load_roundtrip(tmp_path):
    ds = KGDataset.from_triples(_raw(), seed=5)
    f = tmp_path / "ds.pkl"
    ds.save(f)
    ds2 = KGDataset.load(f)
    assert ds2.n_entity == ds.n_entity
    assert ds2.n_relation_type == ds.n_relation_type
    for part in ds.triples:
        np.testing.assert_array_equal(ds2.triples[part], ds.triples[part])


def test_ht_types_none_without_offsets():
    ds = KGDataset.from_triples(_raw())
    assert ds.ht_types is None or ds.ht_types == {}
