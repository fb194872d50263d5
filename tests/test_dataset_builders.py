"""Mocked-source tests for the four dataset builders.

The builders' download paths are network-gated, but all of their conversion
logic (per-type local ID → global ID via type offsets, official-negative
pickup, label mapping, type-contiguous reassignment) runs on whatever the
source API / files return — so we fake the OGB API in ``sys.modules`` and
write tiny on-disk fixtures for the file-based builders, then check the
conversions against hand-computed answers. Covers the logic of reference
``besskge/dataset.py:241-460`` with no network.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from besskge_tpu.dataset import KGDataset

# ---------------------------------------------------------------------------
# ogbl-biokg: per-type local IDs + type offsets + official negatives
# ---------------------------------------------------------------------------

# insertion order fixes the type→offset assignment: disease 0, drug 4, prot 7
_BIOKG_COUNTS = {"disease": 4, "drug": 3, "protein": 5}


class _FakeBioKG:
    def __init__(self, name, root):
        assert name == "ogbl-biokg"

    def __getitem__(self, i):
        assert i == 0
        return {
            "edge_reltype": {"treats": None, "binds": None},
            "num_nodes_dict": dict(_BIOKG_COUNTS),
        }

    def get_edge_split(self):
        train = {
            "head_type": np.array(["drug", "disease", "protein"]),
            "head": np.array([2, 1, 0]),
            "relation": np.array([0, 1, 0]),
            "tail_type": np.array(["protein", "drug", "disease"]),
            "tail": np.array([4, 0, 3]),
        }
        valid = {
            "head_type": np.array(["drug", "drug"]),
            "head": np.array([0, 1]),
            "relation": np.array([1, 0]),
            "tail_type": np.array(["protein", "disease"]),
            "tail": np.array([2, 1]),
            "head_neg": np.array([[1, 2], [0, 2]]),
            "tail_neg": np.array([[0, 1], [2, 3]]),
        }
        test = {
            "head_type": np.array(["protein"]),
            "head": np.array([3]),
            "relation": np.array([1]),
            "tail_type": np.array(["drug"]),
            "tail": np.array([2]),
            "head_neg": np.array([[0, 4]]),
            "tail_neg": np.array([[1, 0]]),
        }
        return {"train": train, "valid": valid, "test": test}


def _write_biokg_mappings(root: Path) -> None:
    mdir = root / "ogbl_biokg/mapping"
    mdir.mkdir(parents=True)
    for k, n in _BIOKG_COUNTS.items():
        pd.DataFrame(
            {"ent idx": np.arange(n), "ent name": [f"{k}_{i}" for i in range(n)]}
        ).to_csv(mdir / f"{k}_entidx2name.csv.gz", index=False, compression="gzip")
    pd.DataFrame(
        {"rel idx": [0, 1], "rel name": ["treats", "binds"]}
    ).to_csv(mdir / "relidx2relname.csv.gz", index=False, compression="gzip")


def _install_fake_ogb(monkeypatch, dataset_cls):
    import sys
    import types

    linkproppred = types.ModuleType("ogb.linkproppred")
    linkproppred.LinkPropPredDataset = dataset_cls
    ogb = types.ModuleType("ogb")
    ogb.linkproppred = linkproppred
    monkeypatch.setitem(sys.modules, "ogb", ogb)
    monkeypatch.setitem(sys.modules, "ogb.linkproppred", linkproppred)


def test_build_ogbl_biokg_conversion(tmp_path, monkeypatch):
    _install_fake_ogb(monkeypatch, _FakeBioKG)
    _write_biokg_mappings(tmp_path)
    ds = KGDataset.build_ogbl_biokg(tmp_path)

    assert ds.n_entity == 12
    assert ds.n_relation_type == 2
    assert ds.type_offsets == {"disease": 0, "drug": 4, "protein": 7}

    # hand-converted global IDs: disease +0, drug +4, protein +7
    np.testing.assert_array_equal(
        ds.triples["train"],
        np.array([[6, 0, 11], [1, 1, 4], [7, 0, 3]]),
    )
    np.testing.assert_array_equal(
        ds.triples["valid"], np.array([[4, 1, 9], [5, 0, 1]])
    )
    np.testing.assert_array_equal(ds.triples["test"], np.array([[10, 1, 6]]))

    # official negatives offset by the POSITIVE's head/tail type
    np.testing.assert_array_equal(
        ds.neg_heads["valid"], np.array([[5, 6], [4, 6]])
    )
    np.testing.assert_array_equal(
        ds.neg_tails["valid"], np.array([[7, 8], [2, 3]])
    )
    np.testing.assert_array_equal(ds.neg_heads["test"], np.array([[7, 11]]))
    np.testing.assert_array_equal(ds.neg_tails["test"], np.array([[5, 4]]))

    # entity labels follow the type-major global ID order
    assert ds.entity_dict[0] == "disease_0"
    assert ds.entity_dict[4] == "drug_0"
    assert ds.entity_dict[7] == "protein_0"
    assert ds.relation_dict == ["treats", "binds"]

    # ht_types digitizes global IDs back to type indices
    np.testing.assert_array_equal(
        ds.ht_types["train"], np.array([[1, 2], [0, 1], [2, 0]])
    )


# ---------------------------------------------------------------------------
# ogbl-wikikg2: untyped global IDs, official negatives pass through
# ---------------------------------------------------------------------------


class _FakeWikiKG2:
    graph = {"num_nodes": 9}

    def __init__(self, name, root):
        assert name == "ogbl-wikikg2"

    def get_edge_split(self):
        return {
            "train": {
                "head": np.array([0, 3, 8]),
                "relation": np.array([0, 2, 1]),
                "tail": np.array([5, 1, 2]),
            },
            "valid": {
                "head": np.array([4]),
                "relation": np.array([1]),
                "tail": np.array([7]),
                "head_neg": np.array([[0, 8, 2]]),
                "tail_neg": np.array([[3, 5, 6]]),
            },
            "test": {
                "head": np.array([6]),
                "relation": np.array([0]),
                "tail": np.array([0]),
                "head_neg": np.array([[1, 2, 3]]),
                "tail_neg": np.array([[4, 5, 8]]),
            },
        }


def test_build_ogbl_wikikg2_conversion(tmp_path, monkeypatch):
    _install_fake_ogb(monkeypatch, _FakeWikiKG2)
    mdir = tmp_path / "ogbl_wikikg2/mapping"
    mdir.mkdir(parents=True)
    pd.DataFrame(
        {"node idx": np.arange(9), "entity id": [f"Q{i}" for i in range(9)]}
    ).to_csv(mdir / "nodeidx2entityid.csv.gz", index=False, compression="gzip")
    pd.DataFrame(
        {"reltype": np.arange(3), "rel id": [f"P{i}" for i in range(3)]}
    ).to_csv(mdir / "reltype2relid.csv.gz", index=False, compression="gzip")

    ds = KGDataset.build_ogbl_wikikg2(tmp_path)
    assert ds.n_entity == 9
    assert ds.n_relation_type == 3
    assert ds.type_offsets is None and ds.ht_types is None
    np.testing.assert_array_equal(
        ds.triples["train"], np.array([[0, 0, 5], [3, 2, 1], [8, 1, 2]])
    )
    # negatives are already global: passed through untouched
    np.testing.assert_array_equal(ds.neg_heads["valid"], np.array([[0, 8, 2]]))
    np.testing.assert_array_equal(ds.neg_tails["test"], np.array([[4, 5, 8]]))
    assert ds.entity_dict[8] == "Q8"
    assert ds.relation_dict == ["P0", "P1", "P2"]


# ---------------------------------------------------------------------------
# YAGO3-10: label TSVs on disk → contiguous IDs, fixed split
# ---------------------------------------------------------------------------


def test_build_yago310_from_local_files(tmp_path):
    rows = {
        "train": [("alice", "knows", "bob"), ("bob", "likes", "carol"),
                  ("carol", "knows", "alice")],
        "valid": [("alice", "likes", "carol")],
        "test": [("dave", "knows", "bob")],
    }
    for part, rs in rows.items():
        (tmp_path / f"{part}.txt").write_text(
            "\n".join("\t".join(r) for r in rs) + "\n"
        )
    ds = KGDataset.build_yago310(tmp_path)
    assert ds.n_entity == 4 and ds.n_relation_type == 2
    assert set(ds.triples) == {"train", "valid", "test"}
    # every triple decodes back to its source labels through the dicts
    for part, rs in rows.items():
        for (h, r, t), (hl, rl, tl) in zip(ds.triples[part], rs):
            assert ds.entity_dict[h] == hl
            assert ds.relation_dict[r] == rl
            assert ds.entity_dict[t] == tl


# ---------------------------------------------------------------------------
# OpenBioLink-HQ: typed labels → type-contiguous global IDs
# ---------------------------------------------------------------------------


def test_build_openbiolink_type_contiguous(tmp_path):
    base = tmp_path / "HQ_DIR/train_test_data"
    base.mkdir(parents=True)
    parts = {
        "train_sample.csv": [
            ("d1", "TREATS", "g1"), ("d2", "TREATS", "g2"),
            ("g1", "REG", "g2"),
        ],
        "val_sample.csv": [("d1", "TREATS", "g2")],
        "test_sample.csv": [("d2", "REG", "g1")],
    }
    for fname, rs in parts.items():
        (base / fname).write_text(
            "\n".join("\t".join((h, r, t, "HQ", "TP", "src")) for h, r, t in rs)
            + "\n"
        )
    (base / "train_val_nodes.csv").write_text(
        "d1\tdrug\nd2\tdrug\ng1\tgene\ng2\tgene\n"
    )
    ds = KGDataset.build_openbiolink(tmp_path)
    assert ds.n_entity == 4 and ds.n_relation_type == 2
    assert ds.type_offsets == {"drug": 0, "gene": 2}
    # type-contiguity: drugs own IDs [0, 2), genes [2, 4)
    drug_ids = {ds.entity_dict.index(lbl) for lbl in ("d1", "d2")}
    gene_ids = {ds.entity_dict.index(lbl) for lbl in ("g1", "g2")}
    assert drug_ids == {0, 1} and gene_ids == {2, 3}
    # ht_types agrees with the per-entity types
    tri, types_ = ds.triples["train"], ds.ht_types["train"]
    for (h, _, t), (ht, tt) in zip(tri, types_):
        assert ht == (0 if h in drug_ids else 1)
        assert tt == (0 if t in drug_ids else 1)
    # splits preserved verbatim (fixed split, no reshuffle)
    assert ds.triples["valid"].shape == (1, 3)
    assert ds.triples["test"].shape == (1, 3)
    h, r, t = ds.triples["valid"][0]
    assert ds.entity_dict[h] == "d1" and ds.entity_dict[t] == "g2"
    assert ds.relation_dict[r] == "TREATS"


def test_save_load_roundtrip_with_negatives(tmp_path):
    _ = pytest.importorskip("numpy")
    ds = KGDataset(
        n_entity=5,
        n_relation_type=2,
        triples={"train": np.array([[0, 1, 2]], np.int32)},
        original_triple_ids={"train": np.arange(1)},
        neg_heads={"train": np.array([[3, 4]], np.int32)},
        neg_tails={"train": np.array([[1, 2]], np.int32)},
        type_offsets={"a": 0, "b": 3},
    )
    p = tmp_path / "ds.pkl"
    ds.save(p)
    back = KGDataset.load(p)
    assert back.n_entity == ds.n_entity
    np.testing.assert_array_equal(back.triples["train"], ds.triples["train"])
    np.testing.assert_array_equal(
        back.neg_heads["train"], ds.neg_heads["train"]
    )
    assert back.type_offsets == ds.type_offsets
