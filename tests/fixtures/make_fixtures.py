"""Generate tiny real-format dataset fixtures for loader tests.

Produces byte-for-byte the on-disk formats the reference consumes:

- ``zinc_split/``: per-split molecule-dict pickles + ``.index`` subset files
  (reference: GraphPrediction/data/molecules.py:23-53 — dicts with
  num_atom / atom_type (torch LongTensor) / bond_type (torch NxN
  LongTensor) / logP_SA_cycle_normalized (torch scalar)).
- ``zinc_pkl/ZINC.pkl``: the bundled tuple format
  (train, val, test, num_atom_type, num_bond_type) where each split is a
  ``data.molecules.MoleculeDGL`` instance whose ``graph_lists`` holds
  DGLGraph objects (reference: molecules.py:279-298).  We fabricate those
  classes in fake ``data.molecules`` / ``dgl`` modules at dump time so the
  pickle references the exact same import paths; the loader must unpickle
  it WITHOUT dgl installed.
- ``alchemy_tu/``: TUDataset text files + ``*_al_10.index`` split files
  (reference: Alchemy/main_alchemy.py:50-82).

Run ``python tests/fixtures/make_fixtures.py`` to (re)generate in place.
"""
from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))


def _random_molecule(rng, n):
    atom = torch.from_numpy(rng.integers(0, 28, size=n)).long()
    bond = np.zeros((n, n), np.int64)
    for i in range(1, n):
        j = int(rng.integers(0, i))
        c = int(rng.integers(1, 4))
        bond[i, j] = bond[j, i] = c
    return {
        "num_atom": n,
        "atom_type": atom,
        "bond_type": torch.from_numpy(bond),
        "logP_SA_cycle_normalized": torch.tensor(
            float(rng.normal()), dtype=torch.float64),
    }


def make_zinc_split(root, rng, n_total=6, n_subset=4):
    os.makedirs(root, exist_ok=True)
    for si, split in enumerate(("train", "val", "test")):
        mols = [_random_molecule(rng, int(rng.integers(5, 12)))
                for _ in range(n_total)]
        with open(os.path.join(root, f"{split}.pickle"), "wb") as f:
            pickle.dump(mols, f)
        idx = rng.choice(n_total, size=n_subset, replace=False)
        with open(os.path.join(root, f"{split}.index"), "w") as f:
            f.write(",".join(str(int(i)) for i in idx))


def make_zinc_pkl(root, rng, n_per_split=3):
    os.makedirs(root, exist_ok=True)
    # fabricate the reference's import paths so the pickle refers to
    # 'data.molecules.MoleculeDGL' and 'dgl.DGLGraph' exactly as the real
    # ZINC.pkl does
    fake_dgl = types.ModuleType("dgl")

    class DGLGraph:  # pragma: no cover - structure only, never executed
        pass

    DGLGraph.__module__ = "dgl"
    DGLGraph.__qualname__ = "DGLGraph"
    fake_dgl.DGLGraph = DGLGraph

    fake_data = types.ModuleType("data")
    fake_mols = types.ModuleType("data.molecules")

    class MoleculeDGL:
        pass

    MoleculeDGL.__module__ = "data.molecules"
    MoleculeDGL.__qualname__ = "MoleculeDGL"
    fake_mols.MoleculeDGL = MoleculeDGL
    fake_data.molecules = fake_mols

    saved = {k: sys.modules.get(k) for k in ("dgl", "data", "data.molecules")}
    sys.modules["dgl"] = fake_dgl
    sys.modules["data"] = fake_data
    sys.modules["data.molecules"] = fake_mols
    try:
        splits = []
        for split in ("train", "val", "test"):
            ds = MoleculeDGL()
            ds.data_dir = "./data/molecules"
            ds.split = split
            ds.num_graphs = n_per_split
            ds.data = [_random_molecule(rng, int(rng.integers(5, 12)))
                       for _ in range(n_per_split)]
            gl = []
            for m in ds.data:
                g = DGLGraph()
                g.ndata = {"feat": m["atom_type"]}
                gl.append(g)
            ds.graph_lists = gl
            ds.graph_labels = [m["logP_SA_cycle_normalized"]
                               for m in ds.data]
            ds.n_samples = n_per_split
            splits.append(ds)
        payload = [splits[0], splits[1], splits[2], 28, 4]
        with open(os.path.join(root, "ZINC.pkl"), "wb") as f:
            pickle.dump(payload, f)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def make_alchemy_tu(root, rng, n_graphs=8, n_train=4, n_val=2, n_test=2):
    name = "alchemy_full"
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    a_rows, gid_rows, nl_rows, el_rows, y_rows = [], [], [], [], []
    offset = 0
    for g in range(n_graphs):
        n = int(rng.integers(4, 9))
        for i in range(n):
            gid_rows.append(g + 1)
            nl_rows.append(int(rng.integers(0, 6)))
        for i in range(1, n):
            j = int(rng.integers(0, i))
            c = int(rng.integers(0, 4))
            # TU format is 1-based, directed pairs both ways
            a_rows.append((offset + i + 1, offset + j + 1))
            el_rows.append(c)
            a_rows.append((offset + j + 1, offset + i + 1))
            el_rows.append(c)
        y_rows.append(rng.normal(size=12))
        offset += n
    pre = os.path.join(d, name)
    with open(pre + "_A.txt", "w") as f:
        f.writelines(f"{a}, {b}\n" for a, b in a_rows)
    with open(pre + "_graph_indicator.txt", "w") as f:
        f.writelines(f"{g}\n" for g in gid_rows)
    with open(pre + "_node_labels.txt", "w") as f:
        f.writelines(f"{v}\n" for v in nl_rows)
    with open(pre + "_edge_labels.txt", "w") as f:
        f.writelines(f"{v}\n" for v in el_rows)
    with open(pre + "_graph_attributes.txt", "w") as f:
        f.writelines(", ".join(f"{v:.6f}" for v in row) + "\n"
                     for row in y_rows)
    perm = rng.permutation(n_graphs)
    cuts = {"train": perm[:n_train], "val": perm[n_train:n_train + n_val],
            "test": perm[n_train + n_val:]}
    for split, idx in cuts.items():
        with open(os.path.join(root, f"{split}_al_10.index"), "w") as f:
            f.write(",".join(str(int(i)) for i in idx))


def main():
    rng = np.random.default_rng(42)
    make_zinc_split(os.path.join(HERE, "zinc_split"), rng)
    make_zinc_pkl(os.path.join(HERE, "zinc_pkl"), rng)
    make_alchemy_tu(os.path.join(HERE, "alchemy_tu"), rng)
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
