"""The ANN decade study's fixtures (tools/ann_decade.py) — SCALE.md's
r15 recall/cost table claims the study regenerates deterministically
from one command. Pin the two properties that claim leans on: the
generator is seed-deterministic, and it actually plants the documented
geometry (tight ~0.92-cosine neighborhoods, near-orthogonal across
blobs, ids shuffled so blob membership never correlates with id order)."""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile

import numpy as np
import pytest


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="annfix_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _load_tool():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ann_decade_tool", os.path.join(root, "tools", "ann_decade.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ann_decade_tool"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic_and_plants_the_documented_geometry(tmpdir):
    import pyarrow.parquet as pq

    tool = _load_tool()
    a, b = f"{tmpdir}/a.parquet", f"{tmpdir}/b.parquet"
    tool.generate(a, 500, seed=7)
    tool.generate(b, 500, seed=7)

    ta, tb = pq.read_table(a), pq.read_table(b)
    assert ta.equals(tb)  # same seed -> byte-identical fixture

    vecs = np.array([np.asarray(v) for v in ta["embedding"].to_pylist()])
    labels = np.array(ta["label"].to_pylist())
    ids = np.array(ta["vec_id"].to_pylist())
    assert vecs.shape == (500, tool.DIM)
    assert len(set(labels)) == 500 // tool.BLOB
    assert list(ids) == list(range(500))

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(500, dtype=bool)
    intra = sims[same & off_diag]
    inter = sims[~same]
    # the documented planted geometry: intra-blob cosine ~1/(1+0.09),
    # inter-blob ~0 (random 64-dim centers)
    assert intra.mean() > 0.85 and intra.min() > 0.6
    assert abs(inter.mean()) < 0.05 and np.abs(inter).max() < 0.6

    # ids are shuffled relative to blob membership: the sampled trainer
    # reads an id-ordered prefix, which must span many blobs, not one
    prefix_blobs = len(set(labels[np.argsort(ids)][: tool.BLOB]))
    assert prefix_blobs > 3

    # a different seed is a different corpus
    c = f"{tmpdir}/c.parquet"
    tool.generate(c, 500, seed=8)
    assert not pq.read_table(c).equals(ta)
