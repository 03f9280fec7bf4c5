"""The similarity-search example is tested like the pipeline example:
the recall/cost dial must actually be a dial (probing more IVF lists
strictly improves recall on this data), recalls are valid fractions,
and a second run reproduces every number (hash-anchored hyperplanes
and deterministic codebook sampling — no RNG at query time)."""

from __future__ import annotations

import importlib.util
import os

from .conftest import SF_DIR

_EX = os.path.join(
    os.path.dirname(__file__), "..", "examples", "similarity_search.py"
)


def _load():
    spec = importlib.util.spec_from_file_location("similarity_example", _EX)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_similarity_search_recall_dial(spark):
    mod = _load()
    r = mod.run_search(spark, SF_DIR)
    assert r["queries"] > 0 and r["corpus_vectors"] > 0
    lo = r["recall_ivf_nprobe2@k"]
    hi = r["recall_ivf_nprobe8@k"]
    lsh = r["recall_lsh_8buckets@k"]
    for v in (lo, hi, lsh):
        assert 0.0 <= v <= 1.0
    assert hi > lo, "probing 4x more IVF lists must raise recall"
    assert hi >= 0.5, "nprobe=8/16 should recover most exact neighbors"
    assert mod.run_search(spark, SF_DIR) == r  # deterministic replay
