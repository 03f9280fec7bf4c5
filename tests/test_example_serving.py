"""The streaming-serving example is tested like the other two: the
view must converge to the cold batch aggregation, and re-running the
whole job over the SAME work dir must change nothing — the composed
exactly-once contracts (checkpoint + batch_id commit idempotence +
src_version refresh guard) make replay a no-op at every layer."""

from __future__ import annotations

import importlib.util
import os

from .conftest import SF_DIR

_EX = os.path.join(
    os.path.dirname(__file__), "..", "examples", "streaming_serving.py"
)


def _load():
    spec = importlib.util.spec_from_file_location("serving_example", _EX)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_streaming_serving_converges_and_replay_noops(spark, tmp_path):
    mod = _load()
    work = str(tmp_path / "serve")
    r1 = mod.run_serving(spark, SF_DIR, work)
    assert r1["converged_to_batch_truth"] is True
    assert r1["event_types_served"] == 5
    assert r1["revenue_cents_total"] > 0
    # full replay over the same work dir: stream restarts from its
    # checkpoint (nothing new), commits no-op on batch_id, refresh
    # no-ops on src_version — identical serving numbers, no extra
    # refresh commits
    r2 = mod.run_serving(spark, SF_DIR, work)
    assert r2 == r1
