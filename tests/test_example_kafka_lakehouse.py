"""The Kafka->lakehouse->CDC example run as a test: every invariant
the example asserts internally (exactly-once ingest count, cdc refresh
mode, audit trail = 2 images per corrected row, view == from-scratch
truth over the same Kafka bytes) must hold under the suite session."""

from __future__ import annotations

import importlib.util
import os

from .conftest import SF_DIR

_EX = os.path.join(
    os.path.dirname(__file__), "..", "examples", "kafka_lakehouse_cdc.py"
)


def _load():
    spec = importlib.util.spec_from_file_location("kafka_lakehouse", _EX)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_kafka_lakehouse_cdc_end_to_end(spark, tmp_path):
    mod = _load()
    r = mod.run_pipeline(spark, SF_DIR, str(tmp_path / "work"))
    assert r["view_matches_from_scratch"] is True
    assert r["refresh_mode_after_merge"] == "cdc"
    assert r["ingested_exactly_once"] == r["produced"] > 0
    assert r["corrected_rows"] > 0
    assert r["audit"] == {
        "update_preimage": r["corrected_rows"],
        "update_postimage": r["corrected_rows"],
    }
