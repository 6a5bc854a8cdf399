"""Constraint-count regression against the golden file
(internal/stats latest.stats CI-check analog)."""

import json
import pathlib

from gnark_tpu import stats
from gnark_tpu.curves import ALL_CURVES

GOLDEN = pathlib.Path(__file__).parent / "stats_golden.json"


def test_snippet_counts_match_golden():
    golden = json.loads(GOLDEN.read_text())
    current = stats.all_stats(list(ALL_CURVES.values()))
    assert current == golden, (
        "constraint counts changed — if intentional, regenerate with "
        "`python -m gnark_tpu.stats > tests/stats_golden.json`")
