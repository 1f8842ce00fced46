"""The training-data pipeline demo must keep running end-to-end: every
stage strictly monotone (a filter never adds rows), nothing empties."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)


def test_demo_funnel_monotone_and_nonempty(spark):
    from training_data_pipeline_demo import main

    funnel = main("/root/testdata/sf0.001")
    order = [
        "ingested",
        "quality_pass",
        "exact_deduped",
        "near_deduped",
        "decontaminated",
        "mixed",
    ]
    vals = [funnel[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] > 0
    assert funnel["ingested"] == 500
    assert funnel["bins"] > 0
