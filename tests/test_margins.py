"""Cross-engine decision-boundary margins, asserted in CI.

The hash-checked approximate queries rely on every threshold / rounding
/ argmin decision sitting far from its boundary relative to the
engines' float-evaluation differences (tools/measure_margins.py has the
full rationale). Running the measurement as a test means a regenerated
testdata drop that lands a value near a boundary fails loudly here
instead of as a rare driver hash flake. numpy-only — no Spark session.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_margins import measure  # noqa: E402


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_all_margins_clear_their_noise_floors(sf_dir):
    results = measure(sf_dir)
    assert results, "measurement produced no margins"
    thin = [
        f"{name}: margin={margin:.3e} floor={floor:.0e}"
        for name, margin, floor, ok in results
        if not ok
    ]
    assert not thin, "margins within 10x of the noise floor:\n" + "\n".join(thin)
