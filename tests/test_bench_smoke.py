"""Smoke-build every driver bench config (round-4 VERDICT #1).

``bench.py`` is driver-executed, load-bearing code: BENCH_r04 shipped with a
setup crash (`interleave = True` on packed tables) that no test could have
caught because nothing imported bench.py. This suite runs the REAL
``run_one`` path for every config name the driver iterates over, at
``BENCH_SMOKE=1`` toy shapes on CPU — same setup functions, same step
builders, same JSON-line assembly — so a config that cannot even build or
take one step fails CI, not the driver.

The ``overlap`` config is exercised for its no-crash contract only (it
shells out to an AOT TPU-topology compile that is environment-dependent and
falls back to a ``blocked`` line; its real evidence is captured by the
driver run — BENCH_r04).
"""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["BENCH_SMOKE"] = "1"
import bench  # noqa: E402

if not bench._SMOKE:  # an earlier import won the race — reload with the flag
    bench = importlib.reload(bench)

# Every name main() iterates over, minus "overlap" (separate no-crash test).
SMOKE_NAMES = [
    "census",
    "biokg",
    "wikikg2",
    "wikikg2_bf16",
    "wikikg2_fp16",
    "valid",
    "allscores",
    "topk_yago",
]


def test_smoke_covers_all_driver_configs():
    """If main() grows a config, this suite must grow with it."""
    import ast
    import inspect

    src = inspect.getsource(bench.main)
    names = [
        n.value
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.List)
        for n in node.elts
        if isinstance(n, ast.Constant) and isinstance(n.value, str)
    ]
    assert set(names) == set(SMOKE_NAMES) | {"overlap"}


@pytest.mark.parametrize("name", SMOKE_NAMES)
def test_bench_config_builds_and_steps(name):
    line = bench.run_one(name)
    assert line["metric"]
    assert line.get("value") is not None
    assert "vs_baseline" in line
    # Derived utilizations must be self-consistent (round-4 VERDICT #7:
    # hbm_bw_pct exceeded 100 under the discredited logical-bytes model).
    pct = line.get("hbm_bw_pct")
    assert pct is None or 0.0 <= pct <= 100.0, line


def test_bench_overlap_does_not_crash():
    line = bench.run_overlap()
    assert line["metric"] == "bess_collective_overlap"
