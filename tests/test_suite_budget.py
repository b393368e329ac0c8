"""Slow-tier cost budget (VERDICT r4 weak 4).

The cold full suite measured 1 h 20 m on a 2-core host in round 4, with
the numpy-oracle parity fixtures (SHOT/SC3D loops, SAC-IA hypothesis
sweeps) and the 2-process jax.distributed spawns dominating. This module
RECORDS that budget and fails when it silently grows: new slow work must
either fit the recorded ceilings or consciously raise them here (with the
measured cost in the commit message) — the suite must never drift into
"nobody will ever run all of it" without a paper trail.
"""

import pathlib
import re

TESTS = pathlib.Path(__file__).parent

#: ceilings (raise deliberately, never implicitly)
MAX_SLOW_TESTS = 35  # r5: 29 test functions live in slow-marked modules
MAX_PROCESS_SPAWN_FILES = 2  # test_distributed_node, test_multihost
#: largest padded capacity any literal `max_points=<digits>` may request
#: in a test (the numpy-oracle loops are O(points * neighbors) per
#: keypoint; 16384 is the measured-tolerable ceiling). Symbolic sizes
#: (e.g. STAGED_THRESHOLD capacities, which are padding-only) are exempt.
MAX_LITERAL_MAX_POINTS = 16384
#: largest literal hypothesis sweep in a test
MAX_LITERAL_HYPOTHESES = 4096


def _test_sources():
    for path in sorted(TESTS.glob("test_*.py")):
        if path.name == "test_suite_budget.py":
            continue
        yield path, path.read_text()


def test_slow_test_count_within_budget():
    n_slow = 0
    for path, text in _test_sources():
        if "pytestmark = pytest.mark.slow" in text:
            n_slow += len(re.findall(r"\n    def test_", text)) + len(
                re.findall(r"\ndef test_", text)
            )
        else:
            # count individually-marked slow tests
            n_slow += text.count("@pytest.mark.slow")
    assert n_slow <= MAX_SLOW_TESTS, (
        f"{n_slow} slow-tier tests exceed the recorded budget "
        f"({MAX_SLOW_TESTS}); the cold suite already costs >1h on a small "
        "host — trim, de-mark, or raise the ceiling here with a measured "
        "cost in the commit message"
    )


def test_process_spawn_files_within_budget():
    spawners = [
        path.name
        for path, text in _test_sources()
        if "multiprocessing" in text or "subprocess" in text
    ]
    assert len(spawners) <= MAX_PROCESS_SPAWN_FILES, (
        f"process-spawning test files {spawners} exceed the budget "
        f"({MAX_PROCESS_SPAWN_FILES}); each spawn pays a fresh jax import "
        "+ compile on every run"
    )


def test_fixture_size_literals_within_budget():
    for path, text in _test_sources():
        for m in re.finditer(r"max_points=(\d+)", text):
            assert int(m.group(1)) <= MAX_LITERAL_MAX_POINTS, (
                f"{path.name}: max_points={m.group(1)} exceeds the "
                f"slow-tier fixture ceiling {MAX_LITERAL_MAX_POINTS}"
            )
        for m in re.finditer(
            r"(?:ransac_hypotheses|sacia_hypotheses)=(\d+)", text
        ):
            assert int(m.group(1)) <= MAX_LITERAL_HYPOTHESES, (
                f"{path.name}: hypothesis sweep {m.group(1)} exceeds the "
                f"slow-tier ceiling {MAX_LITERAL_HYPOTHESES}"
            )
