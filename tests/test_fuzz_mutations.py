"""Pinned concurrent-mutation differential fuzz schedules (r12 verdict
Next#1): randomized PUT/UPDATE/DELETE/deleteFrom/MERGE interleavings
from 4 threads over one store, hash-compared against a serial-replay
oracle in observed commit order.  The full sweep
(`python tools/fuzz_mutations.py --schedules 200`) runs out-of-suite;
these pinned seeds keep the harness itself green in CI time.

Reference contract: consistency/using_transactions_row.md — row-level
write locks let writers on disjoint rows of one table commit
concurrently; intersecting writers serialize."""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_mutations import run_schedule  # noqa: E402

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "seed,mode",
    [
        (101, "mixed"),
        (102, "disjoint"),
        (7000021, "mixed"),  # caught the empty-target MERGE alias bug
        (203, "mixed"),
        (204, "disjoint"),
        (305, "mixed"),
    ],
)
def test_fuzz_mutation_schedule(spark, seed, mode):
    res = run_schedule(
        spark, seed=seed, n_threads=4, ops_per_thread=4, mode=mode
    )
    assert res["ok"], res
