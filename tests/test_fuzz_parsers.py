"""Mutation-fuzz regression: the transpiler and every engine-layer
statement parser must refuse bad input (TranspileError/ValueError),
never crash with an internal error. Reduced round count for the suite;
scripts/fuzz_parsers.py runs the full sweep."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)


def test_no_parser_crashes():
    from fuzz_parsers import run

    assert run(rounds_per_seed=25, seed=1234) == 0
