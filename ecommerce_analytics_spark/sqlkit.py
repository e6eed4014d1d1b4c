"""Shared SQL expression builders with cross-engine edge-case parity.

Spark's ``sequence(start, stop)`` flips to a DESCENDING sequence when
``stop < start`` — so the idiomatic n-gram position generator
``sequence(1, size(toks) - k + 1)`` does not go empty on a document
shorter than k tokens; it yields [1, 0, ...] and the k-gram
``element_at(toks, i + k - 1)`` then indexes out of bounds, which is a
LOUD crash under the session's pinned ANSI mode. DuckDB's
``generate_series(1, 0)`` is empty, so every oracle already drops
short documents gracefully; real corpora contain one-token and empty
documents, making this a guaranteed production crash (found by the
round-6 hostile-input probes — the driver corpus happens to contain
no short text, so the gap was invisible to every green sweep).
"""

from __future__ import annotations


def ngram_positions(arr: str, k: int) -> str:
    """SQL for the ascending 1-based n-gram start positions of ``arr``:
    1..size-k+1, EMPTY when size(arr) < k (matching DuckDB's
    generate_series). ``slice`` with length 0 produces the typed empty
    array that a bare ``sequence`` cannot."""
    n = f"(size({arr}) - {k - 1})"
    return (f"slice(sequence(1, greatest({n}, 1)), 1, "
            f"greatest({n}, 0))")
