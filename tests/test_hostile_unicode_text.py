"""Hostile Unicode text certification (round 8).

Every prior documents wave salted structure (short/empty docs, NULL
metadata, duplicate deliveries) but the `text` column itself stayed
pure ASCII — while a 100 TB pretraining corpus is MOSTLY non-ASCII.
This wave injects the Unicode classes that expose engine divergence:

* CJK (no word boundaries for `\\w`-style classes),
* astral-plane emoji (surrogate PAIRS in Java's UTF-16 regex engine
  vs single codepoints in DuckDB's utf8proc/RE2 — the classic
  code-unit-vs-codepoint length and regex-count divergence),
* ZWJ emoji sequences (one grapheme, many codepoints),
* combining accents (e + U+0301 vs precomposed é — NFC/NFD),
* NBSP inside token runs (not matched by ASCII-space splits),
* Turkish dotted/dotless I (locale-sensitive case mapping:
  Java lower('İ') = 'i' + COMBINING DOT, 2 codepoints),
* RTL text with an explicit RLM mark.

Every registered query whose oracle reads documents.text must still
hash-match its unchanged oracle on the salted corpus. `n_chars` is
left at its original (now inconsistent) value on purpose — the
metadata wave already certified that text/metadata consistency is a
gate concern (documents_validation), not an operator assumption.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pytest

# Oracle references documents AND the text column (word-boundary so
# `text_quality` table aliases etc. don't false-positive).
_TEXT_PAT = re.compile(r"\btext\b")

SALTS = [
    " 漢字テキスト 中文",   # CJK
    " \U0001f980\U0001f680\U0001f600",                       # astral emoji
    " \U0001f469‍\U0001f469‍\U0001f467",           # ZWJ family
    " café café",                                 # NFD vs NFC
    " foo bar",                                         # NBSP token
    " İstanbul ışık",                    # Turkish I
    " ‏مرحبا بالعالم",  # RTL + RLM
]


def _affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(
        n for n, q in all_queries().items()
        if q.oracle and "documents" in q.oracle
        and _TEXT_PAT.search(q.oracle))


@pytest.fixture(scope="module")
def hostile_sf(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("hostile_unicode")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "documents.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    # Deterministic injection: ~1 in 3 docs gets one salt appended,
    # chosen round-robin by doc_id, so every salt class lands on many
    # docs and mixes with every metadata stratum.
    def salt(row):
        if row.doc_id % 3 == 0:
            return row.text + SALTS[int(row.doc_id) % len(SALTS)]
        return row.text
    pdf["text"] = pdf.apply(salt, axis=1)
    # A handful of PURELY non-ASCII docs: no ASCII letter anywhere.
    pure = pdf.index[: min(5, len(pdf))]
    pdf.loc[pure, "text"] = [
        "漢字 漢字 中文 \U0001f980 "
        "مرحبا" for _ in pure]
    pdf.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.mark.parametrize("name", _affected())
def test_query_matches_oracle_on_unicode_text(spark, hostile_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, hostile_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, hostile_sf), name,
        float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
