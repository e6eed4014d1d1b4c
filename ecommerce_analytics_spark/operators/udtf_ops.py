"""Python UDTF surface (Spark 4 user-defined table functions).

The engine's extension story so far covers scalar column expressions,
Arrow-batched pandas UDFs (multimodal/blobs.py), stateful processors
(streaming/), and Python DataSources (sources/). Spark 4's remaining
Python extension point is the user-defined TABLE function: a class
whose ``eval`` yields zero-or-more rows per input row, usable in SQL
``FROM``/``LATERAL`` position — the UDTF equivalent of the
reference's row-expanding transform_to_events loop
(data_loader.py:98-203, one input row → several event rows).

Demonstrated with a sentence splitter over ``documents``. A UDTF is
row-at-a-time Python — the SLOW path. For a row expansion this simple
the built-in ``posexplode(split(...))`` is the production plan (it
stays in codegen), and ``tests/test_udtf.py`` pins the UDTF output
row-for-row to that built-in formulation. The UDTF exists to certify
the extension surface itself — argument binding, lateral join
correlation, multi-row yield, schema contract — for the cases that
genuinely need imperative expansion (recursive document structures,
stateful tokenizers), mirroring how blobs.py certifies decode
plumbing with a fake codec.

The DuckDB oracle runs the equivalent lateral unnest, so the UDTF
path is driver-hash-certified end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

SENT_SEP = ". "


@udtf(returnType="doc_id bigint, sent_id int, sentence string, "
                 "sent_chars int")
class SplitSentences:
    """One output row per '. '-separated sentence of the input text.

    Mirrors Python ``str.split`` semantics exactly (empty fragments
    kept), which is also DuckDB ``string_split`` semantics — the
    oracle relies on that equivalence.
    """

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        for i, sent in enumerate(text.split(SENT_SEP), start=1):
            yield doc_id, i, sent, len(sent)


_UDTF_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(text, '. ') AS parts FROM documents
)
SELECT doc_id, CAST(u.i AS INT) AS sent_id,
       parts[u.i] AS sentence,
       CAST(length(parts[u.i]) AS INT) AS sent_chars
FROM d, unnest(range(1, len(parts) + 1)) AS u(i)
"""


@query(
    "doc_sentences_udtf", _UDTF_ORACLE,
    doc="Python UDTF in LATERAL position: split_sentences(doc_id, "
        "text) yields one row per '. '-separated sentence with its "
        "ordinal and length — certifying Spark 4's table-function "
        "extension surface (argument binding, correlated lateral "
        "join, multi-row yield) against the DuckDB lateral-unnest "
        "oracle. Row-at-a-time Python by design; the codegen "
        "posexplode twin is pinned row-for-row in tests/test_udtf.py "
        "and is the plan to use when the expansion is expressible.",
    tags=("udtf", "text", "extension"),
)
def q_doc_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql("""
        SELECT s.doc_id, s.sent_id, s.sentence, s.sent_chars
        FROM _udtf_docs d,
             LATERAL split_sentences(d.doc_id, d.text) s
    """)


def sentences_builtin(docs: DataFrame) -> DataFrame:
    """The codegen twin: posexplode(split(text, sep, -1))."""
    from pyspark.sql import functions as F
    return (docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\\. ", -1)).alias("pos", "sentence"))
        .select("doc_id", (F.col("pos") + 1).cast("int").alias("sent_id"),
                "sentence",
                F.length("sentence").cast("int").alias("sent_chars")))
