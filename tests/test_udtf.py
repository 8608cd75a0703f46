"""Spark 4 Python UDTF surface: a table function registered for SQL use.

SURVEY §2.10 records the reference has no UDF/UDAF/UDTF surface; this
engine's position is that imperative row-expanding logic belongs in the
declarative plan when expressible (x10's sequence+substring chunker —
JVM-side, no Python) and in an Arrow batch when not. A Python UDTF is
the third option Spark 4 adds — a lateral table function callable from
SQL — so we prove the surface works and that a UDTF chunker produces
EXACTLY the declarative chunker's rows (same contract, slower path:
row-at-a-time Python; keep it for logic that genuinely cannot be
expressed as column ops).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunk_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_start bigint, chunk string")
    class ChunkDocument:
        """Overlapping fixed windows (width 200, stride 150), 1-indexed
        to match SQL substring semantics."""

        def eval(self, doc_id: int, text: str):  # noqa: D102
            n = max(len(text or ""), 1)
            for start in range(1, n + 1, 150):
                yield doc_id, start, (text or "")[start - 1 : start + 199]

    spark.udtf.register("chunk_document", ChunkDocument)
    return ChunkDocument


def test_udtf_matches_declarative_chunker(spark, chunk_udtf):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("docs_udtf_in")
    via_udtf = spark.sql(
        """
        SELECT c.doc_id, c.chunk_start, c.chunk
        FROM docs_udtf_in d,
        LATERAL chunk_document(d.doc_id, d.text) c
        """
    )
    declarative = QUERIES["x10_chunk_documents"].fn(spark, SF)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in declarative.collect()}
    assert len(a) == via_udtf.count() == declarative.count()
    assert a == b


def test_udtf_handles_empty_text(spark, chunk_udtf):
    spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    ).createOrReplaceTempView("docs_udtf_edge")
    out = spark.sql(
        """
        SELECT c.doc_id, c.chunk_start, c.chunk
        FROM docs_udtf_edge d, LATERAL chunk_document(d.doc_id, d.text) c
        """
    ).collect()
    # one empty chunk per doc — mirrors x10's greatest(length,1) guard
    assert {(r.doc_id, r.chunk_start, r.chunk) for r in out} == {
        (1, 1, ""),
        (2, 1, ""),
    }
