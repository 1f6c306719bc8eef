"""Cross-engine checks: Spark operators vs DuckDB window-SQL twins on real
driver testdata (SURVEY.md §5.2.2)."""

import duckdb
import pytest

from biomedical_ner_spark.operators import spans
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    return con


def test_bio_spans_cross_engine(spark, docs_small, duck):
    got = sorted(
        (r.doc_id, r.text, r.type, r.tag, r.start_position, r.end_position,
         len(r.tokens))
        for r in spans.mentions(docs_small).collect()
    )
    want = sorted(
        (r[0], r[2], r[3], r[4], r[5], r[6], r[7])
        for r in duck.sql(spans.bio_spans_window_sql("documents")).fetchall()
    )
    assert len(got) == len(want) and got == want


def test_bio_tags_cross_engine(spark, docs_small, duck):
    got = sorted(
        (r.doc_id, r.pos, r.token, r.tag)
        for r in spans.bio_tags_exploded(docs_small).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.sql(spans.bio_tags_window_sql("documents")).fetchall()
    )
    assert got == want


def test_sql_tokenizer_matches_python_re_on_testdata(spark, docs_small):
    """The ASCII SQL tokenizer twin equals the exact Python-re tokenizer on
    the driver corpus (FIXTURES.md §6 tokenizer property)."""
    from biomedical_ner_spark.core import tokenize_text

    rows = spans.doc_tokens(docs_small).select("doc_id", "text", "tokens").collect()
    for r in rows:
        assert list(r.tokens) == tokenize_text(r.text)[:100], r.doc_id
