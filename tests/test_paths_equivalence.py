"""All three span-merge implementations must produce identical mention sets
on real driver data (not just golden sentences), and embedding near-dup
finds planted duplicates."""

from pyspark.sql import functions as F

from biomedical_ner_spark.operators import dedup, spans


def _key_set(df):
    return {
        (r.doc_id, r.text, r.type, r.tag, tuple(r.individual_tags),
         tuple(r.tokens), r.start_position, r.end_position)
        for r in df.collect()
    }


def test_three_span_paths_identical_on_testdata(spark, docs_small):
    a = _key_set(spans.mentions(docs_small))
    b = _key_set(spans.mentions_hof(docs_small))
    c = _key_set(
        spans.extract_mentions_arrow(docs_small).drop("content_sha")
    )
    assert a == b == c
    assert len(a) > 1000


def test_embedding_near_dups(spark):
    base = [0.1 * i for i in range(8)]
    rows = [
        (0, base),
        (1, base),                       # exact dup
        (2, [x * 2.0 for x in base]),    # same direction -> cos 1.0
        (3, [1.0] + [0.0] * 7),
        (4, [-x for x in base]),         # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    pairs = {(r.a, r.b): r.cos
             for r in dedup.embedding_near_dups(df, threshold=0.99).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(k in {(0, 1), (0, 2), (1, 2)} for k in pairs)
