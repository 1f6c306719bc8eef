"""Encoding stage (D7, app.py:216-252) and embedding matrix (J4/D11)."""

import pytest

from biomedical_ner_spark.core.oracle import encode_tokens
from biomedical_ner_spark.sources.embeddings import (
    build_embedding_matrix,
    load_gensim_vectors,
    seeded_vector,
    write_vocab_tables,
)


def test_encode_tokens_reference_semantics():
    vocab = {"<PAD>": 0, "<UNK>": 1, "<NUM>": 2, "p53": 3, "binds": 4}
    chars = {"<PAD>": 0, "<UNK>": 1, "p": 2, "5": 3, "3": 4, "b": 5}
    toks, wids, cseqs, n = encode_tokens(
        ["P53", "binds", "42", "unknown-word"], vocab, chars
    )
    assert n == 4
    # lowercase before vocab lookup (app.py:232), digits -> <NUM> (229),
    # OOV -> <UNK> (233)
    assert wids == [3, 4, 2, 1]
    # char ids use the ORIGINAL case, unknown chars -> 1 (app.py:245)
    assert cseqs[0] == [1, 3, 4]  # 'P' unknown, '5', '3'
    assert cseqs[1][0] == 5
    # truncation at max_seq_len and max_char_len
    toks2, wids2, cseqs2, n2 = encode_tokens(
        ["x" * 50] * 120, vocab, chars, max_seq_len=100, max_char_len=20
    )
    assert n2 == 100 and len(wids2) == 100 and len(cseqs2[0]) == 20


def test_embedding_matrix_join_and_fallback(spark):
    vocab = spark.createDataFrame(
        [("p53", 3), ("binds", 4), ("rare", 5)], "word STRING, id INT"
    )
    vectors = spark.createDataFrame(
        [("p53", [1.0] * 200)], "word STRING, vector ARRAY<FLOAT>"
    )
    m = {r.word: (r.id, list(r.vector))
         for r in build_embedding_matrix(vocab, vectors, spark).collect()}
    assert set(m) == {"<PAD>", "<UNK>", "<NUM>", "p53", "binds", "rare"}
    assert m["<PAD>"][1] == [0.0] * 200          # PAD zero vector
    assert m["p53"][1] == [1.0] * 200            # pretrained kept
    assert m["binds"][1] == pytest.approx(seeded_vector("binds"), abs=1e-6)
    # deterministic across runs
    m2 = {r.word: list(r.vector)
          for r in build_embedding_matrix(vocab, vectors, spark).collect()}
    assert m2["rare"] == m["rare"][1]


def test_gensim_loader_gated(spark):
    with pytest.raises(NotImplementedError):
        load_gensim_vectors(spark, "/nonexistent.bin")


def test_write_vocab_tables(spark, tmp_path):
    v = spark.createDataFrame([("a", 3)], "word STRING, id INT")
    c = spark.createDataFrame([("a", 2)], "ch STRING, id INT")
    t = spark.createDataFrame([("O", 1)], "tag STRING, id INT")
    write_vocab_tables(v, c, t, str(tmp_path))
    assert spark.read.parquet(str(tmp_path / "vocab")).count() == 1
    assert spark.read.parquet(str(tmp_path / "tag_map")).collect()[0].tag == "O"


def test_train_word2vec_produces_dim_table(spark):
    """A14: in-engine Word2Vec training yields the (word, vector) dim-table
    shape, obeys min_count, and the vectors plug into
    build_embedding_matrix unchanged."""
    from biomedical_ner_spark.sources.embeddings import train_word2vec

    sents = [
        ["p53", "binds", "DNA"],
        ["p53", "activates", "DNA"],
        ["p53", "binds", "RNA"],
        ["BRCA1", "binds", "DNA"],
        ["rareword", "appears", "once"],
    ] * 4  # repeat so contexts exist
    df = spark.createDataFrame([(s,) for s in sents],
                               "tokens ARRAY<STRING>")
    vecs = train_word2vec(df, spark, vector_size=16, min_count=2, max_iter=2)
    rows = {r.word: list(r.vector) for r in vecs.collect()}
    # lowercased, min_count=2 keeps repeated words; all sentences repeat
    # 4x so every word appears >= 4 times
    assert "p53" in rows and "dna" in rows and "binds" in rows
    assert all(len(v) == 16 for v in rows.values())
    assert all(isinstance(x, float) for v in rows.values() for x in v)
    # drop-in: the trained table feeds build_embedding_matrix
    vocab = spark.createDataFrame(
        [("p53", 3), ("unseenword", 4)], "word STRING, id INT")
    m = {r.word: list(r.vector) for r in build_embedding_matrix(
        vocab, vecs, spark, dim=16).collect()}
    assert m["p53"] == pytest.approx(rows["p53"], abs=1e-6)
    assert len(m["unseenword"]) == 16
