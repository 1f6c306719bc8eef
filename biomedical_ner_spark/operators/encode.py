"""Model-input encoding stage (SURVEY.md J1/J2/P4/P6) as an Arrow stage:
tokenize -> word ids (NUM/UNK rules) -> per-char ids (20-char truncation),
the exact reference semantics of app.py:216-252 via the shared
core.oracle.encode_tokens transcription.

The vocab/char dictionaries are vocabulary-bounded dim tables collected
once and shipped in the UDF closure (broadcast-sized, like the reference's
pickled dicts); the corpus side streams through ONE mapInPandas crossing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from ..core.oracle import MAX_CHAR_LEN, MAX_SEQ_LEN, encode_tokens, tokenize_text

ENCODED_SCHEMA = (
    "doc_id BIGINT, pos BIGINT, token STRING, word_id BIGINT,"
    " char_ids ARRAY<INT>"
)


def encode_corpus_arrow(docs: DataFrame, word_vocab: dict[str, int],
                        char_vocab: dict[str, int],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-token encoded rows (doc_id, pos, token, word_id, char_ids)."""
    import pandas as pd

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, raw in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_text(raw or "")
                toks, wids, cseqs, _ = encode_tokens(
                    toks, word_vocab, char_vocab,
                    MAX_SEQ_LEN, MAX_CHAR_LEN)
                for p, (tok, wid, cids) in enumerate(
                        zip(toks, wids, cseqs)):
                    rows.append((did, p, tok, wid, cids))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "pos", "token", "word_id", "char_ids"],
            )

    return docs.select(id_col, text_col).mapInPandas(
        _run, schema=ENCODED_SCHEMA)
