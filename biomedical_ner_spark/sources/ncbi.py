"""S2: NCBI annotated-corpus scan (utils/fonctions.py:61-117).

Format: lines `doc_id\ttitle\ttext` where text carries inline
`<category="SpecificDisease">breast cancer</category>` markup.  The parser
strips tags and recomputes character offsets of each mention in the clean
text, then projects BIO labels onto tokens by char-span overlap (W3,
utils/fonctions.py:144-156).

The offset arithmetic is cumulative (each stripped tag shifts subsequent
offsets), i.e. inherently sequential per document — a perfect Arrow-UDF
case: one mapInPandas crossing parses, strips, and BIO-projects per row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_TAG_RE = re.compile(r'<category="([^"]+)">([^<]+)</category>')
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")  # utils/fonctions.py:127 tokenizer


def parse_ncbi_line(line: str) -> dict | None:
    """Single-doc parse — shared by the Spark UDF and the pytest oracle."""
    parts = line.split("\t", 2)
    if len(parts) != 3:
        return None
    doc_id, title, marked = parts
    clean: list[str] = []
    entities = []
    pos = 0
    out_len = 0
    for m in _TAG_RE.finditer(marked):
        pre = marked[pos:m.start()]
        clean.append(pre)
        out_len += len(pre)
        mention = m.group(2)
        entities.append(
            {"start": out_len, "end": out_len + len(mention),
             "type": m.group(1), "text": mention}
        )
        clean.append(mention)
        out_len += len(mention)
        pos = m.end()
    clean.append(marked[pos:])
    text = "".join(clean)
    return {"doc_id": doc_id, "title": title, "text": text,
            "entities": entities}


def bio_project(text: str, entities: list[dict]) -> tuple[list[str], list[str]]:
    """W3: first overlapping token gets B-, subsequent I-
    (utils/fonctions.py:144-156)."""
    tokens, starts, ends = [], [], []
    for m in _TOKEN_RE.finditer(text):
        tokens.append(m.group(0))
        starts.append(m.start())
        ends.append(m.end())
    labels = ["O"] * len(tokens)
    for e in entities:
        first = True
        for i, (s, x) in enumerate(zip(starts, ends)):
            if s < e["end"] and x > e["start"]:
                labels[i] = ("B-" if first else "I-") + e["type"]
                first = False
    return tokens, labels


NCBI_SCHEMA = (
    "doc_id STRING, title STRING, text STRING,"
    " tokens ARRAY<STRING>, labels ARRAY<STRING>"
)


def read_ncbi(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, title, text, tokens, labels) via one mapInPandas crossing."""
    import pandas as pd

    raw = spark.read.text(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"].tolist():
                doc = parse_ncbi_line(line)
                if doc is None:
                    continue
                tokens, labels = bio_project(doc["text"], doc["entities"])
                rows.append(
                    (doc["doc_id"], doc["title"], doc["text"], tokens, labels)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "text", "tokens", "labels"]
            )

    return raw.mapInPandas(_parse, schema=NCBI_SCHEMA)
