"""Stateful streaming dedup: drop documents whose content sha was already
seen on the stream — the custom-stateful-operator pattern
(applyInPandasWithState) applied to the training-data dedup surface.

State is keyed by a sha prefix bucket (bounded key cardinality, skew-proof);
each key's state holds the set of full shas seen.  On a real deployment the
state store is RocksDB-backed and checkpointed; semantics here are
exactly-once per (sha) within a stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "content_sha STRING, doc_id BIGINT, first_seen BOOLEAN"
STATE_SCHEMA = "shas ARRAY<STRING>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        for sha, doc_id in zip(pdf["content_sha"], pdf["doc_id"]):
            first = sha not in seen
            if first:
                seen.add(sha)
            out.append((sha, int(doc_id), bool(first)))
    state.update((list(seen),))
    yield pd.DataFrame(out, columns=["content_sha", "doc_id", "first_seen"])


def streaming_dedup(docs_stream: DataFrame) -> DataFrame:
    """Input stream must carry (doc_id, content_sha). Emits one row per
    input doc with first_seen marking the keeper."""
    keyed = docs_stream.withColumn(
        "sha_bucket", F.substring("content_sha", 1, 2)
    )
    return (
        keyed.groupBy("sha_bucket")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
