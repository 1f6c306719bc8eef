"""Single-process, reference-faithful oracle for the deterministic stages.

These functions are *transcriptions* of the reference app's deterministic
pipeline stages (cited below into /root/reference/) — not copies of any
execution engine.  They serve two roles:

1. the pytest oracle: the Spark pipeline must match them row-for-row;
2. the shared pure-function core that the Arrow-UDF parity path calls, so
   Spark output equals oracle output *by construction*.

Reference citations:
  * tokenize_text       -> app.py:210-214
  * preprocess encoding -> app.py:216-252 (truncate 100, digit->
                           <NUM>, lower -> vocab, <UNK> default, chars[:20])
  * extract_entities    -> app.py:335-416 (BIO decode / span merge with
                           orphan-I promotion and trailing flush)
"""

from __future__ import annotations

import re
from collections.abc import Callable

from ..lexicon import tag_token

MAX_SEQ_LEN = 100   # inference truncation (app.py:216)
MAX_CHAR_LEN = 20   # per-token char truncation (app.py:216)

# app.py:213 — words (hyphen-joined) or single punctuation chars
_TOKEN_RE = re.compile(r"\b\w+(?:-\w+)*\b|[^\w\s]")


def tokenize_text(text: str) -> list[str]:
    """Tokenizer with the exact Python `re` semantics of app.py:210-214."""
    return _TOKEN_RE.findall(text)


def encode_tokens(
    tokens: list[str],
    vocab: dict[str, int],
    char_vocab: dict[str, int],
    max_seq_len: int = MAX_SEQ_LEN,
    max_char_len: int = MAX_CHAR_LEN,
    ascii_digits: bool = False,
) -> tuple[list[str], list[int], list[list[int]], int]:
    """Encoding stage of app.py:216-252 (without global padding: Spark pads
    per Arrow batch only; the oracle returns unpadded ids + seq_len).

    ``ascii_digits``: the reference's <NUM> test is Python str.isdigit
    (app.py:229), which also accepts non-ASCII digits (Arabic-Indic,
    superscripts).  The distributed engine's relational path can only
    express the ASCII rule ([0-9]+), so its Arrow path passes
    ascii_digits=True to make BOTH physical encode paths agree on every
    input — the two rules differ only on non-ASCII digit tokens, where
    the engine uniformly applies the ASCII rule.  Default False keeps the
    exact reference transcription for the parity oracle."""
    tokens = tokens[:max_seq_len]
    seq_len = len(tokens)
    unk_w = vocab.get("<UNK>", 1)
    if ascii_digits:
        is_num = lambda t: t != "" and all("0" <= c <= "9" for c in t)  # noqa: E731
    else:
        is_num = str.isdigit  # reference semantics (app.py:229)
    word_ids = []
    for token in tokens:
        if is_num(token):
            word_ids.append(vocab.get("<NUM>", unk_w))
        else:
            word_ids.append(vocab.get(token.lower(), unk_w))
    unk_c = char_vocab.get("<UNK>", 1)
    char_seqs = [
        [char_vocab.get(c, unk_c) for c in token[:max_char_len]]
        for token in tokens
    ]
    return tokens, word_ids, char_seqs, seq_len


def predict_tags(
    tokens: list[str],
    tagger: Callable[[str, str | None], str] = tag_token,
) -> list[tuple[str, str]]:
    """(token, tag) pairs per app.py:303 with the injected deterministic
    tagger standing in for the (unavailable) neural forward pass."""
    out: list[tuple[str, str]] = []
    prev: str | None = None
    for tok in tokens:
        out.append((tok, tagger(tok, prev)))
        prev = tok
    return out


def extract_entities(predictions: list[tuple[str, str]]) -> list[dict]:
    """BIO decode / span merge — exact transcription of app.py:335-416.

    Semantics: ``B-`` opens; ``I-`` of the same type extends; ``I-`` of a
    different type (or orphan ``I-``) closes the previous entity and opens a
    new one with the tag rewritten to ``B-<type>`` (app.py:383); ``O``
    closes; a trailing open entity is flushed with end = len(preds)-1.
    """
    entities: list[dict] = []
    current_type: str | None = None
    entity_tag: str | None = None
    entity_tokens: list[str] = []
    entity_tags: list[str] = []
    start_idx = 0

    def _flush(end_idx: int) -> None:
        entities.append(
            {
                "text": " ".join(entity_tokens),
                "type": entity_tag[2:],
                "tag": entity_tag,
                "individual_tags": entity_tags.copy(),
                "tokens": entity_tokens.copy(),
                "start_position": start_idx,
                "end_position": end_idx,
            }
        )

    for idx, (token, tag) in enumerate(predictions):
        if tag.startswith("B-"):
            if current_type:
                _flush(idx - 1)
            current_type = tag[2:]
            entity_tag = tag
            entity_tokens = [token]
            entity_tags = [tag]
            start_idx = idx
        elif tag.startswith("I-"):
            if current_type == tag[2:]:
                entity_tokens.append(token)
                entity_tags.append(tag)
            else:
                if current_type:
                    _flush(idx - 1)
                current_type = tag[2:]
                entity_tag = "B-" + tag[2:]  # orphan-I promotion (app.py:383)
                entity_tokens = [token]
                entity_tags = [tag]
                start_idx = idx
        else:  # 'O' or anything else
            if current_type:
                _flush(idx - 1)
                current_type = None
                entity_tokens = []
                entity_tags = []
                start_idx = 0

    if current_type:
        _flush(len(predictions) - 1)
    return entities


def run_reference_pipeline(
    text: str,
    tagger: Callable[[str, str | None], str] = tag_token,
    max_seq_len: int = MAX_SEQ_LEN,
) -> tuple[list[tuple[str, str]], list[dict]]:
    """Full deterministic inference path of the app (app.py:254-303 +
    extract_entities): tokenize -> truncate -> tag -> span merge."""
    tokens = tokenize_text(text)[:max_seq_len]
    predictions = predict_tags(tokens, tagger)
    return predictions, extract_entities(predictions)
