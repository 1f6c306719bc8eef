"""Deterministic tagging lexicon shared by the oracle, Spark, and DuckDB paths.

The reference app tags tokens with a trained BiLSTM-CRF whose weights are
absent from the repo (see SURVEY.md header: checkpoints stripped).  Parity is
therefore defined against a *deterministic, shared tagger*: a two-lexicon
gazetteer rule whose output is a pure function of ``(token, prev_token)``:

  * ``HEADS``  — tokens that open an entity: emit ``B-<type>`` unless the
    previous token's lexicon type equals this type, in which case ``I-<type>``
    (adjacent same-type heads merge, e.g. "BRCA1 DNA" -> B-DNA I-DNA).
  * ``CONTS``  — continuation tokens: always emit ``I-<type>``; when they
    appear without a compatible opener they are *orphan I-* tags, which the
    reference's span merge promotes to ``B-`` (app.py:365-386).
  * otherwise ``O``.

The lexicon is constructed so the tagger reproduces, token for token, all 8
golden sentences of the reference's own fixture set (JNLPBA.ipynb cc[61],
duplicated BioWordVec.ipynb cc[21]; see FIXTURES.md §3), including the
parity-critical ``B-cell_line B-cell_type I-cell_line`` case of sentence 6.

Because the rule is a function of two adjacent tokens it is exactly
expressible in SQL as ``CASE`` over ``lag(token)`` — the same semantics run
as (a) pure Python (oracle + Arrow UDF), (b) a Spark SQL window expression,
and (c) a DuckDB oracle query, making the whole pipeline value-checkable.

Entity types are the reference's JNLPBA classes (datasets/JNLPBA/classes.txt):
protein, DNA, RNA, cell_line, cell_type.
"""

from __future__ import annotations

# --- golden-sentence lexicon (reproduces JNLPBA.ipynb cc[61] gold tags) ----
_GOLDEN_HEADS = {
    "octamer-binding": "protein",
    "p53": "protein",
    "tp53": "protein",
    "hela": "cell_line",
    "jurkat": "cell_line",
    "brca1": "DNA",
    "dna": "DNA",
    "mrna": "RNA",
    "rna": "RNA",
    "t": "cell_type",
    "breast": "cell_type",
}
_GOLDEN_CONTS = {
    "proteins": "protein",
    "protein": "protein",
    "cells": "cell_line",
    "lymphocytes": "cell_type",
}

# --- testdata lexicon (documents.parquet token pool; TESTDATA.md) -----------
# 'join' is the hottest pool token -> a deliberately hot entity exercising
# skew salting; 'line'/'scan'/'value'/'group' standalone produce orphan I-
# tags exercising the promotion path.
_POOL_HEADS = {
    "join": "protein",
    "customer": "protein",
    "spark": "protein",
    "table": "DNA",
    "hash": "DNA",
    "stream": "RNA",
    "batch": "RNA",
    "window": "cell_line",
    "filter": "cell_type",
}
_POOL_CONTS = {
    "value": "protein",
    "scan": "DNA",
    "merge": "RNA",
    "line": "cell_line",
    "group": "cell_type",
}

HEADS: dict[str, str] = {**_GOLDEN_HEADS, **_POOL_HEADS}
CONTS: dict[str, str] = {**_GOLDEN_CONTS, **_POOL_CONTS}

ENTITY_TYPES = ("DNA", "RNA", "cell_line", "cell_type", "protein")

# friendly display names, mirroring the app's ENTITY_NAMES_* maps
# (reference app.py:82-115)
ENTITY_NAMES: dict[str, str] = {
    "protein": "Protein",
    "DNA": "DNA",
    "RNA": "RNA",
    "cell_line": "Cell Line",
    "cell_type": "Cell Type",
}

# verb pool for the deterministic triple-predicate rule (SURVEY.md §7.5):
# nearest verb-pool token strictly between two mention spans names the
# predicate; otherwise 'co_occurs_with'.
VERB_POOL: dict[str, str] = {
    "binds": "binds",
    "regulate": "regulates",
    "regulates": "regulates",
    "transcribes": "transcribes",
    "produces": "produces",
    "stimulate": "stimulates",
    "stimulates": "stimulates",
    "expresses": "expresses",
    "inhibits": "inhibits",
    "activates": "activates",
    "sort": "sorts",       # pool verbs so driver testdata emits non-trivial preds
    "order": "orders",
    "query": "queries",
}


def lexicon_type(token_lower: str) -> str | None:
    """Entity type of a token under HEADS ∪ CONTS, else None."""
    t = CONTS.get(token_lower)
    if t is not None:
        return t
    return HEADS.get(token_lower)


def tag_token(token: str, prev_token: str | None) -> str:
    """Deterministic BIO tag — pure function of (token, prev_token).

    Mirrors what the reference's tagger would emit; shared verbatim by the
    single-process oracle and the Spark Arrow-UDF path, and transcribed to
    SQL by :func:`tag_case_sql`.
    """
    tl = token.lower()
    ct = CONTS.get(tl)
    if ct is not None:
        return "I-" + ct
    ht = HEADS.get(tl)
    if ht is not None:
        prev_type = lexicon_type(prev_token.lower()) if prev_token else None
        return ("I-" if prev_type == ht else "B-") + ht
    return "O"


# --------------------------------------------------------------------------
# SQL transcriptions — identical text works in Spark SQL and DuckDB.
# --------------------------------------------------------------------------

def _in_list(items) -> str:
    return ", ".join("'" + w + "'" for w in sorted(items))


def type_case_sql(col: str) -> str:
    """CASE expr: lexicon type of ``col`` (lowercased token), else NULL."""
    whens = []
    for typ in ENTITY_TYPES:
        words = [w for w, t in CONTS.items() if t == typ]
        words += [w for w, t in HEADS.items() if t == typ and w not in CONTS]
        whens.append(f"WHEN {col} IN ({_in_list(set(words))}) THEN '{typ}'")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def tag_case_sql(tok: str, prev: str) -> str:
    """SQL expression computing :func:`tag_token` over lowercased token
    columns ``tok`` and ``prev`` (prev may be NULL at sentence start)."""
    cont_whens = []
    for typ in ENTITY_TYPES:
        words = [w for w, t in CONTS.items() if t == typ]
        if words:
            cont_whens.append(
                f"WHEN {tok} IN ({_in_list(words)}) THEN 'I-{typ}'"
            )
    head_whens = []
    for typ in ENTITY_TYPES:
        words = [w for w, t in HEADS.items() if t == typ and w not in CONTS]
        if words:
            head_whens.append(
                f"WHEN {tok} IN ({_in_list(words)}) THEN "
                f"(CASE WHEN COALESCE({type_case_sql(prev)}, '') = '{typ}' "
                f"THEN 'I-{typ}' ELSE 'B-{typ}' END)"
            )
    return (
        "CASE "
        + " ".join(cont_whens)
        + " "
        + " ".join(head_whens)
        + " ELSE 'O' END"
    )


def entity_name_case_sql(col: str) -> str:
    """CASE expr mapping raw type -> friendly name (app.py:82-115 parity)."""
    whens = " ".join(
        f"WHEN {col} = '{t}' THEN '{n}'" for t, n in sorted(ENTITY_NAMES.items())
    )
    return f"CASE {whens} ELSE {col} END"


def verb_pred_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{v}' THEN '{p}'" for v, p in sorted(VERB_POOL.items())
    )
    return f"CASE {whens} ELSE NULL END"


# --------------------------------------------------------------------------
# Alias dictionary (UMLS/MeSH-like gazetteer) for entity linking (J7).
# --------------------------------------------------------------------------

def build_alias_rows() -> list[tuple[str, str, str, float]]:
    """Synthesized alias dictionary rows (alias, cui, entity_type, weight).

    One CUI per head token; aliases are the head alone and head+continuation
    two-token surfaces of the same type. Deterministic CUIs are derived from
    md5 so the Spark and DuckDB sides agree bit-for-bit.
    """
    import hashlib

    rows: list[tuple[str, str, str, float]] = []
    for head, typ in sorted(HEADS.items()):
        cui = "C" + hashlib.md5(f"{typ}:{head}".encode()).hexdigest()[:7].upper()
        rows.append((head, cui, typ, 1.0))
        for cont, ctyp in sorted(CONTS.items()):
            if ctyp == typ:
                rows.append((f"{head} {cont}", cui, typ, 0.9))
    # standalone continuation surfaces (orphan-I promoted spans) get their
    # own CUIs at lower weight
    for cont, typ in sorted(CONTS.items()):
        cui = "C" + hashlib.md5(f"{typ}:{cont}".encode()).hexdigest()[:7].upper()
        rows.append((cont, cui, typ, 0.5))
    return rows
