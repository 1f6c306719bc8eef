"""Language identification (training-data pipeline surface): a
deterministic n-gram heuristic — per-language stopword-unigram hits plus
distinctive character-n-gram hits, argmax with a deterministic tie-break.

The profiles are tiny literals compiled INTO the plan (no dict broadcast,
no UDF): stopword hits are a `filter(tokens, t -> t IN (...))` size and
n-gram hits use the (length - length(replace)) / len(gram) counting trick —
every term is an exact integer, so the score is bit-stable across engines
and the DuckDB oracle recomputes it verbatim.  This is the standard cheap
lang-ID used to bucket web-scale corpora before expensive per-language
processing; a fastText-style model plugs in behind the same output shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword unigrams (weight 1 per hit) and distinctive char n-grams
# (weight 2 per occurrence) per language
PROFILES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "de": (("der", "die", "das", "und", "nicht", "ist", "ein", "eine",
            "mit", "aber", "sind", "dem"),
           ("sch", "ich", "ein")),
    "en": (("the", "and", "of", "is", "are", "was", "with", "over", "a",
            "an", "in", "to"),
           ("th", "ing")),
    "es": (("el", "los", "las", "una", "que", "con", "por", "para", "es",
            "en", "un", "y"),
           ("cion", "ll")),
    "fr": (("le", "la", "les", "des", "une", "est", "dans", "avec", "et",
            "du", "au", "ce"),
           ("eau", "oux", "que")),
    "zh": ((), ("的", "是", "在", "了", "和")),
}

LANGS = tuple(sorted(PROFILES))

# deterministic multilingual fixtures: the driver testdata's `lang` column
# is a label only (its texts are all the same token soup), so the lang_id
# query detects over these synthesized sentences — the same pattern as the
# synthetic media table
SAMPLES: list[tuple[int, str, str]] = [
    (0, "en", "the quick brown fox is jumping over the lazy dog in the"
              " garden"),
    (1, "en", "she was walking with an old friend and the evening was"
              " getting dark"),
    (2, "en", "this is an interesting thing to read in the morning paper"),
    (3, "en", "a man and a woman are standing in the rain with an umbrella"),
    (10, "fr", "le chat noir est dans la maison avec une petite fille et"
               " le chien"),
    (11, "fr", "les oiseaux chantent dans les arbres du jardin au bord de"
               " l eau"),
    (12, "fr", "ce livre est une belle histoire avec des images et des"
               " couleurs"),
    (13, "fr", "la dame marche dans la rue avec du pain et une bouteille"
               " d eau"),
    (20, "de", "der hund und die katze sind nicht in dem haus aber der"
               " mann schon"),
    (21, "de", "ich gehe mit einem freund durch die stadt und das wetter"
               " ist gut"),
    (22, "de", "das kind spielt mit einem ball und die mutter liest ein"
               " buch"),
    (23, "de", "eine frau und ein mann sind mit dem zug durch die stadt"
               " gefahren"),
    (30, "es", "el perro y el gato estan en la casa con una nina y un"
               " hombre"),
    (31, "es", "los libros que tenemos para leer son una coleccion muy"
               " buena"),
    (32, "es", "la cancion que canta el grupo es una cancion para los"
               " ninos"),
    (33, "es", "un hombre y una mujer caminan por la calle con el sol y"
               " las flores"),
    (40, "zh", "他的书是在桌子上的"),
    (41, "zh", "我们在公园里散步了"),
    (42, "zh", "猫和狗是好朋友"),
    (43, "zh", "今天的天气是很好的"),
]


def _score_sql(lang: str, tokens_col: str, text_col: str) -> str:
    sws, grams = PROFILES[lang]
    parts = []
    if sws:
        in_list = ", ".join(f"'{w}'" for w in sws)
        parts.append(
            f"size(filter({tokens_col}, t -> lower(t) IN ({in_list})))")
    for g in grams:
        parts.append(
            f"2 * CAST((length({text_col}) -"
            f" length(replace({text_col}, '{g}', ''))) /"
            f" {len(g)} AS INT)")
    return " + ".join(parts) if parts else "0"


def lang_scores_exprs(tokens_col: str, text_col: str) -> dict[str, Column]:
    return {lang: F.expr(_score_sql(lang, tokens_col, text_col))
            for lang in LANGS}


def predicted_lang_expr(tokens_col: str, text_col: str) -> Column:
    """argmax over languages; ties break to the alphabetically FIRST
    language (struct max over (score, -index, lang))."""
    entries = ", ".join(
        f"struct({_score_sql(lang, tokens_col, text_col)} AS s,"
        f" {-i} AS ni, '{lang}' AS lang)"
        for i, lang in enumerate(LANGS)
    )
    return F.expr(f"array_max(array({entries})).lang")


def _duck_score(lang: str, tokens_col: str, text_col: str) -> str:
    sws, grams = PROFILES[lang]
    parts = []
    if sws:
        in_list = ", ".join(f"'{w}'" for w in sws)
        parts.append(
            f"len(list_filter({tokens_col}, t -> lower(t) IN ({in_list})))")
    for g in grams:
        parts.append(
            f"2 * CAST((length({text_col}) -"
            f" length(replace({text_col}, '{g}', ''))) /"
            f" {len(g)} AS INT)")
    return "(" + (" + ".join(parts) if parts else "0") + ")"


def duck_scores_and_pred(tokens_col: str, text_col: str) -> tuple[str, str]:
    """(score column SQL fragments, predicted-lang CASE) for the oracle."""
    scores = {lang: _duck_score(lang, tokens_col, text_col)
              for lang in LANGS}
    # argmax with alphabetical-first tie-break, as nested GREATEST logic:
    # pick the first lang whose score >= every other score
    cases = []
    for lang in LANGS:
        conds = " AND ".join(
            f"{scores[lang]} >= {scores[o]}" for o in LANGS if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    pred = "CASE " + " ".join(cases) + " END"
    score_cols = ", ".join(
        f"CAST({scores[lang]} AS BIGINT) AS score_{lang}" for lang in LANGS
    )
    return score_cols, pred
