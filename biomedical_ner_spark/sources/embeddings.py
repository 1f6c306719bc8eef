"""Embedding artifacts (SURVEY.md S4/J4/S8, D11).

The reference trains/loads gensim Word2Vec/FastText/BioWordVec models and
builds an embedding matrix per vocab word: pretrained vector if present,
else a seeded random vector (streamlit_utils.py:42-59,
utils/fonctions.py:239-273).  Distributed twin:

* vectors are a `(word, vector ARRAY<FLOAT>)` dim table (parquet) — a
  gensim KeyedVectors export drops in via `load_gensim_vectors` (gated:
  gensim absent in this container);
* the matrix build is a **broadcast left join** vocab x vectors with a
  deterministic md5-seeded fallback (Spark's rand(seed) is
  partition-nondeterministic under retries; per-row seeded hashing is not).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EMB_DIM = 200  # reference dimension (README.md:233-244)


def seeded_vector(word: str, dim: int = EMB_DIM, scale: float = 0.1) -> list[float]:
    """Deterministic fallback vector standing in for the reference's
    N(0, 0.1) init (streamlit_utils.py:50-59), seeded from the word so
    retries agree.  Dimension j = scale * (md5("embv:word:j") scaled to
    [-1, 1)) — float64, deliberately SQL-expressible so the DuckDB
    embedding_matrix oracle reconstructs bit-identical values (the
    float32 quantization at the Arrow boundary equals DuckDB's
    CAST(... AS REAL), both IEEE round-to-nearest)."""
    return [
        (int(hashlib.md5(f"embv:{word}:{j}".encode()).hexdigest()[:8], 16)
         / 4294967296.0 * 2.0 - 1.0) * scale
        for j in range(dim)
    ]


MIN_N, MAX_N = 3, 6  # reference FastText config (fonctionsFaxtText.py:131)


def subword_ngrams_py(word: str, min_n: int = MIN_N,
                      max_n: int = MAX_N) -> list[str]:
    """FastText char n-gram occurrences of '<word>' (duplicates kept, as
    gensim composes over occurrences).  Python twin of the Spark
    expression in subword_mean_components."""
    br = f"<{word}>"
    return [br[i:i + n]
            for n in range(min_n, max_n + 1)
            for i in range(len(br) - n + 1)]


def subword_vector(word: str, dim: int = EMB_DIM, scale: float = 0.1,
                   min_n: int = MIN_N, max_n: int = MAX_N) -> list[float]:
    """FastText-style OOV vector: mean of the md5-seeded n-gram vectors
    (n-gram g's dimension j = the seeded_vector formula under the 'subw'
    namespace).  The in-vocabulary path never calls this; it is J4's
    fallback twin of gensim FastText's OOV composition
    (fonctionsFaxtText.py:567-593: min_n=3, max_n=6).  Falls back to
    seeded_vector for words too short to yield any n-gram (empty word)."""
    grams = subword_ngrams_py(word, min_n, max_n)
    if not grams:
        return seeded_vector(word, dim, scale)
    out = []
    for j in range(dim):
        acc = 0.0
        for g in grams:
            h = int(hashlib.md5(
                f"subw:{g}:{j}".encode()).hexdigest()[:8], 16)
            acc += (h / 4294967296.0 * 2.0 - 1.0) * scale
        out.append(acc / len(grams))
    return out


def subword_mean_components(words: DataFrame, dim: int = EMB_DIM,
                            min_n: int = MIN_N, max_n: int = MAX_N,
                            scale: float = 0.1,
                            word_col: str = "word") -> DataFrame:
    """(word, j, mj, n_ngrams): dimension j of the FastText-style OOV
    vector as pure JVM expressions — explode n-gram occurrences of
    '<word>' (two native explodes, no interpreted HOF on the hot path),
    md5-hash each (ngram, j) inline exactly like the dedup operators (no
    vocabulary dim table, no broadcast), one keyed agg.

    mj is rounded to 9 dp so distributed summation order cannot leak into
    the 6-dp derivations downstream; the DuckDB oracle replays the md5
    arithmetic bit-for-bit."""
    br = words.select(
        F.col(word_col).alias("word"),
        F.concat(F.lit("<"), F.col(word_col), F.lit(">")).alias("br"),
    )
    occ = (
        br.select(
            "word", "br",
            F.explode(F.expr(f"sequence({min_n}, {max_n})")).alias("n"))
        .where(F.length("br") >= F.col("n"))
        .select(
            "word", "br", "n",
            F.explode(F.expr("sequence(1, length(br) - n + 1)")).alias("i"))
        .select("word", F.expr("substr(br, i, n)").alias("ngram"))
    )
    comp = (
        "(cast(conv(substr(md5(concat('subw:', ngram, ':',"
        " cast(j AS STRING))), 1, 8), 16, 10) AS DOUBLE)"
        f" / 4294967296.0 * 2.0 - 1.0) * {scale}"
    )
    return (
        occ.select("word", "ngram",
                   F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("j"))
        .withColumn("comp", F.expr(comp))
        .groupBy("word", "j")
        .agg(F.round(F.avg("comp"), 9).alias("mj"),
             F.count(F.lit(1)).alias("n_ngrams"))
    )


def load_gensim_vectors(spark: SparkSession, path: str,
                        binary: bool = False) -> DataFrame:
    """S4: gensim model -> (word, vector) dim table. Gated import."""
    try:
        from gensim.models import KeyedVectors  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "gensim is not installed in this container; export the model to "
            "a (word, vector) parquet offline and read it with "
            "spark.read.parquet instead"
        ) from e
    kv = KeyedVectors.load_word2vec_format(path, binary=binary)
    rows = [(w, [float(x) for x in kv[w]]) for w in kv.index_to_key]
    return spark.createDataFrame(rows, "word STRING, vector ARRAY<FLOAT>")


def train_word2vec(sentences: DataFrame, spark: SparkSession,
                   vector_size: int = EMB_DIM, window: int = 5,
                   min_count: int = 2, seed: int = 42,
                   max_iter: int = 10,
                   tokens_col: str = "tokens") -> DataFrame:
    """A14: distributed Word2Vec training — the engine twin of
    `train_word2vec_embeddings` (utils/fonctions.py:165-195: skip-gram,
    vector_size=200, window=5, min_count=2, epochs=10) via
    `pyspark.ml.feature.Word2Vec` (hierarchical-softmax skip-gram, the
    same algorithm family; CBOW is not offered by Spark ML).

    Input: (tokens ARRAY<STRING>) rows; tokens are lowercased here like
    the reference.  Output: the (word, vector ARRAY<FLOAT>) dim-table
    shape of load_gensim_vectors — so a trained-in-engine model and an
    imported gensim export are interchangeable in build_embedding_matrix
    and the similarity operators.

    Determinism note: Spark ML Word2Vec is seeded but its parallel updates
    make exact floats partition-layout-dependent, like gensim with
    workers>1 — so this is pytest-verified (schema, vocab rule,
    neighbor sanity), not DuckDB-hashed."""
    from pyspark.ml.feature import Word2Vec

    toks = sentences.select(
        F.expr(f"transform({tokens_col}, t -> lower(t))").alias("_toks"))
    model = Word2Vec(
        vectorSize=vector_size,
        windowSize=window,
        minCount=min_count,
        seed=seed,
        maxIter=max_iter,
        inputCol="_toks",
        outputCol="_vec",
    ).fit(toks)
    from pyspark.ml.functions import vector_to_array

    return model.getVectors().select(
        "word",
        vector_to_array("vector").cast("array<float>").alias("vector"),
    )


def build_embedding_matrix(vocab: DataFrame, vectors: DataFrame | None,
                           spark: SparkSession,
                           dim: int = EMB_DIM,
                           oov: str = "seeded") -> DataFrame:
    """J4/D11: (word, id, vector) — pretrained vector if present, seeded
    deterministic fallback otherwise; PAD (id 0) is the zero vector.

    ``oov`` selects the fallback rule: 'seeded' = per-word seeded vector
    (the reference's N(0, 0.1) init twin), 'subword' = FastText-style
    composition (mean of md5-seeded char n-gram vectors, min_n=3/max_n=6
    — the OOV behavior a gensim FastText model would give,
    fonctionsFaxtText.py:131-173).

    The vectors side is broadcast (~10 MB at reference scale); the fallback
    runs vectorized in one pandas UDF over only the missing rows.
    """
    if oov not in ("seeded", "subword"):
        raise ValueError(f"unknown oov rule: {oov!r}")
    reserved = spark.createDataFrame(
        [("<PAD>", 0), ("<UNK>", 1), ("<NUM>", 2)], "word STRING, id INT"
    )
    full = reserved.unionByName(vocab.select("word", "id"))
    if vectors is not None:
        j = full.join(F.broadcast(vectors), "word", "left")
    else:
        j = full.withColumn("vector", F.lit(None).cast("array<float>"))

    @pandas_udf("array<float>")
    def fallback(words, ids, vecs):
        import pandas as pd

        out = []
        for w, i, v in zip(words, ids, vecs):
            if v is not None and len(v) == dim:
                out.append(list(v))
            elif i == 0:
                out.append([0.0] * dim)  # PAD = zeros (streamlit_utils.py:49)
            elif oov == "subword":
                out.append(subword_vector(w, dim))
            else:
                out.append(seeded_vector(w, dim))
        return pd.Series(out)

    return j.select(
        "word", "id", fallback("word", "id", "vector").alias("vector")
    )


def write_vocab_tables(vocab: DataFrame, char_vocab: DataFrame,
                       tag_map: DataFrame, base_path: str) -> None:
    """S8: persist the dim tables (the reference pickles 4 dicts,
    JNLPBA.ipynb cc[10]; we write parquet dim tables)."""
    vocab.write.mode("overwrite").parquet(f"{base_path}/vocab")
    char_vocab.write.mode("overwrite").parquet(f"{base_path}/char_vocab")
    tag_map.write.mode("overwrite").parquet(f"{base_path}/tag_map")
