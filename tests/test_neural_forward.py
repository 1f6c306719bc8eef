"""M1 drop-in: the numpy CombinatorialNER forward (core/neural.py) feeds
EmissionCRFTagger's real Viterbi and runs end-to-end through the Spark
extract DAG.  Weights are seeded (the reference checkpoints are stripped
blobs, so weight parity is impossible); what these tests prove is the
PLUMBING — shapes per the reference architecture, determinism, the
exported-weights override, and span production through
extract_mentions_arrow(tagger=...)."""

import numpy as np

from biomedical_ner_spark.core.neural import NumpyCombinatorialNER
from biomedical_ner_spark.core.tagger import TAGSET, EmissionCRFTagger
from tests.golden import GOLDEN


def _golden_tokens():
    return [s.split() for s, _ in GOLDEN]


def test_emission_shapes_and_determinism():
    model = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7)
    batch = _golden_tokens()
    em1 = model.emissions(batch, len(TAGSET))
    em2 = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7).emissions(
        batch, len(TAGSET))
    assert em1.shape == (len(batch), max(len(b) for b in batch), len(TAGSET))
    assert np.array_equal(em1, em2)
    assert np.isfinite(em1).all()


def test_exported_weights_drop_in():
    """A weights dict of matching shapes overrides the seeded init — the
    export path a real torch checkpoint takes."""
    base = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7)
    override = {"emit_b": np.arange(len(TAGSET), dtype=float)}
    swapped = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7,
                                    weights=override)
    batch = _golden_tokens()
    a = base.emissions(batch, len(TAGSET))
    b = swapped.emissions(batch, len(TAGSET))
    assert np.allclose(b - a, np.arange(len(TAGSET), dtype=float))


def test_neural_tagger_through_extract_dag(spark):
    """End-to-end: golden sentences -> extract_mentions_arrow with the
    neural tagger -> valid BIO spans, deterministic across runs."""
    from biomedical_ner_spark.operators import spans

    model = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7)
    tagger = EmissionCRFTagger(seed=7, emissions_from_tokens=model.emissions)

    # tag_batch plumbing: every tag is from the tagset, lengths match
    batch = _golden_tokens()
    tags = tagger.tag_batch(batch)
    assert [len(t) for t in tags] == [len(b) for b in batch]
    assert all(t in TAGSET for ts in tags for t in ts)

    docs = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(GOLDEN)],
        "doc_id BIGINT, text STRING",
    )
    out1 = spans.extract_mentions_arrow(docs, tagger=tagger)
    rows1 = {(r.doc_id, r.text, r.type, r.start_position, r.end_position)
             for r in out1.collect()}
    rows2 = {(r.doc_id, r.text, r.type, r.start_position, r.end_position)
             for r in spans.extract_mentions_arrow(
                 docs, tagger=tagger).collect()}
    assert rows1 == rows2
    # spans are structurally valid regardless of (random-weight) content
    for r in spans.extract_mentions_arrow(docs, tagger=tagger).collect():
        assert r.tag.startswith("B-")
        assert r.start_position <= r.end_position
        assert len(r.tokens) == r.end_position - r.start_position + 1


def test_fusion_relu_gated_on_dataset_config():
    """Reference fusion branch (models/models.py:117-129): JNLPBA is
    Linear+Dropout (identity in inference), NCBI adds ReLU — the two
    configs must produce different emissions from the same weights."""
    batch = _golden_tokens()
    jn = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7, dataset="jnlpba")
    nc = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7, dataset="ncbi")
    assert not np.array_equal(
        jn.emissions(batch, len(TAGSET)), nc.emissions(batch, len(TAGSET)))
    try:
        NumpyCombinatorialNER(n_tags=len(TAGSET), dataset="bogus")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_unknown_weight_key_raises_value_error():
    try:
        NumpyCombinatorialNER(
            n_tags=len(TAGSET), seed=7,
            weights={"transitions": np.zeros((3, 3))})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "transitions" in str(e)


def test_checkpoint_vocab_maps_drive_embedding_lookup():
    """A real checkpoint's vocab mapping (operators/encode.py shape) must
    select embedding rows by the trained indices: two tokens that collide
    under hashing resolve to distinct rows under the map, and unknown
    tokens hit the <UNK>=1 row."""
    m = NumpyCombinatorialNER(
        n_tags=len(TAGSET), seed=7,
        word_vocab_map={"il-2": 3, "gene": 4}, char_vocab_map={"a": 2})
    word_ids, char_ids, _ = m._ids([["IL-2", "gene", "alpha", "123"]], 4)
    assert list(word_ids[0]) == [3, 4, 1, 2]  # digit -> <NUM>=2 pre-lookup
    assert char_ids[0, 2, 0] == 2  # 'a' mapped
    assert char_ids[0, 2, 1] == 1  # 'l' not in char map -> UNK


def test_npz_transitions_restore_crf_decode(tmp_path):
    """S5: a 'transitions' array in the .npz must land on the tagger's CRF
    (not the emission net) and change decode accordingly."""
    from biomedical_ner_spark.core.tagger import (
        load_numpy_tagger,
        save_numpy_checkpoint,
    )

    src = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=3)
    k = len(TAGSET)
    trans = -10.0 * np.ones((k, k), dtype=np.float32)
    np.fill_diagonal(trans, 10.0)  # strongly sticky transitions
    path = str(tmp_path / "ckpt_crf.npz")
    save_numpy_checkpoint({**src.w, "transitions": trans}, path)
    tagger = load_numpy_tagger(path, seed=3)
    assert np.array_equal(tagger.transitions, trans)
    batch = _golden_tokens()
    assert [len(t) for t in tagger.tag_batch(batch)] == \
        [len(b) for b in batch]


def test_numpy_checkpoint_roundtrip(tmp_path):
    """S5: save a weight archive, load it into a tagger, and the loaded
    model's emissions must equal the source model's exactly."""
    from biomedical_ner_spark.core.tagger import (
        load_numpy_tagger,
        save_numpy_checkpoint,
    )

    src = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=3)
    path = str(tmp_path / "ckpt.npz")
    save_numpy_checkpoint(src.w, path)
    tagger = load_numpy_tagger(path, seed=3)
    batch = _golden_tokens()
    em_loaded = tagger.emissions_from_tokens(batch, len(TAGSET))
    em_src = src.emissions(batch, len(TAGSET))
    assert np.array_equal(em_loaded, em_src)
    tags = tagger.tag_batch(batch)
    assert [len(t) for t in tags] == [len(b) for b in batch]


def test_ncbi_kernels_derived_from_dataset_config():
    """models/models.py:101: NCBI uses CharCNN kernels (2, 3, 4) vs
    JNLPBA's (3, 5, 7).  kernels=None derives the set from the dataset
    flag, so an NCBI checkpoint's CNN weights shape-validate through
    load_numpy_tagger(dataset='ncbi') with no separate kernel override."""
    import tempfile

    from biomedical_ner_spark.core.tagger import (
        load_numpy_tagger,
        save_numpy_checkpoint,
    )

    jn = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7, dataset="jnlpba")
    nc = NumpyCombinatorialNER(n_tags=len(TAGSET), seed=7, dataset="ncbi")
    assert jn.kernels == (3, 5, 7)
    assert nc.kernels == (2, 3, 4)
    assert set(nc.w) - set(jn.w) == {"cnn2_W", "cnn2_b", "cnn4_W", "cnn4_b"}
    # explicit kernels still win over the dataset default
    custom = NumpyCombinatorialNER(
        n_tags=len(TAGSET), seed=7, dataset="ncbi", kernels=(3,))
    assert custom.kernels == (3,)
    # an "NCBI checkpoint" (the ncbi model's own weight dict) round-trips
    # through the loader without shape/key errors, and its emissions match
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/ncbi.npz"
        save_numpy_checkpoint(nc.w, path)
        tagger = load_numpy_tagger(path, seed=7, dataset="ncbi")
        batch = _golden_tokens()
        got = tagger.emissions_from_tokens(batch, len(TAGSET))
        np.testing.assert_array_equal(got, nc.emissions(batch, len(TAGSET)))
