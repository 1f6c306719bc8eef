"""M1 drop-in: a pure-numpy forward of the reference's CombinatorialNER
architecture (models/models.py:75-193) with seeded exported weights.

The reference repo ships its torch checkpoints as stripped blobs
(.MISSING_LARGE_BLOBS), so exact weight parity is impossible by
construction.  What CAN be proven — and what this module proves — is the
drop-in path: the full architecture (word embedding + CharCNN k in {3,5,7}
+ CharBiLSTM + FC fusion + context BiLSTM + Manhattan attention + emission
layer, models/models.py:75-193) implemented as an inference-mode numpy
forward whose emissions feed core.tagger.EmissionCRFTagger's real Viterbi
decode, running end-to-end through the same Spark extract DAG
(spans.extract_mentions_arrow(tagger=...)).  A real checkpoint drops in by
replacing the seeded weight dict with exported torch tensors — every shape
matches the reference layer for layer (inference mode: dropout = identity).
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm(x: np.ndarray, Wi: np.ndarray, Wh: np.ndarray, b: np.ndarray,
          reverse: bool = False) -> np.ndarray:
    """Single-direction LSTM over [N, T, D] -> [N, T, H]; torch gate order
    (i, f, g, o)."""
    N, T, _ = x.shape
    H = Wh.shape[0]
    h = np.zeros((N, H))
    c = np.zeros((N, H))
    out = np.zeros((N, T, H))
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        z = x[:, t] @ Wi + h @ Wh + b
        i, f, g, o = np.split(z, 4, axis=1)
        i, f, o = _sigmoid(i), _sigmoid(f), _sigmoid(o)
        g = np.tanh(g)
        c = f * c + i * g
        h = o * np.tanh(c)
        out[:, t] = h
    return out


def _bilstm(x: np.ndarray, w: dict, prefix: str) -> np.ndarray:
    fwd = _lstm(x, w[f"{prefix}_Wi_f"], w[f"{prefix}_Wh_f"],
                w[f"{prefix}_b_f"])
    bwd = _lstm(x, w[f"{prefix}_Wi_b"], w[f"{prefix}_Wh_b"],
                w[f"{prefix}_b_b"], reverse=True)
    return np.concatenate([fwd, bwd], axis=-1)


class NumpyCombinatorialNER:
    """Inference-mode numpy twin of CombinatorialNER (JNLPBA config:
    CharCNN kernels 3/5/7, word_embed 200, lstm_hidden 256, fusion 200).

    Weights are seeded standard-normal (scaled 1/sqrt(fan_in)) unless a
    ``weights`` dict of identically-shaped arrays is supplied — the export
    format a real torch checkpoint converts into.

    ``dataset`` mirrors the reference's per-dataset config
    (models/models.py:101, 117-129): the JNLPBA config's FC fusion is
    Linear+Dropout only (identity here, inference mode) with CharCNN
    kernels (3, 5, 7); the NCBI config adds a ReLU and switches the
    kernels to (2, 3, 4).  ``kernels=None`` (the default) derives the
    kernel set from ``dataset`` so a real NCBI checkpoint's CNN shapes
    validate without a separate override; passing kernels explicitly
    still wins.

    ``word_vocab_map`` / ``char_vocab_map`` (token -> row, char -> row)
    plug in a real checkpoint's vocabulary so embedding rows are looked
    up by the trained indices (the operators/encode.py mappings);
    without them, ids fall back to md5/ord hashing — fine for the
    seeded demo, wrong for real exported weights.
    """

    def __init__(self, n_tags: int, seed: int = 42,
                 word_vocab: int = 4096, char_vocab: int = 128,
                 word_dim: int = 200, char_dim: int = 50,
                 char_filters: int = 32,
                 kernels: Sequence[int] | None = None,
                 char_hidden: int = 50, fusion_dim: int = 200,
                 lstm_hidden: int = 256, max_word_len: int = 20,
                 weights: dict[str, np.ndarray] | None = None,
                 dataset: str = "jnlpba",
                 word_vocab_map: dict[str, int] | None = None,
                 char_vocab_map: dict[str, int] | None = None):
        if dataset not in ("jnlpba", "ncbi"):
            raise ValueError(f"unknown dataset config: {dataset!r}")
        if kernels is None:  # per-dataset CharCNN kernels (models.py:101)
            kernels = (2, 3, 4) if dataset == "ncbi" else (3, 5, 7)
        self.n_tags = n_tags
        self.word_vocab = word_vocab
        self.char_vocab = char_vocab
        self.kernels = tuple(kernels)
        self.max_word_len = max_word_len
        self.fusion_relu = dataset == "ncbi"
        self.word_vocab_map = word_vocab_map
        self.char_vocab_map = char_vocab_map
        rng = np.random.default_rng(seed)

        def mk(*shape: int) -> np.ndarray:
            fan = shape[0] if len(shape) > 1 else 1
            return rng.standard_normal(shape) / np.sqrt(max(fan, 1))

        char_out = char_filters * len(kernels) + 2 * char_hidden
        combined = word_dim + char_out
        H = lstm_hidden // 2  # per direction, like nn.LSTM(bidirectional)
        w = {
            "word_emb": mk(word_vocab, word_dim),
            "char_emb": mk(char_vocab, char_dim),
            # CharCNN: one (k, char_dim, filters) kernel + bias per k
            **{f"cnn{k}_W": mk(k * char_dim, char_filters).reshape(
                k, char_dim, char_filters) for k in kernels},
            **{f"cnn{k}_b": np.zeros(char_filters) for k in kernels},
            # CharBiLSTM (hidden 50 per direction)
            "char_Wi_f": mk(char_dim, 4 * char_hidden),
            "char_Wh_f": mk(char_hidden, 4 * char_hidden),
            "char_b_f": np.zeros(4 * char_hidden),
            "char_Wi_b": mk(char_dim, 4 * char_hidden),
            "char_Wh_b": mk(char_hidden, 4 * char_hidden),
            "char_b_b": np.zeros(4 * char_hidden),
            # FC fusion (combined -> 200); ReLU only in the NCBI config
            "fusion_W": mk(combined, fusion_dim),
            "fusion_b": np.zeros(fusion_dim),
            # context BiLSTM (fusion_dim -> lstm_hidden)
            "ctx_Wi_f": mk(fusion_dim, 4 * H),
            "ctx_Wh_f": mk(H, 4 * H),
            "ctx_b_f": np.zeros(4 * H),
            "ctx_Wi_b": mk(fusion_dim, 4 * H),
            "ctx_Wh_b": mk(H, 4 * H),
            "ctx_b_b": np.zeros(4 * H),
            # Manhattan attention (W: [lstm_hidden] -> scalar) + projection
            "attn_W": mk(lstm_hidden, 1),
            "proj_W": mk(2 * lstm_hidden, lstm_hidden),
            "proj_b": np.zeros(lstm_hidden),
            # emission layer
            "emit_W": mk(lstm_hidden, n_tags),
            "emit_b": np.zeros(n_tags),
        }
        # padding_idx=0 embeddings are zero, like nn.Embedding(padding_idx=0)
        w["word_emb"][0] = 0.0
        w["char_emb"][0] = 0.0
        if weights is not None:
            unknown = sorted(set(weights) - set(w))
            if unknown:
                raise ValueError(
                    f"unknown weight keys {unknown}; expected a subset of "
                    f"{sorted(w)} (note: CRF 'transitions' belongs to "
                    "EmissionCRFTagger, not the emission network)")
            for k_, v in weights.items():
                if w[k_].shape != v.shape:
                    raise ValueError(
                        f"shape mismatch for {k_}: checkpoint {v.shape} "
                        f"vs architecture {w[k_].shape}")
                w[k_] = v
        self.w = w

    # --- encoders ---------------------------------------------------------

    def _ids(self, batch: Sequence[Sequence[str]], max_len: int
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        B, W = len(batch), self.max_word_len
        word_ids = np.zeros((B, max_len), dtype=np.int64)
        char_ids = np.zeros((B, max_len, W), dtype=np.int64)
        mask = np.zeros((B, max_len), dtype=bool)
        wmap, cmap = self.word_vocab_map, self.char_vocab_map
        for i, toks in enumerate(batch):
            for j, tok in enumerate(toks[:max_len]):
                if wmap is not None:
                    # checkpoint vocab: the encode_tokens rules — digit
                    # tokens hit <NUM>=2 BEFORE vocab lookup (app.py:229),
                    # misses hit <UNK>=1
                    if tok.isdigit():
                        word_ids[i, j] = wmap.get("<NUM>", 2)
                    else:
                        word_ids[i, j] = wmap.get(tok.lower(), 1)
                else:
                    h = hashlib.md5(tok.lower().encode()).digest()
                    word_ids[i, j] = (
                        int.from_bytes(h[:4], "big") % self.word_vocab)
                mask[i, j] = True
                for c_i, ch in enumerate(tok[:W]):
                    if cmap is not None:
                        char_ids[i, j, c_i] = cmap.get(ch, 1)
                    else:
                        char_ids[i, j, c_i] = (
                            ord(ch) % (self.char_vocab - 1)) + 1
        return word_ids, char_ids, mask

    def _char_cnn(self, ce: np.ndarray) -> np.ndarray:
        """[N, W, D] -> [N, filters * len(kernels)] (relu conv + max-pool,
        'same' padding k//2 like nn.Conv1d(padding=k//2))."""
        N, W, D = ce.shape
        feats = []
        for k in self.kernels:
            pad = k // 2
            padded = np.zeros((N, W + 2 * pad, D))
            padded[:, pad:pad + W] = ce
            # windows: [N, W_out, k, D] via stride tricks-free gather
            conv = np.zeros((N, W + 2 * pad - k + 1,
                             self.w[f"cnn{k}_b"].size))
            for off in range(k):
                conv += np.einsum(
                    "nwd,df->nwf",
                    padded[:, off:off + conv.shape[1]],
                    self.w[f"cnn{k}_W"][off],
                )
            conv = np.maximum(conv + self.w[f"cnn{k}_b"], 0.0)
            feats.append(conv.max(axis=1))
        return np.concatenate(feats, axis=-1)

    # --- forward ----------------------------------------------------------

    def emissions(self, batch: Sequence[Sequence[str]],
                  n_tags: int) -> np.ndarray:
        """[B, T, K] emissions — EmissionCRFTagger's emissions_from_tokens
        contract."""
        assert n_tags == self.n_tags
        max_len = max((len(b) for b in batch), default=1) or 1
        word_ids, char_ids, mask = self._ids(batch, max_len)
        B, T = word_ids.shape
        w = self.w

        we = w["word_emb"][word_ids]                       # [B, T, 200]
        ce = w["char_emb"][char_ids.reshape(B * T, -1)]    # [B*T, W, 50]
        cnn = self._char_cnn(ce).reshape(B, T, -1)         # [B, T, 96]
        clstm = _bilstm(ce, w, "char").max(axis=1).reshape(B, T, -1)
        combined = np.concatenate([we, cnn, clstm], axis=-1)

        fused = combined @ w["fusion_W"] + w["fusion_b"]
        if self.fusion_relu:  # NCBI fusion branch (models/models.py:117-129)
            fused = np.maximum(fused, 0.0)
        h = _bilstm(fused, w, "ctx")                       # [B, T, 256]

        # Manhattan attention (models/models.py:58-72): score(i, j) =
        # -(attn_W . h_j) * L1(h_i, h_j), softmax over j, ctx concat
        dist = np.abs(h[:, :, None, :] - h[:, None, :, :]).sum(-1)
        gate = (h @ w["attn_W"]).squeeze(-1)               # [B, T]
        score = -gate[:, None, :] * dist                   # [B, T, T]
        score = np.where(mask[:, None, :], score, -1e9)
        score = score - score.max(axis=-1, keepdims=True)
        alpha = np.exp(score)
        alpha = alpha / alpha.sum(axis=-1, keepdims=True)
        ctx = alpha @ h
        h = np.concatenate([h, ctx], axis=-1) @ w["proj_W"] + w["proj_b"]

        return h @ w["emit_W"] + w["emit_b"]               # [B, T, K]
