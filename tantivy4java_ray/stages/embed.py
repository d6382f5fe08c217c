"""Embedding-computation stage: the model-in-``__init__`` actor-pool shape
a 100 TB corpus embedding pass needs (GPU encoder loaded once per actor,
batched inference per ``__call__``), exercised end-to-end with a
deterministic, SQL-expressible stub encoder so correctness is oracled
without ML dependencies.

The reference has no embedding stage (SURVEY §2.7 class — LLM-pipeline
extension); the actor signature mirrors the stateful-stage contract of
``stages/multimodal.py`` and SURVEY §2.3.

Scale shape: map-only (zero shuffle); the encoder weights live in actor
memory, loaded ONCE per actor by ``__init__`` — never per batch, never on
the driver; output is a ``FixedSizeList<float32, dim>`` column built from
one contiguous buffer per batch (no per-row Python objects). Feed the
output straight into ``semantic_dedup`` / ``build_ivf_index`` /
``topk_cosine`` — they consume exactly this column shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: the stub encoder's dimension (see ``StubEncoder``)
STUB_DIM = 8


class StubEncoder:
    """Deterministic counting encoder — the documented stand-in for a
    neural encoder. Its 8 features are integer-valued (exactly
    representable in float32, so the DuckDB oracle matches bit-for-bit):

    ==  =======================================  =======================
    i   feature                                  ANSI-SQL equivalent
    ==  =======================================  =======================
    0   character count                          ``length(text)``
    1   whitespace-token count                   ``len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> ''))``
    2   occurrences of ``'e'``                   ``length(text) - length(replace(text,'e',''))``
    3   occurrences of ``'a'``                   (same shape)
    4   occurrences of ``' '``                   (same shape)
    5   occurrences of ``'the'``                 ``(length(text) - length(replace(text,'the',''))) / 3``
    6   character count mod 97                   ``length(text) % 97``
    7   constant 1 (bias)                        ``1``
    ==  =======================================  =======================

    Null text encodes as the empty string. "Loading" the encoder is
    instantiation — real encoders do their weight I/O here.
    """

    dim = STUB_DIM

    def encode(self, texts: pa.Array) -> np.ndarray:
        """-> float32 matrix (len(texts), dim), vectorized Arrow kernels."""
        t = pc.fill_null(texts, "")
        n = len(t)
        out = np.empty((n, self.dim), np.float32)
        as_i64 = lambda a: np.asarray(  # noqa: E731
            a.to_numpy(zero_copy_only=False), np.int64)
        nchars = as_i64(pc.utf8_length(t))
        out[:, 0] = nchars
        out[:, 1] = as_i64(pc.count_substring_regex(t, r"\S+"))
        out[:, 2] = as_i64(pc.count_substring(t, "e"))
        out[:, 3] = as_i64(pc.count_substring(t, "a"))
        out[:, 4] = as_i64(pc.count_substring(t, " "))
        out[:, 5] = as_i64(pc.count_substring(t, "the"))
        out[:, 6] = nchars % 97
        out[:, 7] = 1.0
        return out


class EmbedCorpus:
    """Callable-class stage for ``map_batches(EmbedCorpus, concurrency=N,
    batch_size=B, fn_constructor_kwargs=...)``: the encoder is constructed
    ONCE per actor here (the expensive step for a real model — weight
    load, device placement), then every batch reuses it.

    Emits the input's ``id_col`` plus ``emb_col`` as
    ``FixedSizeList<float32, dim>`` (zero per-row Python: one contiguous
    float32 buffer per batch). ``normalize=True`` L2-normalizes rows
    (what cosine consumers want); all-zero rows are left unnormalized
    rather than dividing by zero.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 emb_col: str = "embedding", *, normalize: bool = False,
                 encoder_factory=StubEncoder):
        self.text_col, self.id_col, self.emb_col = text_col, id_col, emb_col
        self.normalize = normalize
        self.encoder = encoder_factory()   # once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        dim = self.encoder.dim
        col = t.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if t.num_rows == 0:
            emb = pa.array([], pa.list_(pa.float32(), dim))
        else:
            M = np.ascontiguousarray(self.encoder.encode(col), np.float32)
            if M.shape != (t.num_rows, dim):
                raise ValueError(
                    f"encoder returned {M.shape}, expected "
                    f"({t.num_rows}, {dim})")
            if self.normalize:
                nrm = np.linalg.norm(M, axis=1, keepdims=True)
                np.divide(M, nrm, out=M, where=nrm != 0)
            flat = pa.Array.from_buffers(
                pa.float32(), t.num_rows * dim,
                [None, pa.py_buffer(M.tobytes())])
            emb = pa.FixedSizeListArray.from_arrays(flat, dim)
        return pa.table({self.id_col: t.column(self.id_col),
                         self.emb_col: emb})


def embed_corpus(ds, text_col: str = "text", id_col: str = "doc_id", *,
                 normalize: bool = False, encoder_factory=StubEncoder,
                 concurrency: int = 4, batch_size: int = 1024):
    """Corpus embedding pass -> Dataset of ``(id_col, embedding)``.

    Up to ``concurrency`` actors each hold one encoder; the pool
    AUTOSCALES from 1 so a pool sized at the cluster's CPU count cannot
    starve the upstream read of a CPU and wedge the pipeline (the
    MinHasher lesson, SCALE.md). Size ``concurrency x batch_size x dim
    x 4 B`` to the worker heap (a real GPU encoder additionally wants
    ``num_gpus=...`` forwarded through ``map_batches`` — same call
    shape)."""
    return ds.map_batches(
        EmbedCorpus, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   normalize=normalize,
                                   encoder_factory=encoder_factory))
