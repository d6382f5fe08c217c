"""Fieldnorm (document length) u8 quantization for BM25.

The reference stores one byte per (doc, text field) holding the quantized
token count (tantivy's FIELDNORM component; enabled per field at
``split/ParquetCompanionConfig.java:452-458``). The quantization contract:
exact for small lengths (0..=40), then geometric buckets with ~12% relative
precision (ratio 9/8), decoded via a 256-entry table; ``fieldnorm_to_id`` is
the largest id whose decoded value is <= the true length.

This table is frozen by ``tests/test_fieldnorm.py`` goldens; BM25 scoring
uses a 256-entry per-field cache of ``k1 * (1 - b + b * decode(id)/avgdl)``
so scoring never touches raw lengths (same trick as tantivy's Bm25Weight).
"""

from __future__ import annotations

import numpy as np

def _build_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint64)
    for i in range(41):
        table[i] = i
    val = 40
    for i in range(41, 256):
        val = max(val + 1, (val * 9) // 8)
        table[i] = val
    return table


#: decode table: FIELD_NORMS_TABLE[id] = representative doc length.
FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(lengths: np.ndarray | int) -> np.ndarray:
    """Quantize token counts to u8 ids (vectorized).

    id = largest index with FIELD_NORMS_TABLE[id] <= length.
    """
    arr = np.asarray(lengths, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, arr, side="right") - 1
    return ids.astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    """Decode u8 ids back to representative token counts (uint64)."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]
