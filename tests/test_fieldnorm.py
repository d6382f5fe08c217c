import numpy as np

from tantivy4java_ray.fieldnorm import (
    FIELD_NORMS_TABLE, fieldnorm_to_id, id_to_fieldnorm,
)


def test_exact_small_values():
    # exact representation up to 40 tokens
    for n in range(41):
        assert id_to_fieldnorm(fieldnorm_to_id(n)) == n


def test_table_monotonic():
    assert np.all(np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0)


def test_quantization_floor_contract():
    # id = largest index with table[id] <= value
    lens = np.array([0, 1, 40, 41, 45, 46, 100, 1000, 10**6, 2**31], np.uint64)
    ids = fieldnorm_to_id(lens)
    dec = id_to_fieldnorm(ids).astype(np.uint64)
    assert np.all(dec <= lens)
    bigger = ids.astype(np.int64) + 1
    ok = bigger < 256
    assert np.all(FIELD_NORMS_TABLE[bigger[ok]].astype(np.uint64) > lens[ok])


def test_relative_precision():
    # ~12% relative precision above 40 (ratio 9/8 buckets)
    lens = np.arange(41, 200000, 17, dtype=np.uint64)
    dec = id_to_fieldnorm(fieldnorm_to_id(lens)).astype(np.float64)
    rel = (lens - dec) / lens
    assert rel.max() < 0.125


def test_golden_head_of_table():
    assert list(FIELD_NORMS_TABLE[:44]) == list(range(41)) + [45, 50, 56]
