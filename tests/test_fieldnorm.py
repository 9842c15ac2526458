import numpy as np

from tantivy4java_spark.fieldnorm import (
    FIELDNORM_TABLE, fieldnorm_to_id, id_to_fieldnorm, quantized_length)


def test_table_shape_and_monotonic():
    assert FIELDNORM_TABLE.shape == (256,)
    assert (np.diff(FIELDNORM_TABLE) > 0).all()
    assert FIELDNORM_TABLE[0] == 0


def test_small_values_exact():
    # Lucene SmallFloat byte4: 0..39 round-trip exactly
    for n in range(41):
        assert id_to_fieldnorm(fieldnorm_to_id([n]))[0] == n


def test_quantization_rounds_down():
    for n in [41, 43, 100, 1000, 65535, 10**6]:
        q = int(quantized_length([n])[0])
        assert q <= n
        i = int(fieldnorm_to_id([n])[0])
        if i < 255:
            assert FIELDNORM_TABLE[i + 1] > n  # next entry exceeds n


def test_vectorized_matches_scalar():
    ns = np.array([0, 1, 39, 40, 41, 63, 64, 127, 128, 1000, 123456])
    ids = fieldnorm_to_id(ns)
    assert (id_to_fieldnorm(ids) <= ns).all()
    assert (ids >= 0).all() and (ids <= 255).all()
