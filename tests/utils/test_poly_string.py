"""poly_to_string parity (ref test: included in test/utils semantics of
src/utils/poly_to_string.{h,cu})."""

import numpy as np

from troy_tpu.utils.poly_string import (
    uint_to_hex_string, uint_to_dec_string,
    poly_to_hex_string, poly_to_dec_string,
)


def test_uint_strings():
    assert uint_to_hex_string(0) == "0"
    assert uint_to_hex_string(255) == "FF"
    assert uint_to_hex_string(2 ** 64 + 5) == "10000000000000005"
    assert uint_to_dec_string(12345) == "12345"


def test_poly_hex_rendering():
    # 1 + 2x + 255x^3, degree-0 first
    assert poly_to_hex_string([1, 2, 0, 255]) == "FFx^3 + 2x^1 + 1"
    assert poly_to_hex_string([0, 0]) == "0"
    assert poly_to_hex_string(np.array([7], dtype=np.uint64)) == "7"


def test_poly_dec_rendering():
    assert poly_to_dec_string([10, 0, 3]) == "3x^2 + 10"


def test_rejects_bad_input():
    import pytest

    with pytest.raises(ValueError):
        poly_to_hex_string(np.zeros((2, 2)))
    with pytest.raises(ValueError):
        uint_to_hex_string(-1)
