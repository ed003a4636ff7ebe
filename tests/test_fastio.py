"""Native GMP-backed IO extension: bit parity with the mpmath path."""
import numpy as np
import pytest

import sdpb_tpu.utils.strings as S

pytestmark = pytest.mark.skipif(S._fastio is None,
                                reason="_fastio extension not built")

CASES = [
    "1.84026576313204924668804017173055424905",
    "-3.00837365069652345682749551826475590571757403e-4",
    "0", "1", "-1", "42", "-1e100", "1e-100", "2.5e-300", "-2.5e-300",
    "123456789.987654321",
    "-0.97394529105213056425621030987887856608206859",
    "3.14159265358979323846264338327950288419716939937510582097494459230781640628620899862803482534211706798214808651",
]


@pytest.mark.parametrize("K", [2, 3, 4, 6])
def test_parse_parity_with_mpmath(K):
    native = S.strs_to_limbs(CASES, K, np.float64)
    saved = S._fastio
    try:
        S._fastio = None
        ref = S.strs_to_limbs(CASES, K, np.float64)
    finally:
        S._fastio = saved
    np.testing.assert_array_equal(native, ref)


def test_format_roundtrip():
    K = 4
    limbs = S.strs_to_limbs(CASES, K, np.float64)
    strs = S._fastio.format_limbs(limbs.tobytes(), K, limbs.shape[1], 66)
    back = S.strs_to_limbs(strs, K, np.float64)
    np.testing.assert_array_equal(back, limbs)


def test_parse_errors():
    with pytest.raises(ValueError):
        S._fastio.parse_decimals(["not a number"], 2)
    with pytest.raises(TypeError):
        S._fastio.parse_decimals([3.14], 2)
