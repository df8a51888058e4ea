"""Native C++ tokenizer vs the NumPy reference (exact agreement)."""

import numpy as np
import pytest

from molvax.data import DEFAULT_CHARSET, decode_codes, encode_smiles, synthetic_smiles
from molvax.data.featurize import valid_fraction
from molvax.data.native import (
    decode_codes_native,
    encode_smiles_native,
    native_available,
    valid_fraction_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable; NumPy fallback covers API"
)


def test_fallback_always_works():
    smiles = ["CCO", "c1ccccc1"]
    np.testing.assert_array_equal(
        encode_smiles_native(smiles, max_len=40), encode_smiles(smiles, max_len=40)
    )


@needs_native
def test_encode_matches_numpy():
    smiles = synthetic_smiles(2000, seed=0)
    a = encode_smiles_native(smiles, max_len=120)
    b = encode_smiles(smiles, max_len=120)
    np.testing.assert_array_equal(a, b)


@needs_native
def test_decode_matches_numpy():
    smiles = synthetic_smiles(500, seed=1)
    codes = encode_smiles(smiles, max_len=120)
    assert decode_codes_native(codes) == decode_codes(codes) == smiles


@needs_native
def test_strict_error_still_raised():
    with pytest.raises(ValueError):
        encode_smiles_native(["CC?"], max_len=10, strict=True)


@needs_native
def test_nonstrict_truncates():
    out = encode_smiles_native(["C" * 300], max_len=10, strict=False)
    assert out.shape == (1, 10)
    assert (out != DEFAULT_CHARSET.pad_index).all()


@needs_native
def test_valid_fraction_matches():
    smiles = synthetic_smiles(300, seed=2) + ["CC(O", "CC)O"]
    codes = encode_smiles(smiles, max_len=120)
    a = valid_fraction_native(codes)
    b = valid_fraction(decode_codes(codes))
    assert a == pytest.approx(b)


@needs_native
def test_large_batch_threads():
    smiles = synthetic_smiles(20000, seed=3)
    a = encode_smiles_native(smiles, max_len=120)
    b = encode_smiles(smiles, max_len=120)
    np.testing.assert_array_equal(a, b)
