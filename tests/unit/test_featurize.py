import jax.numpy as jnp
import numpy as np
import pytest

from molvax.data import (
    DEFAULT_CHARSET,
    argmax_codes,
    decode_codes,
    encode_smiles,
    one_hot,
    one_hot_to_smiles,
    smiles_to_one_hot,
    valid_fraction,
)

SMILES = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C[C@H](N)C(=O)O"]


def test_roundtrip_codes():
    codes = encode_smiles(SMILES, max_len=120)
    assert codes.shape == (4, 120)
    assert codes.dtype == np.uint8
    assert decode_codes(codes) == SMILES


def test_roundtrip_one_hot():
    x = smiles_to_one_hot(SMILES, max_len=120)
    assert x.shape == (4, 120, DEFAULT_CHARSET.size)
    np.testing.assert_allclose(np.asarray(x.sum(-1)), 1.0)  # rows one-hot
    assert one_hot_to_smiles(x) == SMILES


def test_padding_is_pad_code():
    codes = encode_smiles("CCO", max_len=10)
    assert list(codes[0, :3]) != [0, 0, 0]
    assert (codes[0, 3:] == DEFAULT_CHARSET.pad_index).all()


def test_strict_rejects_unknown_and_long():
    with pytest.raises(ValueError):
        encode_smiles("CC?", max_len=10)
    with pytest.raises(ValueError):
        encode_smiles("C" * 11, max_len=10)
    # non-strict truncates
    codes = encode_smiles("C" * 11, max_len=10, strict=False)
    assert codes.shape == (1, 10)


def test_argmax_codes_inverse():
    codes = jnp.asarray(encode_smiles(SMILES, max_len=60))
    x = one_hot(codes, DEFAULT_CHARSET.size)
    np.testing.assert_array_equal(np.asarray(argmax_codes(x)), np.asarray(codes))


def test_valid_fraction():
    assert valid_fraction(["CCO", "c1ccccc1"]) == 1.0
    assert valid_fraction(["CC(O", ""]) == 0.0
    assert valid_fraction(["CCO", "CC)O"]) == 0.5
