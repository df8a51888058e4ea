import numpy as np
import pytest

from molvax.data import Charset, DEFAULT_CHARSET, PAD_CHAR


def test_default_charset_invariants():
    cs = DEFAULT_CHARSET
    assert cs.chars[0] == PAD_CHAR
    assert cs.pad_index == 0
    assert 30 <= cs.size <= 40  # "~35-token charset" (BASELINE.json:7)
    assert len(set(cs.chars)) == cs.size


def test_tables_roundtrip():
    cs = DEFAULT_CHARSET
    enc, dec = cs.encode_table(), cs.decode_table()
    for i, c in enumerate(cs.chars):
        assert enc[ord(c)] == i
        assert dec[i] == ord(c)


def test_from_corpus():
    cs = Charset.from_corpus(["CCO", "c1ccccc1", "CC(=O)N"])
    assert cs.chars[0] == PAD_CHAR
    for ch in "CO()=Nc1":
        assert ch in cs


def test_from_list_pad_handling():
    cs = Charset.from_list([" ", "C", "N"])
    assert cs.chars == (" ", "C", "N")
    cs2 = Charset.from_list(["C", "N"])  # pad prepended
    assert cs2.chars == (" ", "C", "N")
    with pytest.raises(ValueError):
        Charset.from_list(["C", " ", "N"])  # pad at nonzero index


def test_duplicate_rejected():
    with pytest.raises(ValueError):
        Charset(chars=(" ", "C", "C"))


def test_bytes_charset_from_h5_style():
    cs = Charset.from_list([b" ", b"C", b"c", b"1"])
    assert cs.chars == (" ", "C", "c", "1")
