"""SMILES featurization: string <-> uint8 codes <-> on-device one-hot.

Reference parity: the reference ships 120-char right-padded SMILES one-hot
encoded to float arrays *offline* into an .h5 file, then streams float batches
host->device (SURVEY.md sections 2.2, 3.5).

TPU-native design: the expensive representation change (one-hot to float) is
moved on-device and jit-compiled. Hosts only ever handle (N, T) uint8 code
arrays - a 4*C x smaller host->device transfer (C ~ 35) - and `one_hot` fuses
into the first encoder conv under jit. Decode (argmax -> string) mirrors the
reference's `decode_smiles_from_indexes`.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .charset import Charset, DEFAULT_CHARSET

Array = jax.Array


# --------------------------------------------------------------------------
# Host side: strings -> uint8 codes (numpy, vectorized over raw bytes)
# --------------------------------------------------------------------------

def encode_smiles(
    smiles: Union[str, Sequence[str]],
    charset: Charset = DEFAULT_CHARSET,
    max_len: int = 120,
    strict: bool = True,
) -> np.ndarray:
    """Encode SMILES string(s) to (N, max_len) uint8 charset codes.

    Right-pads with the pad code (0); truncation is an error under
    ``strict`` (the reference assumes pre-filtered corpora of length<=120).
    """
    if isinstance(smiles, str):
        smiles = [smiles]
    table = charset.encode_table()
    known = np.zeros(256, dtype=bool)
    for c in charset.chars:
        known[ord(c)] = True

    out = np.zeros((len(smiles), max_len), dtype=np.uint8)
    for i, s in enumerate(smiles):
        if len(s) > max_len:
            if strict:
                raise ValueError(f"SMILES longer than max_len={max_len}: {s!r}")
            s = s[:max_len]
        b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        if strict and not known[b].all():
            bad = sorted({chr(x) for x in b[~known[b]]})
            raise ValueError(f"SMILES chars not in charset: {bad} in {s!r}")
        out[i, : len(b)] = table[b]
    return out


def decode_codes(
    codes: Union[np.ndarray, Array],
    charset: Charset = DEFAULT_CHARSET,
) -> List[str]:
    """Inverse featurizer: (N, T) integer codes -> SMILES strings.

    Mirrors the reference's ``decode_smiles_from_indexes`` (SURVEY.md 2.2):
    map indices to chars, then strip padding. Padding is stripped anywhere in
    the string (a pad emitted mid-sequence by the model terminates nothing -
    the reference's argmax decode simply drops pad chars on join, and we
    follow suit for parity).
    """
    codes = np.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None]
    dec = charset.decode_table()
    out = []
    for row in codes:
        s = dec[row].tobytes().decode("ascii")
        out.append(s.replace(charset.chars[charset.pad_index], ""))
    return out


# --------------------------------------------------------------------------
# Device side: codes -> one-hot (jit-compiled; fuses into the encoder)
# --------------------------------------------------------------------------

def one_hot(codes: Array, charset_size: int, dtype=jnp.float32) -> Array:
    """(..., T) integer codes -> (..., T, C) one-hot. Runs on device under
    jit; XLA fuses this into the consumer so no (B, T, C) float array ever
    crosses the host->device boundary."""
    return jax.nn.one_hot(codes, charset_size, dtype=dtype)


def argmax_codes(probs_or_logits: Array) -> Array:
    """(..., T, C) -> (..., T) greedy codes (inverse of one_hot up to ties)."""
    return jnp.argmax(probs_or_logits, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Round-trip convenience (tests, notebooks)
# --------------------------------------------------------------------------

def smiles_to_one_hot(
    smiles: Union[str, Sequence[str]],
    charset: Charset = DEFAULT_CHARSET,
    max_len: int = 120,
    dtype=jnp.float32,
) -> Array:
    codes = encode_smiles(smiles, charset, max_len)
    return one_hot(jnp.asarray(codes), charset.size, dtype=dtype)


def one_hot_to_smiles(
    x: Array, charset: Charset = DEFAULT_CHARSET
) -> List[str]:
    return decode_codes(argmax_codes(x), charset)


def is_valid_smiles(s: str, charset: Charset = DEFAULT_CHARSET) -> bool:
    """Grammar-level validity heuristic (no RDKit available offline - see
    SURVEY.md section 7): charset membership + balanced ()/[] + no empty
    string."""
    if not s or any(c not in charset for c in s):
        return False
    depth = 0
    sq = 0
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "[":
            sq += 1
        elif c == "]":
            sq -= 1
        if depth < 0 or sq < 0 or sq > 1:
            return False
    return depth == 0 and sq == 0


def valid_fraction(smiles: Iterable[str], charset: Charset = DEFAULT_CHARSET) -> float:
    """Fraction of strings passing ``is_valid_smiles``. Used by sampling
    metrics."""
    n = 0
    ok = 0
    for s in smiles:
        n += 1
        if is_valid_smiles(s, charset):
            ok += 1
    return ok / max(n, 1)
