"""Host-side salted string hashing.

XLA has no string dtype, so the reference's in-graph `Hashing(salt)` layers
(preprocess_layers.py:79-106) move into the input pipeline: raw strings are
hashed on the host with two independent salted 64-bit hashes ("double
hashing" for collision resistance) and only int32 bucket ids reach the
device. Config semantics are preserved: `deal=hashing` + bucket size +
Variables.seeds.

A C++ batch hasher (native/) accelerates this when built; the Python path
(blake2b, C-speed inside hashlib) is always available and is the
deterministic ground truth both implementations must match.
"""
from __future__ import annotations

import hashlib
from typing import Iterable, List, Sequence, Union

import numpy as np

_MASK63 = (1 << 63) - 1


def hash64(value: Union[str, bytes], seed: int) -> int:
    """Deterministic salted 64-bit hash of a string (non-negative)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    salt = int(seed).to_bytes(8, "little", signed=False)
    digest = hashlib.blake2b(value, digest_size=8, salt=salt).digest()
    return int.from_bytes(digest, "little") & _MASK63


def hash_bucket(value: Union[str, bytes], seed: int, num_bins: int) -> int:
    """Bucket id in [0, num_bins) for one string."""
    return hash64(value, seed) % num_bins


def hash_bucket_array(values: Sequence[Union[str, bytes]],
                      seed: int,
                      num_bins: int) -> np.ndarray:
    """Vectorized bucketing of a flat list of strings -> int64 [n]."""
    salt = int(seed).to_bytes(8, "little", signed=False)
    out = np.empty(len(values), dtype=np.int64)
    blake2b = hashlib.blake2b
    from_bytes = int.from_bytes
    for i, v in enumerate(values):
        if isinstance(v, str):
            v = v.encode("utf-8")
        h = from_bytes(blake2b(v, digest_size=8, salt=salt).digest(), "little")
        out[i] = (h & _MASK63) % num_bins
    return out


def normalize_seeds(seeds: Union[int, Sequence[int], None],
                    num_hashes: int = 2) -> List[int]:
    """Expand a scalar seed into `num_hashes` distinct salts.

    Mirrors the reference convention (preprocess_layers.py:88: [s, s+7])
    while accepting explicit lists from Variables.seeds.
    """
    if seeds is None:
        seeds = 0
    if isinstance(seeds, int):
        return [seeds + 7 * i for i in range(num_hashes)]
    seeds = list(seeds)
    if len(seeds) < num_hashes:
        seeds = seeds + [seeds[-1] + 7 * (i + 1) for i in range(num_hashes - len(seeds))]
    return seeds[:num_hashes]
