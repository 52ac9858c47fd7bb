"""Shared content-hashing kernels.

blake2b (NOT md5) everywhere a hash decides identity: web text is
adversarial input, and md5 chosen-prefix collisions would let an
attacker alias two distinct documents/spans (the curate.py exact-dedup
rationale). 128 bits makes chance collisions impossible at any corpus
size; the two-int64 split exists because Arrow/Ray shuffle int64
columns zero-copy while 16-byte binaries do not."""

from __future__ import annotations

import hashlib

import numpy as np


def digest128_cols(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """blake2b-128 of each string as two int64 arrays (h1 = first 8
    bytes little-endian, h2 = last 8). None hashes as the empty
    string. The single definition of the cross-pipeline digest
    contract — span dedup, the incremental digest index, and any
    future digest-keyed operator must agree byte-for-byte."""
    h1 = np.empty(len(texts), dtype=np.uint64)
    h2 = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.blake2b((t or "").encode("utf-8"),
                            digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1.view(np.int64), h2.view(np.int64)
