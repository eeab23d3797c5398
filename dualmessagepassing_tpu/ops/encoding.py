"""Host-side integer encodings (numpy-vectorized; replaces numba JIT kernels).

Reference: /root/reference/SubgraphCountingMatching/models/embed.py:8-101
(`_get_enc_len`, `_int2anybase`, `_int2multihot` — numba kernels). These run
in the input pipeline on CPU; here they are vectorized numpy (no Python loop
over elements), which is both simpler and as fast for the batch sizes
involved. The encoding tables consumed on-device are built once and frozen.

Semantics preserved exactly:
  * `get_enc_len(x, base)`  — number of base-`base` digits of x (min 1).
  * `int2multihot(x, l, base)` — l blocks of size `base`, most-significant
    digit first; leading blocks one-hot at digit 0; value taken mod base**l.
"""

from __future__ import annotations

import numpy as np


def get_enc_len(x, base: int = 10):
    """Digit count of x in base `base` (elementwise; min 1)."""
    scalar = np.isscalar(x)
    arr = np.atleast_1d(np.asarray(x, dtype=np.int64))
    out = np.ones_like(arr)
    n = np.abs(arr.copy())
    cnt = np.zeros_like(arr)
    while True:
        nz = n > 0
        if not nz.any():
            break
        cnt[nz] += 1
        n = n // base
    out = np.maximum(cnt, 1)
    return int(out[0]) if scalar else out.reshape(np.shape(x))


def int2anybase(x, len_x: int, base: int = 10) -> np.ndarray:
    """Base-`base` digits of x (most-significant first), shape [..., len_x]."""
    scalar = np.isscalar(x)
    arr = np.atleast_1d(np.asarray(x, dtype=np.int64)).reshape(-1)
    arr = arr % (base ** len_x)
    digits = np.zeros((arr.shape[0], len_x), dtype=np.int64)
    for pos in range(len_x - 1, -1, -1):
        digits[:, pos] = arr % base
        arr = arr // base
    if scalar:
        return digits[0]
    return digits.reshape(np.shape(x) + (len_x,))


def int2multihot(x, len_x: int, base: int = 10) -> np.ndarray:
    """Multi-hot digit encoding: shape [..., len_x * base].

    Block k (of size `base`) is the one-hot of digit k (most-significant
    first) — identical layout to the reference numba kernel
    (embed.py:75-87, digits written from the tail, leading zeros one-hot).
    """
    digits = int2anybase(x, len_x, base)
    flat = digits.reshape(-1, len_x)
    n = flat.shape[0]
    rep = np.zeros((n, len_x, base), dtype=np.int64)
    rows = np.repeat(np.arange(n), len_x)
    cols = np.tile(np.arange(len_x), n)
    rep[rows, cols, flat.reshape(-1)] = 1
    rep = rep.reshape(n, len_x * base)
    if np.isscalar(x):
        return rep[0]
    return rep.reshape(np.shape(x) + (len_x * base,))


def multihot_table(max_n: int, base: int = 2) -> np.ndarray:
    """Frozen [max_n, enc_len*base] float32 encoding table.

    Matches `MultihotEmbedding.__init__` (embed.py:197-208): rows are
    int2multihot(0..max_n-1) with enc_len = get_enc_len(max_n-1, base).
    """
    enc_len = get_enc_len(max_n - 1, base)
    return int2multihot(np.arange(max_n), enc_len, base).astype(np.float32)


def position_table(embedding_dim: int, max_len: int = 512, scale: float = 1.0) -> np.ndarray:
    """Frozen sinusoidal position table [max_len, embedding_dim].

    Matches `PositionEmbedding.__init__` (embed.py:211-222):
    inv_freq = 10000^(-2i/d); rows = [sin(p*w) || cos(p*w)] * scale.
    """
    freq_seq = np.arange(0, embedding_dim, 2.0, dtype=np.float64)
    inv_freq = 1.0 / np.power(10000.0, freq_seq / embedding_dim)
    sinusoid = np.outer(np.arange(0, max_len, 1.0), inv_freq)
    return (np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1) * scale).astype(
        np.float32
    )
