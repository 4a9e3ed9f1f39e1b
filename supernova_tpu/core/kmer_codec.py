"""48-mer codec: pack / reverse-complement / canonicalize / lex-sort / search.

TPU-native analogue of the reference's Kmer/Lmer primitives
(lib/tada/src/kmer/mod.rs:27-52 — K=48, 2-bit packed) and KMer<K>
(lib/assembly/src/kmers/KMer.h).  A 48-mer is 96 bits, stored as 3 uint32
words of 16 bases each, base-big-endian within each word so that
lexicographic (w0,w1,w2) order == lexicographic base order with A<C<G<T.

Everything here is jnp, static-shape, jit-friendly.  Invalid slots use the
all-ones sentinel, which can never be a *canonical* kmer (its rc would be
all-zeros, strictly smaller), so sentinels sort after all real kmers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

K = 48
BASES_PER_WORD = 16
KWORDS = K // BASES_PER_WORD  # 3
U32 = jnp.uint32
SENTINEL = np.uint32(0xFFFFFFFF)


# ------------------------------------------------------------------ packing

def sliding_words(codes, n: int):
    """Packed kmer words at every start position.

    codes: (M,) integer array of base codes 0..3, M >= n + K - 1 (pad with
    zeros on the host; validity of positions is the caller's concern).
    Returns (n, 3) uint32: words of the 48-mer starting at each position.

    Built from 48 static shifted slices (shift-or), which XLA fuses into a
    single elementwise loop — the Pallas kernel in ops/pallas replaces this
    on the hot path.
    """
    c = jnp.asarray(codes).astype(U32)
    words = []
    for w in range(KWORDS):
        acc = jnp.zeros((n,), U32)
        for i in range(BASES_PER_WORD):
            off = w * BASES_PER_WORD + i
            acc = (acc << np.uint32(2)) | jax.lax.dynamic_slice(c, (off,), (n,))
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _rev16(w):
    """Reverse the 16 2-bit base fields within each uint32 word."""
    w = ((w & np.uint32(0x33333333)) << np.uint32(2)) | (
        (w >> np.uint32(2)) & np.uint32(0x33333333)
    )
    w = ((w & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (w >> np.uint32(4)) & np.uint32(0x0F0F0F0F)
    )
    w = ((w & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (w >> np.uint32(8)) & np.uint32(0x00FF00FF)
    )
    w = (w << np.uint32(16)) | (w >> np.uint32(16))
    return w


def rc_words(words):
    """Reverse complement: (N,3) -> (N,3). Complement is bitwise NOT."""
    w = ~jnp.asarray(words)
    return jnp.stack([_rev16(w[..., 2]), _rev16(w[..., 1]), _rev16(w[..., 0])], axis=-1)


def lex_lt(a, b):
    """a < b lexicographically over the 3 words; (N,3)x(N,3) -> (N,) bool."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    return (a0 < b0) | ((a0 == b0) & ((a1 < b1) | ((a1 == b1) & (a2 < b2))))


def lex_eq(a, b):
    return jnp.all(a == b, axis=-1)


def canonicalize(words):
    """Canonical = min(fwd, rc).  Returns (canon (N,3), flipped (N,) bool)."""
    rc = rc_words(words)
    flipped = lex_lt(rc, words)
    return jnp.where(flipped[..., None], rc, words), flipped


def successor_words(words, base):
    """Shift one base left, append `base` (0..3) at the 3' end."""
    w0, w1, w2 = words[..., 0], words[..., 1], words[..., 2]
    b = jnp.asarray(base).astype(U32)
    n0 = (w0 << np.uint32(2)) | (w1 >> np.uint32(30))
    n1 = (w1 << np.uint32(2)) | (w2 >> np.uint32(30))
    n2 = (w2 << np.uint32(2)) | b
    return jnp.stack([n0, n1, n2], axis=-1)


def predecessor_words(words, base):
    """Shift one base right, prepend `base` (0..3) at the 5' end."""
    w0, w1, w2 = words[..., 0], words[..., 1], words[..., 2]
    b = jnp.asarray(base).astype(U32)
    n2 = (w2 >> np.uint32(2)) | ((w1 & np.uint32(3)) << np.uint32(30))
    n1 = (w1 >> np.uint32(2)) | ((w0 & np.uint32(3)) << np.uint32(30))
    n0 = (w0 >> np.uint32(2)) | (b << np.uint32(30))
    return jnp.stack([n0, n1, n2], axis=-1)


def first_base(words):
    return (words[..., 0] >> np.uint32(30)).astype(jnp.int32)


def last_base(words):
    return (words[..., 2] & np.uint32(3)).astype(jnp.int32)


def sort_by_words(words, extra_keys=(), payloads=()):
    """Stable lexicographic sort by the 3 kmer words (+ extra key arrays).

    Returns (words_sorted, extra_keys_sorted tuple, payloads_sorted tuple).
    """
    ops = [words[:, 0], words[:, 1], words[:, 2], *extra_keys, *payloads]
    num_keys = 3 + len(extra_keys)
    out = jax.lax.sort(tuple(ops), num_keys=num_keys, is_stable=True)
    ws = jnp.stack(out[:3], axis=-1)
    nk = len(extra_keys)
    return ws, tuple(out[3 : 3 + nk]), tuple(out[3 + nk :])


def searchsorted_words(table, query, table_size: int | None = None):
    """First index i in sorted `table` (M,3) with table[i] >= query row.

    Vectorized branchless binary search (log2(M) gather rounds).  M is the
    static padded table length; pad rows must be SENTINEL so they sort last.
    Returns (idx (N,) int32, found (N,) bool) where found means exact match.
    """
    table = jnp.asarray(table)
    query = jnp.asarray(query)
    m = table.shape[0] if table_size is None else table_size
    n = query.shape[0]
    lo = jnp.zeros((n,), jnp.int32)
    hi = jnp.full((n,), m, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(m, 2)))) + 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        t = table[mid]
        less = lex_lt(t, query)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = lo
    hit = lex_eq(table[jnp.minimum(idx, m - 1)], query) & (idx < m)
    return idx, hit


# ------------------------------------------------------------- host helpers

def words_from_codes_np(codes: np.ndarray) -> np.ndarray:
    """Reference numpy packing of a single K-length code array -> (3,) uint32."""
    codes = np.asarray(codes, dtype=np.uint64)
    assert codes.shape[0] == K
    out = np.zeros(KWORDS, dtype=np.uint32)
    for w in range(KWORDS):
        acc = np.uint64(0)
        for i in range(BASES_PER_WORD):
            acc = (acc << np.uint64(2)) | codes[w * BASES_PER_WORD + i]
        out[w] = np.uint32(acc)
    return out


def codes_from_words_np(words: np.ndarray) -> np.ndarray:
    """(3,) uint32 -> (48,) uint8 base codes."""
    words = np.asarray(words, dtype=np.uint32)
    out = np.zeros(K, dtype=np.uint8)
    for w in range(KWORDS):
        v = int(words[w])
        for i in range(BASES_PER_WORD):
            out[w * BASES_PER_WORD + i] = (v >> (2 * (BASES_PER_WORD - 1 - i))) & 3
    return out
