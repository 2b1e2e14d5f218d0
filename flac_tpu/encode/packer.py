"""Parallel bitstream packing: prefix-sum field layout + segment-sum word fill.

Replaces the reference's sequential bitwriter (src/libFLAC/bitwriter.c,
especially the Rice hot loop at bitwriter.c:544-658) with a data-parallel
scheme:

1. every frame is a flat list of (value, nbits) *fields* — unary runs are a
   single field whose value is the stop bit plus binary LSBs, so a field's
   significant bits are few (<= 33) even when nbits is large;
2. a prefix sum of nbits gives each field's end position;
3. each field contributes to at most 2 consecutive 32-bit output words
   (a field's last word holds r in [1,32] of its bits; the remaining
   <= 32 significant bits land in the word before); contributions combine
   with segment-sums over the already-sorted word indices — no conflicts
   because field bit-spans are disjoint;
4. CRC-8/CRC-16 come from the same field list as a pure XOR reduction: CRC
   is GF(2)-linear, so each field contributes (value(x) * x^(dist+width))
   mod G, evaluated by a carryless multiply against a precomputed
   x^d mod G table (see flac_tpu.crc) — no byte-serial scan.

Field values MUST be pre-masked to their nbits (value < 2^nbits); the frame
assembler guarantees this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flac_tpu import crc as crc_mod

# Max significant bits in any field value: a RICE2 codeword has k+1 <= 31
# significant bits, a 32-bit verbatim/warmup sample 32, the side channel 33,
# the combined first header field 32.
MAX_SIG_BITS = 33


@functools.lru_cache(maxsize=8)
def xpow_table_np(maxbits: int, poly: int, width: int) -> np.ndarray:
    """Entry d = x^(d + width) mod G: CRC contribution of a set bit at
    bit-distance d from the end of the message."""
    return crc_mod.x_pow_mod_table(maxbits + width + 1, poly, width)[width:].astype(np.int32)


def crc_reduce(values: jnp.ndarray, ends: jnp.ndarray, msg_end: jnp.ndarray,
               include: jnp.ndarray, table: jnp.ndarray, poly: int, width: int) -> jnp.ndarray:
    """CRC of the concatenated fields [0, msg_end) as a pure XOR reduction.

    values: [..., F] int64 field values; ends: [..., F] int32 field end bit
    positions; msg_end: [...] message end in bits; include: [..., F] bool —
    which fields belong to the message. Returns [...] int64 CRC.
    """
    base = (msg_end[..., None] - ends).astype(jnp.int32)
    base = jnp.clip(base, 0, table.shape[0] - 1)
    tvals = table[base].astype(jnp.int64)  # x^(dist+width) mod G for each field's LSB
    v = jnp.where(include, values, 0)
    # carryless multiply: product(x) = v(x) * t(x); t has `width` bits
    prod = jnp.zeros_like(v)
    for b in range(width):
        prod = prod ^ jnp.where(((tvals >> b) & 1) == 1, v << b, 0)
    # reduce mod G from the top possible bit down to `width`
    g_full = (1 << width) | poly
    for bit in range(MAX_SIG_BITS + width - 1, width - 1, -1):
        prod = prod ^ (((prod >> bit) & 1) * (g_full << (bit - width)))
    return jax.lax.reduce(prod, jnp.int64(0), jax.lax.bitwise_xor,
                          dimensions=(prod.ndim - 1,))


def pack_fields(values: jnp.ndarray, nbits: jnp.ndarray, maxwords: int
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack fields into big-endian 32-bit words.

    values: [B, F] int64 (masked, significant bits <= MAX_SIG_BITS);
    nbits: [B, F] int32. Returns (words [B, maxwords] int32 — serialize
    big-endian to get the byte stream, total_bits [B] int32).
    """
    ends = jnp.cumsum(nbits, axis=-1)
    total_bits = ends[..., -1]
    we = (ends - 1) >> 5                      # word holding the field's last bit
    r = ends - (we << 5)                      # field bits in that word, in [1, 32]
    has = nbits > 0
    v = jnp.where(has, values, 0)
    c0 = jnp.where(has, (v << (32 - r)) & 0xFFFFFFFF, 0)
    # v >> r is provably < 2^32 (<= 33 sig bits, r >= 1) and 0 whenever the
    # field lies entirely in word `we` (nbits <= ends => v < 2^r when we == 0)
    c1 = (v >> r) & 0xFFFFFFFF

    def one_frame(c0f, c1f, wef):
        w0 = jax.ops.segment_sum(c0f, wef, num_segments=maxwords, indices_are_sorted=True)
        w1 = jax.ops.segment_sum(c1f, jnp.maximum(wef - 1, 0),
                                 num_segments=maxwords, indices_are_sorted=True)
        return w0 + w1

    words = jax.vmap(one_frame)(c0, c1, we)
    return words.astype(jnp.uint32).astype(jnp.int32), total_bits


def compact_stream_bytes(words: jnp.ndarray, total_bits: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate per-frame packed words into one dense byte stream on
    device, so only the real compressed bytes cross HBM→host (the padded
    [B, maxwords] layout is ~2-3x larger than the stream at typical ratios).

    words: [B, W] int32 big-endian words; total_bits: [B]. Frames are
    byte-aligned (the frame tail pads to a byte + CRC-16). Returns
    (stream [B*W*4] uint8 — valid prefix only, total_bytes scalar int64).
    """
    B, W = words.shape
    nbytes = (total_bits.astype(jnp.int64) + 7) // 8
    starts = jnp.cumsum(nbytes) - nbytes
    total = starts[-1] + nbytes[-1]
    N = B * W * 4
    j = jnp.arange(N, dtype=jnp.int64)
    f = jnp.clip(jnp.searchsorted(starts, j, side="right") - 1, 0, B - 1)
    off = j - starts[f]
    w = words.astype(jnp.uint32)[f, jnp.clip(off >> 2, 0, W - 1).astype(jnp.int32)]
    shift = ((3 - (off & 3)) * 8).astype(jnp.uint32)
    byte = (w >> shift) & 0xFF
    return jnp.where(j < total, byte, 0).astype(jnp.uint8), total
