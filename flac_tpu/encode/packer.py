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

    # Segmented reduction WITHOUT scatter (scatters serialize on TPU; this
    # replaced a segment_sum that cost >80% of the whole encode): `we` is
    # sorted, per-word contributions are bit-disjoint (so each word's sum
    # < 2^32), and a running int64 cumsum of all contributions stays exact
    # (F * 2^32 << 2^63) — word w's value is the cumsum difference between
    # segment boundaries, found by binary search. c1 contributions belong to
    # word we-1, i.e. word w sums c1 of fields with we == w+1.
    S0 = jnp.cumsum(c0, axis=-1)
    S1 = jnp.cumsum(c1, axis=-1)
    zero = jnp.zeros(S0.shape[:-1] + (1,), S0.dtype)
    S0p = jnp.concatenate([zero, S0], axis=-1)
    S1p = jnp.concatenate([zero, S1], axis=-1)
    w_probe = jnp.arange(-1, maxwords + 1, dtype=jnp.int32)  # [maxwords + 2]

    # fully unrolled batched binary search (jnp.searchsorted's default scan
    # method lowers to a while loop that dominated the whole encode on TPU)
    F = we.shape[-1]
    steps = max(1, int(np.ceil(np.log2(F + 1))))
    B = we.shape[0]
    lo = jnp.zeros((B, maxwords + 2), jnp.int32)
    hi = jnp.full((B, maxwords + 2), F, jnp.int32)
    wei = we.astype(jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        am = jnp.take_along_axis(wei, jnp.minimum(mid, F - 1), axis=-1)
        go_right = am <= w_probe[None, :]
        lo = jnp.where(go_right & (mid < hi), mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    pos = lo  # first index with we > w  == count of fields with we <= w
    t0 = jnp.take_along_axis(S0p, pos, axis=-1)
    t1 = jnp.take_along_axis(S1p, pos, axis=-1)
    word0 = t0[:, 1 : maxwords + 1] - t0[:, :maxwords]
    word1 = t1[:, 2 : maxwords + 2] - t1[:, 1 : maxwords + 1]
    words = word0 + word1
    return words.astype(jnp.uint32).astype(jnp.int32), total_bits


def compact_stream_words(words: jnp.ndarray, total_bits: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate per-frame packed words into one dense word stream on
    device, so only the real compressed bytes cross HBM→host (the padded
    [B, maxwords] layout is ~2-3x larger than the stream at typical ratios).

    words: [B, W] int32 big-endian words; total_bits: [B]. Frames are
    byte-aligned (the frame tail pads to a byte + CRC-16). Returns
    (stream [B*W] uint32 — the stream's bytes 4j..4j+3 are word j's
    big-endian bytes; serialize with stream_words_to_bytes on the host —
    valid prefix only, total_bytes scalar int64). The uint8 form used to be
    produced on device, but the u32->u8 bitcast+reshape is a physical
    relayout that cost ~2 ms/batch of device time; a host-side byteswap of
    the fetched words is memcpy-speed.

    Formulation: every frame is a CONTIGUOUS run in the output, so the
    compaction is B sequential dynamic-update-slice copies of byte-phase-
    shifted frame words (a lax.scan carrying the output buffer), plus a
    scatter-OR of the 1-3 head bytes of frames that start mid-word. An
    earlier flat-gather formulation (owner-frame cumsums + one B*W-probe
    gather) cost 18 ms/batch on TPU — gathers probe word-by-word; the
    shifted-copy form moves the same bytes in ~3 ms.
    """
    B, W = words.shape
    nbytes32 = ((total_bits.astype(jnp.int32) + 7) // 8)
    starts = jnp.cumsum(nbytes32) - nbytes32                  # [B] byte starts
    total = (starts[-1] + nbytes32[-1]).astype(jnp.int64)
    Nw = B * W

    u = words.astype(jnp.uint32)
    # zero source bytes past each frame's tail (the funnel shift may read up
    # to 3 bytes past it; those byte lanes must be 0 so the next frame's head
    # can be OR'd in)
    jj = jnp.arange(W, dtype=jnp.int32)
    v = jnp.clip(nbytes32[:, None] - 4 * jj[None, :], 0, 4)
    m_partial = jnp.uint32(0xFFFFFFFF) << ((4 - jnp.clip(v, 1, 3)).astype(jnp.uint32) * 8)
    mask = jnp.where(v >= 4, jnp.uint32(0xFFFFFFFF),
                     jnp.where(v == 0, jnp.uint32(0), m_partial))
    u = u & mask
    # frame f's word j, shifted so DUS word slot (starts[f]+3)>>2 + j holds
    # frame bytes [(4-p)+4j, 8-p+4j) for phase p = starts[f] & 3 (frame bytes
    # [0, 4-p) are OR'd into the shared boundary word separately)
    p8 = ((starts & 3).astype(jnp.uint32) * 8)[:, None]       # per-frame phase*8
    nxt = jnp.concatenate([u[:, 1:], jnp.zeros((B, 1), jnp.uint32)], axis=1)
    sh = jnp.where(p8 == 0, u,
                   (u << jnp.minimum(32 - p8, 31)) | (nxt >> p8))
    outpos_w = ((starts + 3) >> 2).astype(jnp.int32)          # [B]

    def body(buf, inp):
        row, pos = inp
        return jax.lax.dynamic_update_slice(buf, row, (pos,)), None

    buf0 = jnp.zeros(Nw + W, jnp.uint32)
    buf, _ = jax.lax.scan(body, buf0, (sh, outpos_w))
    # frames starting mid-word: OR their first 4-p bytes into the boundary
    # word (owned by the previous frame, whose tail bytes there are zero)
    d0 = (starts & 3).astype(jnp.uint32)
    head = jnp.where(d0 > 0, u[:, 0] >> (8 * d0), 0)
    w0 = jnp.clip(starts >> 2, 0, Nw - 1)
    out_w = buf[:Nw] | jnp.zeros(Nw, jnp.uint32).at[w0].add(head)
    # zero bytes past the stream end, then emit big-endian bytes
    k = jnp.arange(Nw, dtype=jnp.int32)
    vtail = jnp.clip(total.astype(jnp.int32) - 4 * k, 0, 4)
    mt_partial = jnp.uint32(0xFFFFFFFF) << ((4 - jnp.clip(vtail, 1, 3)).astype(jnp.uint32) * 8)
    tmask = jnp.where(vtail >= 4, jnp.uint32(0xFFFFFFFF),
                      jnp.where(vtail == 0, jnp.uint32(0), mt_partial))
    out_w = out_w & tmask
    return out_w, total


def stream_words_to_bytes(host_words: np.ndarray, total: int) -> np.ndarray:
    """Host-side serializer for compact_stream_words output: big-endian
    word bytes, trimmed to the stream's true byte length."""
    be = np.ascontiguousarray(host_words, dtype=np.uint32).astype(">u4")
    return np.frombuffer(be.tobytes(), np.uint8)[:int(total)]


def compact_stream_bytes(words: jnp.ndarray, total_bits: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """compact_stream_words + on-device byte serialization (uint8 stream).
    Kept for callers that want device-resident bytes; the hot path fetches
    words and serializes on the host (see compact_stream_words)."""
    out_w, total = compact_stream_words(words, total_bits)
    swapped = (((out_w & 0xFF) << 24) | ((out_w & 0xFF00) << 8)
               | ((out_w >> 8) & 0xFF00) | (out_w >> 24))
    stream = jax.lax.bitcast_convert_type(swapped, jnp.uint8).reshape(-1)
    return stream, total


# ---------------------------------------------------------------------------
# Word-level CRC-16 (GF(2) reduction over packed words)
#
# crc_reduce over the ~2-per-sample field array costs ~50 int64 passes over
# [B, F~16k]; computing the same CRC from the packed words needs only ~32
# int32 passes over [B, W~5k] (≈10x less work): reduce each 32-bit word mod
# G, carryless-multiply by a static per-position x^(32j+16) table (the word's
# distance in the zero-padded buffer is static!), XOR-reduce, then one
# per-frame multiply by x^(-8*pad) to cancel the zero padding. Requires the
# packed stream to hold ZEROS in the final 16-bit CRC slot; the CRC is
# inserted into the words afterwards.
# ---------------------------------------------------------------------------

def _clmul_mod(a: int, b: int, poly: int, width: int) -> int:
    p = 0
    for i in range(width):
        if (b >> i) & 1:
            p ^= a << i
    g = (1 << width) | poly
    for bit in range(2 * width - 2, width - 1, -1):
        if (p >> bit) & 1:
            p ^= g << (bit - width)
    return p


@functools.lru_cache(maxsize=8)
def crc16_word_tables(maxwords: int) -> tuple[np.ndarray, np.ndarray]:
    """(tbl [maxwords] — x^(32*(maxwords-1-i)+16) mod G, the contribution
    multiplier of word i in the full zero-padded buffer;
    inv [4*maxwords+3] — x^(-8k) mod G, the pad fixup)."""
    poly, width = crc_mod.CRC16_POLY, 16
    xp = crc_mod.x_pow_mod_table(32 * maxwords + 17, poly, width)
    idx = 32 * (maxwords - 1 - np.arange(maxwords)) + 16
    tbl = xp[idx].astype(np.int32)
    # x^-1 mod G: x * u = G + 1 => u = (G+1)/x
    g_full = (1 << width) | poly
    u = (g_full ^ 1) >> 1
    u8 = u
    for _ in range(3):  # u^2, u^4, u^8
        u8 = _clmul_mod(u8, u8, poly, width)
    inv = np.zeros(4 * maxwords + 3, np.int32)
    cur = 1
    for k in range(len(inv)):
        inv[k] = cur
        cur = _clmul_mod(cur, u8, poly, width)
    return tbl, inv


def crc16_from_words(words: jnp.ndarray, total_bits: jnp.ndarray,
                     tbl: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """CRC-16 of each frame's byte stream [0, nbytes-2) from its packed words
    (which must have zeros in the final 16-bit slot). Returns [B] int32."""
    W = words.shape[1]
    g16 = (1 << 16) | crc_mod.CRC16_POLY
    r = words.astype(jnp.uint32)
    for bit in range(31, 15, -1):  # word mod G: 32 -> <=16 bits
        r = r ^ (((r >> bit) & 1) * jnp.uint32(g16 << (bit - 16)))
    t = tbl.astype(jnp.uint32)[None, :]
    prod = jnp.zeros_like(r)
    for b in range(16):  # carryless multiply by the static position table
        prod = prod ^ jnp.where(((t >> b) & 1) == 1, r << b, 0)
    acc = jax.lax.reduce(prod, jnp.uint32(0), jax.lax.bitwise_xor, (1,))

    def reduce16(v):
        for bit in range(30, 15, -1):
            v = v ^ (((v >> bit) & 1) * jnp.uint32(g16 << (bit - 16)))
        return v

    def clmul16(a, b):
        p = jnp.zeros_like(a)
        for i in range(16):
            p = p ^ jnp.where(((b >> i) & 1) == 1, a << i, 0)
        return p

    acc = reduce16(acc)
    # cancel the zero padding: pad bytes after the CRC-16 message =
    # buffer(4W) - nbytes + 2 (the reserved zero CRC bytes count as padding)
    nbytes = ((total_bits.astype(jnp.int32) + 7) // 8)
    pad = 4 * W - nbytes + 2
    fix = inv.astype(jnp.uint32)[pad]
    return reduce16(clmul16(acc, fix)).astype(jnp.int32)


def insert_crc16(words: jnp.ndarray, total_bits: jnp.ndarray,
                 crc: jnp.ndarray) -> jnp.ndarray:
    """OR each frame's CRC-16 into the (currently zero) last 16 bits."""
    B = words.shape[0]
    end = total_bits.astype(jnp.int32)
    we = (end - 1) >> 5
    rr = end - (we << 5)  # bits of the frame in its last word, in [8, 32]
    c = crc.astype(jnp.uint32)
    wu = words.astype(jnp.uint32)
    rows = jnp.arange(B)
    c0v = ((c << (32 - rr).astype(jnp.uint32)) & jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
    wu = wu.at[rows, we].add(c0v)
    # CRC straddles two words when rr=8
    spill = jnp.where(rr < 16, c >> rr.astype(jnp.uint32), 0).astype(jnp.uint32)
    wu = wu.at[rows, jnp.maximum(we - 1, 0)].add(spill)
    return wu.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas banded word-fill (TPU): the segmented word reduction as a custom
# kernel. The XLA formulation above needs ~log2(F) batched gather rounds over
# maxwords probes (~85% of encode time on TPU); this kernel instead walks a
# (frame, word-tile) grid, scalar-prefetches each tile's exact field range
# (computed with a tiny coarse search), DMAs only those field chunks, and
# accumulates with masked VPU adds. Contributions are bit-disjoint per word,
# so integer addition is carry-free and exact. Degenerate distributions
# (e.g. thousands of zero-length fields sharing one word) stay correct —
# the per-tile chunk count just grows; masking does the rest.
# ---------------------------------------------------------------------------

_PACK_TILE = 256     # words per output tile
_PACK_CHUNK = 1024   # fields per DMA chunk (per frame row)
_PACK_SUB = 128      # fields per in-kernel guarded subchunk
_PACK_ROWS = 8       # frames per block (TPU block row-divisibility)


def _pack_tile_bounds(we: jnp.ndarray, maxwords: int, hi_extra: int = 0):
    """Per-(frame, tile) relevant-field range [lo, hi) in FIELD index units,
    via an unrolled coarse binary search (NT probes per frame). The ranges
    only SKIP work — the kernel masks by word index, so any superset stays
    correct. hi_extra widens the hi probe for fields whose extra
    contributions (word we-2, ...) reach back into the tile."""
    tile = _PACK_TILE
    B, F = we.shape
    NT = -(-maxwords // tile)
    probes_lo = (jnp.arange(NT, dtype=jnp.int32) * tile) - 1
    probes_hi = probes_lo + tile + 1 + hi_extra

    def count_le(wef, probes):
        lo = jnp.zeros(probes.shape, jnp.int32)
        hi = jnp.full(probes.shape, F, jnp.int32)
        steps = max(1, int(np.ceil(np.log2(F + 1))))
        for _ in range(steps):
            mid = (lo + hi) >> 1
            am = wef[jnp.minimum(mid, F - 1)]
            go = am <= probes
            lo = jnp.where(go & (mid < hi), mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo

    lo = jax.vmap(lambda wef: count_le(wef, probes_lo))(we)   # [B, NT]
    hi = jax.vmap(lambda wef: count_le(wef, probes_hi))(we)   # [B, NT]
    return lo, hi, NT


def _pack_words_pallas(c0: jnp.ndarray, c1: jnp.ndarray, we: jnp.ndarray,
                       maxwords: int, interpret: bool = False) -> jnp.ndarray:
    """words [B, maxwords] int32 from per-field word contributions.

    Grid: (frame-group, word-tile, chunk). Blocks are (_PACK_ROWS, chunk)
    rectangles; a chunk is processed when it overlaps the UNION of the 8
    frames' relevant field ranges (per-frame exactness comes from the
    word-index mask, not the ranges)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F = we.shape
    padF = (-F) % _PACK_CHUNK
    padB = (-B) % _PACK_ROWS
    if padF or padB:
        c0 = jnp.pad(c0, ((0, padB), (0, padF)))
        c1 = jnp.pad(c1, ((0, padB), (0, padF)))
        we = jnp.pad(we, ((0, padB), (0, padF)), constant_values=maxwords + 7)
    Bp, Fp = B + padB, F + padF
    nblocks = Fp // _PACK_CHUNK
    lo, hi, NT = _pack_tile_bounds(we, maxwords)
    G = Bp // _PACK_ROWS
    # union field range per (frame-group, tile), in SUBCHUNK units: the
    # kernel guards each _PACK_SUB-field slice separately, so the per-tile
    # boundary waste is +-_PACK_SUB fields instead of +-_PACK_CHUNK
    lo_g = jnp.min(lo.reshape(G, _PACK_ROWS, NT), axis=1) // _PACK_SUB
    hi_g = -(-jnp.max(hi.reshape(G, _PACK_ROWS, NT), axis=1) // _PACK_SUB)
    Wp = NT * _PACK_TILE
    CPS = _PACK_CHUNK // _PACK_SUB  # subchunks per DMA chunk

    def kern(lo_ref, hi_ref, c0_ref, c1_ref, we_ref, out_ref):
        g = pl.program_id(0)
        t = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when((c * CPS < hi_ref[g, t]) & ((c + 1) * CPS > lo_ref[g, t]))
        def _chunk():
            base = t * _PACK_TILE
            iot = jax.lax.broadcasted_iota(
                jnp.int32, (_PACK_SUB, _PACK_TILE), 1)
            for s in range(CPS):
                cs = c * CPS + s

                @pl.when((cs >= lo_ref[g, t]) & (cs < hi_ref[g, t]))
                def _sub(s=s):
                    sl = slice(s * _PACK_SUB, (s + 1) * _PACK_SUB)
                    for row in range(_PACK_ROWS):
                        lw0 = we_ref[row, sl] - base
                        add0 = jnp.where(lw0[:, None] == iot,
                                         c0_ref[row, sl][:, None], 0)
                        add1 = jnp.where((lw0 - 1)[:, None] == iot,
                                         c1_ref[row, sl][:, None], 0)
                        # dtype=int32: under jax_enable_x64 jnp.sum promotes
                        # to int64, whose in-kernel conversion breaks Mosaic
                        out_ref[row, :] = (out_ref[row, :]
                                           + jnp.sum(add0, axis=0, dtype=jnp.int32)
                                           + jnp.sum(add1, axis=0, dtype=jnp.int32))

    field_spec = pl.BlockSpec((_PACK_ROWS, _PACK_CHUNK),
                              lambda g, t, c, lo, hi: (g, c))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, NT, nblocks),
        in_specs=[field_spec, field_spec, field_spec],
        out_specs=pl.BlockSpec((_PACK_ROWS, _PACK_TILE),
                               lambda g, t, c, lo, hi: (g, t)),
    )
    # propagate the inputs' varying manual axes so shard_map's vma checker
    # accepts the kernel output (unvarying out_shape under a sharded body
    # is what used to force check_vma=False in parallel/sharding.py)
    try:
        vma = jax.typeof(we).vma
    except AttributeError:
        vma = None
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Wp), jnp.int32, vma=vma),
        interpret=interpret,
    )
    args = (lo_g.astype(jnp.int32), hi_g.astype(jnp.int32),
            c0.astype(jnp.int32), c1.astype(jnp.int32), we.astype(jnp.int32))
    # the kernel is pure int32; trace it with x64 off — x64 tracing breaks
    # the Mosaic lowering (runaway convert_element_type recursion)
    if jax.config.jax_enable_x64 and not interpret:
        with jax.enable_x64(False):
            words = call(*args)
    else:
        words = call(*args)
    return words[:B, :maxwords]


# Pack-kernel design notes (measured on TPU v5e, xplane device time, B=512
# frames of T=4096 stereo at level 5 — see docs/perf.md "pack kernel
# experiments"):
# * The v1 kernel below measures ~12 ms and is VPU-bound on the one-hot
#   compare-select-add; tile/chunk/subchunk geometry changes (word tiles
#   128-512, chunks 512-4096, data-dependent chunk index maps that fetch
#   only in-range field chunks) all land within +-10% or regress.
# * An MXU factorization (one-hot split into word-group x word-position
#   outer products evaluated as [SUB,8]^T x [SUB,160] bf16 matmuls with
#   7-bit limbs, f32 accumulation) was 3-8x SLOWER: the dots are too small
#   for the MXU and Mosaic's lowering of many tiny guarded matmuls
#   dominates. It also miscompiled (wrong words) on real hardware while
#   interpret mode was exact.
# * Pre-merged field quads (pack_fields_pallas_merged below: two pairwise
#   merge rounds -> F/4 slots x 3 contributions = 0.375x the one-hot
#   lane-ops, spill arrays gated by a nonzero bitmap) produce byte-identical
#   streams but measure ~3% SLOWER end-to-end at level 5: the XLA-side merge
#   prep (2 rounds of int64 shifts, 3 contribution sets, 3 tile-bound
#   searches) plus two extra pallas launches eat the kernel saving. Kept,
#   env-selectable (FLAC_TPU_PACK=merged), as the tuning knob for field
#   distributions with much smaller mean nbits.
# Conclusion: the banded kernel is at algorithmic speed-of-light for this
# formulation; further encode gains must come from outside the packer.

def pack_fields_pallas(values: jnp.ndarray, nbits: jnp.ndarray, maxwords: int,
                       interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pack_fields with the word fill done by the Pallas banded kernel."""
    ends = jnp.cumsum(nbits, axis=-1)
    total_bits = ends[..., -1]
    we = ((ends - 1) >> 5).astype(jnp.int32)
    r = ends - (we.astype(ends.dtype) << 5)
    has = nbits > 0
    v = jnp.where(has, values, 0)
    c0 = jnp.where(has, (v << (32 - r)) & 0xFFFFFFFF, 0).astype(jnp.uint32)
    c1 = ((v >> r) & 0xFFFFFFFF).astype(jnp.uint32)
    words = _pack_words_pallas(c0, c1, we, maxwords, interpret=interpret)
    return words, total_bits


# --- merged-field pack: the 0.75x-per-round constant-factor win -------------
#
# The banded kernel's cost is (#slots scanned) x (#contributions per slot) x
# TILE. Merging adjacent fields halves the slot count at 3/2 the per-slot
# contribution count (a <= 63-significant-bit merged value spans <= 3 words):
# two merge rounds scan F/4 slots x 3 contributions instead of F x 2 — a
# 0.375x one-hot workload. Pairs that would exceed 63 significant bits spill
# the right-hand slot into a side array; spill arrays are almost always
# all-zero (mean field is ~9 bits) and their kernel passes are skipped at
# subchunk granularity via a scalar-prefetched nonzero bitmap.
#
# Merging rule (uniform for any two slots with end positions e1 < e2):
#   d = e2 - e1; merged value = v1 << d | v2, end = e2, sig = sig1 + d
#   fits iff sig1 + d <= 63 (sig1 == 0 -> always fits, merged sig = sig2).
# Bits the spill slots own lie strictly inside [e1, e2); contributions from
# different arrays are therefore bit-disjoint and the three word images add
# exactly.

_MERGE_ROUNDS = 2


def _merge_round(v, e, sig):
    """One pairwise merge round. v/e/sig: [B, F] (F even). Returns
    (merged (v,e,sig) [B, F/2], spill (v,e,sig) [B, F/2])."""
    vL, vR = v[:, 0::2], v[:, 1::2]
    eL, eR = e[:, 0::2], e[:, 1::2]
    sL, sR = sig[:, 0::2], sig[:, 1::2]
    d = (eR - eL).astype(jnp.int64)
    fit = (sL == 0) | ((sL.astype(jnp.int64) + d) <= 63)
    dc = jnp.clip(d, 0, 63)
    vM = jnp.where(fit, jnp.where(sL > 0, vL << dc, 0) | vR, vL)
    eM = jnp.where(fit, eR, eL)
    sM = jnp.where(fit,
                   jnp.where(sL > 0, sL + d.astype(sig.dtype), sR), sL)
    vS = jnp.where(fit, 0, vR)
    sS = jnp.where(fit, 0, sR)
    return (vM, eM, sM), (vS, eR, sS)


def _contribs3(v, e):
    """Word contributions of <= 63-sig-bit fields ending at bit e: the low
    bits in word we, then the next <= 32 in we-1, then the rest in we-2."""
    we = ((e - 1) >> 5).astype(jnp.int32)
    r = (e - (we.astype(e.dtype) << 5)).astype(jnp.int64)
    M = jnp.int64(0xFFFFFFFF)
    c0 = ((v & M) << (32 - r)) & M
    v1 = jax.lax.shift_right_logical(v, r)
    c1 = v1 & M
    c2 = jax.lax.shift_right_logical(v1, jnp.int64(32)) & M
    return [c0.astype(jnp.uint32), c1.astype(jnp.uint32),
            c2.astype(jnp.uint32)], we


def pack_fields_pallas_merged(values: jnp.ndarray, nbits: jnp.ndarray,
                              maxwords: int, interpret: bool = False
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pack_fields via the banded kernel over pre-merged field quads."""
    B, F = values.shape
    ends = jnp.cumsum(nbits, axis=-1)
    total_bits = ends[..., -1]
    v = jnp.where(nbits > 0, values, 0).astype(jnp.int64)
    e = ends.astype(jnp.int64)
    sig = jnp.minimum(nbits, MAX_SIG_BITS).astype(jnp.int32)

    arrays = []  # (v, e, skippable)
    for _ in range(_MERGE_ROUNDS):
        Fk = v.shape[1]
        if Fk % 2:
            v = jnp.pad(v, ((0, 0), (0, 1)))
            e = jnp.pad(e, ((0, 0), (0, 1)), mode="edge")
            sig = jnp.pad(sig, ((0, 0), (0, 1)))
        (v, e, sig), (vS, eS, sS) = _merge_round(v, e, sig)
        arrays.append((vS, eS, True))
    arrays.append((v, e, False))

    words = None
    for av, ae, skippable in arrays:
        cs, we = _contribs3(av, ae)
        w = _pack_words_pallas_multi(cs, we, maxwords,
                                     skippable=skippable, interpret=interpret)
        words = w if words is None else words + w
    return words.astype(jnp.uint32).astype(jnp.int32), total_bits


_PACK_M_CHUNK = 1024
_PACK_M_SUB = 128


def _pack_words_pallas_multi(contribs, we, maxwords: int,
                             skippable: bool = False,
                             interpret: bool = False) -> jnp.ndarray:
    """Banded word fill for fields with len(contribs) word contributions
    (contrib j lands in word we - j). With skippable=True a scalar-prefetched
    per-(group, subchunk) nonzero bitmap gates the vector work — used for
    the spill arrays, which are almost always entirely zero."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncon = len(contribs)
    B, F = we.shape
    CHUNK, SUB, ROWS, TILE = (_PACK_M_CHUNK, _PACK_M_SUB,
                              _PACK_ROWS, _PACK_TILE)
    padF = (-F) % CHUNK
    padB = (-B) % ROWS
    nz = None
    if skippable:
        nz = jnp.any(jnp.stack([c != 0 for c in contribs]), axis=0)
    if padF or padB:
        contribs = [jnp.pad(c, ((0, padB), (0, padF))) for c in contribs]
        we = jnp.pad(we, ((0, padB), (0, padF)),
                     constant_values=maxwords + 7)
        if nz is not None:
            nz = jnp.pad(nz, ((0, padB), (0, padF)))
    Bp, Fp = B + padB, F + padF
    nblocks = Fp // CHUNK
    # the hi probe must reach ncon-1 words past the tile (contribution j of
    # a field with we just past the tile lands inside it)
    lo, hi, NT = _pack_tile_bounds(we, maxwords, hi_extra=ncon - 2)
    G = Bp // ROWS
    lo_g = jnp.min(lo.reshape(G, ROWS, NT), axis=1) // SUB
    hi_g = -(-jnp.max(hi.reshape(G, ROWS, NT), axis=1) // SUB)
    nsub = Fp // SUB
    if nz is not None:
        nz_sub = jnp.any(nz.reshape(G, ROWS, nsub, SUB), axis=(1, 3))
        nz_sub = nz_sub.astype(jnp.int32)                      # [G, nsub]
    Wp = NT * TILE
    CPS = CHUNK // SUB

    def kern(*refs):
        if nz is not None:
            lo_ref, hi_ref, nz_ref, *crefs, we_ref, out_ref = refs
        else:
            lo_ref, hi_ref, *crefs, we_ref, out_ref = refs
            nz_ref = None
        g = pl.program_id(0)
        t = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when((c * CPS < hi_ref[g, t]) & ((c + 1) * CPS > lo_ref[g, t]))
        def _chunk():
            base = t * TILE
            iot = jax.lax.broadcasted_iota(jnp.int32, (SUB, TILE), 1)
            for s in range(CPS):
                cs = c * CPS + s
                cond = (cs >= lo_ref[g, t]) & (cs < hi_ref[g, t])
                if nz_ref is not None:
                    cond = cond & (nz_ref[g, cs] != 0)

                @pl.when(cond)
                def _sub(s=s):
                    sl = slice(s * SUB, (s + 1) * SUB)
                    for row in range(ROWS):
                        lw0 = we_ref[row, sl] - base
                        acc = out_ref[row, :]
                        for j, cref in enumerate(crefs):
                            add = jnp.where((lw0 - j)[:, None] == iot,
                                            cref[row, sl][:, None], 0)
                            acc = acc + jnp.sum(add, axis=0, dtype=jnp.int32)
                        out_ref[row, :] = acc

    field_spec = pl.BlockSpec((ROWS, CHUNK),
                              lambda g, t, c, *pref: (g, c))
    nscalar = 3 if nz is not None else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nscalar,
        grid=(G, NT, nblocks),
        in_specs=[field_spec] * (ncon + 1),
        out_specs=pl.BlockSpec((ROWS, TILE),
                               lambda g, t, c, *pref: (g, t)),
    )
    try:
        vma = jax.typeof(we).vma
    except AttributeError:
        vma = None
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Wp), jnp.int32, vma=vma),
        interpret=interpret,
    )
    scalars = [lo_g.astype(jnp.int32), hi_g.astype(jnp.int32)]
    if nz is not None:
        scalars.append(nz_sub)
    args = (*scalars, *[c.astype(jnp.int32) for c in contribs],
            we.astype(jnp.int32))
    if jax.config.jax_enable_x64 and not interpret:
        with jax.enable_x64(False):
            words = call(*args)
    else:
        words = call(*args)
    return words[:B, :maxwords]
