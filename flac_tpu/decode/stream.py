"""Stream-level decoding: vectorized frame indexing + batched device decode.

The reference discovers frame boundaries bit-serially (frame_sync_,
stream_decoder.c:1941); frame lengths aren't recorded in the format, so a
parallel decoder must index frames first (SURVEY.md §7.3 hard part #2):

1. numpy sync scan over the whole byte stream: positions matching the
   14-bit sync + reserved-bit + geometry codes from STREAMINFO,
2. vectorized header validation: CRC-8 over the (variable-length) header,
3. chain validation via the UTF-8-coded frame numbers: frame k's header
   carries k, so candidates assemble into an index without sequential
   parsing; ambiguous/corrupt regions fall back to the sequential host
   decoder (the reference's resync behavior),
4. equal-geometry frames decode in device batches; the final partial frame
   and any oddballs go through the host decoder.

MD5 of the assembled PCM is the end-to-end verdict (stream_decoder.h:797).
"""

from __future__ import annotations

import numpy as np

from flac_tpu import constants as C
from flac_tpu import crc as crc_mod
from flac_tpu.decode import host_decoder as hd
from flac_tpu.decode.frame_decoder import DecoderGeometry, build_frame_decoder, bytes_to_words
from flac_tpu.md5 import MD5Context
from flac_tpu.metadata import StreamInfo, parse_metadata


class StreamDecodeError(Exception):
    pass


def index_frames(data: np.ndarray, audio_offset: int, si: StreamInfo) -> np.ndarray | None:
    """Find byte offsets of all frames with the stream's standard geometry.

    Returns offsets sorted by frame number, or None if the index is ambiguous
    (caller falls back to sequential decode). The final partial frame (if any)
    is NOT included — its blocksize code differs.
    """
    d = data
    n = len(d)
    if n < audio_offset + 2:
        return np.zeros(0, np.int64)
    from flac_tpu.encode.frame_encoder import _header_static_codes

    class _Cfg:
        sample_rate = si.sample_rate
        bits_per_sample = si.bits_per_sample
    (bs_code, bs_ext_bits, bs_ext_val, sr_code, sr_ext_bits, sr_ext_val,
     bps_code) = _header_static_codes(_Cfg, si.min_blocksize)
    b0 = 0xFF
    b1 = 0xF8  # sync 111111111111100 + fixed blocksize strategy
    b2 = (bs_code << 4) | sr_code
    cand = np.flatnonzero(
        (d[audio_offset:n - 5] == b0)
        & (d[audio_offset + 1:n - 4] == b1)
        & (d[audio_offset + 2:n - 3] == b2)
    ) + audio_offset
    if len(cand) == 0:
        return np.zeros(0, np.int64)
    # byte 3: ca(4) | bps(3) | pad(1): validate bps code + reserved pad bit
    b3 = d[cand + 3]
    ca = b3 >> 4
    ok = ((b3 & 0x0F) == (bps_code << 1)) & (ca <= (10 if si.channels == 2 else si.channels - 1))
    if si.channels == 2:
        ok &= (ca == 1) | (ca >= 8)
    else:
        ok &= ca == si.channels - 1
    cand = cand[ok]
    if len(cand) == 0:
        return np.zeros(0, np.int64)
    # UTF-8 frame number: length from the lead byte, then gather continuations
    lead = d[cand + 4].astype(np.int64)
    ulen = (1 + (lead >= 0xC0) + (lead >= 0xE0) + (lead >= 0xF0)
            + (lead >= 0xF8) + (lead >= 0xFC) + (lead >= 0xFE)).astype(np.int64)
    lead_bits = np.where(ulen == 1, lead, lead & (0x7F >> np.minimum(ulen, 7)))
    number = lead_bits
    maxu = int(ulen.max())
    for j in range(1, maxu):
        cont = d[np.minimum(cand + 4 + j, n - 1)].astype(np.int64)
        number = np.where(j < ulen, (number << 6) | (cont & 0x3F), number)
    # blocksize/sample-rate extension fields ("get from end of header" codes
    # 6/7 and 12-14): codes alone don't pin the geometry — the final partial
    # frame shares code 6/7 with the standard frames, so the stored extension
    # VALUES must match too (stream_decoder.c:2197-2225)
    ext_ok = np.ones(len(cand), bool)
    ext_off = cand + 4 + ulen
    for nbits, want in ((bs_ext_bits, bs_ext_val), (sr_ext_bits, sr_ext_val)):
        if nbits:
            val = np.zeros(len(cand), np.int64)
            for j in range(nbits // 8):
                val = (val << 8) | d[np.minimum(ext_off + j, n - 1)]
            ext_ok &= val == want
            ext_off = ext_off + nbits // 8
    cand, ulen, number = cand[ext_ok], ulen[ext_ok], number[ext_ok]
    if len(cand) == 0:
        return np.zeros(0, np.int64)
    hdr_len = 4 + ulen + (bs_ext_bits + sr_ext_bits) // 8  # bytes before CRC-8
    # vectorized CRC-8 validation over variable-length headers
    maxh = int(hdr_len.max())
    rows = np.zeros((len(cand), maxh), np.uint8)
    for j in range(maxh):
        rows[:, j] = d[np.minimum(cand + j, n - 1)]
    crc = crc_mod.crc8_batch(rows, hdr_len)
    stored = d[np.minimum(cand + hdr_len, n - 1)]
    good = crc == stored
    cand, number = cand[good], number[good]
    if len(cand) == 0:
        return np.zeros(0, np.int64)
    # chain validation: frame numbers must be a permutation 0..N-1, unique
    order = np.argsort(number, kind="stable")
    number, cand = number[order], cand[order]
    nframes = int(number[-1]) + 1
    if len(number) != nframes or not np.array_equal(number, np.arange(nframes)):
        return None  # duplicates or gaps: ambiguous, sequential fallback
    # offsets must be strictly increasing for sequential frame numbers
    if np.any(np.diff(cand) <= 0):
        return None
    return cand.astype(np.int64)


def index_frames_variable(data: np.ndarray, audio_offset: int, si: StreamInfo):
    """Frame index for a variable-blocksize (blocking_strategy=1) stream.

    Each frame carries its own blocksize code and a UTF-8-coded SAMPLE
    number (stream_decoder.c:2197-2240), so unlike index_frames the
    geometry is parsed per candidate. The chain check is stronger than the
    fixed-blocksize one: sample numbers must start at 0 and each frame's
    sample number must equal the previous frame's number plus its parsed
    blocksize — a property random byte patterns essentially never satisfy.

    Returns (offsets, blocksizes, sample_numbers, hdr_ext_bits) sorted by
    sample number — hdr_ext_bits is each header's bit-width between the
    UTF-8 number and the CRC-8, for DecoderGeometry(dynamic_header_ext) —
    or None when the index is ambiguous (caller falls back to the
    sequential host decoder). Frames using non-canonical sample-rate codes
    also return None: correctness is the host path's job, this index only
    serves the batched fast path.
    """
    d = data
    n = len(d)
    if n < audio_offset + 2:
        return None
    from flac_tpu.encode.frame_encoder import _header_static_codes

    class _Cfg:
        sample_rate = si.sample_rate
        bits_per_sample = si.bits_per_sample
    (_bs, _bse, _bsv, sr_code, sr_ext_bits, sr_ext_val,
     bps_code) = _header_static_codes(_Cfg, max(si.max_blocksize, 16))
    cand = np.flatnonzero(
        (d[audio_offset:n - 5] == 0xFF)
        & (d[audio_offset + 1:n - 4] == 0xF9)       # sync + variable strategy
        & ((d[audio_offset + 2:n - 3] & 0x0F) == sr_code)
        & ((d[audio_offset + 2:n - 3] >> 4) >= 1)   # blocksize code 0 reserved
    ) + audio_offset
    if len(cand) == 0:
        return None
    b3 = d[cand + 3]
    ca = b3 >> 4
    ok = ((b3 & 0x0F) == (bps_code << 1)) \
        & (ca <= (10 if si.channels == 2 else si.channels - 1))
    if si.channels == 2:
        ok &= (ca == 1) | (ca >= 8)
    else:
        ok &= ca == si.channels - 1
    cand = cand[ok]
    if len(cand) == 0:
        return None
    # UTF-8 sample number (up to 36 bits -> up to 7 bytes)
    lead = d[cand + 4].astype(np.int64)
    ulen = (1 + (lead >= 0xC0) + (lead >= 0xE0) + (lead >= 0xF0)
            + (lead >= 0xF8) + (lead >= 0xFC) + (lead >= 0xFE)).astype(np.int64)
    lead_bits = np.where(ulen == 1, lead, lead & (0x7F >> np.minimum(ulen, 7)))
    number = lead_bits
    for j in range(1, int(ulen.max())):
        cont = d[np.minimum(cand + 4 + j, n - 1)].astype(np.int64)
        number = np.where(j < ulen, (number << 6) | (cont & 0x3F), number)
    # per-candidate blocksize from its code (+ 8/16-bit end-of-header value)
    bs_code = (d[cand + 2] >> 4).astype(np.int64)
    bs_ext_bits = np.where(bs_code == 6, 8, np.where(bs_code == 7, 16, 0))
    ext_off = cand + 4 + ulen
    ext_val = d[np.minimum(ext_off, n - 1)].astype(np.int64)
    ext_val = np.where(bs_code == 7,
                       (ext_val << 8) | d[np.minimum(ext_off + 1, n - 1)],
                       ext_val)
    blocksize = np.select(
        [bs_code == 1, (bs_code >= 2) & (bs_code <= 5), (bs_code >= 6) & (bs_code <= 7)],
        [np.int64(192), np.int64(576) << np.maximum(bs_code - 2, 0), ext_val + 1],
        default=np.int64(256) << np.maximum(bs_code - 8, 0))
    # static sample-rate extension (if the canonical code has one)
    ok = np.ones(len(cand), bool)
    sr_off = ext_off + bs_ext_bits // 8
    if sr_ext_bits:
        val = np.zeros(len(cand), np.int64)
        for j in range(sr_ext_bits // 8):
            val = (val << 8) | d[np.minimum(sr_off + j, n - 1)]
        ok &= val == sr_ext_val
    hdr_len = 4 + ulen + bs_ext_bits // 8 + sr_ext_bits // 8
    cand, number, blocksize, bs_ext_bits, hdr_len = \
        cand[ok], number[ok], blocksize[ok], bs_ext_bits[ok], hdr_len[ok]
    if len(cand) == 0:
        return None
    maxh = int(hdr_len.max())
    rows = np.zeros((len(cand), maxh), np.uint8)
    for j in range(maxh):
        rows[:, j] = d[np.minimum(cand + j, n - 1)]
    crc = crc_mod.crc8_batch(rows, hdr_len)
    good = crc == d[np.minimum(cand + hdr_len, n - 1)]
    cand, number, blocksize, bs_ext_bits = \
        cand[good], number[good], blocksize[good], bs_ext_bits[good]
    if len(cand) == 0:
        return None
    order = np.argsort(number, kind="stable")
    cand, number, blocksize, bs_ext_bits = \
        cand[order], number[order], blocksize[order], bs_ext_bits[order]
    # chain validation: contiguous sample coverage from 0, increasing offsets
    if number[0] != 0 or np.any(np.diff(cand) <= 0):
        return None
    if np.any(number[1:] != number[:-1] + blocksize[:-1]):
        return None
    if si.total_samples and int(number[-1] + blocksize[-1]) != si.total_samples:
        return None
    return (cand.astype(np.int64), blocksize.astype(np.int64),
            number.astype(np.int64), (bs_ext_bits + sr_ext_bits).astype(np.int64))


class StreamDecoder:
    """Whole-stream decoder using the device for the bulk of the frames."""

    def __init__(self, data: bytes, check_md5: bool = True, batch_frames: int = 64,
                 max_lpc_order: int = 32, continue_on_error: bool = False):
        self.data_bytes = bytes(data)
        self.continue_on_error = continue_on_error
        self.errors: list[str] = []
        self.d = np.frombuffer(self.data_bytes, np.uint8)
        pos = hd.skip_id3v2(self.data_bytes, 0)
        if self.data_bytes[pos:pos + 4] != C.STREAM_SYNC_STRING:
            raise hd.DecodeError("missing fLaC stream marker")
        self.metadata, self.audio_offset = parse_metadata(self.data_bytes, pos + 4)
        self.streaminfo = self.metadata[0]
        if not isinstance(self.streaminfo, StreamInfo):
            raise hd.DecodeError("first metadata block is not STREAMINFO")
        self.check_md5 = check_md5
        self.batch_frames = batch_frames
        self.max_lpc_order = max_lpc_order

    def _host_fallback(self, path: str) -> tuple[np.ndarray, dict]:
        host = hd.HostDecoder(self.data_bytes, check_md5=self.check_md5,
                              continue_on_error=self.continue_on_error)
        pcm, frames = host.decode_all()
        self.errors.extend(host.errors)
        return pcm, dict(frames=len(frames), path=path)

    def iter_blocks(self, check_crc: bool = True, lookahead: int = 3):
        """Stream the decoded PCM as bounded-size int32 [n, channels] blocks.

        The strict-mode streaming core: at most `lookahead` device batches
        are in flight, so host AND device memory stay bounded regardless of
        stream length (decode_all's previous queue-everything strategy kept
        every batch's PCM buffer live on the device — ~17 MB x nbatches).
        Performs exactly the checks strict decode_all performs (per-batch
        frame-length overrun, CRC-16, host reroute of pathological frames,
        final-partial-frame decode, total_samples clipping, incremental MD5
        with the verdict raised at exhaustion — the reference's decoder also
        delivers all blocks before the MD5 verdict, stream_decoder.h:797).

        Yielded blocks are read-shared with the MD5 worker thread — treat
        them as immutable (copy before mutating in place).

        Streams the device path can't index (ambiguous index, variable
        blocksize) fall back to their assembled decode and yield one block.
        After exhaustion `self.decode_info` carries the decode_all info
        dict. Not valid with continue_on_error: resync/concealment
        (-F decoding) rewrites already-delivered history and stays on the
        assembled paths.
        """
        if self.continue_on_error:
            raise ValueError("iter_blocks is the strict path; -F decoding "
                             "owns resync/concealment and assembles")
        si = self.streaminfo
        if si.min_blocksize != si.max_blocksize:
            pcm, info = self._decode_variable(check_crc)
            self.decode_info = info
            if len(pcm):
                yield pcm
            return
        # start the word-stream upload first (async) so it overlaps the
        # host-side sync scan of index_frames
        import collections

        import jax.numpy as jnp
        jwords = jnp.asarray(bytes_to_words(self.d, bucket=True))
        offsets = index_frames(self.d, self.audio_offset, si)
        if offsets is None:
            pcm, info = self._host_fallback("host-ambiguous")
            self.decode_info = info
            if len(pcm):
                yield pcm
            return
        geom = DecoderGeometry(blocksize=si.min_blocksize, channels=si.channels,
                               bits_per_sample=si.bits_per_sample,
                               sample_rate=si.sample_rate,
                               max_lpc_order=self.max_lpc_order)
        dec = build_frame_decoder(geom)
        nfr = len(offsets)
        # adaptive batch: one big batch for long streams, small for short
        # ones (each distinct batch size is a separate compile)
        B = 512 if nfr >= 256 else self.batch_frames
        md5 = (MD5Context() if self.check_md5 and si.md5sum != b"\x00" * 16
               else None)
        # MD5 runs on a single worker thread, in submission order: the
        # native update releases the GIL, so hashing overlaps the next
        # batch's fetch and the consumer's writes on multicore hosts
        # (~20 ms/batch otherwise serial with delivery)
        md5_pool = md5_fut = None
        if md5 is not None:
            from concurrent.futures import ThreadPoolExecutor
            md5_pool = ThreadPoolExecutor(max_workers=1)
        total_cap = si.total_samples or None
        emitted = 0
        host = None
        frames = nfr
        last_end = self.audio_offset

        def clip(block: np.ndarray) -> np.ndarray:
            nonlocal emitted, md5_fut
            if total_cap is not None and emitted + len(block) > total_cap:
                block = block[: max(total_cap - emitted, 0)]
            emitted += len(block)
            if md5 is not None and len(block):
                md5_fut = md5_pool.submit(md5.accumulate, block,
                                          si.bits_per_sample)
            return block

        try:
            pending = collections.deque()

            def submit(s: int) -> None:
                batch_off = offsets[s:s + B]
                nb = len(batch_off)
                if nb < B:
                    batch_off = np.concatenate(
                        [batch_off, np.repeat(batch_off[-1:], B - nb)])
                pending.append((s, nb, batch_off,
                                dec(jwords, jnp.asarray(batch_off * 8))))

            starts = list(range(0, nfr, B))
            for s in starts[:lookahead]:
                submit(s)
            next_i = min(lookahead, len(starts))
            while pending:
                s, nb, batch_off, (pcm, ends, meta) = pending.popleft()
                if next_i < len(starts):
                    submit(starts[next_i])
                    next_i += 1
                pcm = np.asarray(pcm)[:nb].astype(np.int32, copy=False)
                ends_np = np.asarray(ends)[:nb] // 8
                ovf = np.asarray(meta["unary_overflow"])[:nb]
                if ovf.any():
                    # unary runs beyond the decoder's bit window (pathological
                    # but legal streams): those frames re-decode on the host.
                    # np.asarray on a device array is a read-only view — copy
                    # before writing into it
                    if not pcm.flags.writeable:
                        pcm = pcm.copy()
                    if host is None:
                        host = hd.HostDecoder(self.data_bytes, check_md5=False)
                    for i in np.flatnonzero(ovf):
                        try:
                            fpcm, fi = host.decode_frame_at(int(batch_off[i]))
                        except (hd.DecodeError, EOFError, ValueError, KeyError) as e:
                            raise hd.DecodeError(
                                f"at byte {int(batch_off[i])}: {e}") from e
                        pcm[i] = fpcm.reshape(pcm[i].shape)
                        ends_np[i] = fi.offset + fi.size
                # frame-length sanity: frame k must end at or before frame k+1's
                # start (checked batch-locally against the global index)
                ks = np.arange(s, s + nb)
                lim = np.where(ks < nfr - 1, offsets[np.minimum(ks + 1, nfr - 1)],
                               len(self.d))
                if np.any(ends_np > lim):
                    raise StreamDecodeError("frame length overrun — corrupt stream?")
                if check_crc:
                    bad = self._check_crc16(offsets[s:s + nb], ends_np)
                    if len(bad):
                        raise hd.DecodeError(
                            "frame CRC-16 mismatch in frame(s) "
                            f"{(s + bad)[:5].tolist()}")
                last_end = int(ends_np[-1])
                block = clip(pcm.reshape(-1, si.channels))
                if len(block):
                    yield block
            # the final partial frame (not in the index) decodes on the host
            if last_end < len(self.d) - 2:
                host = hd.HostDecoder(self.data_bytes, check_md5=False)
                try:
                    tail_pcm, _fi = host.decode_frame_at(last_end)
                except hd.CrcMismatchError as e:
                    raise hd.DecodeError(f"at byte {last_end}: {e}") from e
                except (hd.DecodeError, EOFError):
                    tail_pcm = None  # trailing garbage/padding
                if tail_pcm is not None:
                    frames += 1
                    block = clip(tail_pcm)
                    if len(block):
                        yield block
            if md5 is not None:
                if md5_fut is not None:
                    md5_fut.result()  # barrier: all ordered updates done
                md5_pool.shutdown()
                if md5.digest() != si.md5sum:
                    raise hd.DecodeError("MD5 signature mismatch")
            self.decode_info = dict(frames=frames, path="device",
                                    errors=self.errors)
        finally:
            if md5_pool is not None:
                md5_pool.shutdown(wait=False)  # idempotent; frees the worker
                # when the consumer abandons the generator mid-stream

    def decode_all(self, check_crc: bool = True) -> tuple[np.ndarray, dict]:
        si = self.streaminfo
        if si.min_blocksize != si.max_blocksize:
            return self._decode_variable(check_crc)
        if not self.continue_on_error:
            # strict mode: assemble from the streaming core (identical
            # checks/raises; bounded in-flight device memory)
            parts = list(self.iter_blocks(check_crc))
            pcm = (np.concatenate(parts, axis=0) if parts
                   else np.zeros((0, si.channels), np.int32))
            return pcm, dict(self.decode_info)
        # start the word-stream upload first (async) so it overlaps the
        # host-side sync scan of index_frames
        import jax.numpy as jnp
        jwords = jnp.asarray(bytes_to_words(self.d, bucket=True))
        offsets = index_frames(self.d, self.audio_offset, si)
        if offsets is None:
            return self._host_fallback("host-ambiguous")
        geom = DecoderGeometry(blocksize=si.min_blocksize, channels=si.channels,
                               bits_per_sample=si.bits_per_sample,
                               sample_rate=si.sample_rate,
                               max_lpc_order=self.max_lpc_order)
        dec = build_frame_decoder(geom)
        nfr = len(offsets)
        pcm_parts = []
        ends_all = np.zeros(nfr, np.int64)
        # adaptive batch: one big batch for long streams, small for short
        # ones (each distinct batch size is a separate compile)
        B = 512 if nfr >= 256 else self.batch_frames
        host = None
        # queue every batch before fetching any: device compute of later
        # batches overlaps the D2H of earlier ones
        queued = []
        for s in range(0, nfr, B):
            batch_off = offsets[s:s + B]
            nb = len(batch_off)
            if nb < B:
                batch_off = np.concatenate([batch_off, np.repeat(batch_off[-1:], B - nb)])
            queued.append((s, nb, batch_off,
                           dec(jwords, jnp.asarray(batch_off * 8))))
        for s, nb, batch_off, (pcm, ends, meta) in queued:
            pcm = np.asarray(pcm)[:nb].astype(np.int32, copy=False)
            ends_np = np.asarray(ends)[:nb] // 8
            ovf = np.asarray(meta["unary_overflow"])[:nb]
            if ovf.any():
                # unary runs beyond the decoder's bit window (pathological
                # but legal streams): those frames re-decode on the host.
                # np.asarray on a device array is a read-only view (and
                # astype(copy=False) preserves that when dtype is already
                # int32, i.e. for bps > 16) — copy before writing into it
                if not pcm.flags.writeable:
                    pcm = pcm.copy()
                if host is None:
                    host = hd.HostDecoder(self.data_bytes, check_md5=False)
                for i in np.flatnonzero(ovf):
                    try:
                        fpcm, fi = host.decode_frame_at(int(batch_off[i]))
                        pcm[i] = fpcm.reshape(pcm[i].shape)
                        ends_np[i] = fi.offset + fi.size
                    except (hd.DecodeError, EOFError, ValueError, KeyError) as e:
                        if not self.continue_on_error:
                            raise hd.DecodeError(
                                f"at byte {int(batch_off[i])}: {e}") from e
                        # conceal: zero the block, trust the index for length
                        self.errors.append(f"at byte {int(batch_off[i])}: {e}")
                        pcm[i] = 0
                        k = s + i
                        ends_np[i] = offsets[k + 1] if k + 1 < nfr else len(self.d)
            ends_all[s:s + nb] = ends_np
            pcm_parts.append(pcm.reshape(-1, si.channels))
        pcm = (np.concatenate(pcm_parts, axis=0) if pcm_parts
               else np.zeros((0, si.channels), np.int32))
        # frame-length sanity: frame k must end at or before frame k+1's start
        if nfr:
            if np.any(ends_all[:-1] > offsets[1:]) or ends_all[-1] > len(self.d):
                if self.continue_on_error:
                    # index unreliable: redo the whole stream sequentially
                    # with reference concealment semantics
                    self.errors.append("frame length overrun — sequential redecode")
                    return self._host_fallback("host-overrun")
                raise StreamDecodeError("frame length overrun — corrupt stream?")
            if check_crc:
                bad = self._check_crc16(offsets, ends_all)
                if len(bad):
                    if not self.continue_on_error:
                        raise hd.DecodeError(
                            f"frame CRC-16 mismatch in frame(s) {bad[:5].tolist()}")
                    # conceal exactly like the reference (stream_decoder.c
                    # :2106-2113): zero the affected blocks, keep decoding
                    for k in bad:
                        self.errors.append(
                            f"at byte {int(offsets[k])}: frame CRC-16 mismatch")
                        pcm[k * si.min_blocksize:(k + 1) * si.min_blocksize] = 0
        # the final partial frame (not in the index) decodes on the host
        tail_start = int(ends_all[-1]) if nfr else self.audio_offset
        frames = nfr
        if tail_start < len(self.d) - 2:
            host = hd.HostDecoder(self.data_bytes, check_md5=False)
            try:
                tail_pcm, fi = host.decode_frame_at(tail_start)
                pcm = np.concatenate([pcm, tail_pcm], axis=0)
                frames += 1
            except hd.CrcMismatchError as e:
                if self.continue_on_error and e.frame.channels == si.channels:
                    self.errors.append(f"at byte {tail_start}: {e}")
                    pcm = np.concatenate(
                        [pcm, np.zeros((e.frame.blocksize, si.channels), np.int32)],
                        axis=0)
                    frames += 1
                elif not self.continue_on_error:
                    raise hd.DecodeError(f"at byte {tail_start}: {e}") from e
            except (hd.DecodeError, EOFError):
                pass  # trailing garbage/padding
        if si.total_samples and len(pcm) > si.total_samples:
            pcm = pcm[: si.total_samples]
        if self.check_md5 and si.md5sum != b"\x00" * 16:
            md5 = MD5Context()
            md5.accumulate(pcm, si.bits_per_sample)
            if md5.digest() != si.md5sum:
                if not self.continue_on_error:
                    raise hd.DecodeError("MD5 signature mismatch")
                self.errors.append("MD5 signature mismatch")
        return pcm, dict(frames=frames, path="device", errors=self.errors)

    def _check_crc16(self, offsets: np.ndarray, ends: np.ndarray) -> np.ndarray:
        return check_frame_crc16(self.data_bytes, self.d, offsets, ends)

    # -- variable-blocksize streams (blocking_strategy=1) ---------------------
    # Foreign encoders only — neither this encoder nor the reference's emits
    # them. Frames GROUP BY BLOCKSIZE: each group is a uniform-geometry batch
    # for the device decoder; tiny groups (and anything the index can't pin
    # down) go to the sequential host decoder.

    _VAR_MIN_GROUP = 4    # below this, host decode beats a fresh XLA compile
    _VAR_MAX_GROUPS = 8   # distinct device geometries per stream (compiles)

    def _decode_variable(self, check_crc: bool) -> tuple[np.ndarray, dict]:
        si = self.streaminfo
        if self.continue_on_error:
            # concealment/resync semantics are the sequential path's
            return self._host_fallback("host")
        import jax.numpy as jnp
        jwords = jnp.asarray(bytes_to_words(self.d, bucket=True))
        idx = index_frames_variable(self.d, self.audio_offset, si)
        if idx is None:
            return self._host_fallback("host")
        offsets, bss, snos, exts = idx
        nfr = len(offsets)
        total = int(snos[-1] + bss[-1]) if nfr else 0
        pcm = np.zeros((total, si.channels), np.int32)
        ends_all = np.zeros(nfr, np.int64)
        host = None
        # device groups: the most frequent blocksizes, large groups only
        uniq, counts = np.unique(bss, return_counts=True)
        top = np.argsort(-counts)[: self._VAR_MAX_GROUPS]
        dev_bs = {int(b) for b, c in zip(uniq[top], counts[top])
                  if c >= self._VAR_MIN_GROUP}
        host_idx = [i for i in range(nfr) if int(bss[i]) not in dev_bs]
        for bs in sorted(dev_bs):
            sel = np.flatnonzero(bss == bs)
            geom = DecoderGeometry(blocksize=int(bs), channels=si.channels,
                                   bits_per_sample=si.bits_per_sample,
                                   sample_rate=si.sample_rate,
                                   max_lpc_order=self.max_lpc_order,
                                   dynamic_header_ext=True)
            dec = build_frame_decoder(geom)
            B = min(self.batch_frames, len(sel))
            for s in range(0, len(sel), B):
                g = sel[s:s + B]
                nb = len(g)
                gg = np.concatenate([g, np.repeat(g[-1:], B - nb)]) if nb < B else g
                gp, ge, gm = dec(jwords, jnp.asarray(offsets[gg] * 8),
                                 jnp.asarray(exts[gg]))
                gp = np.asarray(gp)[:nb].astype(np.int32, copy=False)
                ge_np = np.asarray(ge)[:nb] // 8
                ovf = np.asarray(gm["unary_overflow"])[:nb]
                if ovf.any() and not gp.flags.writeable:
                    gp = gp.copy()
                for j in np.flatnonzero(ovf):
                    if host is None:
                        host = hd.HostDecoder(self.data_bytes, check_md5=False)
                    fpcm, fi = host.decode_frame_at(int(offsets[g[j]]))
                    gp[j] = fpcm.reshape(gp[j].shape)
                    ge_np[j] = fi.offset + fi.size
                for j in range(nb):
                    k = g[j]
                    pcm[snos[k]: snos[k] + bs] = gp[j].reshape(-1, si.channels)
                    ends_all[k] = ge_np[j]
        for k in host_idx:
            if host is None:
                host = hd.HostDecoder(self.data_bytes, check_md5=False)
            fpcm, fi = host.decode_frame_at(int(offsets[k]))
            pcm[snos[k]: snos[k] + bss[k]] = fpcm
            ends_all[k] = fi.offset + fi.size
        if nfr:
            if np.any(ends_all[:-1] > offsets[1:]) or ends_all[-1] > len(self.d):
                raise StreamDecodeError("frame length overrun — corrupt stream?")
            if check_crc:
                bad = self._check_crc16(offsets, ends_all)
                if len(bad):
                    raise hd.DecodeError(
                        f"frame CRC-16 mismatch in frame(s) {bad[:5].tolist()}")
        if si.total_samples and len(pcm) > si.total_samples:
            pcm = pcm[: si.total_samples]
        if self.check_md5 and si.md5sum != b"\x00" * 16:
            md5 = MD5Context()
            md5.accumulate(pcm, si.bits_per_sample)
            if md5.digest() != si.md5sum:
                raise hd.DecodeError("MD5 signature mismatch")
        return pcm, dict(frames=nfr, path="device-variable", errors=self.errors)


def check_frame_crc16(data_bytes: bytes, d: np.ndarray, offsets: np.ndarray,
                      ends: np.ndarray) -> np.ndarray:
    """CRC-16 validation of every frame (stream_decoder.c:2061).
    Returns the indices of mismatching frames."""
    lengths = ends - offsets
    stored = (d[np.minimum(offsets + lengths - 2, len(d) - 1)].astype(np.uint16) << 8) \
        | d[np.minimum(offsets + lengths - 1, len(d) - 1)]
    try:
        # one native call over the stream buffer: ~10x faster than per-frame
        # Python slices + ctypes calls, ~80x the numpy fallback (which at
        # 512x5.5KB frames cost 5x the device decode kernel itself)
        from flac_tpu._native import crc16_many
        crcs = crc16_many(d, offsets, np.maximum(lengths - 2, 0))
    except Exception:
        # pure-Python fallback: columnwise batch over a padded matrix
        maxlen = int(lengths.max())
        idx = np.minimum(offsets[:, None] + np.arange(maxlen)[None, :],
                         len(d) - 1)
        crcs = crc_mod.crc16_batch(d[idx], lengths - 2)
    return np.flatnonzero(crcs != stored)


def decode_bytes_device(data: bytes, check_md5: bool = True, batch_frames: int = 64,
                        max_lpc_order: int = 32, continue_on_error: bool = False):
    dec = StreamDecoder(data, check_md5=check_md5, batch_frames=batch_frames,
                        max_lpc_order=max_lpc_order,
                        continue_on_error=continue_on_error)
    pcm, info = dec.decode_all()
    return pcm, dec.streaminfo, info
