"""Random access: the analog of FLAC__stream_decoder_seek_absolute.

Reference algorithm (src/libFLAC/stream_decoder.c:1163 →
seek_to_absolute_sample_ :2973): establish byte bounds
[first_frame_offset, stream_length], refine them from SEEKTABLE points
(:3031-3073), then run a linear-interpolated bisection — jump to a guessed
byte position, scan for the next frame sync, parse the header (CRC-8
validated, so payload false-syncs are rejected) to learn that frame's first
sample number, and narrow the interval until the frame containing the target
is found. The delivered block is trimmed to start exactly at the target
sample (write_audio_frame_to_client_ trimming).

This host-side implementation keeps the same O(log n) structure. Bulk reads
after a seek use the device batch decoder when the stream has the fixed
uniform geometry (flac_tpu.decode.stream), falling back to sequential host
decode otherwise.
"""

from __future__ import annotations

import numpy as np

from flac_tpu.bitio import BitReader
from flac_tpu.decode import host_decoder as hd
from flac_tpu.metadata import SeekTable, StreamInfo


class SeekError(Exception):
    pass


class SeekableDecoder:
    """Positioned decoding over an in-memory FLAC stream.

    Usage:
        dec = SeekableDecoder(flac_bytes)
        dec.seek_absolute(123456)
        pcm = dec.read(44100)          # [n, channels] int32

    or one-shot:
        pcm = dec.decode_range(123456, 44100)
    """

    def __init__(self, data: bytes, check_crc: bool = True) -> None:
        data = bytes(data)
        # Ogg FLAC transport: unwrap to the native stream so bulk reads keep
        # the batched device path. Page-level (no-unwrap) random access lives
        # in flac_tpu.ogg.OggSeekableDecoder.
        if data[:4] == b"OggS":
            from flac_tpu.ogg import flac_stream_from_ogg
            data = flac_stream_from_ogg(data)
        self._host = hd.HostDecoder(bytes(data), check_md5=False)
        self.data = self._host.data
        self.streaminfo: StreamInfo = self._host.streaminfo
        self.metadata = self._host.metadata
        self.audio_offset = self._host.audio_offset
        self.check_crc = check_crc
        self.seektable: SeekTable | None = next(
            (b for b in self.metadata if isinstance(b, SeekTable)), None)
        # decode position state
        self._byte_pos = self.audio_offset
        self._pending: np.ndarray | None = None  # leftover PCM from current frame

    # -- header-only probing ---------------------------------------------------

    def _probe_frame(self, pos: int, limit: int | None = None):
        """Scan forward from byte `pos` for a valid frame header; return
        (offset, first_sample, blocksize) without decoding the payload.
        CRC-8 rejects false syncs inside subframe payloads."""
        end = len(self.data) if limit is None else min(limit, len(self.data))
        while True:
            try:
                pos = self._host.find_sync(pos)
            except EOFError:
                raise SeekError("no frame sync found") from None
            if pos >= end:
                raise SeekError("no frame sync found in range")
            r = BitReader(self.data, pos * 8)
            try:
                bs, _sr, _ch, _ca, _bps, strat, number = self._host.read_frame_header(r)
            except (hd.DecodeError, EOFError, KeyError, ValueError):
                # a false sync inside payload bytes: CRC-8 mismatch, reserved
                # codes, or malformed UTF-8 numbers — scan on
                pos += 1
                continue
            first_sample = number if strat else number * self.streaminfo.min_blocksize
            return pos, first_sample, bs

    def _total_samples_estimate(self) -> int:
        si = self.streaminfo
        if si.total_samples:
            return si.total_samples
        # unknown length: estimate from stream size and a probed frame's density
        pos, first_sample, bs = self._probe_frame(self.audio_offset)
        audio_bytes = len(self.data) - self.audio_offset
        # decode one frame to learn bytes/frame
        _pcm, fi = self._host.decode_frame_at(pos)
        return max(1, audio_bytes * bs // max(fi.size, 1))

    # -- seeking ---------------------------------------------------------------

    def seek_absolute(self, target_sample: int) -> None:
        """Position the decoder so the next read() returns samples starting
        at `target_sample` (seek_to_absolute_sample_, stream_decoder.c:2973)."""
        si = self.streaminfo
        total = self._total_samples_estimate()
        if target_sample < 0:
            raise SeekError("negative target sample")
        if si.total_samples and target_sample >= si.total_samples:
            raise SeekError("seek past end of stream")

        lower_pos, lower_sample = self.audio_offset, 0
        upper_pos, upper_sample = len(self.data), max(total, 1)

        # refine bounds from the seektable (stream_decoder.c:3031-3073)
        if self.seektable is not None:
            for p in self.seektable.points:
                if p.is_placeholder:
                    continue
                s = p.sample_number
                off = self.audio_offset + p.stream_offset
                if s <= target_sample and s >= lower_sample and off >= self.audio_offset:
                    lower_pos, lower_sample = off, s
                elif s > target_sample and (s < upper_sample or upper_pos == len(self.data)):
                    upper_pos, upper_sample = min(off, len(self.data)), s

        # linear-interpolated bisection on sample position
        pos = lower_pos
        for _ in range(64):  # convergence guard (reference loops with bound degeneracy checks)
            span_samples = max(upper_sample - lower_sample, 1)
            frac = (target_sample - lower_sample) / span_samples
            guess = int(lower_pos + frac * (upper_pos - lower_pos))
            # back off ~one max frame so the sync scan lands at or before the target frame
            approx_frame_bytes = max(
                (upper_pos - lower_pos) * si.min_blocksize // span_samples, 64)
            guess = max(lower_pos, min(guess - approx_frame_bytes, upper_pos - 1))
            try:
                fpos, fsample, fbs = self._probe_frame(guess, limit=upper_pos)
            except SeekError:
                # overshot into the last partial region: bisect down
                upper_pos = guess
                if upper_pos <= lower_pos:
                    raise
                continue
            if fsample <= target_sample < fsample + fbs:
                self._byte_pos = fpos
                self._pending = None
                self._skip_into_frame = target_sample - fsample
                return
            if fsample > target_sample:
                if (fpos, fsample) == (upper_pos, upper_sample):
                    # degenerate: scan linearly backward by shrinking upper
                    upper_pos = max(lower_pos + 1, fpos - 1)
                else:
                    upper_pos, upper_sample = fpos, fsample
            else:
                if (fpos, fsample) == (lower_pos, lower_sample) and fpos >= guess:
                    # degenerate: walk forward frame by frame
                    _pcm, fi = self._host.decode_frame_at(fpos)
                    lower_pos, lower_sample = fpos + fi.size, fsample + fbs
                else:
                    lower_pos, lower_sample = fpos, fsample
                pos = lower_pos
        raise SeekError("seek did not converge")

    # -- reading ---------------------------------------------------------------

    _DEVICE_MIN_FRAMES = 8  # below this, per-frame host decode is cheaper

    def _frame_index(self):
        """Lazy global frame index (stream.index_frames) for bulk reads;
        None when the stream isn't uniform-geometry or is ambiguous."""
        if not hasattr(self, "_findex"):
            self._findex = None
            si = self.streaminfo
            if si.min_blocksize == si.max_blocksize:
                from flac_tpu.decode.stream import index_frames
                d = np.frombuffer(self.data, np.uint8)
                idx = index_frames(d, self.audio_offset, si)
                if idx is not None and len(idx):
                    self._findex = np.asarray(idx, np.int64)
        return self._findex

    def _device_decode_frames(self, offs: np.ndarray):
        """Batched device decode of full frames at `offs`; returns
        (pcm [m*blocksize, ch], end_byte_of_last_frame) or None on failure."""
        try:
            import jax.numpy as jnp

            from flac_tpu.decode.frame_decoder import (
                DecoderGeometry,
                build_frame_decoder,
                bytes_to_words,
            )
        except Exception:
            return None
        si = self.streaminfo
        geom = DecoderGeometry(blocksize=si.min_blocksize, channels=si.channels,
                               bits_per_sample=si.bits_per_sample,
                               sample_rate=si.sample_rate)
        dec = build_frame_decoder(geom)
        if not hasattr(self, "_jwords"):
            self._jwords = jnp.asarray(bytes_to_words(self.data, bucket=True))
        B = 64
        parts: list[np.ndarray] = []
        end = 0
        m = len(offs)
        for s in range(0, m, B):
            bo = offs[s : s + B]
            nb = len(bo)
            if nb < B:
                bo = np.concatenate([bo, np.repeat(bo[-1:], B - nb)])
            pcm, ends, meta = dec(self._jwords, jnp.asarray(bo * 8))
            pcm = np.asarray(pcm)[:nb].astype(np.int32, copy=False)
            ends_np = np.asarray(ends)[:nb] // 8
            ovf = np.asarray(meta["unary_overflow"])[:nb]
            if ovf.any() and not pcm.flags.writeable:
                pcm = pcm.copy()  # device view is read-only for bps > 16
            for j in np.flatnonzero(ovf):  # pathological frames -> host
                fpcm, fi = self._host.decode_frame_at(int(bo[j]))
                pcm[j] = fpcm.reshape(pcm[j].shape)
                ends_np[j] = fi.offset + fi.size
            # frame-length sanity vs the next indexed offsets
            nxt = offs[s + 1 : s + nb]
            if (len(nxt) and np.any(ends_np[: len(nxt)] > nxt)) \
                    or ends_np[nb - 1] > len(self.data):
                return None
            parts.append(pcm.reshape(-1, si.channels))
            end = int(ends_np[nb - 1])
        return np.concatenate(parts, axis=0), end

    def read(self, nsamples: int) -> np.ndarray:
        """Decode `nsamples` samples from the current position (fewer at EOF).

        Bulk reads over uniform-geometry streams run through the batched
        device decoder; the tail/partial frames and non-uniform streams use
        the sequential host decoder."""
        parts: list[np.ndarray] = []
        got = 0
        skip = getattr(self, "_skip_into_frame", 0)
        self._skip_into_frame = 0
        if self._pending is not None and len(self._pending):
            take = self._pending[: nsamples]
            self._pending = self._pending[len(take):]
            parts.append(take)
            got += len(take)
        bs = max(self.streaminfo.min_blocksize, 1)
        while got < nsamples and self._byte_pos < len(self.data) - 2:
            need_frames = (nsamples - got + skip) // bs
            if need_frames >= self._DEVICE_MIN_FRAMES:
                idx = self._frame_index()
                if idx is not None:
                    i = int(np.searchsorted(idx, self._byte_pos))
                    if i < len(idx) and idx[i] == self._byte_pos:
                        m = min(need_frames, len(idx) - i)
                        if m >= self._DEVICE_MIN_FRAMES:
                            res = self._device_decode_frames(idx[i : i + m])
                            if res is not None:
                                block, end_byte = res
                                self._byte_pos = end_byte
                                if skip:
                                    block = block[skip:]
                                    skip = 0
                                take = block[: nsamples - got]
                                if len(take) < len(block):
                                    self._pending = block[len(take):]
                                parts.append(take)
                                got += len(take)
                                continue
            try:
                pcm, fi = self._host.decode_frame_at(self._byte_pos)
            except (hd.DecodeError, EOFError, ValueError, KeyError):
                break  # trailing garbage / end of audio
            self._byte_pos += fi.size
            if skip:
                pcm = pcm[skip:]
                skip = 0
            take = pcm[: nsamples - got]
            if len(take) < len(pcm):
                self._pending = pcm[len(take):]
            parts.append(take)
            got += len(take)
        if not parts:
            return np.zeros((0, self.streaminfo.channels), np.int32)
        return np.concatenate(parts, axis=0)

    def decode_range(self, start_sample: int, nsamples: int) -> np.ndarray:
        """One-shot positioned decode: seek + read."""
        self.seek_absolute(start_sample)
        return self.read(nsamples)

    def tell(self) -> int:
        """Current byte position in the stream (diagnostic)."""
        return self._byte_pos
