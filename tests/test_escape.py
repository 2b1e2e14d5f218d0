"""Encode-side escaped (raw-bits) partition coding.

The reference searches escaped partitions when do_escape_coding is set
(stream_encoder.c:3694 precompute_partition_info_escapes_ at :3844, selection
in set_partitioned_rice_ :4012-4021, emission stream_encoder_framing.c:478).
Off in every preset; these tests turn it on explicitly.
"""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.decode.host_decoder import HostDecoder
from flac_tpu.encode.encoder import encode_file


def _burst_signal(n: int, bps: int, seed: int = 5) -> np.ndarray:
    """Mostly-tonal signal with one full-scale noise burst confined to a few
    Rice partitions — exactly where an escaped raw partition beats Rice."""
    rng = np.random.default_rng(seed)
    full = (1 << (bps - 1)) - 1
    t = np.arange(n)
    sig = np.round(0.05 * full * np.sin(2 * np.pi * t / 97.0)).astype(np.int64)
    burst = slice(4096 + 512, 4096 + 1024)
    sig[burst] = rng.integers(-full - 1, full, burst.stop - burst.start)
    left = sig
    right = np.round(0.9 * sig).astype(np.int64)
    return np.stack([left, right], axis=-1).astype(np.int32)


def _escaped_partitions(data: bytes) -> int:
    dec = HostDecoder(data)
    _, frames = dec.decode_all()
    return sum(p == -1
               for f in frames for s in f.subframes for p in s.rice_params)


class TestEscapeCoding:
    def test_escapes_emitted_and_lossless(self, tmp_path):
        sig = _burst_signal(4096 * 3, 16)
        p_esc = tmp_path / "esc.flac"
        p_no = tmp_path / "no.flac"
        encode_file(sig, 44100, 16, str(p_esc), level=5, batch_frames=8,
                    do_escape_coding=True)
        encode_file(sig, 44100, 16, str(p_no), level=5, batch_frames=8)
        data = p_esc.read_bytes()
        assert _escaped_partitions(data) > 0, "no escaped partitions emitted"
        assert _escaped_partitions(p_no.read_bytes()) == 0
        # escape coding may only ever shrink the stream
        assert p_esc.stat().st_size <= p_no.stat().st_size
        pcm, frames = HostDecoder(data).decode_all()
        np.testing.assert_array_equal(pcm, sig)

    def test_oracle_accepts_escaped_stream(self, oracle, tmp_path):
        sig = _burst_signal(4096 * 2 + 333, 16)
        path = tmp_path / "esc.flac"
        encode_file(sig, 44100, 16, str(path), level=5, batch_frames=8,
                    do_escape_coding=True)
        assert _escaped_partitions(path.read_bytes()) > 0
        r = subprocess.run([str(oracle), "-t", str(path)], capture_output=True)
        assert r.returncode == 0, r.stderr.decode()

    def test_rice2_stream_with_escapes(self, tmp_path):
        # bps > 16 uses the RICE2 method whose escape parameter is 31
        sig = _burst_signal(4096 * 2, 24, seed=11)
        path = tmp_path / "esc24.flac"
        encode_file(sig, 96000, 24, str(path), level=3, batch_frames=8,
                    do_escape_coding=True)
        data = path.read_bytes()
        assert _escaped_partitions(data) > 0
        pcm, _ = HostDecoder(data).decode_all()
        np.testing.assert_array_equal(pcm, sig)

    def test_device_decode_of_escaped_stream(self, tmp_path):
        from flac_tpu.decode.stream import decode_bytes_device

        sig = _burst_signal(4096 * 4, 16, seed=7)
        path = tmp_path / "esc.flac"
        encode_file(sig, 44100, 16, str(path), level=5, batch_frames=8,
                    do_escape_coding=True)
        data = path.read_bytes()
        assert _escaped_partitions(data) > 0
        pcm, si, info = decode_bytes_device(data, batch_frames=8, max_lpc_order=12)
        assert info["path"] == "device"
        np.testing.assert_array_equal(pcm, sig)
