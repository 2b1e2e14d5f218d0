"""Tests for the batched device decoder and stream indexer."""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.containers.wav import AudioBuffer, write_wav
from flac_tpu.decode.stream import decode_bytes_device, index_frames
from flac_tpu.encode.encoder import encode_file
from flac_tpu.metadata import parse_metadata


def _encode(tmp_path, sig, bps, level, rate=44100, **kw):
    path = tmp_path / "t.flac"
    encode_file(sig, rate, bps, str(path), level=level, batch_frames=8, **kw)
    return path.read_bytes()


class TestDeviceDecode:
    @pytest.mark.parametrize("level", [0, 5])
    def test_roundtrip_stereo(self, tmp_path, level):
        sig = make_signal(4096 * 4 + 321, 2, 16, kind="sine")
        data = _encode(tmp_path, sig, 16, level)
        pcm, si, info = decode_bytes_device(data, batch_frames=8, max_lpc_order=12)
        assert info["path"] == "device"
        np.testing.assert_array_equal(pcm, sig)

    def test_roundtrip_special(self, tmp_path):
        for kind in ("noise", "constant", "wasted"):
            sig = make_signal(4096 * 2, 2, 16, kind=kind, seed=21)
            data = _encode(tmp_path, sig, 16, 5)
            pcm, si, info = decode_bytes_device(data, batch_frames=8, max_lpc_order=12)
            np.testing.assert_array_equal(pcm, sig)

    def test_oracle_files(self, oracle, tmp_path):
        sig = make_signal(4096 * 3 + 11, 2, 16, kind="sine")
        wav = tmp_path / "o.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
        for level in (0, 8):
            path = tmp_path / "o.flac"
            subprocess.run([str(oracle), f"-{level}", "-f", "-o", str(path), str(wav)],
                           capture_output=True, check=True)
            pcm, si, info = decode_bytes_device(path.read_bytes(), batch_frames=8,
                                                max_lpc_order=12)
            assert info["path"] == "device"
            np.testing.assert_array_equal(pcm, sig)

    def test_verify_mode(self, tmp_path):
        sig = make_signal(4096 * 2 + 5, 2, 16, kind="sine")
        _encode(tmp_path, sig, 16, 5, verify=True)  # raises VerifyError on mismatch

    def test_corrupt_frame_crc_detected(self, tmp_path):
        sig = make_signal(4096 * 3, 2, 16)
        data = bytearray(_encode(tmp_path, sig, 16, 2))
        data[len(data) - 1000] ^= 0x08
        from flac_tpu.decode.host_decoder import DecodeError
        with pytest.raises(DecodeError):
            decode_bytes_device(bytes(data), batch_frames=8, max_lpc_order=12)


class TestIndexer:
    def test_index_matches_frame_count(self, tmp_path):
        sig = make_signal(4096 * 5 + 100, 1, 16)
        data = _encode(tmp_path, sig, 16, 1)
        d = np.frombuffer(data, np.uint8)
        blocks, off = parse_metadata(data)
        bs = blocks[0].min_blocksize
        offsets = index_frames(d, off, blocks[0])
        assert offsets is not None
        assert len(offsets) == len(sig) // bs  # partial tail excluded
        assert offsets[0] == off
