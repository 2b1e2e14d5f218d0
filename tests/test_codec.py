"""End-to-end codec tests: lossless round trips at every level, differential
verification against the reference `flac` binary, host-decoder coverage.

The analog of the reference's test_streams.sh encode-decode-compare matrix
(test/test_streams.sh:63-81) plus pieces of test_flac.sh.
"""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.containers.wav import AudioBuffer, read_wav, write_wav
from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.encode.encoder import encode_file
from flac_tpu.md5 import md5_of_pcm
from flac_tpu.metadata import parse_metadata


def _roundtrip_self(sig, bps, level, rate=44100, **kw):
    """Encode with our encoder, decode with our host decoder."""
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as f:
        path = f.name
    try:
        encode_file(sig, rate, bps, path, level=level, batch_frames=8, **kw)
        data = open(path, "rb").read()
    finally:
        os.unlink(path)
    pcm, si, frames = decode_bytes(data)  # raises on CRC/MD5 mismatch
    np.testing.assert_array_equal(pcm, sig)
    return data, si, frames


def _oracle_roundtrip(oracle, tmp_path, sig, bps, level, rate=44100):
    """Encode with our encoder, test + decode with the reference binary."""
    path = tmp_path / "t.flac"
    encode_file(sig, rate, bps, str(path), level=level, batch_frames=8)
    r = subprocess.run([str(oracle), "-t", str(path)], capture_output=True, text=True)
    assert r.returncode == 0, f"oracle -t failed: {r.stderr[-300:]}"
    out = tmp_path / "t.wav"
    r = subprocess.run([str(oracle), "-d", "-f", "-o", str(out), str(path)],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"oracle -d failed: {r.stderr[-300:]}"
    dec = read_wav(str(out))
    np.testing.assert_array_equal(dec.samples, sig)


class TestSelfRoundtrip:
    @pytest.mark.parametrize("level", [0, 2, 5])
    def test_stereo16_levels(self, level):
        sig = make_signal(4096 * 3 + 555, 2, 16, kind="sine")
        _roundtrip_self(sig, 16, level)

    def test_mono16(self):
        sig = make_signal(1152 * 2 + 100, 1, 16, kind="quiet")
        _roundtrip_self(sig, 16, 1)

    def test_special_signals(self):
        for kind in ("noise", "constant", "wasted"):
            sig = make_signal(4096 + 77, 2, 16, kind=kind, seed=11)
            _roundtrip_self(sig, 16, 5)

    def test_24bit(self):
        sig = make_signal(4096 + 1, 2, 24, kind="quiet", seed=6)
        _roundtrip_self(sig, 24, 5, rate=96000)

    def test_8bit(self):
        sig = make_signal(2000, 1, 8, kind="quiet", seed=7)
        _roundtrip_self(sig, 8, 4)

    def test_md5_stored(self):
        sig = make_signal(5000, 2, 16)
        data, si, _ = _roundtrip_self(sig, 16, 2)
        assert si.md5sum == md5_of_pcm(sig, 16)

    def test_tiny_and_empty(self):
        _roundtrip_self(make_signal(3, 2, 16), 16, 5)
        _roundtrip_self(np.zeros((0, 1), np.int32), 16, 5)

    def test_seekpoints_filled(self):
        import io
        from flac_tpu.encode.encoder import StreamEncoder
        from flac_tpu.encode.frame_encoder import EncoderConfig
        from flac_tpu.metadata import SeekTable
        sig = make_signal(4096 * 5, 1, 16)
        buf = io.BytesIO()
        cfg = EncoderConfig.from_level(2, 1, 16, 44100)
        enc = StreamEncoder(cfg, buf, seekpoints=[0, 5000, 12000], batch_frames=4)
        enc.process(sig)
        enc.finish()
        blocks, off = parse_metadata(buf.getvalue())
        st = [b for b in blocks if isinstance(b, SeekTable)][0]
        bs = cfg.blocksize
        assert len(st.points) == 3
        assert st.points[0].sample_number == 0 and st.points[0].stream_offset == 0
        assert st.points[1].sample_number == (5000 // bs) * bs  # frame containing 5000
        assert st.points[1].stream_offset > 0
        # decode from a seekpoint: the frame there must parse
        from flac_tpu.decode.host_decoder import HostDecoder
        dec = HostDecoder(buf.getvalue())
        pcm, fr = dec.decode_frame_at(dec.audio_offset + st.points[1].stream_offset)
        assert fr.frame_number == 5000 // bs


class TestOracleDifferential:
    @pytest.mark.parametrize("level", [0, 5, 8])
    def test_stereo16(self, oracle, tmp_path, level):
        sig = make_signal(4096 * 2 + 999, 2, 16, kind="sine")
        _oracle_roundtrip(oracle, tmp_path, sig, 16, level)

    def test_24bit96k(self, oracle, tmp_path):
        sig = make_signal(4096 + 500, 2, 24, kind="quiet", seed=9)
        _oracle_roundtrip(oracle, tmp_path, sig, 24, 8, rate=96000)

    def test_decode_oracle_files(self, oracle, tmp_path):
        """Our host decoder must decode reference-encoded files at all levels."""
        sig = make_signal(4096 * 2 + 33, 2, 16, kind="sine")
        wav = tmp_path / "o.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
        for level in (0, 5, 8):
            path = tmp_path / f"o{level}.flac"
            subprocess.run([str(oracle), f"-{level}", "-f", "-o", str(path), str(wav)],
                           capture_output=True, check=True)
            pcm, si, frames = decode_bytes(path.read_bytes())
            np.testing.assert_array_equal(pcm, sig)

    def test_compression_competitive(self, oracle, tmp_path):
        """Our -5 output should not be larger than the reference's."""
        import os
        sig = make_signal(44100, 2, 16, kind="sine")
        wav = tmp_path / "c.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
        subprocess.run([str(oracle), "-5", "-f", "--no-padding", "-o",
                        str(tmp_path / "c_ref.flac"), str(wav)], capture_output=True, check=True)
        encode_file(sig, 44100, 16, str(tmp_path / "c_mine.flac"), level=5, batch_frames=8)
        assert (os.path.getsize(tmp_path / "c_mine.flac")
                <= os.path.getsize(tmp_path / "c_ref.flac") * 1.001)


class TestErrorHandling:
    def test_corrupt_frame_detected(self):
        sig = make_signal(4096 * 3, 1, 16)
        data, si, frames = _roundtrip_self(sig, 16, 2)
        # flip a bit inside the second frame's residuals
        blob = bytearray(data)
        pos = len(blob) // 2
        blob[pos] ^= 0x10
        from flac_tpu.decode.host_decoder import DecodeError, HostDecoder
        with pytest.raises(DecodeError):
            decode_bytes(bytes(blob))
        dec = HostDecoder(bytes(blob), continue_on_error=True, check_md5=False)
        pcm, fr = dec.decode_all()
        assert dec.errors  # reported, decode continued (stream_decoder.c:2106)

    def test_invalid_level_message(self):
        with pytest.raises((ValueError, IndexError)):
            encode_file(make_signal(10, 1, 16), 44100, 16, "/tmp/x.flac", level=9)


class TestBitEstimatorSpotcheck:
    """The reference's SPOTCHECK_ESTIMATE debug mode re-encodes each
    subframe to validate the analytic bit-size estimator
    (stream_encoder.c:3439-3468). Here the whole-frame analog: the sum of
    the chosen subframes' exact bit counts plus the frame header/footer
    must equal the packed frame's actual bit length for every frame."""

    def test_exact_bits_match_packed_length(self):
        import jax.numpy as jnp
        from flac_tpu.encode.frame_encoder import EncoderConfig, build_frame_encoder
        T, B = 1024, 6
        cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                       sample_rate=44100, blocksize=T)
        enc = build_frame_encoder(cfg)
        sig = make_signal(B * T, 2, 16, kind="sine", seed=3).reshape(B, T, 2)
        fnos = np.arange(B, dtype=np.int64)
        words, total_bits, info = enc(sig, fnos)
        total_bits = np.asarray(total_bits)
        exact = np.asarray(info["exact_subframe_bits"])  # [B, 4]: L,R,M,S
        assign = np.asarray(info["assignment"])
        pair = {0: (0, 1), 1: (0, 3), 2: (1, 3), 3: (2, 3)}
        # frame header: 32 fixed bits + utf8 frame number + crc8, footer:
        # pad-to-byte + crc16
        for b in range(B):
            n = int(fnos[b])
            utf8_bytes = 1 if n < 0x80 else 2
            hdr = 32 + 8 * utf8_bytes + 8
            i, j = pair[int(assign[b])]
            body = hdr + int(exact[b, i]) + int(exact[b, j])
            expect = (body + 7) // 8 * 8 + 16
            assert expect == int(total_bits[b]), (b, expect, int(total_bits[b]))
