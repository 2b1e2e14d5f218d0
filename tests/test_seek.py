"""Random-seek correctness — the analog of src/test_seeking/main.c:417-470:
fixed + random seek_absolute calls, each landing PCM-verified against a full
decode, over streams with and without a SEEKTABLE, our encoder and the
reference binary's output alike."""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.containers.wav import AudioBuffer, write_wav
from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.decode.seek import SeekableDecoder, SeekError
from flac_tpu.encode.encoder import encode_file


def _encode(tmp_path, sig, level=5, rate=44100, bps=16, seekpoints=None):
    path = tmp_path / "s.flac"
    encode_file(sig, rate, bps, str(path), level=level, batch_frames=8,
                seekpoints=seekpoints)
    return open(path, "rb").read()


def _seek_targets(n, rng, count=12):
    fixed = [0, 1, n - 1, n // 2, n // 3, 4095, 4096, 4097]
    fixed = sorted({t for t in fixed if 0 <= t < n})
    rnd = rng.integers(0, n, size=count).tolist()
    return fixed + rnd


def _verify_seeks(data, sig):
    n = len(sig)
    dec = SeekableDecoder(data)
    rng = np.random.default_rng(42)
    for target in _seek_targets(n, rng):
        want = sig[target : target + 1000]
        got = dec.decode_range(target, len(want))
        np.testing.assert_array_equal(got, want, err_msg=f"seek to {target}")


class TestSeek:
    def test_seek_no_seektable(self, tmp_path):
        sig = make_signal(4096 * 7 + 1234, 2, 16, kind="sine")
        data = _encode(tmp_path, sig)
        _verify_seeks(data, sig)

    def test_seek_with_seektable(self, tmp_path):
        sig = make_signal(4096 * 7 + 99, 2, 16, kind="quiet", seed=3)
        data = _encode(tmp_path, sig, seekpoints=[0, 8192, 16384, 24000])
        _verify_seeks(data, sig)

    def test_seek_mono_small_blocks(self, tmp_path):
        sig = make_signal(1152 * 5 + 7, 1, 16, kind="noise", seed=5)
        data = _encode(tmp_path, sig, level=1)
        _verify_seeks(data, sig)

    def test_streaming_read_across_frames(self, tmp_path):
        sig = make_signal(4096 * 4, 2, 16, kind="quiet", seed=9)
        data = _encode(tmp_path, sig)
        dec = SeekableDecoder(data)
        dec.seek_absolute(4000)
        a = dec.read(300)   # spans the 4096 frame boundary
        b = dec.read(5000)  # continues from where the last read ended
        np.testing.assert_array_equal(np.concatenate([a, b]), sig[4000:4000 + 5300])

    def test_seek_past_end_raises(self, tmp_path):
        sig = make_signal(5000, 2, 16)
        data = _encode(tmp_path, sig)
        dec = SeekableDecoder(data)
        with pytest.raises(SeekError):
            dec.seek_absolute(5000)

    def test_seek_in_oracle_stream(self, tmp_path):
        """Seek inside a file produced by the reference `flac` binary."""
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference oracle unavailable")
        sig = make_signal(4096 * 6 + 500, 2, 16, kind="sine", seed=8)
        wav = tmp_path / "o.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
        out = tmp_path / "o.flac"
        r = subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(wav)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-300:]
        data = open(out, "rb").read()
        pcm, si, _ = decode_bytes(data)
        np.testing.assert_array_equal(pcm, sig)
        _verify_seeks(data, sig)


class TestDeviceBulkRead:
    """Large decode_range calls route through the batched device decoder
    (SeekableDecoder.read device path); results must match the host path
    sample-for-sample including the skip-into-frame trim and tail frames."""

    def test_bulk_read_matches_host(self, tmp_path):
        from flac_tpu.containers import AudioBuffer, write_wav
        from flac_tpu.decode.seek import SeekableDecoder
        sig = make_signal(4096 * 24 + 1000, 2, 16, kind="sine", seed=17)
        p = tmp_path / "b.wav"
        write_wav(str(p), AudioBuffer(samples=sig, sample_rate=44100,
                                      bits_per_sample=16))
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        out = tmp_path / "b.flac"
        subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(p)],
                       check=True, capture_output=True)
        data = out.read_bytes()
        dec = SeekableDecoder(data)
        start, n = 4096 * 2 + 500, 4096 * 18 + 777  # mid-frame start, 18+ frames
        got = dec.decode_range(start, n)
        np.testing.assert_array_equal(got, sig[start : start + n])
        assert dec._frame_index() is not None  # the device path was available
        # sequential continuation from the device-path position
        more = dec.read(5000)
        np.testing.assert_array_equal(
            more, sig[start + n : start + n + 5000])
        # read crossing into the final partial frame (host tail)
        tail_start = len(sig) - 4096 * 9 - 100
        got = dec.decode_range(tail_start, 4096 * 9 + 100)
        np.testing.assert_array_equal(got, sig[tail_start:])


class TestOggSeek:
    """Seeking directly over Ogg FLAC pages — the analog of the reference's
    Ogg seek path (stream_decoder.c:136 seek_to_absolute_sample_ogg_: granule
    bisection over pages, :1221), plus SeekableDecoder accepting Ogg bytes."""

    @pytest.fixture(scope="class")
    def ogg_case(self, tmp_path_factory):
        from flac_tpu.ogg import ogg_from_flac_stream
        sig = make_signal(4096 * 6 + 2345, 2, 16, kind="sine", seed=21)
        p = tmp_path_factory.mktemp("oggseek") / "s.flac"
        encode_file(sig, 44100, 16, str(p), level=5, batch_frames=8)
        return ogg_from_flac_stream(p.read_bytes()), sig

    def test_page_bisection_seeks(self, ogg_case):
        from flac_tpu.ogg import OggSeekableDecoder
        ogg, sig = ogg_case
        n = len(sig)
        dec = OggSeekableDecoder(ogg)
        rng = np.random.default_rng(11)
        for target in _seek_targets(n, rng):
            want = sig[target : target + 1000]
            got = dec.decode_range(target, len(want))
            np.testing.assert_array_equal(got, want, err_msg=f"ogg seek {target}")

    def test_sequential_read(self, ogg_case):
        from flac_tpu.ogg import OggSeekableDecoder
        ogg, sig = ogg_case
        dec = OggSeekableDecoder(ogg)
        parts = [dec.read(3000) for _ in range(len(sig) // 3000 + 2)]
        np.testing.assert_array_equal(np.concatenate(parts), sig)

    def test_seekable_decoder_accepts_ogg(self, ogg_case):
        ogg, sig = ogg_case
        _verify_seeks(ogg, sig)

    def test_read_spanning_seek_target_mid_frame(self, ogg_case):
        from flac_tpu.ogg import OggSeekableDecoder
        ogg, sig = ogg_case
        dec = OggSeekableDecoder(ogg)
        t = 4096 * 3 + 777
        got = dec.decode_range(t, 9000)
        np.testing.assert_array_equal(got, sig[t : t + 9000])
