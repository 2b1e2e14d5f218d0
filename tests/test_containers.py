"""Container round-trip tests (AIFF/AIFF-C, Wave64, raw, WAV), differential
against the reference binary: files we write must be readable by `flac`, and
files `flac -d` writes must parse bit-exactly with our readers — mirroring
test_flac.sh's raw/WAV/AIFF round-trip matrix (test/test_flac.sh:183)."""

import struct
import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.containers import (
    AudioBuffer,
    aiff_bytes,
    parse_aiff,
    parse_raw,
    parse_w64,
    parse_wav,
    raw_bytes,
    read_audio,
    sniff_format,
    w64_bytes,
    wav_bytes,
    write_aiff,
    write_w64,
)
from flac_tpu.containers.aiff import _f80_decode, _f80_encode


def _buf(n=3000, ch=2, bps=16, rate=44100, seed=0, kind="sine"):
    return AudioBuffer(samples=make_signal(n, ch, bps, seed=seed, kind=kind),
                       sample_rate=rate, bits_per_sample=bps)


class TestF80:
    @pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000, 96000, 192000])
    def test_roundtrip(self, rate):
        assert _f80_decode(_f80_encode(float(rate))) == rate


class TestSelfRoundtrip:
    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_aiff(self, bps):
        buf = _buf(bps=bps)
        got = parse_aiff(aiff_bytes(buf))
        np.testing.assert_array_equal(got.samples, buf.samples)
        assert (got.sample_rate, got.bits_per_sample) == (44100, bps)

    @pytest.mark.parametrize("bps", [8, 16, 24, 32])
    def test_w64(self, bps):
        buf = _buf(bps=bps)
        got = parse_w64(w64_bytes(buf))
        np.testing.assert_array_equal(got.samples, buf.samples)

    @pytest.mark.parametrize("be", [False, True])
    @pytest.mark.parametrize("unsigned", [False, True])
    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_raw(self, be, unsigned, bps):
        buf = _buf(bps=bps, ch=2)
        data = raw_bytes(buf, is_big_endian=be, is_unsigned=unsigned)
        got = parse_raw(data, channels=2, bits_per_sample=bps, sample_rate=44100,
                        is_big_endian=be, is_unsigned=unsigned)
        np.testing.assert_array_equal(got.samples, buf.samples)

    @pytest.mark.parametrize("bps", [12, 20])
    def test_odd_bps_left_justified(self, bps):
        """bps%8 streams store left-justified in the padded byte width
        (reference decode.c:962,1094-1097; oracle-verified byte layout) and
        round-trip back to right-justified samples through the parsers."""
        buf = _buf(bps=bps, seed=bps)
        pad = (8 - bps % 8) % 8
        bytes_per = (bps + 7) // 8
        data = wav_bytes(buf)
        got = parse_wav(data)
        np.testing.assert_array_equal(got.samples, buf.samples)
        assert got.bits_per_sample == bps
        j = data.find(b"data")
        n = struct.unpack_from("<I", data, j + 4)[0]
        pcm = np.frombuffer(data[j + 8 : j + 8 + n], np.uint8).reshape(-1, bytes_per)
        assert not np.any(pcm[:, 0] & ((1 << pad) - 1)), "WAV low pad bits must be 0"
        adata = aiff_bytes(buf)
        agot = parse_aiff(adata)
        np.testing.assert_array_equal(agot.samples, buf.samples)
        k = adata.find(b"SSND")
        apcm = np.frombuffer(adata[k + 16 : k + 16 + n], np.uint8).reshape(-1, bytes_per)
        assert not np.any(apcm[:, -1] & ((1 << pad) - 1)), "AIFF low pad bits must be 0"
        wgot = parse_w64(w64_bytes(buf))
        np.testing.assert_array_equal(wgot.samples, buf.samples)

    def test_left_justified_buffers_pass_through(self):
        """A buffer marked left_justified (the CLI ReplayGain path) is
        emitted as-is while the header keeps the true bps."""
        buf = _buf(bps=20, seed=1)
        pre = AudioBuffer(samples=buf.samples << 4, sample_rate=44100,
                          bits_per_sample=20, left_justified=True)
        assert wav_bytes(pre) == wav_bytes(buf)
        assert aiff_bytes(pre) == aiff_bytes(buf)
        assert w64_bytes(pre) == w64_bytes(buf)

    @pytest.mark.parametrize("bps", [8, 16, 20, 24])
    def test_lazy_parse_matches_eager(self, bps):
        """lazy=True parses samples as a LazyPCM view over the container
        bytes (bounded-memory CLI encoding); values and slicing semantics
        match the eager parse exactly."""
        from flac_tpu.containers.wav import LazyPCM
        buf = _buf(bps=bps, seed=bps + 1)
        for parse, data in [(parse_wav, wav_bytes(buf)),
                            (parse_aiff, aiff_bytes(buf)),
                            (parse_w64, w64_bytes(buf))]:
            lz = parse(data, lazy=True)
            assert isinstance(lz.samples, LazyPCM)
            assert lz.samples.shape == buf.samples.shape
            assert lz.nsamples == buf.nsamples and lz.channels == buf.channels
            np.testing.assert_array_equal(np.asarray(lz.samples), buf.samples)
            np.testing.assert_array_equal(np.asarray(lz.samples[100:250]),
                                          buf.samples[100:250])
        lzr = parse_raw(raw_bytes(buf), channels=2, bits_per_sample=bps,
                        sample_rate=44100, lazy=True)
        np.testing.assert_array_equal(np.asarray(lzr.samples), buf.samples)

    def test_sniff(self):
        buf = _buf(n=100)
        assert sniff_format(wav_bytes(buf)) == "wav"
        assert sniff_format(aiff_bytes(buf)) == "aiff"
        assert sniff_format(w64_bytes(buf)) == "w64"
        assert sniff_format(b"fLaC....") == "flac"
        assert sniff_format(b"OggS....") == "ogg"
        assert sniff_format(b"\x01\x02\x03\x04" * 4) == "raw"


class TestOracleDifferential:
    """Our container writers feed `flac`; `flac -d` output feeds our parsers."""

    def _oracle(self):
        p = oracle_path()
        if p is None:
            pytest.skip("oracle unavailable")
        return p

    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_flac_encodes_our_aiff(self, tmp_path, bps):
        oracle = self._oracle()
        buf = _buf(bps=bps, seed=bps)
        src = tmp_path / "a.aiff"
        write_aiff(str(src), buf)
        out = tmp_path / "a.flac"
        r = subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(src)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        back = tmp_path / "b.aiff"
        r = subprocess.run([str(oracle), "-d", "-f", "-o", str(back), str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        got = read_audio(str(back))
        np.testing.assert_array_equal(got.samples, buf.samples)
        assert got.sample_rate == buf.sample_rate

    def test_flac_encodes_our_w64(self, tmp_path):
        oracle = self._oracle()
        buf = _buf(bps=16, seed=3)
        src = tmp_path / "a.w64"
        write_w64(str(src), buf)
        out = tmp_path / "a.flac"
        r = subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(src)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        back = tmp_path / "b.w64"
        r = subprocess.run([str(oracle), "-d", "-f", "-o", str(back), str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        got = read_audio(str(back))
        np.testing.assert_array_equal(got.samples, buf.samples)

    def test_raw_matches_oracle_raw_decode(self, tmp_path):
        oracle = self._oracle()
        buf = _buf(bps=16, seed=5)
        wav = tmp_path / "r.wav"
        wav.write_bytes(wav_bytes(buf))
        flac_f = tmp_path / "r.flac"
        subprocess.run([str(oracle), "-3", "-f", "-o", str(flac_f), str(wav)],
                       check=True, capture_output=True)
        raw_out = tmp_path / "r.raw"
        r = subprocess.run([str(oracle), "-d", "-f", "--force-raw-format",
                            "--endian=little", "--sign=signed",
                            "-o", str(raw_out), str(flac_f)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        got = parse_raw(raw_out.read_bytes(), channels=2, bits_per_sample=16,
                        sample_rate=44100)
        np.testing.assert_array_equal(got.samples, buf.samples)


class TestAifc:
    def test_sowt_little_endian(self):
        """AIFF-C 'sowt' stores little-endian PCM."""
        buf = _buf(n=500, bps=16)
        pcm_le = np.ascontiguousarray(buf.samples, np.int32).reshape(-1).astype("<i2").tobytes()
        comm = (struct.pack(">hIh", 2, buf.nsamples, 16) + _f80_encode(44100.0)
                + b"sowt" + b"\x00\x00")
        ssnd = struct.pack(">II", 0, 0) + pcm_le
        body = (b"AIFC"
                + b"FVER" + struct.pack(">I", 4) + struct.pack(">I", 0xA2805140)
                + b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
        data = b"FORM" + struct.pack(">I", len(body)) + body
        got = parse_aiff(data)
        np.testing.assert_array_equal(got.samples, buf.samples)
