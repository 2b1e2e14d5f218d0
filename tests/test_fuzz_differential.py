"""Differential fuzz vs the reference binary (SURVEY §7.2 step 11): the
oracle encoder sweeps option combinations our encoder never produces
(exhaustive search, high partition orders, lax blocksizes, -p, high LPC
orders), and every resulting stream must decode bit-exactly through our
host decoder, batched device decoder, and seek path."""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.containers import AudioBuffer, write_wav
from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.decode.seek import SeekableDecoder
from flac_tpu.decode.stream import decode_bytes_device


OPTION_SWEEP = [
    ["-0"],
    ["-8", "-p"],
    ["-5", "-e", "-r", "8"],
    ["-2", "-l", "16", "--lax"],
    ["-5", "-b", "1152"],
    ["-8", "-b", "4608", "-A", "hann", "-A", "flattop"],
    ["--lax", "-b", "96", "-5"],
    ["-5", "-M"],
    ["-8", "-e", "-p", "-l", "24", "--lax"],
    ["-8", "-r", "15", "--lax", "-b", "32768"],
    ["-5", "-A", "tukey(0.25)", "-A", "gauss(0.2)"],
    ["-3", "-b", "576"],
    ["--lax", "-b", "65535", "-1"],
]


@pytest.fixture(scope="module")
def oracle():
    p = oracle_path()
    if p is None:
        pytest.skip("oracle unavailable")
    return p


class TestOracleOptionSweep:
    @pytest.mark.parametrize("opts", OPTION_SWEEP,
                             ids=["_".join(o).replace("-", "") for o in OPTION_SWEEP])
    def test_decode_oracle_stream(self, tmp_path, oracle, opts):
        import zlib
        rng = np.random.default_rng(zlib.crc32(" ".join(opts).encode()))
        kind = rng.choice(["sine", "quiet", "noise", "wasted"])
        n = int(rng.integers(3000, 20000))
        sig = make_signal(n, 2, 16, kind=str(kind), seed=int(rng.integers(0, 99)))
        wav = tmp_path / "f.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "f.flac"
        r = subprocess.run([str(oracle), *opts, "-f", "-o", str(out), str(wav)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-300:]
        data = out.read_bytes()
        pcm, si, _ = decode_bytes(data)  # host decoder, CRC+MD5
        np.testing.assert_array_equal(pcm, sig)
        pcm2, _, _ = decode_bytes_device(data)  # device path (host fallback ok)
        np.testing.assert_array_equal(pcm2, sig)
        dec = SeekableDecoder(data)
        t = n // 3
        np.testing.assert_array_equal(dec.decode_range(t, 500), sig[t : t + 500])

    def test_decode_oracle_24bit_escape_codes(self, tmp_path, oracle):
        """bps>16 streams use RICE2 and may emit escaped partitions."""
        sig = make_signal(9000, 2, 24, kind="noise", seed=7)
        wav = tmp_path / "e.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=96000,
                                        bits_per_sample=24))
        out = tmp_path / "e.flac"
        r = subprocess.run([str(oracle), "-8", "-e", "-f", "-o", str(out), str(wav)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-300:]
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)

    def test_truncated_streams_fail_cleanly(self, tmp_path, oracle):
        """Truncation anywhere must raise/flag, never crash or loop."""
        sig = make_signal(6000, 2, 16, kind="quiet", seed=9)
        wav = tmp_path / "t.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "t.flac"
        subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(wav)],
                       check=True, capture_output=True)
        data = out.read_bytes()
        rng = np.random.default_rng(0)
        for cut in sorted(rng.integers(5, len(data) - 1, 6).tolist()):
            trunc = data[:cut]
            try:
                pcm, _, _ = decode_bytes(trunc, check_md5=False,
                                         continue_on_error=True)
                assert len(pcm) <= len(sig)
                if len(pcm):  # whatever decoded must be a prefix
                    np.testing.assert_array_equal(pcm, sig[: len(pcm)])
            except Exception:
                pass  # raising is acceptable; crashing/hanging is not

    def test_conceal_byte_identical_to_oracle_F(self, tmp_path, oracle):
        """`flac -d -F` output on a corrupted stream must be byte-identical
        to the reference binary's: CRC-mismatching frames are delivered as
        zeroed blocks, keeping every later sample aligned
        (stream_decoder.c:2106-2113)."""
        sig = make_signal(4096 * 4 + 1000, 2, 16, kind="sine", seed=3)
        wav = tmp_path / "c.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        clean = tmp_path / "c.flac"
        subprocess.run([str(oracle), "-5", "-f", "-o", str(clean), str(wav)],
                       check=True, capture_output=True)
        data = clean.read_bytes()
        from flac_tpu.decode.host_decoder import HostDecoder
        _, frames = HostDecoder(data, check_md5=False).decode_all()
        # corruption sites: the stored CRC-16 itself (frame parses cleanly,
        # check fails -> pure concealment) and a mid-body residual byte
        sites = [frames[1].offset + frames[1].size - 1,        # frame 1 CRC
                 frames[3].offset + frames[3].size - 2,        # frame 3 CRC
                 frames[2].offset + frames[2].size * 2 // 3]   # frame 2 body
        for pos in sites:
            corrupted = bytearray(data)
            corrupted[pos] ^= 0x41
            bad = tmp_path / "bad.flac"
            bad.write_bytes(bytes(corrupted))
            ref_wav = tmp_path / "ref.wav"
            got_wav = tmp_path / "got.wav"
            r = subprocess.run([str(oracle), "-d", "-F", "-f", "-o", str(ref_wav),
                                str(bad)], capture_output=True)
            from flac_tpu.cli.flac import main as flac_main
            rc = flac_main(["-d", "-F", "-f", "--totally-silent",
                            "-o", str(got_wav), str(bad)])
            assert rc == r.returncode, (pos, rc, r.returncode, r.stderr[-200:])
            assert got_wav.read_bytes() == ref_wav.read_bytes(), \
                f"-F output diverges from oracle for corruption at byte {pos}"

    def test_bitflips_detected_or_isolated(self, tmp_path, oracle):
        """Random single-byte corruptions: the decoder must either raise or
        (continue_on_error) keep non-corrupted frames intact."""
        sig = make_signal(4096 * 3, 2, 16, kind="quiet", seed=11)
        wav = tmp_path / "b.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "b.flac"
        subprocess.run([str(oracle), "-5", "-f", "-o", str(out), str(wav)],
                       check=True, capture_output=True)
        data = bytearray(out.read_bytes())
        from flac_tpu.decode.host_decoder import HostDecoder
        audio_off = HostDecoder(bytes(data), check_md5=False).audio_offset
        rng = np.random.default_rng(1)
        for _ in range(8):
            pos = int(rng.integers(audio_off, len(data)))
            corrupted = bytearray(data)
            corrupted[pos] ^= int(rng.integers(1, 256))
            dec = HostDecoder(bytes(corrupted), check_md5=False,
                              continue_on_error=True)
            pcm, frames = dec.decode_all()
            # frames that decoded cleanly must match the original exactly;
            # CRC-concealed frames are delivered as zeroed blocks
            cursor = 0
            for fr in frames:
                seg = pcm[cursor : cursor + fr.blocksize]
                orig_start = fr.frame_number * 4096
                orig = sig[orig_start : orig_start + fr.blocksize]
                if fr.concealed:
                    assert not seg.any()
                elif seg.shape == orig.shape:
                    np.testing.assert_array_equal(seg, orig)
                cursor += fr.blocksize
