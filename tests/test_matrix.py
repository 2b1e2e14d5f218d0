"""Brute-force encode/decode sweep — the analog of test_bins.sh
(test/test_bins.sh:62-114: channels × bps × levels × -e/-p × lax blocksizes
× subframe-disable flags) fed by test_streams-style pathological signal
generators (src/test_streams/main.c:217-967). Every case: our encode → our
decode bit-exact → reference `flac -t` + decode compare."""

import subprocess

import numpy as np
import pytest

from tests.conftest import oracle_path

from flac_tpu.containers.wav import read_wav
from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.decode.stream import decode_bytes_device
from flac_tpu.encode.encoder import encode_file


def pathological(kind: str, n: int, ch: int, bps: int, seed: int = 0) -> np.ndarray:
    """Deterministic stress signals in the spirit of test_streams."""
    rng = np.random.default_rng(seed)
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n, dtype=np.float64)
    out = np.zeros((n, ch), np.int32)
    for c in range(ch):
        if kind == "fullscale_dc":
            out[:, c] = amp if c % 2 == 0 else -amp - 1
        elif kind == "alternating":
            out[:, c] = np.where(t.astype(np.int64) % 2 == 0, amp, -amp - 1)
        elif kind == "sine_mix":
            x = (0.49 * np.sin(2 * np.pi * (441 + 100 * c) * t / 44100)
                 + 0.49 * np.sin(2 * np.pi * (1234.5 + 11 * c) * t / 44100))
            out[:, c] = np.round(x * amp).astype(np.int32)
        elif kind == "noise":
            out[:, c] = rng.integers(-amp - 1, amp + 1, n, dtype=np.int64).astype(np.int32)
        elif kind == "quiet_walk":
            out[:, c] = np.clip(np.round(np.cumsum(rng.normal(0, amp / 2000, n))),
                                -amp - 1, amp).astype(np.int32)
        elif kind == "wasted":
            shift = min(5, bps - 2)
            out[:, c] = (rng.integers(-(amp >> shift), amp >> shift, n,
                                      dtype=np.int64) << shift).astype(np.int32)
        elif kind == "ramp":
            out[:, c] = (np.round(t * (2 * amp) / max(n - 1, 1)) - amp).astype(np.int32)
        else:
            raise ValueError(kind)
    return out


def _roundtrip(tmp_path, sig, bps, rate=44100, oracle_check=True,
               device_decode=False, **kw):
    path = tmp_path / "m.flac"
    encode_file(sig, rate, bps, str(path), batch_frames=8, **kw)
    data = path.read_bytes()
    pcm, si, _ = decode_bytes(data)  # host (native) path, CRC+MD5 checked
    np.testing.assert_array_equal(pcm, sig)
    if device_decode:  # compiles a decoder per geometry — only where it adds coverage
        pcm2, _, info = decode_bytes_device(data)
        np.testing.assert_array_equal(pcm2, sig)
    if oracle_check:
        oracle = oracle_path()
        if oracle is not None:
            r = subprocess.run([str(oracle), "-t", str(path)],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr[-300:]
            out = tmp_path / "m.wav"
            r = subprocess.run([str(oracle), "-d", "-f", "-o", str(out), str(path)],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr[-300:]
            np.testing.assert_array_equal(read_wav(str(out)).samples, sig)
    return data


N = 4096 + 333  # > one frame, fractional tail


class TestChannelsBpsSweep:
    @pytest.mark.parametrize("ch", [1, 2, 4, 8])
    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_channels_bps(self, tmp_path, ch, bps):
        sig = pathological("sine_mix", N, ch, bps, seed=ch * 31 + bps)
        _roundtrip(tmp_path, sig, bps, level=5,
                   device_decode=(ch, bps) in ((2, 16), (8, 24)))


class TestSignalKinds:
    @pytest.mark.parametrize("kind", ["fullscale_dc", "alternating", "noise",
                                      "quiet_walk", "wasted", "ramp"])
    @pytest.mark.parametrize("level", [1, 8])
    def test_kinds(self, tmp_path, kind, level):
        sig = pathological(kind, N, 2, 16, seed=level)
        _roundtrip(tmp_path, sig, 16, level=level)


class TestExhaustiveAndPrecisionSearch:
    def test_e_flag(self, tmp_path):
        sig = pathological("quiet_walk", N, 2, 16, seed=5)
        _roundtrip(tmp_path, sig, 16, level=5, do_exhaustive_model_search=True)

    def test_p_flag(self, tmp_path):
        sig = pathological("sine_mix", N, 2, 16, seed=6)
        _roundtrip(tmp_path, sig, 16, level=5, do_qlp_coeff_prec_search=True)

    def test_p_flag_really_searches(self, tmp_path):
        """-p must RUN the precision sweep (stream_encoder.c:3336-3385), not
        just round-trip: the stream differs from the non-p stream and at least
        one LPC subframe carries a precision other than the static default
        (12 for 16-bit/4096, EncoderConfig.resolve)."""
        from flac_tpu.decode.host_decoder import HostDecoder
        from flac_tpu import constants as C_

        sig = pathological("sine_mix", N, 2, 16, seed=6)
        plain = _roundtrip(tmp_path, sig, 16, level=8, oracle_check=False)
        searched = _roundtrip(tmp_path, sig, 16, level=8,
                              do_qlp_coeff_prec_search=True)
        assert searched != plain, "-p produced identical bytes to -8"
        precs = {sf.qlp_precision
                 for f in HostDecoder(searched).decode_all()[1]
                 for sf in f.subframes if sf.type == C_.SUBFRAME_TYPE_LPC}
        assert precs and precs != {12}, f"search never left the default: {precs}"


class TestLaxBlocksizes:
    @pytest.mark.parametrize("blocksize", [32, 256, 32768])
    def test_lax_blocksize(self, tmp_path, blocksize):
        n = max(blocksize * 2 + 17, 100)
        sig = pathological("quiet_walk", n, 2, 16, seed=blocksize)
        _roundtrip(tmp_path, sig, 16, level=2, blocksize=blocksize,
                   streamable_subset=False)

    def test_subset_blocksize_rule(self, tmp_path):
        """Subset @ ≤48kHz caps blocksize at 4608 (format.c:222-246)."""
        sig = pathological("sine_mix", 9216 + 7, 2, 16)
        with pytest.raises(ValueError):
            _roundtrip(tmp_path, sig, 16, level=5, blocksize=8192,
                       oracle_check=False)
        _roundtrip(tmp_path, sig, 16, level=5, blocksize=8192, rate=96000,
                   oracle_check=True)


class TestSubframeDisableFlags:
    @pytest.mark.parametrize("flag", ["disable_constant_subframes",
                                      "disable_fixed_subframes",
                                      "disable_verbatim_subframes"])
    def test_disable(self, tmp_path, flag):
        kind = {"disable_constant_subframes": "fullscale_dc",
                "disable_fixed_subframes": "ramp",
                "disable_verbatim_subframes": "noise"}[flag]
        sig = pathological(kind, N, 2, 16, seed=3)
        _roundtrip(tmp_path, sig, 16, level=5, **{flag: True})


class TestHighRes:
    def test_24bit_96k_level8(self, tmp_path):
        sig = pathological("quiet_walk", N, 2, 24, seed=8)
        _roundtrip(tmp_path, sig, 24, rate=96000, level=8)

    def test_8bit_8k(self, tmp_path):
        sig = pathological("sine_mix", 2048, 1, 8, seed=9)
        _roundtrip(tmp_path, sig, 8, rate=8000, level=3)


class TestBeyondReferenceBps:
    """The reference codec caps input at 24 bits (format.h:121
    FLAC__REFERENCE_CODEC_MAX_BITS_PER_SAMPLE); the format itself allows 32.
    This implementation is lossless through the full 28/32-bit range (no
    oracle cross-check possible — the reference binary rejects such input)."""

    @pytest.mark.parametrize("bps", [28, 32])
    def test_high_bps_roundtrip(self, tmp_path, bps):
        rng = np.random.default_rng(bps)
        lim = 1 << (bps - 1)
        sig = np.clip((rng.normal(0, 0.1, (N, 2)) * lim).astype(np.int64),
                      -lim, lim - 1).astype(np.int32)
        _roundtrip(tmp_path, sig, bps, oracle_check=False)


@pytest.mark.slow
class TestBinsCrossProduct:
    """The full test_bins.sh cross product (test/test_bins.sh:62-114), not the
    sampled axes above: levels 0-8 x channels {1,2,4,8} x bps {8,16,24}, plus
    -e/-p over every level, lax blocksizes x levels, and the 2^3 product of
    subframe-disable flags x levels. Every case oracle-gated. ~390 round
    trips; run with `pytest -m slow` (deselected by default via pytest.ini)."""

    @pytest.mark.parametrize("level", range(9))
    @pytest.mark.parametrize("ch", [1, 2, 4, 8])
    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_level_channels_bps(self, tmp_path, level, ch, bps):
        kind = ["sine_mix", "noise", "quiet_walk", "wasted",
                "ramp", "alternating"][(level + ch) % 6]
        sig = pathological(kind, N, ch, bps, seed=level * 97 + ch * 7 + bps)
        _roundtrip(tmp_path, sig, bps, level=level)

    @pytest.mark.parametrize("level", range(9))
    @pytest.mark.parametrize("flag", ["do_exhaustive_model_search",
                                      "do_qlp_coeff_prec_search"])
    def test_ep_all_levels(self, tmp_path, level, flag):
        sig = pathological("quiet_walk", N, 2, 16, seed=level)
        _roundtrip(tmp_path, sig, 16, level=level, **{flag: True})

    @pytest.mark.parametrize("level", [0, 5, 8])
    @pytest.mark.parametrize("blocksize", [32, 256, 2048, 32768, 65535])
    def test_lax_blocksizes_levels(self, tmp_path, level, blocksize):
        n = max(blocksize * 2 + 17, 100)
        sig = pathological("sine_mix", n, 2, 16, seed=blocksize + level)
        _roundtrip(tmp_path, sig, 16, level=level, blocksize=blocksize,
                   streamable_subset=False)

    @pytest.mark.parametrize("level", [1, 5, 8])
    @pytest.mark.parametrize("mask", range(1, 8))
    def test_disable_flag_product(self, tmp_path, level, mask):
        flags = {}
        if mask & 1:
            flags["disable_constant_subframes"] = True
        if mask & 2:
            flags["disable_fixed_subframes"] = True
        if mask & 4:
            flags["disable_verbatim_subframes"] = True
        kind = ["fullscale_dc", "ramp", "noise", "quiet_walk"][mask % 4]
        sig = pathological(kind, N, 2, 16, seed=mask * 13 + level)
        _roundtrip(tmp_path, sig, 16, level=level, **flags)
