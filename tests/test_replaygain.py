"""ReplayGain tests: analysis gains/peaks differential against the reference
metaflac --add-replay-gain (same files, tags must agree), tag storage
formats, synthesis gain application, CLI wiring."""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.encode.encoder import encode_file
from flac_tpu.metadata import Padding, get_tags
from flac_tpu.replaygain import (
    GainAnalysis,
    ReplayGainError,
    add_replay_gain_tags,
    apply_gain,
    compute_replay_gain,
    is_valid_sample_rate,
    load_tags,
)


def _tone(n, freq, amp, rate=44100, ch=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    out = np.stack([x, 0.9 * x], axis=1)[:, :ch]
    out += rng.normal(0, amp * 0.01, out.shape)
    return np.clip(np.round(out), -32768, 32767).astype(np.int32)


class TestAnalysis:
    def test_rates(self):
        assert is_valid_sample_rate(44100) and is_valid_sample_rate(96000)
        assert not is_valid_sample_rate(44000)
        with pytest.raises(ReplayGainError):
            GainAnalysis(44000)

    def test_louder_means_lower_gain(self):
        quiet = _tone(44100, 1000, 1000)
        loud = _tone(44100, 1000, 20000)
        ga = GainAnalysis(44100)
        ga.analyze(quiet, 16)
        g_quiet = ga.title_gain()
        ga.analyze(loud, 16)
        g_loud = ga.title_gain()
        assert g_loud < g_quiet
        assert abs((g_quiet - g_loud) - 20 * np.log10(20000 / 1000)) < 1.0

    def test_peak(self):
        sig = _tone(44100, 440, 16384)
        ga = GainAnalysis(44100)
        ga.analyze(sig, 16)
        ga.title_gain()
        assert abs(ga.title_peak_final - 16384 / 32768) < 0.02

    def test_mono_equals_dual_mono(self):
        x = _tone(22050, 440, 8000, ch=1)
        ga1 = GainAnalysis(44100)
        ga1.analyze(x, 16)
        g1 = ga1.title_gain()
        ga2 = GainAnalysis(44100)
        ga2.analyze(np.repeat(x, 2, axis=1), 16)
        assert g1 == ga2.title_gain()


class TestOracleDifferential:
    def test_tags_match_metaflac(self, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        paths = []
        for k, (freq, amp) in enumerate([(440, 18000), (880, 4000)]):
            sig = _tone(44100 * 2, freq, amp, seed=k)
            p = tmp_path / f"t{k}.flac"
            encode_file(sig, 44100, 16, str(p), level=2,
                        metadata=[Padding(length=512)])
            paths.append(str(p))
        r = subprocess.run([str(metaflac), "--add-replay-gain", *paths],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        theirs = []
        for p in paths:
            vc = get_tags(p)
            theirs.append({
                "tg": float(vc.find_entry("REPLAYGAIN_TRACK_GAIN").split()[0]),
                "tp": float(vc.find_entry("REPLAYGAIN_TRACK_PEAK")),
                "ag": float(vc.find_entry("REPLAYGAIN_ALBUM_GAIN").split()[0]),
                "ap": float(vc.find_entry("REPLAYGAIN_ALBUM_PEAK")),
            })
        album_gain, album_peak, titles = compute_replay_gain(paths)
        for (tg, tp), t in zip(titles, theirs):
            assert abs(tg - t["tg"]) <= 0.011, (tg, t["tg"])
            assert abs(tp - t["tp"]) <= 1e-6
            assert abs(album_gain - t["ag"]) <= 0.011
            assert abs(album_peak - t["ap"]) <= 1e-6

    def test_our_tags_format(self, tmp_path):
        sig = _tone(44100, 440, 12000)
        p = tmp_path / "f.flac"
        encode_file(sig, 44100, 16, str(p), level=1,
                    metadata=[Padding(length=512)])
        add_replay_gain_tags([str(p)])
        vc = get_tags(str(p))
        assert vc.find_entry("REPLAYGAIN_REFERENCE_LOUDNESS") == "89.0 dB"
        tg = vc.find_entry("REPLAYGAIN_TRACK_GAIN")
        assert tg.endswith(" dB") and tg[0] in "+-"
        peak = vc.find_entry("REPLAYGAIN_TRACK_PEAK")
        assert len(peak.split(".")[1]) == 8
        g, pk = load_tags(str(p), album=False)
        assert abs(g - float(tg.split()[0])) < 1e-6


class TestSynthesis:
    def test_apply_gain_scales(self):
        sig = _tone(4410, 440, 1000)
        out = apply_gain(sig, 6.0206, 16, hard_limit=False)
        ratio = np.abs(out).max() / np.abs(sig).max()
        assert abs(ratio - 2.0) < 0.01

    def test_hard_limit_prevents_clip(self):
        sig = _tone(4410, 440, 30000)
        out = apply_gain(sig, 12.0, 16, hard_limit=True)
        assert np.abs(out).max() <= 32767
        quiet = apply_gain(_tone(4410, 440, 100), 12.0, 16, hard_limit=True)
        assert abs(np.abs(quiet).max() / 100 - 10 ** (12 / 20)) < 0.2

    def test_bit_width_change(self):
        sig = _tone(1000, 440, 20000)
        out = apply_gain(sig, 0.0, 16, target_bps=24, hard_limit=False)
        assert abs(np.abs(out).max() / (np.abs(sig).max() * 256) - 1) < 0.01


class TestCLI:
    def test_replay_gain_roundtrip(self, tmp_path):
        from flac_tpu.cli.flac import main
        from flac_tpu.containers import AudioBuffer, read_wav, write_wav
        sig = _tone(44100, 440, 20000)
        wav = tmp_path / "rg.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "rg.flac"
        assert main(["--totally-silent", "-2", "-f", "--replay-gain",
                     "-o", str(out), str(wav)]) == 0
        assert get_tags(str(out)).find_entry("REPLAYGAIN_TRACK_GAIN") is not None
        back = tmp_path / "rg_out.wav"
        assert main(["--totally-silent", "-d", "-f",
                     "--apply-replaygain-which-is-not-lossless=t",
                     "-o", str(back), str(out)]) == 0
        got = read_wav(str(back)).samples
        g, _pk = load_tags(str(out), album=False)
        expect_ratio = 10 ** (g / 20)
        ratio = np.abs(got).max() / np.abs(sig).max()
        assert abs(ratio - min(expect_ratio, 32767 / np.abs(sig).max())) < 0.1


class TestSynthesisOracleDifferential:
    """Byte-exact parity of --apply-replaygain-which-is-not-lossless with the
    reference binary: same RNG (two-polycounter, replaygain_synthesis.c:92),
    same 16-tap noise-shaping filters with float32 error feedback
    (:131-196,216-262), same per-frame chunking of the dither state
    (decode.c:1100 applies gain once per decoded frame)."""

    @pytest.mark.parametrize("spec", [None, "t", "an2", "-6tLn3", "0aln1"])
    def test_apply_gain_matches_reference(self, tmp_path, spec):
        from tests.conftest import oracle_path
        oracle = oracle_path()
        mf = oracle.parent / "metaflac" if oracle else None
        if oracle is None or not mf.exists():
            pytest.skip("reference flac/metaflac oracle not available")
        import subprocess
        from flac_tpu.cli.flac import main
        from flac_tpu.containers import AudioBuffer, write_wav
        n = 44100
        t = np.arange(n) / 44100.0
        rng = np.random.default_rng(3)
        loud = 0.9 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
        pcm = np.stack([loud, 0.7 * np.sin(2 * np.pi * 523 * t)], axis=1)
        pcm = np.clip(pcm * 32767, -32768, 32767).astype(np.int32)
        wav = tmp_path / "rg.wav"
        write_wav(str(wav), AudioBuffer(samples=pcm, sample_rate=44100,
                                        bits_per_sample=16))
        fl = tmp_path / "rg.flac"
        r = subprocess.run([str(oracle), "-f", "-s", "-o", str(fl), str(wav)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        r = subprocess.run([str(mf), "--add-replay-gain", str(fl)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        arg = "--apply-replaygain-which-is-not-lossless" + (
            f"={spec}" if spec is not None else "")
        ref = tmp_path / "ref.wav"
        r = subprocess.run([str(oracle), "-d", "-f", "-s", arg, "-o",
                            str(ref), str(fl)], capture_output=True)
        assert r.returncode == 0, r.stderr
        ours = tmp_path / "ours.wav"
        assert main(["--totally-silent", "-d", "-f", arg, "-o", str(ours),
                     str(fl)]) == 0
        assert ours.read_bytes() == ref.read_bytes()

    @pytest.mark.parametrize("spec", [None, "an2"])
    def test_apply_gain_odd_bps_matches_reference(self, tmp_path, spec):
        """bps%8 source (20-bit): the reference dithers/quantizes at the
        SOURCE width (init_dither_context gets the stream bps, decode.c:1353;
        Mask/Add/Dither in replaygain_synthesis.c:226-228) while converting
        at target_bps = bps+shift — output bytes must match exactly."""
        from tests.conftest import oracle_path
        oracle = oracle_path()
        mf = oracle.parent / "metaflac" if oracle else None
        if oracle is None or not mf.exists():
            pytest.skip("reference flac/metaflac oracle not available")
        import subprocess
        from flac_tpu.cli.flac import main
        from flac_tpu.containers import AudioBuffer, write_wav
        from tests.conftest import make_signal
        pcm = make_signal(44100 // 2, 2, 20, kind="quiet", seed=9)
        wav = tmp_path / "rg20.wav"
        write_wav(str(wav), AudioBuffer(samples=pcm, sample_rate=44100,
                                        bits_per_sample=20))
        fl = tmp_path / "rg20.flac"
        r = subprocess.run([str(oracle), "-f", "-s", "-o", str(fl), str(wav)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        r = subprocess.run([str(mf), "--add-replay-gain", str(fl)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        arg = "--apply-replaygain-which-is-not-lossless" + (
            f"={spec}" if spec is not None else "")
        ref = tmp_path / "ref.wav"
        r = subprocess.run([str(oracle), "-d", "-f", "-s", arg, "-o",
                            str(ref), str(fl)], capture_output=True)
        assert r.returncode == 0, r.stderr
        ours = tmp_path / "ours.wav"
        assert main(["--totally-silent", "-d", "-f", arg, "-o", str(ours),
                     str(fl)]) == 0
        assert ours.read_bytes() == ref.read_bytes()
