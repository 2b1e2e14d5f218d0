"""CLI behavior tests — the analog of test_flac.sh / test_metaflac.sh:
round trips through the `flac` CLI (encode/decode/test/analyze), windowing,
metadata options, raw format; `metaflac` ops with --list output diffed
byte-for-byte against the reference binary."""

import io
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.cli import flac as flac_cli
from flac_tpu.cli import metaflac as metaflac_cli
from flac_tpu.containers import AudioBuffer, read_wav, read_audio, write_wav
from flac_tpu.decode.host_decoder import decode_bytes


def run_flac(*args):
    return flac_cli.main(["--totally-silent", *args])


def run_metaflac_capture(*args):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = metaflac_cli.main(list(args))
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


@pytest.fixture
def wav_file(tmp_path):
    sig = make_signal(4096 * 3 + 211, 2, 16, kind="quiet", seed=13)
    p = tmp_path / "in.wav"
    write_wav(str(p), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
    return p, sig


class TestFlacCLI:
    def test_encode_decode_roundtrip(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        assert run_flac("-5", "-f", "-o", str(out), str(wav)) == 0
        back = tmp_path / "back.wav"
        assert run_flac("-d", "-f", "-o", str(back), str(out)) == 0
        np.testing.assert_array_equal(read_wav(str(back)).samples, sig)
        oracle = oracle_path()
        if oracle:
            r = subprocess.run([str(oracle), "-t", str(out)], capture_output=True)
            assert r.returncode == 0

    def test_test_mode(self, tmp_path, wav_file):
        wav, _ = wav_file
        out = tmp_path / "a.flac"
        run_flac("-2", "-f", "-o", str(out), str(wav))
        assert run_flac("-t", str(out)) == 0
        data = bytearray(out.read_bytes())
        data[len(data) // 2] ^= 0xFF  # corrupt mid-frame
        bad = tmp_path / "bad.flac"
        bad.write_bytes(bytes(data))
        assert run_flac("-t", str(bad)) == 1

    def test_skip_until(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        assert run_flac("-3", "-f", "--skip=1000", "--until=5000",
                        "-o", str(out), str(wav)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig[1000:5000])

    def test_until_relative_forms(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        assert run_flac("-1", "-f", "--skip=100", "--until=+200",
                        "-o", str(out), str(wav)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig[100:300])
        assert run_flac("-1", "-f", "--until=-100", "-o", str(out), str(wav)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig[: len(sig) - 100])

    def test_decode_skip_window(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        run_flac("-4", "-f", "-o", str(out), str(wav))
        back = tmp_path / "b.wav"
        assert run_flac("-d", "-f", "--skip=4000", "--until=9000",
                        "-o", str(back), str(out)) == 0
        np.testing.assert_array_equal(read_wav(str(back)).samples, sig[4000:9000])

    def test_raw_roundtrip(self, tmp_path, wav_file):
        wav, sig = wav_file
        raw = tmp_path / "in.raw"
        raw.write_bytes(np.ascontiguousarray(sig, np.int32).reshape(-1)
                        .astype("<i2").tobytes())
        out = tmp_path / "r.flac"
        assert run_flac("-5", "-f", "--force-raw-format", "--endian=little",
                        "--sign=signed", "--channels=2", "--bps=16",
                        "--sample-rate=44100", "-o", str(out), str(raw)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        rawout = tmp_path / "out.raw"
        assert run_flac("-d", "-f", "--force-raw-format", "--endian=little",
                        "--sign=signed", "-o", str(rawout), str(out)) == 0
        assert rawout.read_bytes() == raw.read_bytes()

    def test_aiff_output(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        run_flac("-2", "-f", "-o", str(out), str(wav))
        aiff = tmp_path / "o.aiff"
        assert run_flac("-d", "-f", "--force-aiff-format",
                        "-o", str(aiff), str(out)) == 0
        np.testing.assert_array_equal(read_audio(str(aiff)).samples, sig)

    def test_metadata_options(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        assert run_flac("-1", "-f", "-T", "TITLE=Hello", "-T", "ARTIST=World",
                        "-S", "3x", "-P", "1234", "-o", str(out), str(wav)) == 0
        from flac_tpu.metadata import Padding, SeekTable, get_tags, parse_metadata
        blocks, _ = parse_metadata(out.read_bytes())
        tags = get_tags(str(out))
        assert tags.find_entry("TITLE") == "Hello"
        st = next(b for b in blocks if isinstance(b, SeekTable))
        assert len(st.points) == 3
        assert all(p.stream_offset or p.sample_number == 0 for p in st.points)
        assert any(isinstance(b, Padding) and b.length == 1234 for b in blocks)
        oracle = oracle_path()
        if oracle:
            assert subprocess.run([str(oracle), "-t", str(out)],
                                  capture_output=True).returncode == 0

    def test_disable_subframe_flags(self, tmp_path):
        sig = make_signal(4096, 2, 16, kind="constant")
        wav = tmp_path / "c.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "c.flac"
        assert run_flac("-5", "-f", "--disable-constant-subframes",
                        "-o", str(out), str(wav)) == 0
        pcm, _, frames = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        from flac_tpu import constants as C
        for fr in frames:
            for sf in fr.subframes:
                assert sf.type != C.SUBFRAME_TYPE_CONSTANT

    def test_flac_to_flac_reencode(self, tmp_path, wav_file):
        wav, sig = wav_file
        a = tmp_path / "a.flac"
        b = tmp_path / "b.flac"
        run_flac("-0", "-f", "-o", str(a), str(wav))
        assert run_flac("-8", "-f", "-o", str(b), str(a)) == 0
        pcm, _, _ = decode_bytes(b.read_bytes())
        np.testing.assert_array_equal(pcm, sig)

    def test_analyze_matches_oracle(self, tmp_path, wav_file):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        wav, _ = wav_file
        out = tmp_path / "a.flac"
        run_flac("-5", "-f", "-o", str(out), str(wav))
        ours = tmp_path / "ours.ana"
        theirs = tmp_path / "theirs.ana"
        assert run_flac("-a", "--residual-text", "-f", "-o", str(ours), str(out)) == 0
        subprocess.run([str(oracle), "-a", "--residual-text", "-f",
                        "-o", str(theirs), str(out)], check=True, capture_output=True)
        assert ours.read_text() == theirs.read_text()


class TestMetaflacCLI:
    @pytest.fixture
    def flac_file(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "m.flac"
        run_flac("-2", "-f", "-T", "TITLE=t0", "-P", "2048", "-o", str(out), str(wav))
        return out

    def test_show_streaminfo_fields(self, flac_file):
        rc, out = run_metaflac_capture("--show-sample-rate", "--show-channels",
                                       "--show-bps", "--show-total-samples",
                                       str(flac_file))
        assert rc == 0
        assert out.splitlines() == ["44100", "2", "16", str(4096 * 3 + 211)]

    def test_list_matches_oracle(self, flac_file):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        rc, ours = run_metaflac_capture("--list", str(flac_file))
        assert rc == 0
        theirs = subprocess.run([str(metaflac), "--list", str(flac_file)],
                                capture_output=True, text=True).stdout
        assert ours == theirs

    def test_tag_ops(self, flac_file):
        rc, _ = run_metaflac_capture("--set-tag=ARTIST=abc", str(flac_file))
        assert rc == 0
        rc, out = run_metaflac_capture("--show-tag=ARTIST", str(flac_file))
        assert out.strip() == "ARTIST=abc"
        rc, _ = run_metaflac_capture("--remove-tag=ARTIST", str(flac_file))
        rc, out = run_metaflac_capture("--show-tag=ARTIST", str(flac_file))
        assert out.strip() == ""

    def test_tags_import_export(self, flac_file, tmp_path):
        tf = tmp_path / "tags.txt"
        tf.write_text("ALBUM=A\nGENRE=G\n")
        rc, _ = run_metaflac_capture(f"--import-tags-from={tf}", str(flac_file))
        assert rc == 0
        out_tf = tmp_path / "out.txt"
        rc, _ = run_metaflac_capture(f"--export-tags-to={out_tf}", str(flac_file))
        text = out_tf.read_text()
        assert "ALBUM=A" in text and "GENRE=G" in text and "TITLE=t0" in text

    def test_remove_and_padding_ops(self, flac_file):
        rc, _ = run_metaflac_capture("--add-padding=100", "--add-padding=50",
                                     str(flac_file))
        assert rc == 0
        rc, _ = run_metaflac_capture("--sort-padding", str(flac_file))
        assert rc == 0
        from flac_tpu.metadata import MetadataChain, Padding
        chain = MetadataChain.read(str(flac_file))
        pads = [b for b in chain.blocks if isinstance(b, Padding)]
        assert len(pads) == 1 and chain.blocks[-1] is pads[0]
        rc, _ = run_metaflac_capture("--block-type=PADDING", "--remove",
                                     "--dont-use-padding", str(flac_file))
        chain = MetadataChain.read(str(flac_file))
        assert not any(isinstance(b, Padding) for b in chain.blocks)

    def test_audio_survives_edits(self, flac_file, wav_file):
        _, sig = wav_file
        run_metaflac_capture("--set-tag=X=" + "y" * 3000, str(flac_file))
        run_metaflac_capture("--remove-all-tags", str(flac_file))
        pcm, _, _ = decode_bytes(flac_file.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        oracle = oracle_path()
        if oracle:
            assert subprocess.run([str(oracle), "-t", str(flac_file)],
                                  capture_output=True).returncode == 0

    def test_picture_import_export(self, flac_file, tmp_path):
        import struct, zlib
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        png = (b"\x89PNG\x0d\x0a\x1a\x0a" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
        pf = tmp_path / "p.png"
        pf.write_bytes(png)
        rc, _ = run_metaflac_capture(f"--import-picture-from={pf}", str(flac_file))
        assert rc == 0
        out_p = tmp_path / "out.png"
        rc, _ = run_metaflac_capture(f"--export-picture-to={out_p}", str(flac_file))
        assert rc == 0 and out_p.read_bytes() == png
