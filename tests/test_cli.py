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

    def test_odd_bps_outputs_match_oracle(self, tmp_path):
        """20-bit streams: decoded WAV/AIFF/RF64/W64 container bytes are
        IDENTICAL to the reference binary's (bps%8 samples store
        left-justified in the padded byte width, decode.c:962,1094-1097),
        and our 20-bit encode round-trips through the oracle."""
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        sig = make_signal(4096 * 2 + 307, 2, 20, kind="quiet", seed=20)
        src = tmp_path / "in20.wav"
        write_wav(str(src), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=20))
        fl = tmp_path / "o20.flac"
        r = subprocess.run([str(oracle), "-5", "-f", "-s", "-o", str(fl),
                            str(src)], capture_output=True)
        assert r.returncode == 0, r.stderr
        for flag, ext in [((), "wav"), (("--force-aiff-format",), "aiff"),
                          (("--force-rf64-format",), "rf64"),
                          (("--force-wave64-format",), "w64")]:
            ref = tmp_path / f"ref.{ext}"
            r = subprocess.run([str(oracle), "-d", "-f", "-s", *flag, "-o",
                                str(ref), str(fl)], capture_output=True)
            assert r.returncode == 0, r.stderr
            ours = tmp_path / f"ours.{ext}"
            assert run_flac("-d", "-f", *flag, "-o", str(ours), str(fl)) == 0
            assert ours.read_bytes() == ref.read_bytes(), ext
        # encode side: our 20-bit encode passes oracle -t and decodes back
        # to the byte-identical source container
        ours_fl = tmp_path / "ours20.flac"
        assert run_flac("-5", "-f", "-o", str(ours_fl), str(src)) == 0
        r = subprocess.run([str(oracle), "-t", str(ours_fl)], capture_output=True)
        assert r.returncode == 0, r.stderr
        back = tmp_path / "back20.wav"
        r = subprocess.run([str(oracle), "-d", "-f", "-s", "-o", str(back),
                            str(ours_fl)], capture_output=True)
        assert r.returncode == 0, r.stderr
        assert back.read_bytes() == src.read_bytes()

    def test_streaminfo_overestimate_header_fixup(self, tmp_path, wav_file):
        """The streaming decode path writes container headers from
        STREAMINFO total_samples up front; when the stream delivers a
        different count the headers are rewritten with the real one
        (reference decode.c:119-128 fixes headers up the same way)."""
        from flac_tpu.metadata import parse_metadata
        from flac_tpu.metadata.blocks import serialize_metadata
        wav, sig = wav_file
        out = tmp_path / "a.flac"
        assert run_flac("-2", "-f", "-o", str(out), str(wav)) == 0
        data = out.read_bytes()
        blocks, audio_offset = parse_metadata(data)
        blocks[0].total_samples += 777  # overestimate; MD5 still matches
        patched = tmp_path / "p.flac"
        patched.write_bytes(b"fLaC" + serialize_metadata([blocks[0]])
                            + data[audio_offset:])
        back = tmp_path / "back.wav"
        assert run_flac("-d", "-f", "-o", str(back), str(patched)) == 0
        got = read_wav(str(back))
        assert got.nsamples == len(sig)
        np.testing.assert_array_equal(got.samples, sig)

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


class TestNegationFlags:
    """Every boolean long option has a no- negation in the reference table
    (src/flac/main.c:97-222); later flags override earlier ones."""

    def test_negations_override(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "n.flac"
        # --force then --no-force: second write must refuse (file exists)
        assert run_flac("-5", "-f", "-o", str(out), str(wav)) == 0
        assert run_flac("-5", "--force", "--no-force",
                        "-o", str(out), str(wav)) == 1
        # --delete-input-file then --no-delete-input-file: input kept
        assert run_flac("-5", "--delete-input-file", "--no-delete-input-file",
                        "-f", "-o", str(out), str(wav)) == 0
        assert wav.exists()

    def test_negations_parse(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "p.flac"
        assert run_flac(
            "-5", "--warnings-as-errors", "--no-warnings-as-errors",
            "--replay-gain", "--no-replay-gain",
            "--keep-foreign-metadata", "--no-keep-foreign-metadata",
            "--silent", "--no-silent", "--totally-silent",
            "-f", "-o", str(out), str(wav)) == 0
        wavout = tmp_path / "p.wav"
        assert run_flac(
            "-d", "--decode-through-errors", "--no-decode-through-errors",
            "-f", "-o", str(wavout), str(out)) == 0
        ana = tmp_path / "p.ana"
        assert run_flac(
            "-a", "--residual-text", "--no-residual-text",
            "--residual-gnuplot", "--no-residual-gnuplot",
            "-f", "-o", str(ana), str(out)) == 0


class TestExtendedFlags:
    """The remaining main.c option-table entries: --ignore-chunk-sizes,
    --sector-align (deprecated), --output-prefix, --preserve-modtime,
    --serial-number, --channel-map=none, --no-cued-seekpoints, -H."""

    def test_ignore_chunk_sizes(self, tmp_path):
        import struct
        sig = make_signal(6000, 2, 16, kind="sine", seed=5)
        wav = tmp_path / "bogus.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        raw = bytearray(wav.read_bytes())
        # corrupt the data chunk size down to 1000 samples' worth
        di = raw.find(b"data")
        assert di > 0
        struct.pack_into("<I", raw, di + 4, 1000 * 4)
        wav.write_bytes(bytes(raw))
        out = tmp_path / "o.flac"
        assert run_flac("-5", "-f", "-o", str(out), str(wav)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        assert len(pcm) == 1000  # honored the (bogus) chunk size
        assert run_flac("-5", "--ignore-chunk-sizes", "-f", "-o", str(out),
                        str(wav)) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)  # read to EOF

    def test_ignore_chunk_sizes_usage_errors(self, wav_file):
        wav, _ = wav_file
        assert run_flac("-d", "--ignore-chunk-sizes", str(wav)) == 1
        assert run_flac("--ignore-chunk-sizes", "--sector-align", str(wav)) == 1
        assert run_flac("--ignore-chunk-sizes", "--until=100", str(wav)) == 1

    def test_sector_align_two_files(self, tmp_path):
        n1, n2 = 4096 * 2 + 301, 4096 + 97  # neither a multiple of 588
        sig1 = make_signal(n1, 2, 16, kind="sine", seed=1)
        sig2 = make_signal(n2, 2, 16, kind="quiet", seed=2)
        for name, sig in (("a.wav", sig1), ("b.wav", sig2)):
            write_wav(str(tmp_path / name),
                      AudioBuffer(samples=sig, sample_rate=44100,
                                  bits_per_sample=16))
        assert run_flac("-3", "-f", "--sector-align",
                        str(tmp_path / "a.wav"), str(tmp_path / "b.wav")) == 0
        pcm1, _, _ = decode_bytes((tmp_path / "a.flac").read_bytes())
        pcm2, _, _ = decode_bytes((tmp_path / "b.flac").read_bytes())
        assert len(pcm1) % 588 == 0 and len(pcm2) % 588 == 0
        total = np.concatenate([sig1, sig2], axis=0)
        pad = (-len(total)) % 588
        padded = np.concatenate(
            [total, np.zeros((pad, 2), total.dtype)], axis=0)
        np.testing.assert_array_equal(
            np.concatenate([pcm1, pcm2], axis=0), padded)

    def test_sector_align_vs_oracle(self, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        n1, n2 = 5000, 3333
        sig1 = make_signal(n1, 2, 16, kind="noise", seed=3)
        sig2 = make_signal(n2, 2, 16, kind="sine", seed=4)
        for d in ("ours", "ref"):
            (tmp_path / d).mkdir()
            for name, sig in (("a.wav", sig1), ("b.wav", sig2)):
                write_wav(str(tmp_path / d / name),
                          AudioBuffer(samples=sig, sample_rate=44100,
                                      bits_per_sample=16))
        assert run_flac("-5", "-f", "--sector-align",
                        str(tmp_path / "ours" / "a.wav"),
                        str(tmp_path / "ours" / "b.wav")) == 0
        r = subprocess.run([str(oracle), "-5", "-f", "--sector-align",
                            str(tmp_path / "ref" / "a.wav"),
                            str(tmp_path / "ref" / "b.wav")],
                           capture_output=True)
        assert r.returncode == 0
        for name in ("a.flac", "b.flac"):
            ours, _, _ = decode_bytes((tmp_path / "ours" / name).read_bytes())
            theirs, _, _ = decode_bytes((tmp_path / "ref" / name).read_bytes())
            np.testing.assert_array_equal(ours, theirs)

    def test_output_prefix(self, tmp_path, wav_file, monkeypatch):
        wav, sig = wav_file
        monkeypatch.chdir(wav.parent)
        # the prefix is prepended to the output name verbatim (main.c
        # get_outfilename), so it composes with relative inputs
        assert run_flac("-1", "-f", "--output-prefix=pfx-", wav.name) == 0
        out = wav.parent / "pfx-in.flac"
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        assert run_flac("--output-prefix=x", "-o", "y.flac", wav.name) == 1

    def test_preserve_modtime(self, tmp_path, wav_file):
        import os
        wav, _ = wav_file
        old = 946684800  # 2000-01-01
        os.utime(wav, (old, old))
        out = tmp_path / "m.flac"
        assert run_flac("-0", "-f", "-o", str(out), str(wav)) == 0
        assert int(os.stat(out).st_mtime) == old  # default: preserved
        assert run_flac("-0", "--no-preserve-modtime", "-f", "-o", str(out),
                        str(wav)) == 0
        assert int(os.stat(out).st_mtime) != old

    def test_ogg_serial_number(self, tmp_path, wav_file):
        wav, _ = wav_file
        out = tmp_path / "s.oga"
        assert run_flac("--ogg", "--serial-number=12345", "-2", "-f",
                        "-o", str(out), str(wav)) == 0
        data = out.read_bytes()
        assert data[:4] == b"OggS"
        serial = int.from_bytes(data[14:18], "little")
        assert serial == 12345

    def test_channel_map_none(self, tmp_path):
        import struct
        # WAVE_FORMAT_EXTENSIBLE with an unsupported channel mask
        sig = make_signal(3000, 2, 16, kind="quiet", seed=6)
        pcm = sig.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 2, 44100, 44100 * 4, 4, 16,
                          22, 16, 0x0009) + b"\x01\x00" + b"\x00" * 14
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
        wav = tmp_path / "ext.wav"
        wav.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
        out = tmp_path / "e.flac"
        assert run_flac("-1", "-f", "-o", str(out), str(wav)) == 1
        assert run_flac("-1", "--channel-map=none", "-f", "-o", str(out),
                        str(wav)) == 0
        got, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(got, sig)

    def test_no_cued_seekpoints(self, tmp_path, wav_file):
        from flac_tpu.metadata import SeekTable, parse_metadata
        wav, sig = wav_file
        cue = tmp_path / "t.cue"
        cue.write_text('FILE "x.wav" WAVE\n  TRACK 01 AUDIO\n    INDEX 01 00:00:00\n'
                       '  TRACK 02 AUDIO\n    INDEX 01 00:00:05\n')
        def seektable(flags):
            out = tmp_path / "c.flac"
            assert run_flac(*flags, f"--cuesheet={cue}", "-S", "1x", "-f",
                            "-o", str(out), str(wav)) == 0
            blocks, _ = parse_metadata(out.read_bytes(), 4)
            st = next(b for b in blocks if isinstance(b, SeekTable))
            return {p.sample_number for p in st.points}
        with_cued = seektable(["-1"])
        # INDEX 01 00:00:05 = 5 CD frames = 2940 samples; the encoder's
        # seekpoint fill-in snaps it to the containing frame's first sample
        # (blocksize 1152 at -1 -> 2304)
        track2 = 5 * 588 // 1152 * 1152
        assert 0 in with_cued and track2 in with_cued
        without = seektable(["-1", "--no-cued-seekpoints"])
        assert without == {0}  # only the -S 1x point remains

    def test_explain(self, capsys):
        with pytest.raises(SystemExit) as e:
            flac_cli.main(["-H"])
        assert e.value.code == 0
        assert "Detailed option reference" in capsys.readouterr().out


class TestMetaflacExtended:
    """Remaining metaflac option-table entries: undocumented STREAMINFO
    setters, --append (errors, like the reference), --version,
    --no-cued-seekpoints on cuesheet import."""

    @pytest.fixture
    def flac_pair(self, tmp_path):
        """The same FLAC file twice: ours to edit, ref copy for the oracle."""
        sig = make_signal(44100 * 2, 2, 16, kind="sine", seed=31)
        wav = tmp_path / "in.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        ours = tmp_path / "ours.flac"
        assert run_flac("-3", "-f", "-o", str(ours), str(wav)) == 0
        ref = tmp_path / "ref.flac"
        ref.write_bytes(ours.read_bytes())
        return ours, ref

    def test_streaminfo_setters_match_oracle(self, flac_pair):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        mf = oracle.parent / "metaflac"
        ours, ref = flac_pair
        ops = ["--set-total-samples=12345", "--set-min-framesize=99",
               "--set-max-framesize=100000", "--set-sample-rate=48000",
               "--set-channels=2", "--set-bps=16",
               "--set-md5sum=" + "ab" * 16]
        rc, _ = run_metaflac_capture(*ops, str(ours))
        assert rc == 0
        subprocess.run([str(mf), *ops, str(ref)], check=True,
                       capture_output=True)
        rc, got = run_metaflac_capture("--list", "--block-number=0", str(ours))
        assert rc == 0
        want = subprocess.run([str(mf), "--list", "--block-number=0", str(ref)],
                              capture_output=True, text=True).stdout
        assert got == want
        assert ours.read_bytes() == ref.read_bytes()

    def test_append_not_implemented(self, flac_pair):
        ours, _ = flac_pair
        rc, _ = run_metaflac_capture("--append", str(ours))
        assert rc == 1

    def test_version(self):
        with pytest.raises(SystemExit) as e:
            metaflac_cli.main(["--version"])
        assert e.value.code is None or e.value.code == 0

    def test_import_cuesheet_cued_seekpoints(self, flac_pair, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        mf = oracle.parent / "metaflac"
        ours, ref = flac_pair
        cue = tmp_path / "t.cue"
        cue.write_text('FILE "x.wav" WAVE\n  TRACK 01 AUDIO\n    INDEX 01 00:00:00\n'
                       '  TRACK 02 AUDIO\n    INDEX 00 00:00:40\n    INDEX 01 00:01:00\n')
        rc, _ = run_metaflac_capture(f"--import-cuesheet-from={cue}", str(ours))
        assert rc == 0
        subprocess.run([str(mf), f"--import-cuesheet-from={cue}", str(ref)],
                       check=True, capture_output=True)
        _, got = run_metaflac_capture("--list", "--block-type=SEEKTABLE",
                                      str(ours))
        want = subprocess.run(
            [str(mf), "--list", "--block-type=SEEKTABLE", str(ref)],
            capture_output=True, text=True).stdout
        assert got == want

    def test_import_cuesheet_no_cued_seekpoints(self, flac_pair, tmp_path):
        from flac_tpu.metadata import MetadataChain, SeekTable
        ours, _ = flac_pair
        cue = tmp_path / "t.cue"
        cue.write_text('FILE "x.wav" WAVE\n  TRACK 01 AUDIO\n    INDEX 01 00:00:00\n')
        before = MetadataChain.read(str(ours)).get(SeekTable)
        rc, _ = run_metaflac_capture("--no-cued-seekpoints",
                                     f"--import-cuesheet-from={cue}", str(ours))
        assert rc == 0
        after = MetadataChain.read(str(ours)).get(SeekTable)
        # no new points were added (the pre-existing table is untouched)
        assert (after.points if after else []) == (before.points if before else [])

    def test_force_rf64_output(self, tmp_path, wav_file):
        wav, sig = wav_file
        out = tmp_path / "r.flac"
        run_flac("-2", "-f", "-o", str(out), str(wav))
        rf = tmp_path / "o.rf64"
        assert run_flac("-d", "-f", "--force-rf64-format",
                        "-o", str(rf), str(out)) == 0
        data = rf.read_bytes()
        assert data[:4] == b"RF64" and data[12:16] == b"ds64"
        from flac_tpu.containers import parse_wav
        got = parse_wav(data)  # RF64 parses through the WAV reader (ds64 sizes)
        np.testing.assert_array_equal(got.samples, sig)
        oracle = oracle_path()
        if oracle:
            # the oracle encodes RF64 input; round-trip ours through it
            back = tmp_path / "rt.flac"
            r = subprocess.run([str(oracle), "-2", "-f", "-o", str(back), str(rf)],
                               capture_output=True)
            assert r.returncode == 0, r.stderr[-300:]
            pcm, _, _ = decode_bytes(back.read_bytes())
            np.testing.assert_array_equal(pcm, sig)

    def test_stdin_stdout_pipes(self, tmp_path, wav_file):
        """Explicit "-" = encode stdin to stdout (main.c:2165); zero file
        arguments print usage and exit 0 (main.c:344-348)."""
        import subprocess as sp
        wav, sig = wav_file
        import sys as _sys, os as _os
        env = dict(_os.environ, JAX_PLATFORMS="cpu", FLAC_TPU_DEVICE="cpu")
        r = sp.run([_sys.executable, "-m", "flac_tpu.cli.flac",
                    "--totally-silent", "-0", "-"],
                   input=wav.read_bytes(), capture_output=True, env=env,
                   timeout=500)
        assert r.returncode == 0, r.stderr[-300:]
        assert r.stdout[:4] == b"fLaC"
        pcm, _, _ = decode_bytes(r.stdout)
        np.testing.assert_array_equal(pcm, sig)
        r2 = sp.run([_sys.executable, "-m", "flac_tpu.cli.flac",
                     "--totally-silent", "-d", "-"],
                    input=r.stdout, capture_output=True, env=env, timeout=500)
        assert r2.returncode == 0, r2.stderr[-300:]
        assert r2.stdout[:4] == b"RIFF"
        r3 = sp.run([_sys.executable, "-m", "flac_tpu.cli.flac",
                     "--totally-silent"], capture_output=True, env=env,
                    timeout=500)
        assert r3.returncode == 0 and r3.stdout == b""  # usage, success
