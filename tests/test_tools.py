"""Dev-tool and foreign-metadata tests: flacdiff first-divergence reporting,
flactimer, --keep-foreign-metadata WAV round trip (test_flac.sh:1162)."""

import struct
import sys

import numpy as np

from tests.conftest import make_signal

from flac_tpu.cli import flacdiff
from flac_tpu.cli.flac import main as flac_main
from flac_tpu.containers import AudioBuffer, read_wav, wav_bytes, write_wav
from flac_tpu.encode.encoder import encode_file


class TestFlacdiff:
    def test_identical_and_diff(self, tmp_path, capsys):
        sig = make_signal(4096 + 10, 2, 16, kind="quiet", seed=30)
        a = tmp_path / "a.flac"
        encode_file(sig, 44100, 16, str(a), level=2)
        b = tmp_path / "b.flac"
        b.write_bytes(a.read_bytes())
        assert flacdiff.main([str(a), str(b)]) == 0
        data = bytearray(a.read_bytes())
        data[len(data) - 100] ^= 0x5A
        b.write_bytes(bytes(data))
        assert flacdiff.main([str(a), str(b)]) == 2
        out = capsys.readouterr().out
        assert "first difference at byte" in out and "frame" in out

    def test_metadata_region(self, tmp_path, capsys):
        sig = make_signal(2048, 2, 16, kind="quiet", seed=31)
        a = tmp_path / "a.flac"
        encode_file(sig, 44100, 16, str(a), level=1)
        data = bytearray(a.read_bytes())
        data[10] ^= 0xFF  # inside STREAMINFO
        b = tmp_path / "b.flac"
        b.write_bytes(bytes(data))
        assert flacdiff.main([str(a), str(b)]) == 2
        assert "in metadata" in capsys.readouterr().out


class TestFlactimer:
    def test_times_command(self, capsys):
        from flac_tpu.cli.flactimer import main
        rc = main([sys.executable, "-c", "print('hi')"])
        assert rc == 0
        err = capsys.readouterr().err
        assert "real time" in err


class TestKeepForeignMetadata:
    def test_wav_foreign_chunks_roundtrip(self, tmp_path):
        sig = make_signal(4096 + 5, 2, 16, kind="quiet", seed=33)
        base = wav_bytes(AudioBuffer(samples=sig, sample_rate=44100,
                                     bits_per_sample=16))
        # graft two foreign chunks (LIST/INFO and a custom one) onto the WAV
        info = b"INFOISFT\x0c\x00\x00\x00flac_tpu\x00\x00\x00\x00"
        list_chunk = b"LIST" + struct.pack("<I", len(info)) + info
        cust = b"xyz " + struct.pack("<I", 5) + b"hello" + b"\x00"
        wav = base[:12] + list_chunk + cust + base[12:]
        wav = b"RIFF" + struct.pack("<I", len(wav) - 8) + wav[8:]
        src = tmp_path / "f.wav"
        src.write_bytes(wav)
        out = tmp_path / "f.flac"
        assert flac_main(["--totally-silent", "-2", "-f", "--keep-foreign-metadata",
                          "-o", str(out), str(src)]) == 0
        from flac_tpu.metadata import Application, parse_metadata
        blocks, _ = parse_metadata(out.read_bytes(), 4)
        apps = [b for b in blocks if isinstance(b, Application) and b.app_id == b"riff"]
        # reference-compatible storage (foreign_metadata.c:186-253): one block
        # per chunk in file order — RIFF header, LIST, xyz, fmt, data marker
        assert len(apps) == 5
        assert apps[0].data[:4] == b"RIFF" and apps[0].data[8:12] == b"WAVE"
        assert apps[1].data == list_chunk
        assert apps[2].data == cust
        assert apps[3].data[:4] == b"fmt "
        assert apps[4].data[:4] == b"data" and len(apps[4].data) == 8
        back = tmp_path / "g.wav"
        assert flac_main(["--totally-silent", "-d", "-f", "--keep-foreign-metadata",
                          "-o", str(back), str(out)]) == 0
        # restore splices the stored chunks back verbatim: byte-identical WAV
        assert back.read_bytes() == wav
        got = read_wav(str(back))
        np.testing.assert_array_equal(got.samples, sig)


class TestResidualGnuplot:
    def test_gp_files_written(self, tmp_path, monkeypatch):
        from flac_tpu.cli.flac import main as flac_main
        sig = make_signal(1152 * 2, 2, 16, kind="quiet", seed=40)
        wav = tmp_path / "g.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "g.flac"
        assert flac_main(["--totally-silent", "-2", "-f", "-o", str(out), str(wav)]) == 0
        monkeypatch.chdir(tmp_path)
        assert flac_main(["--totally-silent", "-a", "--residual-gnuplot", "-f",
                          "-o", str(tmp_path / "g.ana"), str(out)]) == 0
        gp = sorted(tmp_path.glob("f*.s*.gp"))
        assert len(gp) == 4  # 2 frames x 2 channels
        assert (tmp_path / "all").exists()
        text = gp[0].read_text()
        assert text.startswith("plot '-' title 'PDF'") and "\ne\n" in text
