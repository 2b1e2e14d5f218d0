"""grabbag-equivalent tests: seektable spec parsing, cuesheet parse/emit
(differential against the reference metaflac import/export), picture spec
parsing with PNG/JPEG/GIF sniffing — the analog of test_grabbag + pieces of
test_metaflac.sh."""

import struct
import subprocess
import zlib

import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.encode.encoder import encode_file
from flac_tpu.grabbag import (
    CueSheetParseError,
    PictureSpecError,
    cuesheet_emit,
    cuesheet_parse,
    picture_from_specification,
    seektable_from_specification,
)
from flac_tpu.metadata import SeekPoint


class TestSeektableSpec:
    def test_spaced_points(self):
        pts, real = seektable_from_specification("4x", 1000, 44100)
        assert real
        assert [p.sample_number for p in pts] == [0, 250, 500, 750]

    def test_spaced_by_seconds(self):
        pts, _ = seektable_from_specification("1s", 44100 * 3, 44100)
        assert [p.sample_number for p in pts] == [0, 44100, 88200]
        # non-dividing total gets the trailing point
        pts, _ = seektable_from_specification("1s", 44100 * 3 + 5, 44100)
        assert [p.sample_number for p in pts] == [0, 44100, 88200, 132300]

    def test_explicit_and_placeholder(self):
        pts, real = seektable_from_specification("X;100;50;X", 1000, 44100)
        assert real
        assert [p.sample_number for p in pts[:2]] == [50, 100]
        assert pts[2].is_placeholder and pts[3].is_placeholder

    def test_dedupe_and_out_of_range(self):
        pts, _ = seektable_from_specification("100;100;2000", 1000, 44100)
        assert [p.sample_number for p in pts] == [100]

    def test_unknown_total_skips_computed(self):
        pts, real = seektable_from_specification("10x;1s;X", 0, 44100)
        assert real is False  # nothing computable counted as real
        assert len(pts) == 1 and pts[0].is_placeholder


CUE_TEXT = """\
CATALOG 1234567890123
FILE "x.wav" WAVE
  TRACK 01 AUDIO
    ISRC USRC17607839
    INDEX 01 00:00:00
  TRACK 02 AUDIO
    FLAGS PRE
    INDEX 00 00:04:00
    INDEX 01 00:05:37
"""


class TestCuesheet:
    def test_parse_cdda(self):
        cs = cuesheet_parse(CUE_TEXT, 44100, True, 44100 * 60)
        assert cs.is_cd and cs.lead_in == 2 * 44100
        assert cs.media_catalog_number.rstrip(b"\x00") == b"1234567890123"
        assert len(cs.tracks) == 3  # 2 + lead-out
        t1, t2, lo = cs.tracks
        assert t1.number == 1 and t1.offset == 0
        assert t1.isrc == b"USRC17607839"
        assert t2.pre_emphasis
        assert t2.offset == 4 * 44100 and len(t2.indices) == 2
        assert t2.indices[1].offset == (5 * 44100 + 37 * 588) - 4 * 44100
        assert lo.number == 170 and lo.offset == 44100 * 60

    def test_emit_roundtrip(self):
        cs = cuesheet_parse(CUE_TEXT, 44100, True, 44100 * 60)
        text = cuesheet_emit(cs)
        cs2 = cuesheet_parse(text, 44100, True, 44100 * 60)
        assert cs.body_bytes() == cs2.body_bytes()

    def test_errors(self):
        with pytest.raises(CueSheetParseError):
            cuesheet_parse("TRACK 01 AUDIO\n", 44100, True, 100)  # no INDEX
        with pytest.raises(CueSheetParseError):
            cuesheet_parse("CATALOG 123\n" + CUE_TEXT[22:], 44100, True, 100)
        with pytest.raises(CueSheetParseError):  # first index must be 00:00:00
            cuesheet_parse("TRACK 01 AUDIO\n INDEX 01 00:01:00\n", 44100, True, 10 ** 6)

    def test_non_cdda_sample_offsets(self):
        text = "TRACK 01 AUDIO\n  INDEX 01 0\nTRACK 02 AUDIO\n  INDEX 01 96000\n"
        cs = cuesheet_parse(text, 96000, False, 96000 * 9)
        assert cs.tracks[1].offset == 96000
        assert cs.tracks[-1].number == 255

    def test_differential_vs_metaflac(self, tmp_path):
        """Import our emitted cuesheet with the reference metaflac, export it
        back, and re-parse: the binary block must round-trip identically."""
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        n = 44100 * 60
        sig = make_signal(4096, 2, 16)  # short file, but claim total via cuesheet rules
        path = tmp_path / "c.flac"
        encode_file(make_signal(n // 100, 2, 16, kind="constant"), 44100, 16,
                    str(path), level=0, batch_frames=64)
        cue = tmp_path / "in.cue"
        cue.write_text(CUE_TEXT)
        r = subprocess.run([str(metaflac), f"--import-cuesheet-from={cue}", str(path)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        out = tmp_path / "out.cue"
        r = subprocess.run([str(metaflac), f"--export-cuesheet-to={out}", str(path)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        ours = cuesheet_parse(out.read_text(), 44100, True,
                              lead_out_offset=n // 100)
        from flac_tpu.metadata import CueSheet, get_cuesheet
        theirs = get_cuesheet(str(path))
        assert theirs is not None
        assert ours.body_bytes() == theirs.body_bytes()


def _png_bytes(w=8, h=8, color_type=2, bit_depth=8):
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    return (b"\x89PNG\x0d\x0a\x1a\x0a" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"\x00") + chunk(b"IEND", b""))


def _gif_bytes(w=5, h=7):
    return b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x87, 0, 0]) + b"\x3b"


def _jpeg_bytes(w=6, h=4):
    sof0 = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, h, w, 3) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe0\x00\x04\x4a\x46" + sof0 + b"\xff\xd9"


class TestPictureSpec:
    def test_png_sniff(self, tmp_path):
        p = tmp_path / "a.png"
        p.write_bytes(_png_bytes(8, 8))
        pic = picture_from_specification(str(p))
        assert (pic.mime_type, pic.width, pic.height, pic.depth) == ("image/png", 8, 8, 24)
        assert pic.picture_type == 3

    def test_gif_sniff(self, tmp_path):
        p = tmp_path / "a.gif"
        p.write_bytes(_gif_bytes(5, 7))
        pic = picture_from_specification(f"4||desc||{p}")
        assert (pic.mime_type, pic.width, pic.height, pic.depth) == ("image/gif", 5, 7, 24)
        assert pic.picture_type == 4 and pic.description == "desc"

    def test_jpeg_sniff(self, tmp_path):
        p = tmp_path / "a.jpg"
        p.write_bytes(_jpeg_bytes(6, 4))
        pic = picture_from_specification(str(p))
        assert (pic.mime_type, pic.width, pic.height) == ("image/jpeg", 6, 4)

    def test_explicit_resolution(self, tmp_path):
        p = tmp_path / "b.png"
        p.write_bytes(_png_bytes())
        pic = picture_from_specification(f"3|image/png|c|300x200x24/0|{p}")
        assert (pic.width, pic.height, pic.depth, pic.colors) == (300, 200, 24, 0)

    def test_url(self):
        pic = picture_from_specification("3|-->|c|10x10x24|http://x/y.png")
        assert pic.data == b"http://x/y.png"

    def test_icon_rule(self, tmp_path):
        p = tmp_path / "i.png"
        p.write_bytes(_png_bytes(16, 16))
        with pytest.raises(PictureSpecError):
            picture_from_specification(f"1||||{p}")
        p.write_bytes(_png_bytes(32, 32))
        pic = picture_from_specification(f"1||||{p}")
        assert pic.picture_type == 1

    def test_differential_vs_metaflac(self, tmp_path):
        """--import-picture-from with the same spec must produce an identical
        PICTURE block body."""
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        png = tmp_path / "cover.png"
        png.write_bytes(_png_bytes(8, 8))
        path = tmp_path / "p.flac"
        encode_file(make_signal(2000, 2, 16), 44100, 16, str(path), level=0)
        spec = f"3|image/png|the cover||{png}"
        r = subprocess.run([str(metaflac), f"--import-picture-from={spec}", str(path)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        from flac_tpu.metadata import get_picture
        theirs = get_picture(str(path))
        ours = picture_from_specification(spec)
        assert theirs is not None
        assert ours.body_bytes() == theirs.body_bytes()
