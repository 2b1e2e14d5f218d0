"""flac-to-flac re-encode metadata semantics (encode.c:1783-2009).

Mirrors the reference harness's case00a-04e matrix
(test/test_flac.sh:1176-1240): re-encode FLAC inputs carrying different
block combinations and check the output's metadata block sequence against
the reference binary's, using the harness's own filter (vendor strings,
min/max sizes and stream offsets legitimately differ between encoders).

Input fixtures are synthesized here (block letters as in the reference's
input-*.flac names: S=SEEKTABLE, C=CUESHEET, V=VORBIS_COMMENT,
A=APPLICATION, U=unknown block, P=PADDING).
"""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.cli import flac as flac_cli
from flac_tpu.containers import AudioBuffer, write_wav
from flac_tpu.metadata import (
    Application,
    CueSheet,
    CueSheetIndex,
    CueSheetTrack,
    Padding,
    SeekPoint,
    SeekTable,
    Unknown,
    VorbisComment,
    parse_metadata,
    serialize_metadata,
)

TOTAL = 176400  # 4 s of CDDA; divisible by 588 so a CD cuesheet is legal


def run_flac(*args):
    return flac_cli.main(["--totally-silent", *args])


def _block(letter):
    if letter == "S":
        return SeekTable(points=[SeekPoint(0, 0, 4096)])
    if letter == "C":
        return CueSheet(media_catalog_number=b"", lead_in=88200, is_cd=True,
                        tracks=[CueSheetTrack(offset=0, number=1,
                                              indices=[CueSheetIndex(0, 1)]),
                                CueSheetTrack(offset=TOTAL, number=170)])
    if letter == "V":
        return VorbisComment(vendor_string="input-vendor",
                             comments=["TITLE=orig", "ALBUM=fixture"])
    if letter == "A":
        return Application(app_id=b"xtra", data=b"app-payload-123")
    if letter == "U":
        return Unknown(code=90, data=b"\x5a" * 12)
    if letter == "P":
        return Padding(length=777)
    raise ValueError(letter)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """One base encode; header rewritten per block-letter combination."""
    tmp = tmp_path_factory.mktemp("f2f")
    sig = make_signal(TOTAL, 2, 16, seed=11, kind="quiet")
    wav = tmp / "in.wav"
    write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                    bits_per_sample=16))
    base = tmp / "base.flac"
    assert run_flac("-1", "-f", "-S-", "--no-padding",
                    "-o", str(base), str(wav)) == 0
    data = base.read_bytes()
    blocks, audio_off = parse_metadata(data, 4)
    si, audio = blocks[0], data[audio_off:]

    out = {}
    for letters in ("SCVAUP", "SCVPAP", "SCVA", "SVAUP", "VA", "SCPAP"):
        hdr = [si] + [_block(c) for c in letters]
        p = tmp / f"input-{letters}.flac"
        p.write_bytes(b"fLaC" + serialize_metadata(hdr) + audio)
        out[letters] = p
    cue = tmp / "input0.cue"
    cue.write_text('FILE "x.wav" WAVE\n  TRACK 01 AUDIO\n'
                   '    INDEX 01 00:00:00\n')
    out["cue"] = cue
    return out


def _filter(listing: str) -> str:
    """The reference harness's filter (test_flac.sh:1183-1190) plus the
    VORBIS_COMMENT length line (vendor strings differ in length between the
    two encoders, which the harness's single-binary runs never see)."""
    out, in_vc = [], False
    for line in listing.splitlines():
        if line.startswith("  type:"):
            in_vc = "VORBIS_COMMENT" in line
        if line.startswith("  vendor string:"):
            continue
        if in_vc and line.startswith("  length:"):
            continue
        if line.startswith(("  minimum blocksize:", "  maximum blocksize:",
                            "  minimum framesize:", "  maximum framesize:")):
            continue
        out.append(line.split(", stream_offset")[0])
    return "\n".join(out)


CASES = [
    # (case id, input letters, extra args) — comments per test_flac.sh
    ("00a", "SCVAUP", []),                      # keep all, same order
    ("01a", "SCVPAP", []),                      # paddings aggregate at end
    ("01b", "SCVPAP", ["--no-padding"]),        # all padding deleted
    ("01c", "SCVPAP", ["-P", "1234"]),          # -P overrides all padding
    ("01d", "SCVA", ["-P", "1234"]),            # no padding in input, -P
    ("01e", "SCVA", []),                        # no padding, default size
    ("02a", "SCPAP", []),                       # no VC: new VC added
    ("02b", "SCPAP", ["--tag=artist=0"]),       # no VC: new VC with tags
    ("02c", "SCVAUP", ["--tag=artist=0"]),      # existing VC replaced
    ("03a", "SVAUP", ["--cuesheet"]),           # no CUESHEET: added
    ("03b", "SCVAUP", ["--cuesheet"]),          # existing CUESHEET replaced
    ("03c", "SCVAUP", ["--skip=588"]),          # size change drops CS + ST
    ("04a", "VA", ["--no-padding", "--no-seektable"]),
    ("04b", "VA", ["--no-padding", "-S", "5x"]),
    ("04c", "VA", ["--no-padding"]),            # new default SEEKTABLE
    ("04d", "SCVA", ["--no-padding", "--no-seektable"]),
    ("04e", "SCVA", ["--no-padding", "-S", "5x"]),
]


class TestFlacToFlacOracle:
    @pytest.mark.parametrize("case,letters,args",
                             CASES, ids=[c[0] for c in CASES])
    def test_case(self, tmp_path, fixtures, case, letters, args):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference flac oracle not available")
        metaflac = oracle.parent / "metaflac"
        args = [a if a != "--cuesheet" else f"--cuesheet={fixtures['cue']}"
                for a in args]
        src = fixtures[letters]
        ref_out = tmp_path / "ref.flac"
        r = subprocess.run([str(oracle), "-s", "-f", "-o", str(ref_out),
                            *args, str(src)], capture_output=True)
        assert r.returncode == 0, r.stderr
        our_out = tmp_path / "ours.flac"
        assert run_flac("-f", "-o", str(our_out), *args, str(src)) == 0

        def listing(p):
            r = subprocess.run([str(metaflac), "--list", str(p)],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            return r.stdout

        assert _filter(listing(our_out)) == _filter(listing(ref_out)), case


class TestFlacToFlacLocal:
    """Non-oracle assertions on the carry-over rules (block-type sequences),
    so the semantics stay covered when the oracle is unavailable."""

    def _types(self, path):
        blocks, _ = parse_metadata(path.read_bytes(), 4)
        return [type(b).__name__ for b in blocks]

    def test_keep_all_same_order(self, tmp_path, fixtures):
        out = tmp_path / "o.flac"
        assert run_flac("-f", "-o", str(out), str(fixtures["SCVAUP"])) == 0
        assert self._types(out) == ["StreamInfo", "SeekTable", "CueSheet",
                                    "VorbisComment", "Application", "Unknown",
                                    "Padding"]
        blocks, _ = parse_metadata(out.read_bytes(), 4)
        assert blocks[3].comments == ["TITLE=orig", "ALBUM=fixture"]
        assert blocks[4].data == b"app-payload-123"
        assert blocks[5].data == b"\x5a" * 12

    def test_padding_aggregates(self, tmp_path, fixtures):
        out = tmp_path / "o.flac"
        assert run_flac("-f", "-o", str(out), str(fixtures["SCVPAP"])) == 0
        blocks, _ = parse_metadata(out.read_bytes(), 4)
        pads = [b for b in blocks if isinstance(b, Padding)]
        assert len(pads) == 1 and blocks[-1] is pads[0]
        assert pads[0].length == 777 * 2  # sum of the two input paddings

    def test_new_vc_prepended(self, tmp_path, fixtures):
        out = tmp_path / "o.flac"
        assert run_flac("-f", "-o", str(out), str(fixtures["SCPAP"])) == 0
        # new (empty) VC lands right after STREAMINFO, before kept blocks
        assert self._types(out)[:3] == ["StreamInfo", "VorbisComment",
                                        "SeekTable"]

    def test_size_change_drops_cuesheet_and_seektable(self, tmp_path,
                                                      fixtures):
        out = tmp_path / "o.flac"
        assert run_flac("-f", "--skip=588", "-o", str(out),
                        str(fixtures["SCVAUP"])) == 0
        types = self._types(out)
        assert "CueSheet" not in types
        # a NEW default seektable replaces the dropped one
        blocks, _ = parse_metadata(out.read_bytes(), 4)
        st = [b for b in blocks if isinstance(b, SeekTable)]
        assert len(st) == 1

    def test_warnings_as_errors(self, tmp_path, fixtures):
        out = tmp_path / "o.flac"
        rc = flac_cli.main(["--totally-silent", "-w", "-f", "-o", str(out),
                            "--tag=artist=0", str(fixtures["SCVAUP"])])
        assert rc != 0  # replacing input tags warns, -w makes it fatal

    def test_roundtrip_pcm_identical(self, tmp_path, fixtures):
        from flac_tpu.decode.host_decoder import decode_bytes
        out = tmp_path / "o.flac"
        assert run_flac("-f", "-8", "-o", str(out), str(fixtures["SCVAUP"])) == 0
        pcm, _, _ = decode_bytes(out.read_bytes())
        pcm0, _, _ = decode_bytes(fixtures["SCVAUP"].read_bytes())
        np.testing.assert_array_equal(pcm, pcm0)
