"""--keep-foreign-metadata: container-chunk preservation tests.

Mirrors the reference harness: the "wacky" WAV/Wave64/RF64 fixtures are the
byte-exact files generate_wackywavs/generate_wackywav64s/generate_wackyrf64s
emit (src/test_streams/main.c:835-965), and the round-trip matrix matches
test_flac.sh:1162-1172 (rt_test_* with --keep-foreign-metadata). Cross
encode/decode against the reference binary proves the APPLICATION-block
storage format (foreign_metadata.c) is interoperable byte-for-byte.
"""

import struct
import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.cli import flac as flac_cli
from flac_tpu.cli.foreign import (
    from_application_blocks,
    scan_aiff,
    scan_container,
    scan_wave,
    scan_wave64,
)


def run_flac(*args):
    return flac_cli.main(["--totally-silent", *args])


# -- wacky fixtures: byte-for-byte the reference's generators ----------------

def wacky_wavs() -> list[bytes]:
    """generate_wackywavs (test_streams/main.c:835-869): junk chunks before
    fmt and (in wacky2) after data; 8 samples of 16-bit mono PCM."""
    wav = bytes([
        0x52, 0x49, 0x46, 0x46, 76, 0, 0, 0,
        0x57, 0x41, 0x56, 0x45, 0x6A, 0x75, 0x6E, 0x6B,
        4, 0, 0, 0, 0x62, 0x6C, 0x61, 0x68,
        0x70, 0x61, 0x64, 0x20, 4, 0, 0, 0,
        0x42, 0x4C, 0x41, 0x48, 0x66, 0x6D, 0x74, 0x20,
        16, 0, 0, 0, 1, 0, 1, 0,
        0x44, 0xAC, 0, 0, 0x88, 0x58, 0x01, 0,
        2, 0, 16, 0, 0x64, 0x61, 0x74, 0x61,
        16, 0, 0, 0, 0, 0, 1, 0,
        4, 0, 9, 0, 16, 0, 25, 0,
        36, 0, 49, 0, 0x70, 0x61, 0x64, 0x20,
        4, 0, 0, 0, 0x62, 0x6C, 0x61, 0x68,
    ])
    w1 = wav[:84]
    w2 = wav[:4] + bytes([76 + 12]) + wav[5:96]
    return [w1, w2]


def wacky_w64s() -> list[bytes]:
    """generate_wackywav64s (test_streams/main.c:871-917)."""
    wav = bytes([
        0x72, 0x69, 0x66, 0x66, 0x2E, 0x91, 0xCF, 0x11,
        0xD6, 0xA5, 0x28, 0xDB, 0x04, 0xC1, 0x00, 0x00,
        152, 0, 0, 0, 0, 0, 0, 0,
        0x77, 0x61, 0x76, 0x65, 0xF3, 0xAC, 0xD3, 0x11,
        0xD1, 0x8C, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A,
        0x6A, 0x75, 0x6E, 0x6B, 0xF3, 0xAC, 0xD3, 0x11,
        0xD1, 0x8C, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A,
        32, 0, 0, 0, 0, 0, 0, 0,
        0x62, 0x6C, 0x61, 0x68, 0x62, 0x6C, 0x61, 0x68,
        0x66, 0x6D, 0x74, 0x20, 0xF3, 0xAC, 0xD3, 0x11,
        0xD1, 0x8C, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A,
        40, 0, 0, 0, 0, 0, 0, 0,
        1, 0, 1, 0, 0x44, 0xAC, 0, 0,
        0x88, 0x58, 0x01, 0, 2, 0, 16, 0,
        0x64, 0x61, 0x74, 0x61, 0xF3, 0xAC, 0xD3, 0x11,
        0xD1, 0x8C, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A,
        40, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 1, 0, 4, 0, 9, 0,
        16, 0, 25, 0, 36, 0, 49, 0,
        0x6A, 0x75, 0x6E, 0x6B, 0xF3, 0xAC, 0xD3, 0x11,
        0xD1, 0x8C, 0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A,
        32, 0, 0, 0, 0, 0, 0, 0,
        0x62, 0x6C, 0x61, 0x68, 0x62, 0x6C, 0x61, 0x68,
    ])
    w1 = wav[:152]
    w2 = wav[:16] + bytes([152 + 32]) + wav[17:184]
    return [w1, w2]


def wacky_rf64s() -> list[bytes]:
    """generate_wackyrf64s (test_streams/main.c:919-965)."""
    wav = bytes([
        0x52, 0x46, 0x36, 0x34, 255, 255, 255, 255,
        0x57, 0x41, 0x56, 0x45, 0x64, 0x73, 0x36, 0x34,
        28, 0, 0, 0, 112, 0, 0, 0,
        0, 0, 0, 0, 16, 0, 0, 0,
        0, 0, 0, 0, 8, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0,
        0x6A, 0x75, 0x6E, 0x6B,
        4, 0, 0, 0, 0x62, 0x6C, 0x61, 0x68,
        0x70, 0x61, 0x64, 0x20, 4, 0, 0, 0,
        0x42, 0x4C, 0x41, 0x48, 0x66, 0x6D, 0x74, 0x20,
        16, 0, 0, 0, 1, 0, 1, 0,
        0x44, 0xAC, 0, 0, 0x88, 0x58, 0x01, 0,
        2, 0, 16, 0, 0x64, 0x61, 0x74, 0x61,
        255, 255, 255, 255, 0, 0, 1, 0,
        4, 0, 9, 0, 16, 0, 25, 0,
        36, 0, 49, 0, 0x70, 0x61, 0x64, 0x20,
        4, 0, 0, 0, 0x62, 0x6C, 0x61, 0x68,
    ])
    w1 = wav[:120]
    w2 = wav[:20] + bytes([112 + 12]) + wav[21:132]
    return [w1, w2]


# -- synthetic chunk-rich fixtures (exercise every splice position) ----------

def chunky_wav(pcm: np.ndarray) -> bytes:
    body = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, pcm.shape[1], 44100,
                      44100 * pcm.shape[1] * 2, pcm.shape[1] * 2, 16)
    chunks = [(b"LIST", b"INFOIART" + struct.pack("<I", 6) + b"someon"),
              (b"fmt ", fmt),
              (b"smpl", struct.pack("<9I", 0, 0, 22675, 60, 0, 0, 0, 0, 0)),
              (b"data", body),
              (b"odd ", b"x" * 7)]
    payload = b"WAVE"
    for cid, cbody in chunks:
        payload += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            payload += b"\x00"
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def chunky_aiff(pcm: np.ndarray) -> bytes:
    comm = struct.pack(">hIh", pcm.shape[1], len(pcm), 16) + \
        b"\x40\x0E" + struct.pack(">Q", 44100 << 48)
    ssnd = struct.pack(">II", 0, 0) + pcm.astype(">i2").tobytes()
    chunks = [(b"NAME", b"test tone"), (b"COMM", comm),
              (b"ANNO", b"an annotation"), (b"SSND", ssnd),
              (b"AUTH", b"nobody!")]
    payload = b"AIFF"
    for cid, cbody in chunks:
        payload += cid + struct.pack(">I", len(cbody)) + cbody
        if len(cbody) & 1:
            payload += b"\x00"
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def chunky_w64(pcm: np.ndarray) -> bytes:
    def guid(fourcc):
        return fourcc + b"\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"

    def chunk(g, cbody):
        size = 24 + len(cbody)
        return g + struct.pack("<Q", size) + cbody + b"\x00" * ((-size) % 8)

    riff = b"\x72\x69\x66\x66\x2E\x91\xCF\x11\xD6\xA5\x28\xDB\x04\xC1\x00\x00"
    wave = b"\x77\x61\x76\x65\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"
    fmt = struct.pack("<HHIIHH", 1, pcm.shape[1], 44100,
                      44100 * pcm.shape[1] * 2, pcm.shape[1] * 2, 16)
    payload = chunk(guid(b"levl"), b"L" * 11) + chunk(guid(b"fmt "), fmt) + \
        chunk(guid(b"bext"), b"B" * 13) + \
        chunk(guid(b"data"), pcm.astype("<i2").tobytes()) + \
        chunk(guid(b"afsp"), b"A" * 5)
    return riff + struct.pack("<Q", 40 + len(payload)) + wave + payload


def _pcm(n=4409, ch=2, seed=7):
    return make_signal(n, ch, 16, seed=seed, kind="quiet")


# -- unit: scanners ------------------------------------------------------------

class TestScanners:
    def test_wave_chunk_map(self):
        fm = scan_wave(chunky_wav(_pcm()))
        assert fm.app_id == b"riff" and not fm.is_rf64
        assert fm.format_block == 2 and fm.audio_block == 4
        assert fm.blocks[0][:4] == b"RIFF"
        assert fm.blocks[4] == fm.blocks[4][:8]  # data stored header-only
        assert fm.blocks[5][:4] == b"odd " and len(fm.blocks[5]) == 8 + 8

    def test_aiff_ssnd_header_only(self):
        fm = scan_aiff(chunky_aiff(_pcm()))
        assert fm.format_block == 2 and fm.audio_block == 4
        # SSND stored as header + offset/blockSize words only
        assert len(fm.blocks[4]) == 8 + 8

    def test_w64_data_header_only(self):
        fm = scan_wave64(chunky_w64(_pcm()))
        assert fm.format_block == 2 and fm.audio_block == 4
        assert len(fm.blocks[4]) == 24

    def test_wacky_fixtures_scan(self):
        for data in wacky_wavs():
            scan_wave(data)
        for data in wacky_w64s():
            scan_wave64(data)
        for data in wacky_rf64s():
            fm = scan_wave(data)
            assert fm.is_rf64

    def test_roundtrip_through_application_blocks(self):
        fm = scan_wave(chunky_wav(_pcm()))
        fm2 = from_application_blocks(list(fm.blocks), "wav")
        assert fm2.blocks == fm.blocks
        assert (fm2.format_block, fm2.audio_block) == (fm.format_block,
                                                       fm.audio_block)

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            scan_wave(chunky_wav(_pcm())[:-3])


# -- CLI round trips (test_flac.sh rt_test_* --keep-foreign-metadata) --------

def _rt(tmp_path, name, data, decode_flag):
    src = tmp_path / name
    src.write_bytes(data)
    fl = tmp_path / (name + ".flac")
    assert run_flac("-f", "--keep-foreign-metadata", "-3",
                    "-o", str(fl), str(src)) == 0
    out = tmp_path / ("rt_" + name)
    args = ["-d", "-f", "--keep-foreign-metadata"]
    if decode_flag:
        args.append(decode_flag)
    assert run_flac(*args, "-o", str(out), str(fl)) == 0
    assert out.read_bytes() == data
    return fl


class TestRoundTrips:
    @pytest.mark.parametrize("i", [0, 1])
    def test_wacky_wav(self, tmp_path, i):
        _rt(tmp_path, f"wacky{i}.wav", wacky_wavs()[i], "")

    @pytest.mark.parametrize("i", [0, 1])
    def test_wacky_w64(self, tmp_path, i):
        _rt(tmp_path, f"wacky{i}.w64", wacky_w64s()[i], "--force-wave64-format")

    @pytest.mark.parametrize("i", [0, 1])
    def test_wacky_rf64(self, tmp_path, i):
        _rt(tmp_path, f"wacky{i}.rf64", wacky_rf64s()[i], "--force-rf64-format")

    def test_chunky_wav(self, tmp_path):
        _rt(tmp_path, "c.wav", chunky_wav(_pcm()), "")

    def test_chunky_aiff(self, tmp_path):
        _rt(tmp_path, "c.aiff", chunky_aiff(_pcm()), "--force-aiff-format")

    def test_chunky_w64(self, tmp_path):
        _rt(tmp_path, "c.w64", chunky_w64(_pcm()), "--force-wave64-format")

    def test_stdout_gated(self, tmp_path, capsys):
        src = tmp_path / "c.wav"
        src.write_bytes(chunky_wav(_pcm()))
        assert run_flac("-f", "--keep-foreign-metadata", "-c", str(src)) != 0


# -- cross-implementation interop with the reference binary ------------------

class TestOracleInterop:
    @pytest.mark.parametrize("kind,gen,flag", [
        ("wav", chunky_wav, ""),
        ("aiff", chunky_aiff, "--force-aiff-format"),
        ("w64", chunky_w64, "--force-wave64-format"),
    ])
    def test_cross(self, tmp_path, kind, gen, flag):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference flac oracle not available")
        data = gen(_pcm())
        src = tmp_path / ("x." + kind)
        src.write_bytes(data)
        ours = tmp_path / "ours.flac"
        assert run_flac("-f", "--keep-foreign-metadata", "-3",
                        "-o", str(ours), str(src)) == 0
        theirs = tmp_path / "theirs.flac"
        r = subprocess.run([str(oracle), "-f", "-s", "--keep-foreign-metadata",
                            "-3", "-o", str(theirs), str(src)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        # our .flac restored by the reference binary
        out1 = tmp_path / ("ref_restore." + kind)
        args = [str(oracle), "-d", "-f", "-s", "--keep-foreign-metadata"]
        if flag:
            args.append(flag)
        r = subprocess.run(args + ["-o", str(out1), str(ours)],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        assert out1.read_bytes() == data
        # the reference's .flac restored by us
        out2 = tmp_path / ("our_restore." + kind)
        args = ["-d", "-f", "--keep-foreign-metadata"]
        if flag:
            args.append(flag)
        assert run_flac(*args, "-o", str(out2), str(theirs)) == 0
        assert out2.read_bytes() == data


# -- WAVEFORMATEXTENSIBLE channel masks ---------------------------------------

def extensible_wav(pcm: np.ndarray, mask: int, bits=16) -> bytes:
    ch = pcm.shape[1]
    fmt = struct.pack("<HHIIHH", 0xFFFE, ch, 44100, 44100 * ch * 2, ch * 2,
                      bits) + struct.pack("<HHI", 22, bits, mask) + \
        b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    body = pcm.astype("<i2").tobytes()
    payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


class TestChannelMask:
    def test_mask_tag_and_restore(self, tmp_path):
        """A 4-channel extensible WAV round-trips its speaker mask through a
        WAVEFORMATEXTENSIBLE_CHANNEL_MASK tag (utils.c:279-297,
        decode.c:1359) and the restored fmt chunk is extensible."""
        pcm = _pcm(ch=4, n=2111)
        mask = 0x0033  # quad: FL FR BL BR
        src = tmp_path / "q.wav"
        src.write_bytes(extensible_wav(pcm, mask))
        fl = tmp_path / "q.flac"
        assert run_flac("-f", "-3", "-o", str(fl), str(src)) == 0
        from flac_tpu.metadata import VorbisComment, parse_metadata
        blocks, _ = parse_metadata(fl.read_bytes(), 4)
        tags = [c for b in blocks if isinstance(b, VorbisComment)
                for c in b.comments]
        assert "WAVEFORMATEXTENSIBLE_CHANNEL_MASK=0x0033" in tags
        back = tmp_path / "back.wav"
        assert run_flac("-d", "-f", "-o", str(back), str(fl)) == 0
        assert back.read_bytes() == src.read_bytes()

    def test_cross_oracle_mask(self, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference flac oracle not available")
        pcm = _pcm(ch=6, n=1733)
        mask = 0x060F  # 5.1: FL FR FC LFE SL SR
        src = tmp_path / "s.wav"
        src.write_bytes(extensible_wav(pcm, mask))
        theirs = tmp_path / "theirs.flac"
        r = subprocess.run([str(oracle), "-f", "-s", "-3", "-o", str(theirs),
                            str(src)], capture_output=True)
        assert r.returncode == 0, r.stderr
        ref_out = tmp_path / "ref.wav"
        r = subprocess.run([str(oracle), "-d", "-f", "-s", "-o", str(ref_out),
                            str(theirs)], capture_output=True)
        assert r.returncode == 0, r.stderr
        our_out = tmp_path / "our.wav"
        assert run_flac("-d", "-f", "-o", str(our_out), str(theirs)) == 0
        assert our_out.read_bytes() == ref_out.read_bytes()

    def test_bad_mask_rejected(self, tmp_path):
        """Encode rejects a mask whose popcount doesn't match the channel
        count (flac__utils_get_channel_mask: encode.c channel-map check)."""
        pcm = _pcm(ch=4, n=1024)
        src = tmp_path / "b.wav"
        src.write_bytes(extensible_wav(pcm, 0x0007))  # 3 bits for 4 channels
        assert run_flac("-f", "-1", "-o", str(tmp_path / "b.flac"),
                        str(src)) != 0
        # --channel-map=none bypasses the check (main.c option table)
        assert run_flac("-f", "-1", "--channel-map=none",
                        "-o", str(tmp_path / "b.flac"), str(src)) == 0
