"""Unit tests for CRC, bit I/O, UTF-8 coding, MD5 contract, WAV container,
and metadata block round trips."""

import numpy as np
import pytest

from flac_tpu import crc
from flac_tpu.bitio import BitReader, BitWriter, utf8_decode, utf8_encode, utf8_encoded_len
from flac_tpu.containers.wav import AudioBuffer, parse_wav, wav_bytes
from flac_tpu.md5 import md5_of_pcm, pack_samples
from flac_tpu.metadata import (
    Application,
    CueSheet,
    CueSheetIndex,
    CueSheetTrack,
    Padding,
    Picture,
    SeekPoint,
    SeekTable,
    StreamInfo,
    VorbisComment,
    parse_metadata,
    serialize_metadata,
)

from tests.conftest import make_signal


class TestCRC:
    def test_crc8_known_vector(self):
        # CRC-8/ATM of "123456789" is 0xF4 (standard check value for poly 0x07 init 0)
        assert crc.crc8(b"123456789") == 0xF4

    def test_crc16_known_vector(self):
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check value is 0xFEE8
        assert crc.crc16(b"123456789") == 0xFEE8

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(0)
        rows = rng.integers(0, 256, size=(8, 64), dtype=np.int64).astype(np.uint8)
        lengths = rng.integers(0, 65, size=8)
        b16 = crc.crc16_batch(rows, lengths)
        b8 = crc.crc8_batch(rows, lengths)
        for i in range(8):
            assert b16[i] == crc.crc16(rows[i, : lengths[i]].tobytes())
            assert b8[i] == crc.crc8(rows[i, : lengths[i]].tobytes())

    def test_xpow_table_linearity(self):
        # CRC16(M) == XOR of x^(dist+16) mod G over set bits of M
        msg = b"\x80\x01\xff\x12"
        tab = crc.x_pow_mod_table(8 * len(msg) + 16, crc.CRC16_POLY, 16)
        acc = 0
        bits = np.unpackbits(np.frombuffer(msg, dtype=np.uint8))
        L = len(bits)
        for i, b in enumerate(bits):
            if b:
                acc ^= int(tab[(L - 1 - i) + 16])
        assert acc == crc.crc16(msg)


class TestBitIO:
    def test_writer_reader_roundtrip(self):
        rng = np.random.default_rng(1)
        fields = []
        w = BitWriter()
        for _ in range(500):
            n = int(rng.integers(1, 33))
            v = int(rng.integers(0, 1 << n))
            fields.append((v, n))
            w.write_bits(v, n)
        w.zero_pad_to_byte()
        r = BitReader(w.getvalue())
        for v, n in fields:
            assert r.read_bits(n) == v

    def test_signed(self):
        w = BitWriter()
        vals = [-1, -32768, 32767, 0, -5, 5]
        for v in vals:
            w.write_signed_bits(v, 16)
        w.zero_pad_to_byte()
        r = BitReader(w.getvalue())
        for v in vals:
            assert r.read_signed_bits(16) == v

    def test_unary(self):
        w = BitWriter()
        vals = [0, 1, 7, 8, 31, 64, 100]
        for v in vals:
            w.write_unary(v)
        w.zero_pad_to_byte()
        r = BitReader(w.getvalue())
        for v in vals:
            assert r.read_unary() == v

    def test_rice_roundtrip(self):
        rng = np.random.default_rng(2)
        for k in [0, 1, 4, 14]:
            w = BitWriter()
            vals = [int(v) for v in rng.integers(-(1 << 12), 1 << 12, size=200)]
            for v in vals:
                w.write_rice_signed(v, k)
            w.zero_pad_to_byte()
            r = BitReader(w.getvalue())
            for v in vals:
                assert r.read_rice_signed(k) == v

    def test_utf8_roundtrip(self):
        for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
                  0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF, 0x80000000, (1 << 36) - 1]:
            enc = utf8_encode(v, wide=True)
            assert len(enc) == utf8_encoded_len(v)
            r = BitReader(enc)
            assert utf8_decode(r) == v


class TestMD5:
    def test_pack_16bit(self):
        sig = np.array([[1, -1], [258, -258]], dtype=np.int32)
        assert pack_samples(sig, 16) == b"\x01\x00\xff\xff\x02\x01\xfe\xfe"

    def test_pack_24bit(self):
        sig = np.array([[0x123456], [-2]], dtype=np.int32)
        assert pack_samples(sig, 24) == b"\x56\x34\x12\xfe\xff\xff"

    def test_md5_deterministic(self):
        sig = make_signal(1000, 2, 16)
        assert md5_of_pcm(sig, 16) == md5_of_pcm(sig.copy(), 16)


class TestWav:
    @pytest.mark.parametrize("bits,channels", [(8, 1), (16, 2), (24, 2), (32, 1)])
    def test_roundtrip(self, bits, channels):
        sig = make_signal(1000, channels, bits, kind="noise")
        buf = AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=bits)
        parsed = parse_wav(wav_bytes(buf))
        assert parsed.sample_rate == 44100
        assert parsed.bits_per_sample == bits
        np.testing.assert_array_equal(parsed.samples, sig)

    def test_oracle_reads_our_wav(self, oracle, tmp_path):
        import subprocess
        sig = make_signal(4096, 2, 16)
        buf = AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16)
        wav_path = tmp_path / "t.wav"
        wav_path.write_bytes(wav_bytes(buf))
        r = subprocess.run([str(oracle), "-s", "-f", "-o", str(tmp_path / "t.flac"), str(wav_path)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr


class TestMetadata:
    def test_streaminfo_roundtrip(self):
        si = StreamInfo(min_blocksize=4096, max_blocksize=4096, min_framesize=14,
                        max_framesize=9999, sample_rate=44100, channels=2,
                        bits_per_sample=16, total_samples=123456789,
                        md5sum=bytes(range(16)))
        blocks, off = parse_metadata(b"fLaC" + serialize_metadata([si]))
        si2 = blocks[0]
        assert isinstance(si2, StreamInfo)
        for f in ("min_blocksize", "max_blocksize", "min_framesize", "max_framesize",
                  "sample_rate", "channels", "bits_per_sample", "total_samples", "md5sum"):
            assert getattr(si2, f) == getattr(si, f)

    def test_all_block_types_roundtrip(self):
        blocks = [
            StreamInfo(min_blocksize=4096, max_blocksize=4096, sample_rate=44100,
                       channels=2, bits_per_sample=16),
            Application(app_id=b"riff", data=b"hello"),
            SeekTable(points=[SeekPoint(0, 0, 4096), SeekPoint(4096, 1000, 4096),
                              SeekPoint(SeekPoint.PLACEHOLDER, 0, 0)]),
            VorbisComment(vendor_string="flac_tpu", comments=["TITLE=x", "ARTIST=y"]),
            CueSheet(media_catalog_number=b"123", lead_in=88200, is_cd=True,
                     tracks=[CueSheetTrack(offset=0, number=1, isrc=b"USRC17607839",
                                           indices=[CueSheetIndex(0, 1)]),
                             CueSheetTrack(offset=0, number=170)]),
            Picture(picture_type=3, mime_type="image/png", description="front",
                    width=32, height=32, depth=24, data=b"\x89PNG fake"),
            Padding(length=100),
        ]
        parsed, off = parse_metadata(b"fLaC" + serialize_metadata(blocks))
        assert len(parsed) == len(blocks)
        assert off == 4 + len(serialize_metadata(blocks))
        assert parsed[1].app_id == b"riff" and parsed[1].data == b"hello"
        assert parsed[2].points[2].is_placeholder and parsed[2].is_legal()
        assert parsed[3].find_entry("title") == "x"
        assert parsed[4].tracks[0].isrc == b"USRC17607839"
        assert parsed[4].is_cd and parsed[4].lead_in == 88200
        assert parsed[5].mime_type == "image/png" and parsed[5].data == b"\x89PNG fake"
        assert parsed[6].length == 100
        assert parsed[6].is_last
