"""Ogg FLAC tests: page CRC, packet assembly across continued pages, mapping
round trip, CLI --ogg mode. (The locally-built oracle has no libogg, so
coverage is self-consistent round trips plus spec-derived vectors.)"""

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.containers import AudioBuffer, write_wav
from flac_tpu.ogg import (
    OggError,
    build_page,
    decode_ogg_flac,
    encode_ogg_flac,
    extract_packets,
    flac_stream_from_ogg,
    ogg_crc,
    ogg_from_flac_stream,
    parse_pages,
)


class TestPageLayer:
    def test_crc_known_vector(self):
        # Ogg CRC of "OggS" with the spec polynomial/reflection conventions:
        # independently computed with a bitwise non-reflected CRC-32/MPEG-style
        # routine (init 0, xorout 0)
        def bitwise(data):
            crc = 0
            for byte in data:
                crc ^= byte << 24
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                           else crc << 1) & 0xFFFFFFFF
            return crc
        for v in (b"OggS", b"", b"\x00", bytes(range(256))):
            assert ogg_crc(v) == bitwise(v)

    def test_page_roundtrip(self):
        page = build_page(7, 0, 1234, [b"hello", b"world" * 100], bos=True)
        [(htype, granule, serial, seqno, segs)] = list(parse_pages(page))
        assert htype == 2 and granule == 1234 and serial == 7 and seqno == 0
        packets = extract_packets(page)
        assert packets == [b"hello", b"world" * 100]

    def test_corrupt_page_crc_detected(self):
        page = bytearray(build_page(7, 0, 0, [b"data"]))
        page[-1] ^= 1
        with pytest.raises(OggError):
            list(parse_pages(bytes(page)))

    def test_large_packet_spans_pages(self):
        big = bytes(np.random.default_rng(0).integers(0, 256, 200_000, np.uint8))
        from flac_tpu.ogg import _paginate_packet
        pages, _ = _paginate_packet(big, 3, 0, 42)
        assert len(pages) > 1
        stream = b"".join(pages)
        infos = list(parse_pages(stream))
        assert infos[0][0] & 1 == 0 and all(h[0] & 1 for h in infos[1:])
        assert infos[-1][1] == 42  # granule on final page
        assert infos[0][1] == (1 << 64) - 1  # -1 on continuation-start pages
        assert extract_packets(stream) == [big]


class TestMapping:
    def _sig(self, n=4096 * 2 + 333):
        return make_signal(n, 2, 16, kind="quiet", seed=17)

    def test_roundtrip(self):
        sig = self._sig()
        ogg = encode_ogg_flac(sig, 44100, 16, level=5)
        assert ogg[:4] == b"OggS"
        pcm, si, blocks = decode_ogg_flac(ogg)
        np.testing.assert_array_equal(pcm, sig)
        assert si.sample_rate == 44100

    def test_metadata_carried(self):
        from flac_tpu.metadata import Padding, VorbisComment
        sig = self._sig(2000)
        ogg = encode_ogg_flac(sig, 44100, 16, level=1,
                              metadata=[VorbisComment(vendor_string="v",
                                                      comments=["T=x"]),
                                        Padding(length=64)])
        pcm, si, blocks = decode_ogg_flac(ogg)
        np.testing.assert_array_equal(pcm, sig)
        vc = next(b for b in blocks if isinstance(b, VorbisComment))
        assert "T=x" in vc.comments

    def test_wrap_unwrap_identity(self, tmp_path):
        """ogg(flac) then unwrap must reproduce the exact native stream."""
        from flac_tpu.encode.encoder import encode_file
        sig = self._sig()
        p = tmp_path / "x.flac"
        encode_file(sig, 44100, 16, str(p), level=3)
        native = p.read_bytes()
        round_tripped = flac_stream_from_ogg(ogg_from_flac_stream(native))
        assert round_tripped == native

    def test_mapping_header_fields(self):
        sig = self._sig(1000)
        ogg = encode_ogg_flac(sig, 44100, 16, level=0)
        packets = extract_packets(ogg)
        p0 = packets[0]
        assert p0[0] == 0x7F and p0[1:5] == b"FLAC"
        assert p0[5] == 1 and p0[6] == 0  # mapping version 1.0
        nheaders = int.from_bytes(p0[7:9], "big")
        assert nheaders == len(packets) - sum(
            1 for p in packets if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xFE) == 0xF8)
        assert p0[9:13] == b"fLaC"

    def test_granule_positions(self):
        sig = self._sig(4096 + 100)
        ogg = encode_ogg_flac(sig, 44100, 16, level=0, blocksize=4096)
        granules = [g for h, g, s, q, segs in parse_pages(ogg)
                    if g not in (0, (1 << 64) - 1)]
        assert granules[-1] == 4096 + 100
        assert granules[0] == 4096

    def test_granules_variable_blocksize_rewrap(self):
        """ogg_from_flac_stream on a foreign variable-blocksize stream must
        emit cumulative-sample granules from each frame's own header, not
        (k+1)*min_blocksize (ogg_encoder_aspect.c:194)."""
        flac, blocksizes, pcm = _make_variable_blocksize_flac([64, 160, 96, 23])
        # sanity: our host decoder accepts the hand-built stream
        from flac_tpu.decode.host_decoder import decode_bytes
        out, si, _infos = decode_bytes(flac, check_md5=False)
        np.testing.assert_array_equal(out[:, 0], pcm)
        ogg = ogg_from_flac_stream(flac)
        granules = [g for h, g, s, q, segs in parse_pages(ogg)
                    if g not in (0, (1 << 64) - 1)]
        assert granules == list(np.cumsum(blocksizes))
        # and the rewrapped stream still unwraps to the identical bytes
        assert flac_stream_from_ogg(ogg) == flac


def _make_variable_blocksize_flac(blocksizes):
    """Hand-assemble a spec-valid variable-blocksize FLAC stream (mono, 8-bit,
    8 kHz, verbatim subframes) — neither our encoder nor the reference's
    normally emits blocking_strategy=1, so build it from the format spec
    (frame header layout: stream_decoder.c read_frame_header_)."""
    from flac_tpu.bitio import BitWriter
    from flac_tpu.crc import crc8, crc16
    from flac_tpu.metadata import StreamInfo, serialize_block

    rng = np.random.default_rng(3)
    total = int(sum(blocksizes))
    pcm = rng.integers(-128, 128, total, np.int64)
    si = StreamInfo(min_blocksize=min(blocksizes), max_blocksize=max(blocksizes),
                    sample_rate=8000, channels=1, bits_per_sample=8,
                    total_samples=total)
    out = bytearray(b"fLaC" + serialize_block(si, is_last=True))
    sample_no = 0
    for bs in blocksizes:
        w = BitWriter()
        w.write_bits(0b11111111111110, 14)  # sync
        w.write_bits(0, 1)                  # reserved
        w.write_bits(1, 1)                  # blocking strategy: variable
        w.write_bits(0b0111, 4)             # blocksize: 16-bit at end of header
        w.write_bits(0b0100, 4)             # sample rate: 8 kHz
        w.write_bits(0, 4)                  # channel assignment: mono
        w.write_bits(0b001, 3)              # bps: 8
        w.write_bits(0, 1)                  # reserved
        w.write_utf8_u64(sample_no)         # sample number (variable streams)
        w.write_bits(bs - 1, 16)
        hdr = w.getvalue()
        w.write_bits(crc8(hdr), 8)
        w.write_bits(0, 1)                  # subframe: pad bit
        w.write_bits(0b000001, 6)           # verbatim
        w.write_bits(0, 1)                  # no wasted bits
        for v in pcm[sample_no:sample_no + bs]:
            w.write_signed_bits(int(v), 8)
        w.zero_pad_to_byte()
        body = w.getvalue()
        out += body + crc16(body).to_bytes(2, "big")
        sample_no += bs
    return bytes(out), blocksizes, pcm


class TestCLIOgg:
    def test_flac_cli_ogg(self, tmp_path):
        from flac_tpu.cli.flac import main
        sig = make_signal(4096 + 55, 2, 16, kind="sine", seed=4)
        wav = tmp_path / "o.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        oga = tmp_path / "o.oga"
        assert main(["--totally-silent", "--ogg", "-5", "-f",
                     "-o", str(oga), str(wav)]) == 0
        assert oga.read_bytes()[:4] == b"OggS"
        assert main(["--totally-silent", "-t", str(oga)]) == 0
        back = tmp_path / "b.wav"
        assert main(["--totally-silent", "-d", "-f", "-o", str(back), str(oga)]) == 0
        from flac_tpu.containers import read_wav
        np.testing.assert_array_equal(read_wav(str(back)).samples, sig)


class TestChainedAndMultiplexed:
    """Chain-link / multiplexed-serial edge parity (ogg_decoder_aspect.c):
    the decoder latches one FLAC bitstream, never reads past its EOS page,
    and (beyond reference) iter_chain_links exposes the later links."""

    def _one_oga(self, sig, serial):
        import io

        from flac_tpu.encode.encoder import encode_file
        from flac_tpu.ogg import ogg_from_flac_stream
        import tempfile, os

        fd, p = tempfile.mkstemp(suffix=".flac")
        os.close(fd)
        try:
            encode_file(sig, 44100, 16, p, level=1)
            return ogg_from_flac_stream(open(p, "rb").read(), serial=serial)
        finally:
            os.unlink(p)

    def test_chained_links(self):
        from flac_tpu.ogg import decode_ogg_flac, iter_chain_links

        sig1 = make_signal(4096 + 100, 2, 16, kind="quiet", seed=1)
        sig2 = make_signal(4096 + 33, 2, 16, kind="quiet", seed=2)
        chained = self._one_oga(sig1, 0x11) + self._one_oga(sig2, 0x22)
        links = list(iter_chain_links(chained))
        assert len(links) == 2 and links[0][1] == links[1][0]
        # reference parity: only the first link decodes by default
        pcm, _si, _blocks = decode_ogg_flac(chained)
        np.testing.assert_array_equal(pcm, sig1)
        # beyond-reference: all_links concatenates every FLAC link
        pcm_all, _si, _blocks = decode_ogg_flac(chained, all_links=True)
        np.testing.assert_array_equal(pcm_all, np.concatenate([sig1, sig2]))

    def test_chained_same_serial_stops_at_eos(self):
        """A second link REUSING the serial must not leak frames into the
        first link's stream (extract_packets stops at EOS)."""
        from flac_tpu.ogg import decode_ogg_flac

        sig1 = make_signal(4096 + 100, 2, 16, kind="quiet", seed=3)
        sig2 = make_signal(4096 + 33, 2, 16, kind="quiet", seed=4)
        chained = self._one_oga(sig1, 0x77) + self._one_oga(sig2, 0x77)
        pcm, _si, _blocks = decode_ogg_flac(chained)
        np.testing.assert_array_equal(pcm, sig1)

    def test_flac_stream_found_behind_foreign_bos(self):
        """Grouped/multiplexed file whose FIRST BOS is another codec: the
        FLAC-mapped bitstream is still found by the BOS scan."""
        from flac_tpu.ogg import _raw_page, decode_ogg_flac

        sig = make_signal(4096 + 10, 2, 16, kind="quiet", seed=5)
        oga = self._one_oga(sig, 0x99)
        fake_body = b"\x01vorbis" + b"\x00" * 20
        fake_bos = _raw_page(0x42, 0, 0, bytes([len(fake_body)]), fake_body,
                             bos=True, eos=False, continued=False)
        pcm, _si, _blocks = decode_ogg_flac(fake_bos + oga)
        np.testing.assert_array_equal(pcm, sig)
