"""OO callback API tests — the analog of the libFLAC++ decoder/encoder tests
(src/test_libFLAC++): callback delivery order, metadata respond/ignore
filtering, abort from the write callback, seek + process_single, MD5 verdict,
error callback on corruption, encoder progress callback."""

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu import constants as C
from flac_tpu.api import Decoder, DecoderState, Encoder
from flac_tpu.encode.encoder import encode_file
from flac_tpu.metadata import Padding, VorbisComment


SIG = make_signal(4096 * 2 + 500, 2, 16, kind="quiet", seed=44)


@pytest.fixture(scope="module")
def flac_data(tmp_path_factory):
    p = tmp_path_factory.mktemp("api") / "a.flac"
    encode_file(SIG, 44100, 16, str(p), level=2, batch_frames=8,
                metadata=[VorbisComment(vendor_string="v", comments=["T=1"]),
                          Padding(length=64)])
    return p.read_bytes()


class TestDecoder:
    def test_full_stream_with_callbacks(self, flac_data):
        got = []
        metas = []
        dec = Decoder(flac_data,
                      write_callback=lambda pcm, fr: got.append(pcm),
                      metadata_callback=lambda b: metas.append(b))
        assert dec.process_until_end_of_stream()
        assert dec.state is DecoderState.END_OF_STREAM
        np.testing.assert_array_equal(
            np.concatenate(got)[: len(SIG)], SIG)
        # default respond set: STREAMINFO only (stream_decoder.h defaults)
        assert [b.type_code for b in metas] == [C.METADATA_TYPE_STREAMINFO]
        assert dec.md5_ok is True

    def test_metadata_respond_filtering(self, flac_data):
        metas = []
        dec = Decoder(flac_data, metadata_callback=lambda b: metas.append(b))
        dec.set_metadata_respond_all()
        dec.set_metadata_ignore(C.METADATA_TYPE_PADDING)
        dec.process_until_end_of_metadata()
        codes = [b.type_code for b in metas]
        assert C.METADATA_TYPE_VORBIS_COMMENT in codes
        assert C.METADATA_TYPE_PADDING not in codes

    def test_process_single_stepping(self, flac_data):
        frames = []
        dec = Decoder(flac_data, write_callback=lambda pcm, fr: frames.append(fr))
        dec.process_until_end_of_metadata()
        assert dec.process_single()
        assert len(frames) == 1 and frames[0].blocksize == 1152  # level-2 default
        assert dec.state is DecoderState.READ_FRAME

    def test_abort_from_write_callback(self, flac_data):
        dec = Decoder(flac_data, write_callback=lambda pcm, fr: False)
        assert not dec.process_until_end_of_stream()
        assert dec.state is DecoderState.ABORTED

    def test_seek_then_single(self, flac_data):
        got = []
        dec = Decoder(flac_data, write_callback=lambda pcm, fr: got.append((pcm, fr)))
        target = 4096 + 123
        assert dec.seek_absolute(target)
        assert dec.process_single()
        pcm, fr = got[0]
        bs = 1152  # level-2 default blocksize
        assert fr.frame_number == target // bs
        np.testing.assert_array_equal(pcm, SIG[fr.frame_number * bs:(fr.frame_number + 1) * bs])
        assert not dec.seek_absolute(10 ** 9)

    def test_error_callback_and_resync(self, flac_data):
        data = bytearray(flac_data)
        # corrupt the first frame's payload
        from flac_tpu.decode.host_decoder import HostDecoder
        h = HostDecoder(bytes(flac_data), check_md5=False)
        data[h.audio_offset + 40] ^= 0xFF
        errors = []
        frames = []
        dec = Decoder(bytes(data),
                      write_callback=lambda pcm, fr: frames.append(fr),
                      error_callback=lambda s: errors.append(s))
        dec.process_until_end_of_stream()
        assert errors  # CRC mismatch reported
        assert any(fr.frame_number > 0 for fr in frames)  # resynced + continued


class TestEncoder:
    def test_progress_and_roundtrip(self, tmp_path):
        progress = []
        out = tmp_path / "e.flac"
        enc = Encoder(str(out), sample_rate=44100, bits_per_sample=16,
                      channels=2, compression_level=2,
                      total_samples_estimate=len(SIG),
                      progress_callback=lambda st: progress.append(
                          (st.frames, st.samples, st.bytes_written)))
        half = len(SIG) // 2
        enc.process(SIG[:half])
        enc.process(SIG[half:])
        si = enc.finish()
        assert len(progress) >= 3
        assert progress[-1][1] == len(SIG)
        assert si.total_samples == len(SIG)
        from flac_tpu.decode.host_decoder import decode_bytes
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, SIG)
