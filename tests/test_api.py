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


class TestOggTransport:
    """The OO layer over Ogg FLAC transport — the analog of the reference's
    decoder layer matrix (src/test_libFLAC++/decoders.cpp LAYER_* x {native,
    ogg}, stream_decoder.c:136 FLAC__stream_decoder_init_ogg_*)."""

    @pytest.fixture(scope="class")
    def ogg_data(self, flac_data):
        from flac_tpu.ogg import ogg_from_flac_stream
        return ogg_from_flac_stream(flac_data)

    def test_full_stream(self, ogg_data):
        got, metas = [], []
        dec = Decoder(ogg_data,
                      write_callback=lambda pcm, fr: got.append(pcm),
                      metadata_callback=lambda b: metas.append(b))
        assert dec.is_ogg
        assert dec.process_until_end_of_stream()
        np.testing.assert_array_equal(np.concatenate(got)[: len(SIG)], SIG)
        assert [b.type_code for b in metas] == [C.METADATA_TYPE_STREAMINFO]
        assert dec.md5_ok is True

    def test_metadata_filtering_over_ogg(self, ogg_data):
        metas = []
        dec = Decoder(ogg_data, metadata_callback=lambda b: metas.append(b))
        dec.set_metadata_respond_all()
        dec.process_until_end_of_metadata()
        codes = [b.type_code for b in metas]
        assert C.METADATA_TYPE_VORBIS_COMMENT in codes

    def test_seek_over_ogg(self, ogg_data):
        got = []
        dec = Decoder(ogg_data, write_callback=lambda pcm, fr: got.append((pcm, fr)))
        target = 1152 * 3 + 99
        assert dec.seek_absolute(target)
        assert dec.process_single()
        pcm, fr = got[0]
        assert fr.frame_number == target // 1152
        np.testing.assert_array_equal(
            pcm, SIG[fr.frame_number * 1152:(fr.frame_number + 1) * 1152])


class TestApplicationIDFiltering:
    """set_metadata_respond_application / ignore_application
    (stream_decoder.h:826,846): the id list toggles the type-level decision
    (stream_decoder.c:1479-1481), and each setter is a no-op when the
    type-level filter already agrees (stream_decoder.c:778-779,837-838)."""

    @pytest.fixture(scope="class")
    def app_flac(self, tmp_path_factory):
        from flac_tpu.metadata import Application
        p = tmp_path_factory.mktemp("app") / "a.flac"
        encode_file(SIG[:5000], 44100, 16, str(p), level=1, batch_frames=8,
                    metadata=[Application(app_id=b"abcd", data=b"one"),
                              Application(app_id=b"wxyz", data=b"two")])
        return p.read_bytes()

    @staticmethod
    def _app_ids_delivered(data, setup):
        metas = []
        dec = Decoder(data, metadata_callback=lambda b: metas.append(b))
        setup(dec)
        dec.process_until_end_of_metadata()
        return [b.app_id for b in metas
                if b.type_code == C.METADATA_TYPE_APPLICATION]

    def test_respond_application_one_id(self, app_flac):
        ids = self._app_ids_delivered(
            app_flac, lambda d: d.set_metadata_respond_application(b"abcd"))
        assert ids == [b"abcd"]

    def test_ignore_application_one_id(self, app_flac):
        def setup(d):
            d.set_metadata_respond_all()
            d.set_metadata_ignore_application(b"wxyz")
        assert self._app_ids_delivered(app_flac, setup) == [b"abcd"]

    def test_respond_application_noop_when_type_responds(self, app_flac):
        def setup(d):
            d.set_metadata_respond(C.METADATA_TYPE_APPLICATION)
            d.set_metadata_respond_application(b"abcd")  # must NOT toggle to ignore
        assert self._app_ids_delivered(app_flac, setup) == [b"abcd", b"wxyz"]

    def test_ignore_application_noop_when_type_ignored(self, app_flac):
        def setup(d):
            d.set_metadata_ignore_application(b"abcd")  # type ignored -> no-op
        assert self._app_ids_delivered(app_flac, setup) == []

    def test_type_level_setter_clears_id_list(self, app_flac):
        def setup(d):
            d.set_metadata_respond_application(b"abcd")
            d.set_metadata_ignore(C.METADATA_TYPE_APPLICATION)  # clears ids
        assert self._app_ids_delivered(app_flac, setup) == []
