"""Callback-fed (bounded-compressed-memory) streaming decode tests.

The reference decoder consumes bytes through a client read callback with a
refilled word buffer (bitreader.c:138-257, stream_decoder.c:1034-1160);
these tests pin the window-refill analog: a pipe fed in 64 KiB chunks
decodes byte-identically while the decoder never buffers more than its
compressed window.
"""

import io
import sys

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.decode.host_decoder import DecodeError, decode_bytes
from flac_tpu.decode.streaming import (ByteFeed, ChunkedStreamDecoder,
                                       decode_chunked)
from flac_tpu.encode.encoder import encode_file


class ChunkReader:
    """A pipe-like source: read(n) returns at most `chunk` bytes."""

    def __init__(self, data: bytes, chunk: int = 65536):
        self.data, self.pos, self.chunk = data, 0, chunk

    def read(self, n: int) -> bytes:
        n = min(n, self.chunk)
        out = self.data[self.pos: self.pos + n]
        self.pos += len(out)
        return out


@pytest.fixture(scope="module")
def flac_stream(tmp_path_factory):
    # big enough that the stream (~350 KB) exceeds the 256 KiB decode window
    sig = make_signal(4096 * 48 + 999, 2, 16, kind="quiet", seed=77)
    p = tmp_path_factory.mktemp("stream") / "s.flac"
    encode_file(sig, 44100, 16, str(p), level=5, batch_frames=8)
    return p.read_bytes(), sig


class TestChunkedDecoder:
    def test_64k_chunks_byte_identical_bounded_window(self, flac_stream):
        data, sig = flac_stream
        dec = ChunkedStreamDecoder(ChunkReader(data, chunk=65536),
                                   window_bytes=1 << 18, batch_frames=8)
        max_buffered = 0
        orig_ensure = dec.feed.ensure

        def spying_ensure(n):
            nonlocal max_buffered
            r = orig_ensure(n)
            max_buffered = max(max_buffered, len(dec.feed))
            return r

        dec.feed.ensure = spying_ensure
        pcm = np.concatenate(list(dec.iter_blocks()), axis=0)
        np.testing.assert_array_equal(pcm, sig)
        assert dec.decode_info["path"] == "chunked-device"
        # compressed-side memory stays at one window regardless of length
        assert max_buffered <= dec.window, (max_buffered, dec.window)
        assert dec.window < len(data), "window must be smaller than the stream"

    def test_tiny_dribble_reads(self, flac_stream):
        """A source that returns 1000-byte dribbles still assembles windows."""
        data, sig = flac_stream
        pcm, si, info = decode_chunked(ChunkReader(data, chunk=1000),
                                       window_bytes=1 << 17, batch_frames=4)
        np.testing.assert_array_equal(pcm, sig)
        assert si.total_samples == len(sig)

    def test_short_stream_host_path(self, tmp_path):
        """<2 indexable frames: the sequential host step owns the window."""
        sig = make_signal(4096 + 1234, 2, 16, kind="quiet", seed=5)
        p = tmp_path / "short.flac"
        encode_file(sig, 44100, 16, str(p), level=2)
        pcm, _si, info = decode_chunked(ChunkReader(p.read_bytes(), 4096))
        np.testing.assert_array_equal(pcm, sig)

    def test_md5_verdict_raises(self, flac_stream):
        data, _sig = flac_stream
        bad = bytearray(data)
        bad[len(bad) // 2] ^= 0x40  # flip a payload bit mid-stream
        with pytest.raises(DecodeError):
            for _ in ChunkedStreamDecoder(ChunkReader(bytes(bad)),
                                          window_bytes=1 << 18).iter_blocks():
                pass

    def test_next_frame_sequential_pull(self, flac_stream):
        data, sig = flac_stream
        dec = ChunkedStreamDecoder(ChunkReader(data), window_bytes=1 << 17)
        parts, offs = [], []
        while True:
            step = dec.next_frame()
            if step is None:
                break
            pcm, fi = step
            parts.append(pcm)
            offs.append(fi.offset)
        pcm = np.concatenate(parts, axis=0)[: len(sig)]
        np.testing.assert_array_equal(pcm, sig)
        assert offs == sorted(offs) and len(set(offs)) == len(offs)

    def test_bytefeed_eof_semantics(self):
        feed = ByteFeed(io.BytesIO(b"abcdef"))
        assert feed.ensure(4) == 4
        feed.consume(2)
        assert feed.base == 2
        assert feed.ensure(100) == 4  # rest of stream
        assert feed.eof


class TestAPIStreamingSource:
    def test_decoder_over_read_callable(self, flac_stream):
        from flac_tpu.api import Decoder

        data, sig = flac_stream
        reader = ChunkReader(data, chunk=32768)
        got = []
        dec = Decoder(reader.read,
                      write_callback=lambda pcm, fr: got.append(pcm))
        assert dec._chunked is not None, "callable source must stream"
        assert dec.process_until_end_of_stream()
        pcm = np.concatenate(got, axis=0)[: len(sig)]
        np.testing.assert_array_equal(pcm, sig)
        assert dec.md5_ok is True
        assert not dec.seek_absolute(100), "pipe source has no seek callback"

    def test_decoder_nonseekable_filelike(self, flac_stream):
        from flac_tpu.api import Decoder

        data, _sig = flac_stream

        class Pipe(ChunkReader):
            def seekable(self):
                return False

        dec = Decoder(Pipe(data))
        assert dec._chunked is not None
        assert dec.process_until_end_of_metadata()
        assert dec.streaminfo.channels == 2


class TestCLIPipe:
    def _pipe_stdin(self, monkeypatch, data: bytes, chunk: int = 65536):
        reader = ChunkReader(data, chunk=chunk)

        class FakeStdin:
            buffer = reader

        monkeypatch.setattr(sys, "stdin", FakeStdin)
        return reader

    def test_decode_from_stdin_pipe(self, tmp_path, monkeypatch, flac_stream):
        from flac_tpu.cli import flac as flac_cli
        from flac_tpu.containers import read_wav

        data, sig = flac_stream
        self._pipe_stdin(monkeypatch, data)
        out = tmp_path / "out.wav"
        rc = flac_cli.main(["--totally-silent", "-d", "-f",
                            "-o", str(out), "-"])
        assert rc == 0
        np.testing.assert_array_equal(read_wav(str(out)).samples, sig)

    def test_test_mode_from_stdin_pipe(self, monkeypatch, flac_stream):
        from flac_tpu.cli import flac as flac_cli

        data, _sig = flac_stream
        self._pipe_stdin(monkeypatch, data)
        assert flac_cli.main(["--totally-silent", "-t", "-"]) == 0

    def test_test_mode_stdin_detects_corruption(self, monkeypatch, flac_stream):
        from flac_tpu.cli import flac as flac_cli

        data, _sig = flac_stream
        bad = bytearray(data)
        bad[len(bad) // 2] ^= 0x40
        self._pipe_stdin(monkeypatch, bytes(bad))
        assert flac_cli.main(["--totally-silent", "-t", "-"]) != 0


class TestOggPipe:
    """Ogg FLAC pipes stream through OggToNativeReader + the chunked
    decoder — bounded on both sides (the reference's
    FLAC__stream_decoder_init_ogg_stream read path)."""

    def test_ogg_adapter_chunked_decode(self, flac_stream):
        from flac_tpu.ogg import OggToNativeReader, ogg_from_flac_stream

        data, sig = flac_stream
        oga = ogg_from_flac_stream(data, serial=0xBEEF)
        reader = ChunkReader(oga, chunk=50000)
        dec = ChunkedStreamDecoder(OggToNativeReader(reader.read),
                                   window_bytes=1 << 18, batch_frames=8)
        pcm = np.concatenate(list(dec.iter_blocks()), axis=0)
        np.testing.assert_array_equal(pcm, sig)
        assert dec.decode_info["path"] == "chunked-device"

    def test_cli_test_mode_ogg_stdin(self, monkeypatch, flac_stream):
        from flac_tpu.cli import flac as flac_cli
        from flac_tpu.ogg import ogg_from_flac_stream

        data, _sig = flac_stream
        oga = ogg_from_flac_stream(data, serial=7)
        reader = ChunkReader(oga, chunk=65536)

        class FakeStdin:
            buffer = reader

        monkeypatch.setattr(sys, "stdin", FakeStdin)
        assert flac_cli.main(["--totally-silent", "-t", "-"]) == 0

    def test_api_decoder_ogg_pipe(self, flac_stream):
        from flac_tpu.api import Decoder
        from flac_tpu.ogg import ogg_from_flac_stream

        data, sig = flac_stream
        oga = ogg_from_flac_stream(data, serial=9)
        got = []
        dec = Decoder(ChunkReader(oga).read,
                      write_callback=lambda pcm, fr: got.append(pcm))
        assert dec.is_ogg and dec._chunked is not None
        assert dec.process_until_end_of_stream()
        np.testing.assert_array_equal(
            np.concatenate(got, axis=0)[: len(sig)], sig)
        assert dec.md5_ok is True
