"""Object-oriented, callback-inverted codec API.

The analog of the libFLAC++ wrapper classes (include/FLAC++/decoder.h:99,222,
encoder.h:101,232) and of the C engines' callback-driven shape
(stream_decoder.h:742-1551): a `Decoder` you subclass (or hand callables to)
with `write_callback` / `metadata_callback` / `error_callback`, metadata
respond/ignore filtering (stream_decoder.h:811-879), `process_single` /
`process_until_end_of_metadata` / `process_until_end_of_stream`, a decoder
state machine, and `seek_absolute`; plus an `Encoder` with a progress
callback (FLAC__StreamEncoderProgressCallback, stream_encoder.h:677).

Batch-oriented code should prefer the functional entry points
(`flac_tpu.encode.encoder.encode_file`, `flac_tpu.decode.stream`); this
facade exists for drop-in ports of reference-API client code.
"""

from __future__ import annotations

import enum

import numpy as np

from flac_tpu import constants as C
from flac_tpu.decode import host_decoder as hd
from flac_tpu.decode.seek import SeekableDecoder, SeekError
from flac_tpu.metadata import MetadataBlock


class DecoderState(enum.Enum):
    SEARCH_FOR_METADATA = 0
    READ_METADATA = 1
    SEARCH_FOR_FRAME_SYNC = 2
    READ_FRAME = 3
    END_OF_STREAM = 4
    ABORTED = 6


class Decoder:
    """Callback-inverted streaming decoder over a file path, byte buffer, or
    readable object. Subclass and override the callbacks, or pass them as
    constructor arguments."""

    def __init__(self, source, write_callback=None, metadata_callback=None,
                 error_callback=None, md5_checking: bool = True) -> None:
        # read-callback / pipe sources stream through a bounded compressed
        # window (the reference's client-read-callback decode model,
        # stream_decoder.h:433-470 + bitreader.c:138-257) instead of
        # slurping; seeking is unavailable on them, like a reference
        # decoder whose seek callback is NULL
        self._chunked = None
        if callable(source) or (hasattr(source, "read")
                                and not self._is_seekable(source)):
            from flac_tpu.decode.streaming import ByteFeed, ChunkedStreamDecoder
            feed = ByteFeed(source)
            feed.ensure(4)
            src = feed
            if bytes(feed.view()[:4]) == b"OggS":
                # Ogg pipe: incremental page demux, still bounded
                from flac_tpu.ogg import OggToNativeReader
                src = OggToNativeReader(feed.read)
            self._chunked = ChunkedStreamDecoder(src, check_md5=False)
            self._init_common(write_callback, metadata_callback,
                              error_callback, md5_checking)
            self.is_ogg = src is not feed
            return
        if isinstance(source, (bytes, bytearray)):
            data = bytes(source)
        elif isinstance(source, str):
            with open(source, "rb") as f:
                data = f.read()
        else:
            data = source.read()
        # Ogg FLAC transport (the reference's FLAC__stream_decoder_init_ogg_*
        # layer): unwrap to the native stream for sequential decode; raw page
        # seeking lives in ogg.OggSeekableDecoder
        self.is_ogg = data[:4] == b"OggS"
        if self.is_ogg:
            from flac_tpu.ogg import flac_stream_from_ogg
            data = flac_stream_from_ogg(data)
        self._dec = hd.HostDecoder(data, check_md5=False)
        self._seek = SeekableDecoder(data)
        self._pos = self._dec.audio_offset
        self._init_common(write_callback, metadata_callback, error_callback,
                          md5_checking)

    @staticmethod
    def _is_seekable(source) -> bool:
        try:
            return source.seekable()
        except Exception:
            return hasattr(source, "seek")

    def _init_common(self, write_callback, metadata_callback, error_callback,
                     md5_checking: bool) -> None:
        if self._chunked is not None:
            self.is_ogg = False
            self._dec = None
            self._seek = None
            self._pos = len(self._chunked.meta_prefix)
        self._write_cb = write_callback
        self._metadata_cb = metadata_callback
        self._error_cb = error_callback
        self.md5_checking = md5_checking
        # respond filtering (stream_decoder.h:811-879); STREAMINFO on by default
        self._respond: set[int] = {C.METADATA_TYPE_STREAMINFO}
        # APPLICATION id list (stream_decoder.c:769-851): ids here TOGGLE the
        # type-level decision for matching blocks (stream_decoder.c:1479-1481)
        self._app_ids: set[bytes] = set()
        self._metadata_delivered = False
        self._frames = 0
        self._samples = 0
        self._md5 = None
        if md5_checking:
            from flac_tpu.md5 import MD5Context
            self._md5 = MD5Context()
        self.state = DecoderState.SEARCH_FOR_METADATA
        self.md5_ok: bool | None = None

    # -- metadata filtering ---------------------------------------------------

    def set_metadata_respond(self, type_code: int) -> None:
        self._respond.add(type_code)
        if type_code == C.METADATA_TYPE_APPLICATION:
            self._app_ids.clear()

    def set_metadata_respond_all(self) -> None:
        self._respond = set(range(0, 127))
        self._app_ids.clear()

    def set_metadata_ignore(self, type_code: int) -> None:
        self._respond.discard(type_code)
        if type_code == C.METADATA_TYPE_APPLICATION:
            self._app_ids.clear()

    def set_metadata_ignore_all(self) -> None:
        self._respond = set()
        self._app_ids.clear()

    def set_metadata_respond_application(self, app_id: bytes) -> None:
        """Respond to APPLICATION blocks with this 4-byte id even though the
        type is otherwise ignored (stream_decoder.h:826; no-op when the whole
        type already responds, stream_decoder.c:778-779)."""
        if C.METADATA_TYPE_APPLICATION not in self._respond:
            self._app_ids.add(bytes(app_id))

    def set_metadata_ignore_application(self, app_id: bytes) -> None:
        """Ignore APPLICATION blocks with this 4-byte id even though the type
        otherwise responds (stream_decoder.h:846; no-op when the whole type is
        already ignored, stream_decoder.c:837-838)."""
        if C.METADATA_TYPE_APPLICATION in self._respond:
            self._app_ids.add(bytes(app_id))

    def _should_deliver(self, block: MetadataBlock) -> bool:
        respond = block.type_code in self._respond
        # id-list XOR toggle (stream_decoder.c:1479-1481)
        if (block.type_code == C.METADATA_TYPE_APPLICATION and self._app_ids
                and getattr(block, "app_id", None) in self._app_ids):
            respond = not respond
        return respond

    # -- overridable callbacks --------------------------------------------------

    def write_callback(self, pcm: np.ndarray, frame: hd.FrameInfo) -> bool:
        """Return False to abort (like FLAC__STREAM_DECODER_WRITE_STATUS_ABORT)."""
        if self._write_cb:
            return self._write_cb(pcm, frame) is not False
        return True

    def metadata_callback(self, block: MetadataBlock) -> None:
        if self._metadata_cb:
            self._metadata_cb(block)

    def error_callback(self, status: str) -> None:
        if self._error_cb:
            self._error_cb(status)

    # -- processing -------------------------------------------------------------

    @property
    def streaminfo(self):
        return (self._chunked or self._dec).streaminfo

    @property
    def _meta_blocks(self):
        return (self._chunked or self._dec).metadata

    def get_decode_position(self) -> int:
        return self._pos

    def process_until_end_of_metadata(self) -> bool:
        if not self._metadata_delivered:
            for block in self._meta_blocks:
                if self._should_deliver(block):
                    self.metadata_callback(block)
            self._metadata_delivered = True
        self.state = DecoderState.SEARCH_FOR_FRAME_SYNC
        return True

    def _next_frame(self):
        """One frame from whichever backend; None at end of stream; raises
        nothing — errors go through error_callback with reference resync
        semantics (frame_sync_, stream_decoder.c:1941)."""
        if self._chunked is not None:
            while True:
                try:
                    step = self._chunked.next_frame()
                except (hd.DecodeError, ValueError, KeyError) as e:
                    self.error_callback(str(e))
                    if self._chunked.resync():
                        self.state = DecoderState.SEARCH_FOR_FRAME_SYNC
                        continue
                    return None
                return step
        if self._pos >= len(self._dec.data) - 2:
            return None
        try:
            step = self._dec.decode_frame_at(self._pos)
        except (hd.DecodeError, EOFError, ValueError, KeyError) as e:
            self.error_callback(str(e))
            try:
                self._pos = self._dec.find_sync(self._pos + 1)
                self.state = DecoderState.SEARCH_FOR_FRAME_SYNC
                return self._next_frame()
            except EOFError:
                return None
        return step

    def process_single(self) -> bool:
        """Decode and deliver exactly one frame (or one metadata pass)."""
        if not self._metadata_delivered:
            return self.process_until_end_of_metadata()
        step = self._next_frame()
        if step is None:
            self.state = DecoderState.END_OF_STREAM
            self._finish_md5()
            return True
        pcm, frame = step
        self._pos = frame.offset + frame.size
        self._frames += 1
        self._samples += frame.blocksize
        if self._md5 is not None:
            total = self.streaminfo.total_samples
            if total and self._samples > total:
                pcm_for_md5 = pcm[: len(pcm) - (self._samples - total)]
            else:
                pcm_for_md5 = pcm
            self._md5.accumulate(pcm_for_md5, self.streaminfo.bits_per_sample)
        self.state = DecoderState.READ_FRAME
        if not self.write_callback(pcm, frame):
            self.state = DecoderState.ABORTED
            return False
        return True

    def process_until_end_of_stream(self) -> bool:
        while self.state not in (DecoderState.END_OF_STREAM, DecoderState.ABORTED):
            if not self.process_single():
                return False
        return self.state == DecoderState.END_OF_STREAM

    def seek_absolute(self, sample: int) -> bool:
        """Position so the next process_single delivers the frame containing
        `sample` (the delivered block is NOT trimmed; use the frame's
        sample_number/blocksize, matching the reference's write-callback
        trimming being the client's to observe)."""
        if self._chunked is not None:
            return False  # read-callback source: no seek callback (NULL seek)
        try:
            self._seek.seek_absolute(sample)
        except SeekError:
            return False
        self._pos = self._seek.tell()
        self._md5 = None  # MD5 can't be checked after a seek
        if not self._metadata_delivered:
            self.process_until_end_of_metadata()
        return True

    def _finish_md5(self) -> None:
        si = self.streaminfo
        if self._md5 is not None and si.md5sum != b"\x00" * 16:
            self.md5_ok = self._md5.digest() == si.md5sum
            if not self.md5_ok:
                self.error_callback("MD5 signature mismatch")


class Encoder:
    """OO encoder facade with a progress callback — a thin shaping of
    flac_tpu.encode.encoder.StreamEncoder to the reference API's silhouette:

        enc = Encoder(out_file_or_path, sample_rate=.., bits_per_sample=..,
                      channels=.., compression_level=5,
                      progress_callback=lambda st: ...)
        enc.process(pcm)   # repeatedly, any chunking
        enc.finish()
    """

    def __init__(self, out, sample_rate: int, bits_per_sample: int, channels: int,
                 compression_level: int = 5, blocksize: int | None = None,
                 metadata: list | None = None, verify: bool = False,
                 total_samples_estimate: int = 0, progress_callback=None,
                 **overrides) -> None:
        from flac_tpu.encode.encoder import StreamEncoder
        from flac_tpu.encode.frame_encoder import EncoderConfig

        self._own_file = isinstance(out, str)
        self._out = open(out, "wb") if self._own_file else out
        cfg = EncoderConfig.from_level(compression_level, channels,
                                       bits_per_sample, sample_rate,
                                       blocksize=blocksize, **overrides)
        self._enc = StreamEncoder(cfg, self._out, metadata=metadata,
                                  verify=verify,
                                  total_samples_estimate=total_samples_estimate)
        self._progress = progress_callback

    @property
    def stats(self):
        return self._enc.stats

    def process(self, samples: np.ndarray) -> None:
        self._enc.process(samples)
        if self._progress:
            # bytes/samples/frames written so far (stream_encoder.h:677)
            self._progress(self._enc.stats)

    def finish(self):
        si = self._enc.finish()
        if self._progress:
            self._progress(self._enc.stats)
        if self._own_file:
            self._out.close()
        return si

    @property
    def verify_errors(self):
        return getattr(self._enc, "_verify_errors", [])
