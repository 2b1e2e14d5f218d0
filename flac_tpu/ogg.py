"""Ogg FLAC: page-layer mux/demux and the FLAC-in-Ogg mapping.

The analog of the reference's Ogg support, implemented natively (the
reference links libogg): page framing with the Ogg CRC-32
(poly 0x04C11DB7, non-reflected, zero init/xorout), packet (re)assembly
across pages (src/libFLAC/ogg_decoder_aspect.c:105-253), the FLAC mapping
(ogg_mapping.c:38-47 — first packet 0x7F "FLAC" <major> <minor>
<num-headers,16be> "fLaC" <STREAMINFO block>; each further metadata block
one packet; exactly one FLAC frame per audio packet), and the
one-packet-first-page / granule-position rules of the encoder aspect
(ogg_encoder_aspect.c:50-227).

Encode and decode reuse the native stream engines: decode extracts the
packets and reconstitutes a native FLAC stream; encode splits a natively
encoded stream into packets.
"""

from __future__ import annotations

import numpy as np

MAPPING_MAJOR = 1
MAPPING_MINOR = 0


# -- Ogg CRC-32 (different from zlib's: non-reflected, init 0, xorout 0) ----

def _make_crc_table() -> np.ndarray:
    tab = np.zeros(256, np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ (0x04C11DB7 if r & 0x80000000 else 0)) & 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TABLE = _make_crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) ^ int(tab[((crc >> 24) & 0xFF) ^ b])) & 0xFFFFFFFF
    return crc


# -- page layer -------------------------------------------------------------

class OggError(Exception):
    pass


def build_page(serial: int, seqno: int, granule: int, packets: list[bytes],
               bos: bool = False, eos: bool = False, continued: bool = False) -> bytes:
    """One Ogg page holding whole `packets` (each ≤ 255*255 here; larger
    payloads must be split by the caller via continued pages)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    if len(lacing) > 255:
        raise OggError("too many segments for one page")
    header = bytearray()
    header += b"OggS\x00"
    header.append((1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0))
    header += (granule & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    header += serial.to_bytes(4, "little")
    header += seqno.to_bytes(4, "little")
    header += b"\x00\x00\x00\x00"  # CRC placeholder
    header.append(len(lacing))
    header += lacing
    page = bytes(header) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def _raw_page(serial: int, seqno: int, granule: int, lacing: bytes, body: bytes,
              bos: bool, eos: bool, continued: bool) -> bytes:
    header = bytearray()
    header += b"OggS\x00"
    header.append((1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0))
    header += (granule & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    header += serial.to_bytes(4, "little")
    header += seqno.to_bytes(4, "little")
    header += b"\x00\x00\x00\x00"
    header.append(len(lacing))
    header += lacing
    page = bytes(header) + body
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


# max bytes of one packet that can END on a single page: the terminating
# lacing value (<255) plus up to 254 full 255-byte lacing values
_MAX_FINAL_CHUNK = 254 * 255 + 254
# continuation chunks must be a multiple of 255 with no terminator
_CONT_CHUNK = 255 * 255


def _paginate_packet(packet: bytes, serial: int, seqno: int, granule: int,
                     bos: bool = False, eos: bool = False) -> tuple[list[bytes], int]:
    """Emit one packet as one or more pages (continued pages for large
    packets). Granule goes on the page where the packet ends; continuation
    pages carry -1 per the Ogg spec."""
    pages = []
    pos = 0
    first = True
    while len(packet) - pos > _MAX_FINAL_CHUNK:
        chunk = packet[pos : pos + _CONT_CHUNK]
        lacing = b"\xff" * (len(chunk) // 255)  # no terminator: continues
        pages.append(_raw_page(serial, seqno, (1 << 64) - 1, lacing, chunk,
                               bos=bos and first, eos=False, continued=not first))
        seqno += 1
        pos += len(chunk)
        first = False
    chunk = packet[pos:]
    q, r = divmod(len(chunk), 255)
    lacing = b"\xff" * q + bytes([r])
    pages.append(_raw_page(serial, seqno, granule, lacing, chunk,
                           bos=bos and first, eos=eos, continued=not first))
    return pages, seqno + 1


def parse_pages(data: bytes):
    """Yield (header_type, granule, serial, seqno, [segments]) per page,
    validating CRCs."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] != b"OggS":
            raise OggError(f"lost Ogg page sync at byte {pos}")
        if data[pos + 4] != 0:
            raise OggError("unsupported Ogg version")
        htype = data[pos + 5]
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little")
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        seqno = int.from_bytes(data[pos + 18 : pos + 22], "little")
        crc_stored = int.from_bytes(data[pos + 22 : pos + 26], "little")
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        body_len = sum(lacing)
        page_len = 27 + nsegs + body_len
        page = bytearray(data[pos : pos + page_len])
        if len(page) < page_len:
            raise OggError("truncated Ogg page")
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise OggError(f"Ogg page CRC mismatch at byte {pos}")
        body = data[pos + 27 + nsegs : pos + page_len]
        segments = []
        off = 0
        for lace in lacing:
            segments.append((body[off : off + lace], lace))
            off += lace
        yield htype, granule, serial, seqno, segments
        pos += page_len


def _first_flac_serial(data: bytes) -> int | None:
    """Serial of the first logical bitstream whose BOS packet carries the
    FLAC mapping (0x7F 'FLAC'), or None if no such stream exists. The
    reference aspect only ever latches the FIRST page's serial
    (ogg_decoder_aspect.c:201-203) and returns NOT_FLAC for anything
    else; scanning the BOS set also finds FLAC when it is multiplexed
    behind another codec's stream."""
    for htype, _g, ser, _s, segments in parse_pages(data):
        if not (htype & 2):     # BOS pages come first; stop at the body
            return None
        if segments and segments[0][0][:5] == b"\x7fFLAC":
            return ser
    return None


def extract_packets(data: bytes, serial: int | None = None,
                    stop_at_eos: bool = True) -> list[bytes]:
    """Reassemble the packet stream for one logical bitstream.

    Chained streams (a second link concatenated after the first link's
    EOS page, possibly REUSING the serial): the reference decoder ends at
    end-of-stream of the link it latched onto (aspect->end_of_stream);
    stop_at_eos mirrors that — packets after the chosen bitstream's EOS
    page never leak in. Pass stop_at_eos=False to keep scanning (used by
    iter_chain_links)."""
    packets: list[bytes] = []
    cur = bytearray()
    chosen = serial
    for htype, _granule, ser, _seq, segments in parse_pages(data):
        if chosen is None:
            chosen = ser  # first (normally BOS) page selects the bitstream
        if ser != chosen:
            continue
        if not (htype & 1):
            # not a continuation: any dangling partial packet is dropped
            cur = bytearray()
        for seg, lace in segments:
            cur += seg
            if lace < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        if stop_at_eos and (htype & 4):
            break
    return packets


def iter_chain_links(data: bytes):
    """Split a (possibly chained) Ogg file into its links.

    Yields (start_byte, end_byte, serials) per chain link, where a link
    is a maximal page run from a BOS page set to the matching EOS pages
    (RFC 3533 chaining: links are concatenated, never interleaved). A
    reference decoder consumes only the first link; this iterator lets a
    caller decode every FLAC link (decode_ogg_flac(all_links=True))."""
    link_start = None
    open_serials: set[int] = set()
    serials: set[int] = set()
    pos = 0
    for htype, _g, ser, _s, segments in parse_pages(data):
        page_len = 27 + len(segments) + sum(lace for _seg, lace in segments)
        if htype & 2:  # BOS
            if link_start is None:
                link_start, serials, open_serials = pos, set(), set()
            open_serials.add(ser)
            serials.add(ser)
        if link_start is None:
            link_start, serials, open_serials = pos, {ser}, {ser}
        if htype & 4:  # EOS
            open_serials.discard(ser)
            if not open_serials:
                yield link_start, pos + page_len, frozenset(serials)
                link_start = None
        pos += page_len
    if link_start is not None:  # truncated final link (no EOS)
        yield link_start, pos, frozenset(serials)


# -- FLAC-in-Ogg mapping ----------------------------------------------------

def ogg_from_flac_stream(flac_data: bytes, serial: int = 0x464C4143) -> bytes:
    """Wrap a native FLAC stream into Ogg FLAC."""
    from flac_tpu.decode import host_decoder as hd
    from flac_tpu.decode.stream import index_frames
    from flac_tpu.metadata import parse_metadata, serialize_block

    if flac_data[:4] != b"fLaC":
        raise OggError("not a FLAC stream")
    blocks, audio_offset = parse_metadata(flac_data, 4)
    si = blocks[0]

    # first packet: mapping header + fLaC + STREAMINFO (is_last=false iff
    # more header packets follow)
    nheaders = len(blocks)
    first = bytearray()
    first.append(0x7F)
    first += b"FLAC"
    first.append(MAPPING_MAJOR)
    first.append(MAPPING_MINOR)
    first += nheaders.to_bytes(2, "big")
    first += b"fLaC"
    first += serialize_block(si, is_last=(nheaders == 1))
    pages: list[bytes] = []
    seqno = 0
    new_pages, seqno = _paginate_packet(bytes(first), serial, seqno, 0, bos=True)
    pages += new_pages
    for i, b in enumerate(blocks[1:], start=1):
        pkt = serialize_block(b, is_last=(i == nheaders - 1))
        new_pages, seqno = _paginate_packet(pkt, serial, seqno, 0)
        pages += new_pages

    # audio packets: exactly one frame each; granule = last sample of the
    # frame + 1 (sample count so far)
    d = np.frombuffer(flac_data, np.uint8)
    offsets = index_frames(d, audio_offset, si)
    host = hd.HostDecoder(flac_data, check_md5=False)
    frame_spans: list[tuple[int, int]] = []
    if offsets is not None and len(offsets) > 1:
        # frame k ends where frame k+1 starts; only the last indexed frame
        # and any trailing partial frame need host-side sizing
        starts = [int(x) for x in offsets]
        frame_spans = list(zip(starts[:-1], starts[1:]))
        pos = starts[-1]
    else:
        pos = audio_offset
    while pos < len(flac_data) - 2:
        try:
            _pcm, fi = host.decode_frame_at(pos)
        except (hd.DecodeError, EOFError):
            break
        frame_spans.append((pos, pos + fi.size))
        pos += fi.size

    # granule = last sample of the frame + 1 (ogg_encoder_aspect.c:194).
    # Parse each frame's own header: variable-blocksize streams carry a
    # sample number + per-frame blocksize, fixed-blocksize streams a frame
    # number — (k+1)*min_blocksize would be wrong for the former and for a
    # short final frame.
    from flac_tpu.bitio import BitReader
    total = si.total_samples
    for k, (s, e) in enumerate(frame_spans):
        fbs, _sr, _ch, _asgn, _bps, num_is_sample, num = \
            host.read_frame_header(BitReader(flac_data, s * 8))
        granule = (num + fbs) if num_is_sample else num * si.min_blocksize + fbs
        if total:
            granule = min(granule, total)
        is_last = k == len(frame_spans) - 1
        new_pages, seqno = _paginate_packet(flac_data[s:e], serial, seqno,
                                            granule, eos=is_last)
        pages += new_pages
    if not frame_spans:  # zero-length stream: emit an empty EOS page
        pages.append(build_page(serial, seqno, 0, [], eos=True))
    return b"".join(pages)


def flac_stream_from_ogg(data: bytes) -> bytes:
    """Unwrap Ogg FLAC into a native FLAC stream.

    Latches onto the first FLAC-mapped logical bitstream (BOS scan) so a
    FLAC stream multiplexed behind another codec's still unwraps; stops
    at that bitstream's EOS page, so chained links after it never leak
    into the frame bytes (the reference aspect's end_of_stream behavior,
    ogg_decoder_aspect.c). For the later links use iter_chain_links /
    decode_ogg_flac(all_links=True)."""
    packets = extract_packets(data, serial=_first_flac_serial(data))
    if not packets:
        raise OggError("no Ogg packets found")
    p0 = packets[0]
    if len(p0) < 9 + 4 + 38 or p0[0] != 0x7F or p0[1:5] != b"FLAC":
        raise OggError("first packet is not a FLAC mapping header")
    major = p0[5]
    if major != MAPPING_MAJOR:
        raise OggError(f"unsupported Ogg FLAC mapping version {major}")
    nheaders = int.from_bytes(p0[7:9], "big")
    if p0[9:13] != b"fLaC":
        raise OggError("missing fLaC magic in first packet")
    out = bytearray(b"fLaC")
    out += p0[13:]  # the STREAMINFO block
    if nheaders > 0:
        header_pkts = packets[1:nheaders]
        audio_start = nheaders
    else:
        # num-headers 0 = unknown: headers run until the first frame sync
        header_pkts = []
        audio_start = 1
        for p in packets[1:]:
            if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xFE) == 0xF8:
                break
            header_pkts.append(p)
            audio_start += 1
    for p in header_pkts:
        out += p
    # normalize is_last flags: set only on the final metadata block
    q = 4
    block_offsets = []
    while q < len(out):
        length = int.from_bytes(out[q + 1 : q + 4], "big")
        block_offsets.append(q)
        q += 4 + length
    for b in block_offsets[:-1]:
        out[b] &= 0x7F
    out[block_offsets[-1]] |= 0x80
    for p in packets[audio_start:]:
        out += p
    return bytes(out)


class OggToNativeReader:
    """Incremental Ogg FLAC -> native FLAC byte adapter for pipe decoding.

    Wraps a `read(n)` callable / file-like carrying an Ogg FLAC stream and
    exposes the demuxed NATIVE stream through the same read(n) contract,
    holding only whole-page granules of compressed bytes — so
    `decode.streaming.ChunkedStreamDecoder(OggToNativeReader(pipe))`
    decodes an unbounded Ogg pipe in O(window) memory on both sides (the
    reference's FLAC__stream_decoder_init_ogg_stream read path,
    ogg_decoder_aspect.c:105-253).

    The metadata packets are buffered until the first audio packet so the
    is_last flags can be normalized exactly like flac_stream_from_ogg
    (bounded: metadata precedes audio). Latches the first FLAC-mapped
    bitstream's serial; stops at its EOS page.
    """

    def __init__(self, source) -> None:
        self._read = source if callable(source) else source.read
        self._buf = bytearray()      # raw ogg bytes not yet paged
        self._out = bytearray()      # demuxed native bytes not yet consumed
        self._packet = bytearray()   # packet under assembly
        self._serial = None
        self._header_pkts: list[bytes] | None = []  # None once flushed
        self._nheaders = None
        self._eos = False
        self._raw_eof = False

    # -- page pump -----------------------------------------------------------

    def _fill_raw(self, n: int) -> None:
        while len(self._buf) < n and not self._raw_eof:
            chunk = self._read(max(n - len(self._buf), 1 << 16))
            if not chunk:
                self._raw_eof = True
                break
            self._buf += chunk

    def _next_page(self):
        """Parse one page off the raw buffer; None when exhausted."""
        self._fill_raw(27)
        if len(self._buf) < 27:
            return None
        if bytes(self._buf[:4]) != b"OggS":
            raise OggError("lost Ogg page sync in stream")
        nsegs = self._buf[26]
        self._fill_raw(27 + nsegs)
        lacing = bytes(self._buf[27:27 + nsegs])
        body_len = sum(lacing)
        total = 27 + nsegs + body_len
        self._fill_raw(total)
        if len(self._buf) < total:
            raise OggError("truncated Ogg page")
        page = bytes(self._buf[:total])
        del self._buf[:total]
        crc_stored = int.from_bytes(page[22:26], "little")
        if ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) != crc_stored:
            raise OggError("Ogg page CRC mismatch in stream")
        htype = page[5]
        serial = int.from_bytes(page[14:18], "little")
        body = page[27 + nsegs:]
        return htype, serial, lacing, body

    def _emit_packet(self, pkt: bytes) -> None:
        if self._header_pkts is None:       # audio phase: pass through
            self._out += pkt
            return
        if self._nheaders is None:          # first packet: mapping header
            if (len(pkt) < 9 + 4 + 38 or pkt[0] != 0x7F
                    or pkt[1:5] != b"FLAC"):
                raise OggError("first packet is not a FLAC mapping header")
            if pkt[5] != MAPPING_MAJOR:
                raise OggError(f"unsupported Ogg FLAC mapping version {pkt[5]}")
            if pkt[9:13] != b"fLaC":
                raise OggError("missing fLaC magic in first packet")
            self._nheaders = int.from_bytes(pkt[7:9], "big")
            self._header_pkts.append(pkt[13:])  # STREAMINFO block
            if self._nheaders == 1:
                self._flush_headers()
            return
        # subsequent header packet, or first audio packet when count unknown
        if self._nheaders == 0 and len(pkt) >= 2 and pkt[0] == 0xFF \
                and (pkt[1] & 0xFE) == 0xF8:
            self._flush_headers()
            self._out += pkt
            return
        self._header_pkts.append(pkt)
        if self._nheaders > 0 and len(self._header_pkts) == self._nheaders:
            self._flush_headers()

    def _flush_headers(self) -> None:
        blob = bytearray(b"fLaC") + b"".join(self._header_pkts)
        q = 4
        offsets = []
        while q < len(blob):
            offsets.append(q)
            q += 4 + int.from_bytes(blob[q + 1:q + 4], "big")
        for b in offsets[:-1]:
            blob[b] &= 0x7F
        blob[offsets[-1]] |= 0x80
        self._out += blob
        self._header_pkts = None

    def _pump(self) -> bool:
        """Demux one more page into _out; False at end of stream."""
        if self._eos:
            return False
        page = self._next_page()
        if page is None:
            return False
        htype, serial, lacing, body = page
        if self._serial is None:
            # latch the first FLAC-mapped BOS (skip foreign BOS packets)
            if (htype & 2) and body[:5] != b"\x7fFLAC":
                return True
            self._serial = serial
        if serial != self._serial:
            return True
        if not (htype & 1):
            self._packet = bytearray()
        off = 0
        for lace in lacing:
            self._packet += body[off:off + lace]
            off += lace
            if lace < 255:
                self._emit_packet(bytes(self._packet))
                self._packet = bytearray()
        if htype & 4:
            self._eos = True
        return True

    def read(self, n: int) -> bytes:
        while len(self._out) < n:
            if not self._pump():
                break
        out = bytes(self._out[:n])
        del self._out[:n]
        return out


# -- page-level random access ------------------------------------------------

class _PageHeader:
    """Parsed Ogg page header (no CRC validation — seek probes are lazy;
    the packet path re-validates via the frame CRCs)."""

    __slots__ = ("offset", "htype", "granule", "serial", "seqno", "lacing",
                 "body_offset", "size")

    def __init__(self, data: bytes, pos: int) -> None:
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            raise OggError(f"no Ogg page at byte {pos}")
        self.offset = pos
        self.htype = data[pos + 5]
        g = int.from_bytes(data[pos + 6 : pos + 14], "little")
        self.granule = -1 if g == (1 << 64) - 1 else g
        self.serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        self.seqno = int.from_bytes(data[pos + 18 : pos + 22], "little")
        nsegs = data[pos + 26]
        self.lacing = data[pos + 27 : pos + 27 + nsegs]
        self.body_offset = pos + 27 + nsegs
        self.size = 27 + nsegs + sum(self.lacing)
        if self.body_offset + sum(self.lacing) > len(data):
            raise OggError("truncated Ogg page")


def _find_page(data: bytes, pos: int, serial: int | None = None) -> _PageHeader | None:
    """Next structurally valid page at or after byte `pos` (optionally
    matching `serial`)."""
    n = len(data)
    while pos < n:
        hit = data.find(b"OggS", pos)
        if hit < 0 or hit + 27 > n:
            return None
        try:
            page = _PageHeader(data, hit)
        except OggError:
            pos = hit + 1
            continue
        if serial is not None and page.serial != serial:
            pos = hit + page.size
            continue
        return page
    return None


class OggSeekableDecoder:
    """Positioned decoding DIRECTLY over Ogg FLAC bytes: seeks bisect pages
    on granule position (the reference's seek_to_absolute_sample_ogg_,
    stream_decoder.c:136,1221) instead of unwrapping the whole stream, then
    packets (one FLAC frame each, per the mapping) decode through the host
    frame decoder against a STREAMINFO-only prefix.

    Mirrors SeekableDecoder's surface: seek_absolute / read / decode_range /
    tell (tell returns the Ogg byte offset of the page cursor).
    """

    def __init__(self, data: bytes, check_crc: bool = True) -> None:
        from flac_tpu.decode import host_decoder as hd
        from flac_tpu.metadata import parse_metadata, serialize_metadata

        self.data = bytes(data)
        first = _find_page(self.data, 0)
        if first is None:
            raise OggError("no Ogg pages found")
        self.serial = first.serial
        header_blob, self._audio_cursor = self._read_headers(first)
        prefix = bytearray(b"fLaC") + header_blob
        # normalize is_last flags (packets carry the original stream's flags)
        q = 4
        block_offsets = []
        while q < len(prefix):
            length = int.from_bytes(prefix[q + 1 : q + 4], "big")
            block_offsets.append(q)
            q += 4 + length
        if not block_offsets:
            raise OggError("Ogg FLAC stream has no metadata blocks")
        for b in block_offsets[:-1]:
            prefix[b] &= 0x7F
        prefix[block_offsets[-1]] |= 0x80
        self.metadata, _ = parse_metadata(bytes(prefix), 4)
        self.streaminfo = self.metadata[0]
        # per-packet frame decoding uses a minimal STREAMINFO-only prefix so
        # large PADDING/PICTURE blocks aren't re-parsed per frame
        import dataclasses as _dc
        si_only = _dc.replace(self.streaminfo, is_last=True)
        self._prefix = b"fLaC" + serialize_metadata([si_only])
        self.check_crc = check_crc
        self._hd = hd
        self._reset_walk(*self._audio_cursor)

    # -- packet walking -------------------------------------------------------

    def _read_headers(self, first: "_PageHeader"):
        """Collect the FLAC mapping header packets; returns
        (metadata_blob, (audio_page_offset, packets_to_skip_there))."""
        pos = first.offset
        partial = bytearray()
        blob = bytearray()
        nheaders = None
        have = 0
        while True:
            page = _find_page(self.data, pos, self.serial)
            if page is None:
                raise OggError("truncated Ogg FLAC headers")
            if not (page.htype & 1):
                partial = bytearray()
            body = self.data[page.body_offset : page.body_offset + sum(page.lacing)]
            off = 0
            completed = 0
            for lace in page.lacing:
                partial += body[off : off + lace]
                off += lace
                if lace < 255:
                    pkt = bytes(partial)
                    partial = bytearray()
                    completed += 1
                    if nheaders is None:
                        if len(pkt) < 13 or pkt[0] != 0x7F or pkt[1:5] != b"FLAC" \
                                or pkt[5] != MAPPING_MAJOR or pkt[9:13] != b"fLaC":
                            raise OggError("first packet is not a FLAC mapping header")
                        nheaders = int.from_bytes(pkt[7:9], "big")
                        blob += pkt[13:]
                        have = 1
                    elif nheaders == 0 and len(pkt) >= 2 and pkt[0] == 0xFF \
                            and (pkt[1] & 0xFE) == 0xF8:
                        # unknown header count: audio begins at the first
                        # frame-sync packet — re-deliver it on the audio walk
                        return blob, (page.offset, completed - 1)
                    else:
                        blob += pkt
                        have += 1
                    if nheaders > 0 and have == nheaders:
                        return blob, (page.offset, completed)
            pos = page.offset + page.size

    def _reset_walk(self, page_offset: int, skip_packets: int) -> None:
        self._cursor = page_offset
        self._skip_packets = skip_packets
        self._partial = bytearray()
        self._queue: list[bytes] = []
        self._pending: np.ndarray | None = None
        self._seek_target: int | None = None

    def _next_packet(self) -> bytes | None:
        while not self._queue:
            page = _find_page(self.data, self._cursor, self.serial)
            if page is None:
                return None
            if not (page.htype & 1):
                self._partial = bytearray()
            body = self.data[page.body_offset : page.body_offset + sum(page.lacing)]
            off = 0
            for lace in page.lacing:
                self._partial += body[off : off + lace]
                off += lace
                if lace < 255:
                    pkt = bytes(self._partial)
                    self._partial = bytearray()
                    if self._skip_packets > 0:
                        self._skip_packets -= 1
                    else:
                        self._queue.append(pkt)
            self._cursor = page.offset + page.size
        return self._queue.pop(0)

    def _next_frame(self):
        """Decode the next audio packet as one FLAC frame; returns
        (pcm, first_sample) or None at end of stream."""
        hd = self._hd
        while True:
            pkt = self._next_packet()
            if pkt is None:
                return None
            if len(pkt) < 2 or pkt[0] != 0xFF or (pkt[1] & 0xFE) != 0xF8:
                continue  # not an audio packet (stray metadata/garbage)
            dec = hd.HostDecoder(self._prefix + pkt, check_md5=False)
            try:
                pcm, fi = dec.decode_frame_at(len(self._prefix))
            except (hd.DecodeError, EOFError, ValueError, KeyError):
                continue  # corrupt packet: resync at the next packet
            first = (fi.sample_number if fi.sample_number >= 0
                     else fi.frame_number * self.streaminfo.min_blocksize)
            return pcm, first

    # -- seeking --------------------------------------------------------------

    def _granule_at_or_after(self, pos: int, limit: int) -> "_PageHeader | None":
        """First page at/after `pos` (before `limit`) with a valid granule."""
        while pos < limit:
            page = _find_page(self.data, pos, self.serial)
            if page is None or page.offset >= limit:
                return None
            if page.granule >= 0:
                return page
            pos = page.offset + page.size
        return None

    def seek_absolute(self, target_sample: int) -> None:
        """Granule-position bisection over raw pages: find the last page
        whose granule (samples finished by end of page) is <= target; every
        packet ending on that page is pre-target, and the walk resumes with
        the first frame that ends after it."""
        from flac_tpu.decode.seek import SeekError

        si = self.streaminfo
        if target_sample < 0:
            raise SeekError("negative target sample")
        if si.total_samples and target_sample >= si.total_samples:
            raise SeekError("seek past end of stream")
        audio_page, audio_skip = self._audio_cursor
        lo = audio_page
        hi = len(self.data)
        anchor: _PageHeader | None = None
        while hi - lo > 4096:
            mid = (lo + hi) // 2
            page = self._granule_at_or_after(mid, hi)
            if page is None:
                hi = mid
                continue
            if page.granule <= target_sample:
                anchor = page
                lo = page.offset + page.size
            else:
                hi = page.offset
        # linear tail over the remaining window
        scan = audio_page if anchor is None else anchor.offset + anchor.size
        while True:
            page = self._granule_at_or_after(scan, hi)
            if page is None or page.granule > target_sample:
                break
            anchor = page
            scan = page.offset + page.size
        if anchor is None or anchor.offset == audio_page:
            # target inside the first audio span (or anchor IS the first
            # audio page, where header packets also need skipping)
            self._reset_walk(audio_page, audio_skip)
        else:
            self._reset_walk(anchor.offset,
                             sum(1 for l in anchor.lacing if l < 255))
        self._seek_target = target_sample

    # -- reading --------------------------------------------------------------

    def read(self, nsamples: int) -> np.ndarray:
        parts: list[np.ndarray] = []
        got = 0
        target = self._seek_target
        self._seek_target = None
        if self._pending is not None and len(self._pending):
            take = self._pending[: nsamples]
            self._pending = self._pending[len(take):]
            parts.append(take)
            got += len(take)
        while got < nsamples:
            nxt = self._next_frame()
            if nxt is None:
                break
            pcm, first = nxt
            if target is not None:
                if first + len(pcm) <= target:
                    continue  # frame entirely before the target
                if first < target:
                    pcm = pcm[target - first :]
                target = None
            take = pcm[: nsamples - got]
            if len(take) < len(pcm):
                self._pending = pcm[len(take):]
            parts.append(take)
            got += len(take)
        if not parts:
            return np.zeros((0, self.streaminfo.channels), np.int32)
        return np.concatenate(parts, axis=0)

    def decode_range(self, start_sample: int, nsamples: int) -> np.ndarray:
        self.seek_absolute(start_sample)
        return self.read(nsamples)

    def tell(self) -> int:
        return self._cursor


# -- high-level helpers (used by the CLI) ------------------------------------

def encode_ogg_flac(samples: np.ndarray, sample_rate: int, bits_per_sample: int,
                    level: int = 5, blocksize: int | None = None,
                    metadata=None, verify: bool = False, serial: int = 0x464C4143,
                    **overrides) -> bytes:
    import io

    from flac_tpu.encode.encoder import StreamEncoder
    from flac_tpu.encode.frame_encoder import EncoderConfig

    if samples.ndim == 1:
        samples = samples[:, None]
    cfg = EncoderConfig.from_level(level, samples.shape[1], bits_per_sample,
                                   sample_rate, blocksize=blocksize, **overrides)
    buf = io.BytesIO()
    enc = StreamEncoder(cfg, buf, metadata=metadata,
                        total_samples_estimate=samples.shape[0], verify=verify)
    enc.process(samples)
    enc.finish()
    return ogg_from_flac_stream(buf.getvalue(), serial=serial)


def decode_ogg_flac(data: bytes, check_md5: bool = True,
                    all_links: bool = False):
    """Returns (pcm, streaminfo, metadata_blocks).

    Default: the first FLAC link only — reference parity (a chained
    file's later links are unreachable through the C decoder aspect).
    all_links=True decodes EVERY FLAC link of a chained file and
    concatenates the PCM (links must share channels/bps; streaminfo and
    metadata are the first link's)."""
    import numpy as np

    from flac_tpu.decode.stream import decode_bytes_device
    from flac_tpu.metadata import parse_metadata

    flac_data = flac_stream_from_ogg(data)
    pcm, si, _info = decode_bytes_device(flac_data, check_md5=check_md5)
    blocks, _ = parse_metadata(flac_data, 4)
    if all_links:
        links = list(iter_chain_links(data))
        for start, end, _serials in links[1:]:
            try:
                chunk = flac_stream_from_ogg(data[start:end])
            except OggError:
                continue  # non-FLAC link
            pcm2, si2, _ = decode_bytes_device(chunk, check_md5=check_md5)
            if si2.channels != si.channels or si2.bits_per_sample != si.bits_per_sample:
                raise OggError("chained links change the sample format")
            pcm = np.concatenate([pcm, pcm2], axis=0)
    return pcm, si, blocks
