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


def extract_packets(data: bytes, serial: int | None = None) -> list[bytes]:
    """Reassemble the packet stream for one logical bitstream."""
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
    return packets


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

    total = si.total_samples
    bs = si.min_blocksize
    for k, (s, e) in enumerate(frame_spans):
        granule = min((k + 1) * bs, total) if total else (k + 1) * bs
        is_last = k == len(frame_spans) - 1
        new_pages, seqno = _paginate_packet(flac_data[s:e], serial, seqno,
                                            granule, eos=is_last)
        pages += new_pages
    if not frame_spans:  # zero-length stream: emit an empty EOS page
        pages.append(build_page(serial, seqno, 0, [], eos=True))
    return b"".join(pages)


def flac_stream_from_ogg(data: bytes) -> bytes:
    """Unwrap Ogg FLAC into a native FLAC stream."""
    packets = extract_packets(data)
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


def decode_ogg_flac(data: bytes, check_md5: bool = True):
    """Returns (pcm, streaminfo, metadata_blocks)."""
    from flac_tpu.decode.stream import decode_bytes_device
    from flac_tpu.metadata import parse_metadata

    flac_data = flac_stream_from_ogg(data)
    pcm, si, _info = decode_bytes_device(flac_data, check_md5=check_md5)
    blocks, _ = parse_metadata(flac_data, 4)
    return pcm, si, blocks
