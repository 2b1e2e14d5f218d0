"""File-level metadata editing: the reference's 3-level metadata API.

- Level 0 (include/FLAC/metadata.h:158-236): one-shot convenience getters —
  get_streaminfo / get_tags / get_cuesheet / get_picture.
- Level 1 (metadata.h:312-672, metadata_iterators.c:673+): SimpleIterator —
  walk blocks in-file and set/insert/delete with padding reuse, else a
  whole-file rewrite.
- Level 2 (metadata.h:798-1242): Chain/Iterator — read all metadata, edit in
  memory, write back with a `use_padding` strategy (in-place when the new
  metadata fits the existing region, absorbing the difference into a PADDING
  block) or a tempfile rewrite + atomic rename
  (write_metadata_block_stationary_ / rewrite_whole_file_,
  metadata_iterators.c:117-137).

Host-side, pure Python; no TPU content.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from flac_tpu import constants as C
from flac_tpu.metadata.blocks import (
    CueSheet,
    MetadataBlock,
    Padding,
    Picture,
    StreamInfo,
    VorbisComment,
    parse_block,
    serialize_metadata,
)

BLOCK_HEADER_LEN = 4  # 1 byte is_last+type, 3 bytes length


class MetadataIOError(Exception):
    pass


def _find_stream_start(data: bytes) -> int:
    """Offset of the 'fLaC' marker, skipping a leading ID3v2 tag
    (the reference level-1/2 APIs tolerate ID3v2 the same way the decoder
    does, stream_decoder.c:1919)."""
    pos = 0
    if data[:3] == b"ID3":
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    if data[pos : pos + 4] != C.STREAM_SYNC_STRING:
        raise MetadataIOError("not a FLAC file (missing fLaC marker)")
    return pos


# ---------------------------------------------------------------------------
# Level 0 — convenience getters (metadata.h:158-236)
# ---------------------------------------------------------------------------

def get_streaminfo(path: str) -> StreamInfo | None:
    for b in _iter_blocks_from_file(path):
        if isinstance(b, StreamInfo):
            return b
    return None


def get_tags(path: str) -> VorbisComment | None:
    """First VORBIS_COMMENT block, like FLAC__metadata_get_tags."""
    for b in _iter_blocks_from_file(path):
        if isinstance(b, VorbisComment):
            return b
    return None


def get_cuesheet(path: str) -> CueSheet | None:
    for b in _iter_blocks_from_file(path):
        if isinstance(b, CueSheet):
            return b
    return None


def get_picture(path: str, picture_type: int | None = None,
                mime_type: str | None = None, description: str | None = None,
                max_width: int = (1 << 32) - 1, max_height: int = (1 << 32) - 1,
                max_depth: int = (1 << 32) - 1, max_colors: int = (1 << 32) - 1,
                ) -> Picture | None:
    """FLAC__metadata_get_picture (metadata.h:209-236): among PICTURE blocks
    matching the filters and within the max constraints, return the one with
    the largest area."""
    best: Picture | None = None
    best_area = -1
    for b in _iter_blocks_from_file(path):
        if not isinstance(b, Picture):
            continue
        if picture_type is not None and b.picture_type != picture_type:
            continue
        if mime_type is not None and b.mime_type != mime_type:
            continue
        if description is not None and b.description != description:
            continue
        if b.width > max_width or b.height > max_height:
            continue
        if b.depth > max_depth or b.colors > max_colors:
            continue
        area = b.width * b.height
        if area > best_area:
            best, best_area = b, area
    return best


def _iter_blocks_from_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    pos = _find_stream_start(data) + 4
    while True:
        block, pos = parse_block(data, pos)
        yield block
        if block.is_last:
            return


# ---------------------------------------------------------------------------
# Level 2 — Chain (read → edit in memory → write)
# ---------------------------------------------------------------------------

@dataclass
class _Layout:
    stream_start: int      # offset of 'fLaC'
    metadata_end: int      # offset of first audio byte
    file_len: int


class MetadataChain:
    """FLAC__metadata_chain_* analog. Blocks are exposed as a plain list
    (`chain.blocks`); edit it (or use the convenience methods) and call
    write(). STREAMINFO must remain first; is_last flags are managed
    automatically on write."""

    def __init__(self) -> None:
        self.blocks: list[MetadataBlock] = []
        self._path: str | None = None
        self._layout: _Layout | None = None

    # -- reading --

    @classmethod
    def read(cls, path: str) -> "MetadataChain":
        chain = cls()
        with open(path, "rb") as f:
            data = f.read()
        start = _find_stream_start(data)
        pos = start + 4
        while True:
            block, pos = parse_block(data, pos)
            chain.blocks.append(block)
            if block.is_last:
                break
        chain._path = path
        chain._layout = _Layout(stream_start=start, metadata_end=pos, file_len=len(data))
        if not chain.blocks or not isinstance(chain.blocks[0], StreamInfo):
            raise MetadataIOError("first metadata block is not STREAMINFO")
        return chain

    # -- editing helpers (metadata_object.c-style ops) --

    def merge_padding(self) -> None:
        """Combine adjacent PADDING blocks into one
        (FLAC__metadata_chain_merge_padding, metadata.h:1009)."""
        out: list[MetadataBlock] = []
        for b in self.blocks:
            if isinstance(b, Padding) and out and isinstance(out[-1], Padding):
                out[-1] = Padding(length=out[-1].length + BLOCK_HEADER_LEN + b.length)
            else:
                out.append(b)
        self.blocks = out

    def sort_padding(self) -> None:
        """Move all padding to one block at the end
        (FLAC__metadata_chain_sort_padding, metadata.h:1023)."""
        total = sum(BLOCK_HEADER_LEN + b.length for b in self.blocks
                    if isinstance(b, Padding))
        self.blocks = [b for b in self.blocks if not isinstance(b, Padding)]
        if total >= BLOCK_HEADER_LEN:
            self.blocks.append(Padding(length=total - BLOCK_HEADER_LEN))

    def get(self, cls_or_code) -> MetadataBlock | None:
        for b in self.blocks:
            if isinstance(cls_or_code, int):
                if b.type_code == cls_or_code:
                    return b
            elif isinstance(b, cls_or_code):
                return b
        return None

    def remove(self, predicate) -> int:
        keep, removed = [], 0
        for b in self.blocks:
            if predicate(b) and not isinstance(b, StreamInfo):
                removed += 1
            else:
                keep.append(b)
        self.blocks = keep
        return removed

    # -- writing --

    def _serialized(self) -> bytes:
        return serialize_metadata(self.blocks)

    def check_if_tempfile_needed(self, use_padding: bool = True) -> bool:
        """FLAC__metadata_chain_check_if_tempfile_needed (metadata.h:941)."""
        if self._layout is None:
            return True
        existing = self._layout.metadata_end - (self._layout.stream_start + 4)
        new = len(self._serialized())
        if new == existing:
            return False
        if not use_padding:
            return True
        if isinstance(self.blocks[-1], Padding):
            # the last padding block can shrink or grow to absorb the difference
            delta = existing - new
            return self.blocks[-1].length + delta < 0
        # can append a padding block if ≥4 bytes remain for its header
        return not (new + BLOCK_HEADER_LEN <= existing)

    def write(self, use_padding: bool = True, path: str | None = None) -> None:
        """Write the chain back to the file. In-place when the new metadata
        fits the existing region (difference absorbed by a final PADDING
        block), else tempfile rewrite + atomic rename."""
        path = path or self._path
        if path is None:
            raise MetadataIOError("chain has no associated file")
        if not self.blocks or not isinstance(self.blocks[0], StreamInfo):
            raise MetadataIOError("first metadata block must be STREAMINFO")
        layout = self._layout if path == self._path else None

        if layout is not None:
            existing = layout.metadata_end - (layout.stream_start + 4)
            new_blob = self._serialized()
            fits = False
            if len(new_blob) == existing:
                fits = True
            elif use_padding:
                blocks = list(self.blocks)
                if isinstance(blocks[-1], Padding):
                    delta = existing - len(new_blob)
                    if blocks[-1].length + delta >= 0:
                        blocks[-1] = Padding(length=blocks[-1].length + delta)
                        self.blocks = blocks
                        fits = True
                elif len(new_blob) + BLOCK_HEADER_LEN <= existing:
                    self.blocks = blocks + [
                        Padding(length=existing - len(new_blob) - BLOCK_HEADER_LEN)]
                    fits = True
            if fits:
                blob = self._serialized()
                assert len(blob) == existing
                with open(path, "r+b") as f:
                    f.seek(layout.stream_start + 4)
                    f.write(blob)
                return
        # tempfile rewrite (rewrite_whole_file_, metadata_iterators.c:127-137)
        with open(path, "rb") as f:
            data = f.read()
        if layout is None:
            start = _find_stream_start(data)
            pos = start + 4
            while True:
                _b, pos = parse_block(data, pos)
                if _b.is_last:
                    break
            layout = _Layout(stream_start=start, metadata_end=pos, file_len=len(data))
        blob = self._serialized()
        dirn = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(prefix=".flacmeta.", dir=dirn)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data[: layout.stream_start + 4])
                f.write(blob)
                f.write(data[layout.metadata_end :])
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        self._layout = _Layout(stream_start=layout.stream_start,
                               metadata_end=layout.stream_start + 4 + len(blob),
                               file_len=len(data) - (layout.metadata_end -
                                                     layout.stream_start - 4) + len(blob))
        self._path = path


# ---------------------------------------------------------------------------
# Level 1 — SimpleIterator (in-file walking + targeted edits)
# ---------------------------------------------------------------------------

class SimpleIterator:
    """FLAC__metadata_simple_iterator_* analog. Random access over blocks in
    a file with targeted set/insert/delete. Internally backed by a chain —
    the observable file-mutation semantics match the reference (in-place
    when padding allows, else rewrite)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._chain = MetadataChain.read(path)
        self.index = 0

    # -- navigation --

    def __len__(self) -> int:
        return len(self._chain.blocks)

    def next(self) -> bool:
        if self.index + 1 >= len(self._chain.blocks):
            return False
        self.index += 1
        return True

    def prev(self) -> bool:
        if self.index == 0:
            return False
        self.index -= 1
        return True

    def is_last(self) -> bool:
        return self.index == len(self._chain.blocks) - 1

    def get_block_type(self) -> int:
        return self._chain.blocks[self.index].type_code

    def get_block_length(self) -> int:
        return len(self._chain.blocks[self.index].body_bytes())

    def get_block(self) -> MetadataBlock:
        return self._chain.blocks[self.index]

    def get_block_offset(self) -> int:
        """Byte offset of the current block's header in the file."""
        off = self._chain._layout.stream_start + 4
        for b in self._chain.blocks[: self.index]:
            off += BLOCK_HEADER_LEN + len(b.body_bytes())
        return off

    # -- mutation (each writes through to the file immediately, like the
    # reference's level-1 API) --

    def set_block(self, block: MetadataBlock, use_padding: bool = True) -> None:
        if self.index == 0 and not isinstance(block, StreamInfo):
            raise MetadataIOError("block 0 must remain STREAMINFO")
        self._chain.blocks[self.index] = block
        self._chain.write(use_padding=use_padding)

    def insert_block_after(self, block: MetadataBlock, use_padding: bool = True) -> None:
        self._chain.blocks.insert(self.index + 1, block)
        self._chain.write(use_padding=use_padding)
        self.index += 1

    def delete_block(self, use_padding: bool = True) -> None:
        """Delete the current block. With use_padding the block is replaced
        by an equal-size PADDING block (so the file is edited in place);
        otherwise the file shrinks via rewrite
        (metadata_iterators.c delete semantics)."""
        if self.index == 0:
            raise MetadataIOError("cannot delete STREAMINFO")
        if use_padding:
            cur = self._chain.blocks[self.index]
            self._chain.blocks[self.index] = Padding(length=len(cur.body_bytes()))
        else:
            del self._chain.blocks[self.index]
        self._chain.write(use_padding=use_padding)
        # like the reference, the iterator is left on the preceding block
        self.index -= 1
