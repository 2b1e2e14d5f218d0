"""FLAC metadata engine: block object model, stream I/O, and chain editing.

The analog of the reference's 3-level metadata API
(include/FLAC/metadata.h:158-2181, src/libFLAC/metadata_object.c,
metadata_iterators.c). Host-side, pure Python — there is no TPU content in
metadata handling.
"""

from flac_tpu.metadata.iterators import (  # noqa: F401
    MetadataChain,
    MetadataIOError,
    SimpleIterator,
    get_cuesheet,
    get_picture,
    get_streaminfo,
    get_tags,
)
from flac_tpu.metadata.blocks import (  # noqa: F401
    Application,
    CueSheet,
    CueSheetIndex,
    CueSheetTrack,
    MetadataBlock,
    Padding,
    Picture,
    SeekPoint,
    SeekTable,
    StreamInfo,
    Unknown,
    VorbisComment,
    parse_block,
    parse_metadata,
    serialize_block,
    serialize_metadata,
)
