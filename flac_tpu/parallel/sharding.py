"""Frame-sharded encoding over a device mesh.

Design (SURVEY.md §2.3, §5.8): FLAC frames are fully self-contained — predictor
warm-up samples live inside each subframe and prediction history never crosses
a frame boundary (reference format.h:304-331, stream_encoder.c:3515) — so the
frame-batch axis is embarrassingly data-parallel. What is NOT local:

* STREAMINFO statistics (min/max frame size, total samples): min/max/sum
  collectives over the mesh (reference tracks these serially in write_frame_,
  stream_encoder.c:2418-2421).
* Frame placement in the output stream & seekpoint byte offsets: an exclusive
  prefix sum of per-frame encoded byte lengths. Locally a cumsum; across
  shards an all_gather of per-shard totals + masked sum (a two-level scan).
* The ordered byte stream / MD5: inherently sequential, stays on the host I/O
  path (the driver concatenates shards in frame order).

The mesh is 2-D ('host', 'chip'): 'host' models the DCN axis across hosts and
'chip' the ICI axis within a slice; frames shard over both (pure DP — a codec
has no TP/PP analog, SURVEY.md §2.3). Collectives reduce over both axes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flac_tpu.encode.frame_encoder import EncoderConfig, build_frame_encoder


def make_mesh(devices=None, n_hosts: int | None = None) -> Mesh:
    """A ('host', 'chip') mesh over the given (default: all) devices.

    With one process and N local devices this still produces a 2-D mesh so the
    cross-'host' collective paths compile and execute exactly as they would on
    a real multi-host slice (single-host multi-device simulation, SURVEY.md §4).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_hosts is None:
        # prefer an even split so both mesh axes are non-trivial when possible
        n_hosts = 2 if n % 2 == 0 and n >= 2 else 1
    if n % n_hosts:
        raise ValueError(f"{n} devices not divisible into {n_hosts} hosts")
    arr = np.asarray(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(arr, ("host", "chip"))


@jax.tree_util.register_dataclass
@dataclass
class ShardedEncodeResult:
    """Outputs of one sharded encode step (all global-shape arrays)."""

    words: jax.Array        # [B, maxwords] int32 — packed big-endian frame words
    nbytes: jax.Array       # [B] int64 — encoded byte length per frame
    stream_offset: jax.Array  # [B] int64 — exclusive prefix sum of nbytes
    min_framesize: jax.Array  # [] int64 — global min (STREAMINFO)
    max_framesize: jax.Array  # [] int64 — global max (STREAMINFO)
    total_bytes: jax.Array    # [] int64 — global sum
    assignment: jax.Array     # [B] int32 — chosen channel assignment


def build_sharded_encode_step(cfg: EncoderConfig, mesh: Mesh,
                              frames_per_device: int):
    """Returns `step(pcm[B,T,Ch], frame_numbers[B]) -> ShardedEncodeResult`,
    jitted over the mesh with the frame axis sharded across every device.

    B must equal frames_per_device * mesh.size. The per-shard body runs the
    full batched frame encoder; cross-shard reductions and the two-level
    length prefix-sum ride the mesh's collectives.
    """
    cfg = cfg.resolve()
    # pick the word-pack kernel by the MESH's platform, not the default
    # backend: a CPU dry-run mesh may coexist with a loaded TPU plugin
    mesh_platform = mesh.devices.flat[0].platform
    from flac_tpu.encode.frame_encoder import build_frame_encoder_parts
    fields_fn, pack_fn = build_frame_encoder_parts(
        cfg, packer_impl="pallas" if mesh_platform == "tpu" else "xla")
    n_dev = mesh.size
    B = frames_per_device * n_dev
    axes = ("host", "chip")

    def search_step(pcm, fnos):
        # pcm: [frames_per_device, T, Ch] (this shard's frames).
        # Candidate search + field assembly + EVERY collective. The frame's
        # total bit count is the field nbits sum (pad + CRC-16 fields
        # included), so stream placement doesn't need the packer.
        values, nbits, info = fields_fn(pcm, fnos)
        total_bits = jnp.sum(nbits.astype(jnp.int64), axis=1)
        nbytes = (total_bits + 7) // 8

        # --- global STREAMINFO statistics over ICI+DCN ----------------------
        min_fs = jax.lax.pmin(jnp.min(nbytes), axis_name=axes)
        max_fs = jax.lax.pmax(jnp.max(nbytes), axis_name=axes)
        total = jax.lax.psum(jnp.sum(nbytes), axis_name=axes)

        # --- two-level exclusive prefix sum of frame byte lengths -----------
        # level 1: local exclusive cumsum; level 2: all_gather each shard's
        # total and add the sum of all preceding shards' totals.
        local_excl = jnp.cumsum(nbytes) - nbytes
        shard_total = jnp.sum(nbytes)
        # gather over both axes in row-major ('host' major) order = frame order
        host_tot = jax.lax.all_gather(
            jax.lax.all_gather(shard_total, "chip"), "host")  # [H, C]
        flat = host_tot.reshape(-1)
        my_idx = (jax.lax.axis_index("host") * jax.lax.axis_size("chip")
                  + jax.lax.axis_index("chip"))
        preceding = jnp.sum(jnp.where(jnp.arange(flat.shape[0]) < my_idx, flat, 0))
        offsets = preceding + local_excl

        return (values, nbits, nbytes, offsets, min_fs[None], max_fs[None],
                total[None], info["assignment"])

    def pack_step(values, nbits):
        # pure per-frame pack: field words + CRC-16. NO collectives — so
        # running it vma-unchecked (below) leaves nothing unprotected.
        words, _total_bits = pack_fn(values, nbits)
        return words

    spec_b = P(("host", "chip"))
    spec_b2 = P(("host", "chip"), None)
    # varying-axes checking is ON for the stage that owns the collectives.
    sharded_search = jax.shard_map(
        search_step, mesh=mesh,
        in_specs=(P(("host", "chip"), None, None), spec_b),
        out_specs=(spec_b2, spec_b2, spec_b, spec_b,
                   P(("host", "chip")), P(("host", "chip")),
                   P(("host", "chip")), spec_b),
        check_vma=True,
    )
    # The pack stage is collective-free, but its Pallas kernel body trips
    # the vma checker (unvarying loop/index values meeting varying refs —
    # a JAX-side limitation, see the checker's own error text). Scoping
    # check_vma=False to THIS shard_map only exempts the kernel; the
    # search stage above stays fully checked on every platform.
    sharded_pack = jax.shard_map(
        pack_step, mesh=mesh,
        in_specs=(spec_b2, spec_b2),
        out_specs=spec_b2,
        check_vma=(mesh_platform != "tpu"),
    )

    in_sh = (NamedSharding(mesh, P(("host", "chip"), None, None)),
             NamedSharding(mesh, spec_b))

    @jax.jit
    def step(pcm: jax.Array, frame_numbers: jax.Array) -> ShardedEncodeResult:
        assert pcm.shape[0] == B, (pcm.shape, B)
        pcm = jax.lax.with_sharding_constraint(pcm, in_sh[0])
        frame_numbers = jax.lax.with_sharding_constraint(frame_numbers, in_sh[1])
        values, nbits, nbytes, offs, mn, mx, tot, assign = sharded_search(
            pcm, frame_numbers)
        words = sharded_pack(values, nbits)
        return ShardedEncodeResult(
            words=words, nbytes=nbytes, stream_offset=offs,
            min_framesize=mn[0], max_framesize=mx[0], total_bytes=tot[0],
            assignment=assign)

    return step


def encode_frames_sharded(pcm: np.ndarray, cfg: EncoderConfig,
                          mesh: Mesh | None = None,
                          first_frame_number: int = 0) -> ShardedEncodeResult:
    """Convenience: encode [B, T, Ch] PCM with B sharded over all devices.

    B must be divisible by the device count; the stream driver handles
    padding/remainders.
    """
    if mesh is None:
        mesh = make_mesh()
    B = pcm.shape[0]
    if B % mesh.size:
        raise ValueError(f"batch {B} not divisible by mesh size {mesh.size}")
    step = build_sharded_encode_step(cfg, mesh, B // mesh.size)
    fnos = np.arange(first_frame_number, first_frame_number + B, dtype=np.int64)
    return step(jnp.asarray(pcm), jnp.asarray(fnos))


def encode_corpus_sharded(pcm, cfg: EncoderConfig, mesh: Mesh | None = None,
                          metadata: list | None = None, do_md5: bool = True,
                          frames_per_device: int = 16) -> bytes:
    """One-call multi-device encode of a whole corpus -> a complete .flac.

    `pcm` is either one [n, channels] int32 array, or a list of per-host
    ragged chunks (arbitrary, non-frame-aligned split of the corpus — the
    multi-host ingestion model of SURVEY §5.8). Ragged chunks are re-cut on
    the frame grid: SAMPLES cross shard boundaries during the re-cut, never
    codec state — FLAC frames are self-contained (reference format.h:304-331),
    so after the re-cut the frame axis is embarrassingly data-parallel.

    Per sharded step the mesh runs: the full batched frame encoder on every
    device, pmin/pmax/psum collectives for the STREAMINFO statistics
    (write_frame_'s serial tracking, stream_encoder.c:2418-2421), and the
    two-level exclusive prefix sum that places every frame in the output
    stream. The host then performs only the inherently sequential work:
    ordered byte concatenation, the final partial frame, MD5, and the
    STREAMINFO rewrite (update_metadata_, stream_encoder.c:2516).
    """
    from flac_tpu.md5 import MD5Context
    from flac_tpu.metadata import StreamInfo, VorbisComment, serialize_metadata
    from flac_tpu.version import VENDOR_STRING

    if isinstance(pcm, (list, tuple)):
        # boundary exchange: concatenating IS the warm-up-sample re-cut —
        # the samples a raw split bisected out of a frame move to the shard
        # that owns that frame, and nothing else moves
        pcm = np.concatenate([np.asarray(c) for c in pcm], axis=0)
    pcm = np.asarray(pcm, np.int32)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if mesh is None:
        mesh = make_mesh()
    cfg = cfg.resolve()
    bs, ch = cfg.blocksize, cfg.channels
    assert pcm.shape[1] == ch, (pcm.shape, ch)
    n = pcm.shape[0]
    nfull, rem = divmod(n, bs)

    step = build_sharded_encode_step(cfg, mesh, frames_per_device)
    B = frames_per_device * mesh.size
    frames = pcm[: nfull * bs].reshape(nfull, bs, ch)

    payload = bytearray()
    min_fs, max_fs = (1 << 31) - 1, 0
    for start in range(0, nfull, B):
        batch = frames[start : start + B]
        nb = batch.shape[0]
        if nb < B:  # pad AFTER the real frames; pads drop out of the stream
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], B - nb, axis=0)], axis=0)
        fnos = np.arange(start, start + B, dtype=np.int64)
        res = step(jnp.asarray(batch), jnp.asarray(fnos))
        words = np.asarray(res.words).astype(">u4")
        nbytes = np.asarray(res.nbytes)
        offs = np.asarray(res.stream_offset)
        # host-ordered write via the collective prefix-sum placement
        total_real = int(offs[nb - 1] + nbytes[nb - 1])
        chunk = bytearray(total_real)
        for i in range(nb):
            chunk[offs[i] : offs[i] + nbytes[i]] = words[i].tobytes()[: nbytes[i]]
        payload += chunk
        min_fs = min(min_fs, int(nbytes[:nb].min()))
        max_fs = max(max_fs, int(nbytes[:nb].max()))
    if rem:
        from flac_tpu.encode.frame_encoder import build_frame_encoder
        tail_enc = build_frame_encoder(cfg, blocksize=rem)
        words, total_bits, _ = tail_enc(pcm[None, nfull * bs :, :],
                                        np.asarray([nfull], np.int64))
        tail = np.asarray(words)[0].astype(">u4").tobytes()[
            : int(np.asarray(total_bits)[0]) // 8]
        payload += tail
        min_fs = min(min_fs, len(tail))
        max_fs = max(max_fs, len(tail))

    md5 = b"\x00" * 16
    if do_md5:
        ctx = MD5Context()
        ctx.accumulate(pcm, cfg.bits_per_sample)
        md5 = ctx.digest()
    si = StreamInfo(min_blocksize=bs, max_blocksize=bs,
                    min_framesize=0 if n == 0 else min_fs,
                    max_framesize=max_fs, sample_rate=cfg.sample_rate,
                    channels=ch, bits_per_sample=cfg.bits_per_sample,
                    total_samples=n, md5sum=md5)
    blocks = [si] + list(metadata or [])
    if not any(isinstance(b, VorbisComment) for b in blocks):
        blocks.insert(1, VorbisComment(vendor_string=VENDOR_STRING))
    from flac_tpu import constants as C
    return C.STREAM_SYNC_STRING + serialize_metadata(blocks) + bytes(payload)


def build_sharded_decode_step(geom, mesh: Mesh, frames_per_device: int):
    """Frame-sharded decode: `step(words[W], start_bits[B]) -> (pcm[B,T,Ch],
    end_bits[B], overflow[B])` with the frame axis sharded across every
    device and the packed word stream replicated (each frame gather-reads
    its own bit window; decode is embarrassingly frame-parallel, mirroring
    the encode side's data-parallel design). `overflow` marks frames whose
    bitstream left the batched kernel's domain — the caller re-decodes
    those on the host (same contract as the single-device path)."""
    from flac_tpu.decode.frame_decoder import build_frame_decoder

    decode = build_frame_decoder(geom)
    n_dev = mesh.size
    B = frames_per_device * n_dev

    def local_step(words, start_bits):
        # promote the replicated word stream to varying: the decoder's scan
        # carries mix words-derived values with per-shard cursors, and the
        # varying-axes checker requires consistent vma across scan carries
        words = jax.lax.pcast(words, ("host", "chip"), to="varying")
        pcm, ends, meta = decode(words, start_bits)
        return pcm, ends, meta["unary_overflow"]

    spec_b = P(("host", "chip"))
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(None), spec_b),
        out_specs=(P(("host", "chip"), None, None), spec_b, spec_b),
    )

    @jax.jit
    def step(words: jax.Array, start_bits: jax.Array):
        assert start_bits.shape[0] == B, (start_bits.shape, B)
        words = jax.lax.with_sharding_constraint(
            words, NamedSharding(mesh, P(None)))
        start_bits = jax.lax.with_sharding_constraint(
            start_bits, NamedSharding(mesh, spec_b))
        return sharded(words, start_bits)

    return step


def decode_corpus_sharded(data: bytes, mesh: Mesh | None = None,
                          frames_per_device: int = 16,
                          max_lpc_order: int = 32,
                          check_md5: bool = True) -> np.ndarray:
    """One-call multi-device decode of a whole .flac stream -> PCM.

    The decode mirror of encode_corpus_sharded: the host does only the
    inherently sequential work (metadata parse, the vectorized frame index,
    the final partial frame, MD5), and every indexed frame decodes on the
    mesh in frame-sharded batches. Strict by construction — any CRC-16
    mismatch, frame-length overrun, or MD5 failure raises (robustness
    features — concealment, resync, error callbacks — live in
    decode_bytes_device / HostDecoder, reference stream_decoder.c:2106).

    Frames the batched kernel flags as out-of-domain (pathological-but-
    legal Rice outliers) re-decode on the host, exactly like the
    single-device driver.
    """
    import jax.numpy as jnp

    from flac_tpu.decode import host_decoder as hd
    from flac_tpu.decode.frame_decoder import DecoderGeometry, bytes_to_words
    from flac_tpu.decode.stream import (StreamDecodeError, check_frame_crc16,
                                        index_frames)
    from flac_tpu.md5 import MD5Context
    from flac_tpu.metadata import StreamInfo, parse_metadata

    if mesh is None:
        mesh = make_mesh()
    data = bytes(data)
    d = np.frombuffer(data, np.uint8)
    pos = hd.skip_id3v2(data, 0)
    if data[pos:pos + 4] != b"fLaC":
        raise hd.DecodeError("missing fLaC stream marker")
    metadata, audio_offset = parse_metadata(data, pos + 4)
    si = metadata[0]
    if not isinstance(si, StreamInfo):
        raise hd.DecodeError("first metadata block is not STREAMINFO")
    if si.min_blocksize != si.max_blocksize:
        raise StreamDecodeError(
            "variable-blocksize stream: use decode_bytes_device")
    offsets = index_frames(d, audio_offset, si)
    if offsets is None:
        raise StreamDecodeError("ambiguous frame index: use decode_bytes_device")
    geom = DecoderGeometry(blocksize=si.min_blocksize, channels=si.channels,
                           bits_per_sample=si.bits_per_sample,
                           sample_rate=si.sample_rate,
                           max_lpc_order=max_lpc_order)
    step = build_sharded_decode_step(geom, mesh, frames_per_device)
    B = frames_per_device * mesh.size
    jwords = jnp.asarray(bytes_to_words(d, bucket=True))
    nfr = len(offsets)
    # queue every batch before fetching any (compute/D2H overlap)
    queued = []
    for s in range(0, nfr, B):
        batch_off = offsets[s:s + B]
        nb = len(batch_off)
        if nb < B:
            batch_off = np.concatenate(
                [batch_off, np.repeat(batch_off[-1:], B - nb)])
        queued.append((s, nb, batch_off,
                       step(jwords, jnp.asarray(batch_off * 8))))
    host = None
    pcm_parts = []
    ends_all = np.zeros(nfr, np.int64)
    for s, nb, batch_off, (pcm, ends, ovf) in queued:
        pcm = np.asarray(pcm)[:nb].astype(np.int32, copy=False)
        ends_np = np.asarray(ends)[:nb] // 8
        ovf_np = np.asarray(ovf)[:nb]
        if ovf_np.any() and not pcm.flags.writeable:
            pcm = pcm.copy()  # device view is read-only for bps > 16
        for i in np.flatnonzero(ovf_np):
            if host is None:
                host = hd.HostDecoder(data, check_md5=False)
            fpcm, fi = host.decode_frame_at(int(batch_off[i]))
            pcm[i] = fpcm.reshape(pcm[i].shape)
            ends_np[i] = fi.offset + fi.size
        ends_all[s:s + nb] = ends_np
        pcm_parts.append(pcm.reshape(-1, si.channels))
    pcm = (np.concatenate(pcm_parts, axis=0) if pcm_parts
           else np.zeros((0, si.channels), np.int32))
    if nfr:
        if np.any(ends_all[:-1] > offsets[1:]) or ends_all[-1] > len(d):
            raise StreamDecodeError("frame length overrun — corrupt stream?")
        bad = check_frame_crc16(data, d, offsets, ends_all)
        if len(bad):
            raise hd.DecodeError(
                f"frame CRC-16 mismatch in frame(s) {bad[:5].tolist()}")
    # the final partial frame (not in the index) decodes on the host
    tail_start = int(ends_all[-1]) if nfr else audio_offset
    if tail_start < len(d) - 2:
        host = hd.HostDecoder(data, check_md5=False)
        try:
            tail_pcm, _fi = host.decode_frame_at(tail_start)
            pcm = np.concatenate([pcm, tail_pcm], axis=0)
        except (hd.DecodeError, EOFError):
            pass  # trailing garbage/padding
    if si.total_samples and len(pcm) > si.total_samples:
        pcm = pcm[: si.total_samples]
    if check_md5 and si.md5sum != b"\x00" * 16:
        md5 = MD5Context()
        md5.accumulate(pcm, si.bits_per_sample)
        if md5.digest() != si.md5sum:
            raise hd.DecodeError("MD5 signature mismatch")
    return pcm
