"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4's
single-host multi-device simulation): frame-sharded encode with collective
STREAMINFO stats and two-level length prefix sum; frame-sharded decode with a
replicated word stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import cpu_devices, make_signal

from flac_tpu.decode.frame_decoder import DecoderGeometry, bytes_to_words
from flac_tpu.decode.stream import index_frames
from flac_tpu.encode.encoder import encode_file
from flac_tpu.encode.frame_encoder import EncoderConfig
from flac_tpu.metadata import parse_metadata
from flac_tpu.parallel.sharding import (
    build_sharded_decode_step,
    build_sharded_encode_step,
    make_mesh,
)


BS = 256


@pytest.fixture(scope="module")
def mesh():
    devs = cpu_devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(devs[:8])


class TestShardedEncode:
    def test_matches_single_device(self, mesh):
        cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                       sample_rate=44100, blocksize=BS)
        B = 16
        sig = make_signal(BS * B, 2, 16, kind="quiet", seed=50)
        pcm = sig.reshape(B, BS, 2)
        fnos = np.arange(B, dtype=np.int64)
        step = build_sharded_encode_step(cfg, mesh, B // mesh.size)
        res = step(jnp.asarray(pcm), jnp.asarray(fnos))
        nbytes = np.asarray(res.nbytes)
        offs = np.asarray(res.stream_offset)
        assert np.array_equal(offs, np.cumsum(nbytes) - nbytes)
        assert int(res.total_bytes) == nbytes.sum()
        assert int(res.min_framesize) == nbytes.min()
        assert int(res.max_framesize) == nbytes.max()
        # byte-identical to the unsharded encoder
        from flac_tpu.encode.frame_encoder import build_frame_encoder
        words1, bits1, _ = build_frame_encoder(cfg)(pcm, fnos)
        np.testing.assert_array_equal(np.asarray(res.words), np.asarray(words1))


class TestShardedDecode:
    def test_roundtrip(self, mesh, tmp_path):
        B = 16
        sig = make_signal(BS * B, 2, 16, kind="quiet", seed=51)
        p = tmp_path / "s.flac"
        encode_file(sig, 44100, 16, str(p), level=5, blocksize=BS)
        data = p.read_bytes()
        blocks, audio_off = parse_metadata(data, 4)
        offs = index_frames(np.frombuffer(data, np.uint8), audio_off, blocks[0])
        assert offs is not None and len(offs) == B
        geom = DecoderGeometry(blocksize=BS, channels=2, bits_per_sample=16,
                               sample_rate=44100, max_lpc_order=32)
        step = build_sharded_decode_step(geom, mesh, B // mesh.size)
        pcm, ends, ovf = step(jnp.asarray(bytes_to_words(data)),
                              jnp.asarray(offs * 8))
        assert not np.asarray(ovf).any()
        np.testing.assert_array_equal(np.asarray(pcm).reshape(-1, 2), sig)

    def test_decode_corpus_sharded(self, mesh, tmp_path):
        """One-call mesh decode: partial tail frame, MD5 verdict, CRC gate."""
        from flac_tpu.parallel.sharding import decode_corpus_sharded

        sig = make_signal(BS * 16 + 77, 2, 16, kind="quiet", seed=52)
        p = tmp_path / "c.flac"
        encode_file(sig, 44100, 16, str(p), level=5, blocksize=BS)
        pcm = decode_corpus_sharded(p.read_bytes(), mesh, frames_per_device=2)
        np.testing.assert_array_equal(pcm, sig)
        # strictness: a flipped bit in some frame body must raise
        data = bytearray(p.read_bytes())
        data[len(data) - 600] ^= 0x10
        from flac_tpu.decode.host_decoder import DecodeError
        from flac_tpu.decode.stream import StreamDecodeError
        with pytest.raises((DecodeError, StreamDecodeError)):
            decode_corpus_sharded(bytes(data), mesh, frames_per_device=2)


class TestCollectiveAudit:
    """The scaling-efficiency argument (BASELINE.json: >=80% from 1 chip to
    N>=2 hosts) rests on per-step collective volume being O(mesh) bytes,
    independent of batch and blocksize. Pin that property in the compiled
    HLO the mesh actually runs (tools/collective_audit.py)."""

    def test_encode_collectives_are_bounded(self, mesh):
        from tools.collective_audit import audit_encode_step

        colls, _flops = audit_encode_step(mesh, frames_per_device=2,
                                          blocksize=BS)
        total = sum(c["bytes"] for c in colls)
        # 3 scalar reductions + the two-level prefix-sum gather (+ whatever
        # small fusions XLA makes of them): a generous budget is mesh-size
        # KB-scale; the real payload is ~hundreds of bytes
        assert colls, "expected STREAMINFO/prefix-sum collectives"
        assert total <= 64 * mesh.size * 8, (total, colls)
        assert len(colls) <= 12, colls

    def test_encode_collectives_do_not_grow_with_batch(self, mesh):
        from tools.collective_audit import audit_encode_step

        small, _ = audit_encode_step(mesh, frames_per_device=2, blocksize=BS)
        big, _ = audit_encode_step(mesh, frames_per_device=8, blocksize=BS)
        # 4x the frames per device must not change a single payload size
        assert sorted(c["bytes"] for c in small) == \
               sorted(c["bytes"] for c in big)

    def test_decode_has_no_collectives(self, mesh):
        from tools.collective_audit import audit_decode_step

        colls = audit_decode_step(mesh, frames_per_device=2, blocksize=BS)
        assert colls == [], colls


@pytest.mark.slow
class TestCrossProcess:
    """The process-boundary version of the multi-device evidence: the same
    sharded steps driven from 2 jax.distributed CPU processes (Gloo across
    the boundary) must be byte-identical to the single-process mesh.
    tools/multihost_dryrun.py owns the launch/compare; a green run is also
    recorded in PROGRESS.jsonl."""

    def test_two_process_world_matches_single_process(self):
        import subprocess
        import sys
        from pathlib import Path

        tool = Path(__file__).resolve().parent.parent / "tools" / "multihost_dryrun.py"
        r = subprocess.run(
            [sys.executable, str(tool), "--nprocs", "2", "--devices-per-proc", "4"],
            capture_output=True, text=True, timeout=1500)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "PASS" in r.stdout
