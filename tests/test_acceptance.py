"""BASELINE.json acceptance-gate configs, one test per listed config:

1. 16-bit/44.1k mono `-0` via CLI (fixed predictors, no mid-side)
2. 16-bit/44.1k stereo `-5` (LPC 8, mid-side search, Rice partitions)
3. 24-bit/96k stereo `-8` (LPC 12, exhaustive search)
4. Ogg FLAC with seektable + metadata round-trip
5. Multi-"host" sharded corpus over the ('host','chip') mesh with
   sample-boundary alignment (SURVEY §5.7: samples, not codec state, cross
   shard boundaries)

Each lossless gate is judged against the reference binary where it applies.
"""

import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import cpu_devices, make_signal, oracle_path

from flac_tpu.cli.flac import main as flac_main
from flac_tpu.containers import AudioBuffer, read_wav, write_wav
from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.decode.stream import decode_bytes_device


def _oracle_gate(path, sig):
    oracle = oracle_path()
    if oracle is None:
        return
    assert subprocess.run([str(oracle), "-t", str(path)],
                          capture_output=True).returncode == 0
    out = str(path) + ".wav"
    assert subprocess.run([str(oracle), "-d", "-f", "-o", out, str(path)],
                          capture_output=True).returncode == 0
    np.testing.assert_array_equal(read_wav(out).samples, sig)


class TestAcceptanceConfigs:
    def test_config1_mono16_level0_cli(self, tmp_path):
        sig = make_signal(44100 // 2, 1, 16, kind="sine", seed=1)
        wav = tmp_path / "c1.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100,
                                        bits_per_sample=16))
        out = tmp_path / "c1.flac"
        assert flac_main(["--totally-silent", "-0", "-f",
                          "-o", str(out), str(wav)]) == 0
        pcm, si, frames = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        from flac_tpu import constants as C
        assert all(sf.type != C.SUBFRAME_TYPE_LPC
                   for fr in frames for sf in fr.subframes)
        _oracle_gate(out, sig)

    def test_config2_stereo16_level5(self, tmp_path):
        sig = make_signal(4096 * 4 + 777, 2, 16, kind="quiet", seed=2)
        out = tmp_path / "c2.flac"
        from flac_tpu.encode.encoder import encode_file
        encode_file(sig, 44100, 16, str(out), level=5)
        pcm, _, info = decode_bytes_device(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        _oracle_gate(out, sig)

    def test_config3_hires24_level8(self, tmp_path):
        sig = make_signal(4096 * 2 + 33, 2, 24, kind="quiet", seed=3)
        out = tmp_path / "c3.flac"
        from flac_tpu.encode.encoder import encode_file
        encode_file(sig, 96000, 24, str(out), level=8)
        pcm, _, _ = decode_bytes(out.read_bytes())
        np.testing.assert_array_equal(pcm, sig)
        _oracle_gate(out, sig)

    def test_config4_ogg_seektable_metadata(self, tmp_path):
        from flac_tpu.metadata import SeekTable, VorbisComment, parse_metadata
        from flac_tpu.ogg import decode_ogg_flac, encode_ogg_flac
        from flac_tpu.grabbag import seektable_from_specification
        sig = make_signal(4096 * 3 + 99, 2, 16, kind="sine", seed=4)
        points, _ = seektable_from_specification("4x", len(sig), 44100)
        ogg = encode_ogg_flac(sig, 44100, 16, level=5,
                              metadata=[SeekTable(points=points),
                                        VorbisComment(vendor_string="v",
                                                      comments=["TITLE=gate4"])])
        pcm, si, blocks = decode_ogg_flac(ogg)
        np.testing.assert_array_equal(pcm, sig)
        st = next(b for b in blocks if isinstance(b, SeekTable))
        assert len(st.points) == 4
        vc = next(b for b in blocks if isinstance(b, VorbisComment))
        assert "TITLE=gate4" in vc.comments

    def test_config5_sharded_corpus_boundary_alignment(self, tmp_path):
        """Long PCM split at arbitrary byte positions across 'hosts': shards
        are re-cut to frame boundaries (samples exchanged, not codec state),
        encoded frame-parallel on the mesh, concatenated in frame order, and
        the result decodes bit-exactly with correct global STREAMINFO."""
        devs = cpu_devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from flac_tpu.encode.frame_encoder import EncoderConfig
        from flac_tpu.parallel.sharding import build_sharded_encode_step, make_mesh
        BS = 256
        n_hosts = 2
        corpus = make_signal(BS * 32, 2, 16, kind="quiet", seed=5)
        # arbitrary (non-frame-aligned) raw split: host 0 gets a ragged chunk
        ragged = BS * 13 + 100
        host_chunks = [corpus[:ragged], corpus[ragged:]]
        # boundary warm-up exchange: host 1 needs the tail samples of host 0's
        # chunk to complete the frame the split bisected — re-cut on frame grid
        aligned0 = corpus[: (ragged // BS) * BS]
        aligned1 = corpus[(ragged // BS) * BS :]
        assert len(host_chunks[0]) - len(aligned0) == 100  # samples moved, not state
        frames = np.concatenate([aligned0, aligned1]).reshape(-1, BS, 2)
        mesh = make_mesh(devs[:8], n_hosts=n_hosts)
        cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                       sample_rate=44100, blocksize=BS)
        step = build_sharded_encode_step(cfg, mesh, frames.shape[0] // mesh.size)
        res = step(jnp.asarray(frames),
                   jnp.asarray(np.arange(frames.shape[0], dtype=np.int64)))
        words = np.asarray(res.words).astype(">u4")
        nbytes = np.asarray(res.nbytes)
        offs = np.asarray(res.stream_offset)
        # host-ordered concatenation via the collective prefix sum
        payload = bytearray(int(res.total_bytes))
        for i in range(frames.shape[0]):
            payload[offs[i] : offs[i] + nbytes[i]] = \
                words[i].tobytes()[: nbytes[i]]
        # wrap with a STREAMINFO built from the collective stats
        from flac_tpu.md5 import md5_of_pcm
        from flac_tpu.metadata import StreamInfo, serialize_metadata
        si = StreamInfo(min_blocksize=BS, max_blocksize=BS,
                        min_framesize=int(res.min_framesize),
                        max_framesize=int(res.max_framesize),
                        sample_rate=44100, channels=2, bits_per_sample=16,
                        total_samples=corpus.shape[0],
                        md5sum=md5_of_pcm(corpus, 16))
        stream = b"fLaC" + serialize_metadata([si]) + bytes(payload)
        pcm, si2, _ = decode_bytes(stream)  # CRC + MD5 checked
        np.testing.assert_array_equal(pcm, corpus)
        _oracle_gate_bytes(tmp_path, stream, corpus)


    def test_config5b_encode_corpus_sharded_api(self, tmp_path):
        """The one-call corpus API (parallel.encode_corpus_sharded): ragged
        multi-host chunks in, complete .flac out — boundary re-cut, collective
        stats, prefix-sum placement, host-ordered write, tail frame, MD5 —
        oracle-gated (SURVEY §5.8, stream_encoder.c:2418-2470)."""
        devs = cpu_devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from flac_tpu.encode.frame_encoder import EncoderConfig
        from flac_tpu.parallel.sharding import encode_corpus_sharded, make_mesh
        BS = 256
        corpus = make_signal(BS * 50 + 123, 2, 16, kind="quiet", seed=6)
        ragged = BS * 17 + 201                      # non-frame-aligned split
        chunks = [corpus[:ragged], corpus[ragged:]]
        mesh = make_mesh(devs[:8], n_hosts=2)
        cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                       sample_rate=44100, blocksize=BS)
        stream = encode_corpus_sharded(chunks, cfg, mesh, frames_per_device=4)
        pcm, si, _ = decode_bytes(stream)           # CRC + MD5 checked
        np.testing.assert_array_equal(pcm, corpus)
        assert si.total_samples == corpus.shape[0]
        _oracle_gate_bytes(tmp_path, stream, corpus)


def _oracle_gate_bytes(tmp_path, stream: bytes, sig):
    oracle = oracle_path()
    if oracle is None:
        return
    p = tmp_path / "sharded.flac"
    p.write_bytes(stream)
    assert subprocess.run([str(oracle), "-t", str(p)],
                          capture_output=True).returncode == 0
    out = tmp_path / "sharded.wav"
    assert subprocess.run([str(oracle), "-d", "-f", "-o", str(out), str(p)],
                          capture_output=True).returncode == 0
    np.testing.assert_array_equal(read_wav(str(out)).samples, sig)
