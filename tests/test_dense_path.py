"""The dense (device-compacted) stream path used on TPU: StreamEncoder's
_emit_dense must produce byte-identical output to the regular path, with
working seektable fill-in and verify mode."""

import io

import numpy as np

from tests.conftest import make_signal

from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.encode.encoder import StreamEncoder
from flac_tpu.encode.frame_encoder import EncoderConfig, build_frame_encoder_dense


def _encode(sig, dense: bool, seekpoints=None, verify=False) -> bytes:
    cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                   sample_rate=44100, blocksize=1024)
    out = io.BytesIO()
    enc = StreamEncoder(cfg, out, batch_frames=4, seekpoints=seekpoints,
                        total_samples_estimate=len(sig), verify=verify)
    if dense:  # force the TPU-only path on CPU (XLA pack under the hood)
        enc._dense = True
        enc._encode = build_frame_encoder_dense(cfg)
    enc.process(sig)
    enc.finish()
    return out.getvalue()


class TestCompaction:
    def test_random_frame_sizes_vs_numpy_concat(self):
        """compact_stream_bytes == numpy byte concat for random frame byte
        counts covering every start phase (mod 4), tiny frames, and
        full-buffer frames."""
        import jax.numpy as jnp

        from flac_tpu.encode.packer import compact_stream_bytes

        rng = np.random.default_rng(123)
        B, W = 37, 24
        for trial in range(4):
            nbytes = rng.integers(11, 4 * W + 1, B)
            if trial == 2:
                nbytes[::5] = 11          # lots of tiny frames
            if trial == 3:
                nbytes[:] = 4 * W         # full frames, phase 0 everywhere
            words = np.zeros((B, W), np.uint32)
            payloads = []
            for i, n in enumerate(nbytes):
                raw = rng.integers(0, 256, n, dtype=np.uint8)
                payloads.append(raw.tobytes())
                padded = np.zeros(4 * W, np.uint8)
                padded[:n] = raw
                words[i] = padded.view(">u4").astype(np.uint32)
            expect = b"".join(payloads)
            stream, total = compact_stream_bytes(
                jnp.asarray(words.astype(np.int32)),
                jnp.asarray((nbytes * 8).astype(np.int32)))
            assert int(total) == len(expect)
            got = np.asarray(stream)[: int(total)].tobytes()
            # the hot path: device word stream + host-side serialization
            from flac_tpu.encode.packer import (compact_stream_words,
                                                stream_words_to_bytes)
            wstream, wtotal = compact_stream_words(
                jnp.asarray(words.astype(np.int32)),
                jnp.asarray((nbytes * 8).astype(np.int32)))
            assert int(wtotal) == len(expect)
            assert stream_words_to_bytes(np.asarray(wstream),
                                         int(wtotal)).tobytes() == expect
            assert got == expect, f"trial {trial}"


class TestDensePath:
    def test_byte_identical_to_regular(self):
        sig = make_signal(1024 * 9 + 321, 2, 16, kind="quiet", seed=77)
        a = _encode(sig, dense=False, seekpoints=[0, 2048, 5000])
        b = _encode(sig, dense=True, seekpoints=[0, 2048, 5000])
        assert a == b

    def test_roundtrip_and_verify_mode(self):
        sig = make_signal(1024 * 5 + 11, 2, 16, kind="sine", seed=78)
        data = _encode(sig, dense=True, verify=True)
        pcm, si, _ = decode_bytes(data)
        np.testing.assert_array_equal(pcm, sig)
