"""Tests for the batched device decoder and stream indexer."""

import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal

from flac_tpu.containers.wav import AudioBuffer, write_wav
from flac_tpu.decode.stream import decode_bytes_device, index_frames
from flac_tpu.encode.encoder import encode_file
from flac_tpu.metadata import parse_metadata


def _encode(tmp_path, sig, bps, level, rate=44100, **kw):
    path = tmp_path / "t.flac"
    encode_file(sig, rate, bps, str(path), level=level, batch_frames=8, **kw)
    return path.read_bytes()


class TestIterBlocks:
    """The bounded-memory streaming core (StreamDecoder.iter_blocks)."""

    def test_blocks_equal_decode_all(self, tmp_path):
        from flac_tpu.decode.stream import StreamDecoder
        sig = make_signal(4096 * 9 + 1501, 2, 16, kind="quiet", seed=4)
        data = _encode(tmp_path, sig, 16, 5)
        blocks = []
        dec = StreamDecoder(data, batch_frames=4)
        for b in dec.iter_blocks():
            blocks.append(b)
        assert len(blocks) > 1, "multi-batch stream must stream as blocks"
        np.testing.assert_array_equal(np.concatenate(blocks), sig)
        assert dec.decode_info["path"] == "device"
        pcm, info = StreamDecoder(data, batch_frames=4).decode_all()
        np.testing.assert_array_equal(pcm, np.concatenate(blocks))
        assert info["frames"] == dec.decode_info["frames"]

    def test_md5_verdict_raised_at_exhaustion(self, tmp_path):
        from flac_tpu.decode import host_decoder as hd
        from flac_tpu.decode.stream import StreamDecoder
        sig = make_signal(4096 * 2, 2, 16, seed=5)
        data = bytearray(_encode(tmp_path, sig, 16, 2))
        data[26] ^= 0xFF  # corrupt a STREAMINFO md5 byte (offset 4+4+18)
        got = 0
        with pytest.raises(hd.DecodeError, match="MD5"):
            for b in StreamDecoder(bytes(data)).iter_blocks():
                got += len(b)
        assert got == len(sig), "all PCM is delivered before the MD5 verdict"

    def test_strict_only(self, tmp_path):
        from flac_tpu.decode.stream import StreamDecoder
        data = _encode(tmp_path, make_signal(4096, 1, 16), 16, 1)
        dec = StreamDecoder(data, continue_on_error=True)
        with pytest.raises(ValueError):
            next(dec.iter_blocks())


class TestDeviceDecode:
    @pytest.mark.parametrize("level", [0, 5])
    def test_roundtrip_stereo(self, tmp_path, level):
        sig = make_signal(4096 * 4 + 321, 2, 16, kind="sine")
        data = _encode(tmp_path, sig, 16, level)
        pcm, si, info = decode_bytes_device(data, batch_frames=8, max_lpc_order=12)
        assert info["path"] == "device"
        np.testing.assert_array_equal(pcm, sig)

    def test_roundtrip_special(self, tmp_path):
        for kind in ("noise", "constant", "wasted"):
            sig = make_signal(4096 * 2, 2, 16, kind=kind, seed=21)
            data = _encode(tmp_path, sig, 16, 5)
            pcm, si, info = decode_bytes_device(data, batch_frames=8, max_lpc_order=12)
            np.testing.assert_array_equal(pcm, sig)

    def test_oracle_files(self, oracle, tmp_path):
        sig = make_signal(4096 * 3 + 11, 2, 16, kind="sine")
        wav = tmp_path / "o.wav"
        write_wav(str(wav), AudioBuffer(samples=sig, sample_rate=44100, bits_per_sample=16))
        for level in (0, 8):
            path = tmp_path / "o.flac"
            subprocess.run([str(oracle), f"-{level}", "-f", "-o", str(path), str(wav)],
                           capture_output=True, check=True)
            pcm, si, info = decode_bytes_device(path.read_bytes(), batch_frames=8,
                                                max_lpc_order=12)
            assert info["path"] == "device"
            np.testing.assert_array_equal(pcm, sig)

    def test_24bit_outlier_reroute_writes_batch(self, tmp_path):
        """Rice outliers (near-silent partitions with full-scale spikes)
        overflow the batched kernel's unary/fold guards and reroute those
        frames to the host, which writes into the device batch. For
        bps > 16 the device output is int32 and np.asarray gives a
        READ-ONLY view — regression: 'assignment destination is read-only'
        (found by tools/fuzz_campaign.py case 4/seed 46)."""
        rng = np.random.default_rng(3)
        amp = (1 << 23) - 1
        x = rng.integers(-3, 4, (4096 * 3, 2)).astype(np.int32)
        idx = rng.integers(0, len(x), 40)
        x[idx] = rng.integers(-amp - 1, amp + 1, (40, 2)).astype(np.int32)
        data = _encode(tmp_path, x, 24, 5)
        pcm, si, info = decode_bytes_device(data, batch_frames=8,
                                            max_lpc_order=12)
        np.testing.assert_array_equal(pcm, x)

    def test_verify_mode(self, tmp_path):
        sig = make_signal(4096 * 2 + 5, 2, 16, kind="sine")
        _encode(tmp_path, sig, 16, 5, verify=True)  # raises VerifyError on mismatch

    def test_corrupt_frame_crc_detected(self, tmp_path):
        sig = make_signal(4096 * 3, 2, 16)
        data = bytearray(_encode(tmp_path, sig, 16, 2))
        data[len(data) - 1000] ^= 0x08
        from flac_tpu.decode.host_decoder import DecodeError
        with pytest.raises(DecodeError):
            decode_bytes_device(bytes(data), batch_frames=8, max_lpc_order=12)


class TestNarrowScan:
    """The int32-limb residual scan (frame_decoder._narrow_residual_scan)
    must match the wide scan bit-for-bit on its domain, and flag-and-reroute
    (ovf) outside it — never produce wrong samples."""

    def _decode_both(self, data, bps, maxord=12):
        import jax.numpy as jnp

        from flac_tpu.decode.frame_decoder import (DecoderGeometry,
                                                   build_frame_decoder,
                                                   bytes_to_words)
        d = np.frombuffer(data, np.uint8)
        blocks, ao = parse_metadata(data)
        offs = index_frames(d, ao, blocks[0])
        words = jnp.asarray(bytes_to_words(d))
        starts = jnp.asarray(offs * 8)
        outs = []
        for impl in ("wide", "narrow"):
            g = DecoderGeometry(blocksize=blocks[0].min_blocksize, channels=2,
                                bits_per_sample=bps, sample_rate=44100,
                                max_lpc_order=maxord, scan_impl=impl)
            pcm, ends, meta = build_frame_decoder(g)(words, starts)
            outs.append((np.asarray(pcm), np.asarray(ends),
                         np.asarray(meta["unary_overflow"])))
        return outs

    def test_matches_wide_16bit(self, tmp_path):
        # one geometry pair, several signal kinds through it (compile economy)
        for kind, level in [("quiet", 5), ("noise", 5), ("wasted", 5),
                            ("sine", 5)]:
            sig = make_signal(1024 * 8, 2, 16, kind=kind, seed=13)
            data = _encode(tmp_path, sig, 16, level, blocksize=1024)
            (pw, ew, ow), (pn, en, on) = self._decode_both(data, 16)
            assert not ow.any() and not on.any(), kind
            np.testing.assert_array_equal(pw, pn)
            np.testing.assert_array_equal(ew, en)
            np.testing.assert_array_equal(
                pn.reshape(-1, 2).astype(np.int32), sig)

    def test_matches_wide_24bit_rice2(self, tmp_path):
        # 24-bit noise drives RICE2 (method 1) with k ~ 20-22
        sig = make_signal(1024 * 4, 2, 24, kind="noise", seed=14)
        data = _encode(tmp_path, sig, 24, 8, blocksize=1024)
        (pw, ew, ow), (pn, en, on) = self._decode_both(data, 24)
        assert not ow.any() and not on.any()
        np.testing.assert_array_equal(pw, pn)
        np.testing.assert_array_equal(ew, en)

    @staticmethod
    def _scan_bits(bits: str, T: int):
        import jax.numpy as jnp

        from flac_tpu.decode.frame_decoder import _narrow_residual_scan
        bits += "0" * ((-len(bits)) % 32)
        words = np.array([int(bits[i:i + 32], 2) for i in range(0, len(bits), 32)],
                         dtype=np.uint64).astype(np.uint32).view(np.int32)
        words = np.concatenate([words, np.zeros(16, np.int32)])
        B = 1
        mk = lambda v: jnp.full((B,), v, jnp.int64)
        tr = jnp.full((B,), True)
        fl = jnp.full((B,), False)
        res, pos, ovf = _narrow_residual_scan(
            jnp.asarray(words), mk(0), T, tr, fl,
            mk(16), mk(0), mk(5), mk(31), mk(T))
        return (np.asarray(res)[0], int(np.asarray(pos)[0]),
                bool(np.asarray(ovf)[0]))

    def test_fold_guard(self):
        """A legal RICE2 k=26 partition: q*2^k >= 2^30 must raise ovf
        (host reroute), never emit a wrong sample; q within the guard must
        decode exactly."""
        T = 8
        k26 = format(26, "05b")
        tail = ("1" + "0" * 26) * (T - 1)     # q=0, lsb=0 codewords
        # outlier: q=47 (passes the z>=48 unary guard, 47*2^26 >= 2^30)
        lsb = format(0x155AA55 & ((1 << 26) - 1), "026b")
        _, _, ovf = self._scan_bits(k26 + "0" * 47 + "1" + lsb + tail, T)
        assert ovf
        # in-domain: q=15 == 2^(30-26)-1, folded fits int32 -> exact decode
        res, pos, ovf = self._scan_bits(
            k26 + "0" * 15 + "1" + format(123, "026b") + tail, T)
        assert not ovf
        folded = (15 << 26) | 123
        assert res[0] == ((folded >> 1) ^ -(folded & 1))
        assert (res[1:] == 0).all()
        assert pos == 5 + (15 + 1 + 26) + (T - 1) * 27


class TestVariableBlocksize:
    """Foreign variable-blocksize streams (blocking_strategy=1) decode on
    the device by grouping frames per blocksize; oddball blocksizes and
    ambiguous indexes fall back to the host (stream_decoder.c:2197-2240)."""

    def test_grouped_device_decode(self):
        from tests.test_ogg import _make_variable_blocksize_flac

        from flac_tpu.decode.stream import index_frames_variable
        bss = [64] * 10 + [160] * 8 + [96, 23] + [64] * 5
        data, _, pcm = _make_variable_blocksize_flac(bss)
        d = np.frombuffer(data, np.uint8)
        blocks, ao = parse_metadata(data)
        idx = index_frames_variable(d, ao, blocks[0])
        assert idx is not None and len(idx[0]) == len(bss)
        np.testing.assert_array_equal(idx[1], bss)  # parsed blocksizes
        out, si, info = decode_bytes_device(data, batch_frames=8)
        assert info["path"] == "device-variable"
        np.testing.assert_array_equal(out.reshape(-1), pcm)

    def test_crc_mismatch_raises(self):
        from tests.test_ogg import _make_variable_blocksize_flac
        # distinct blocksizes so STREAMINFO min != max (the variable path)
        data, _, _ = _make_variable_blocksize_flac([64] * 8 + [160] * 8)
        data = bytearray(data)
        data[-40] ^= 0x20  # inside the last frame's body
        from flac_tpu.decode.host_decoder import DecodeError
        from flac_tpu.decode.stream import StreamDecodeError
        with pytest.raises((DecodeError, StreamDecodeError)):
            decode_bytes_device(bytes(data), batch_frames=8)


class TestIndexer:
    def test_index_matches_frame_count(self, tmp_path):
        sig = make_signal(4096 * 5 + 100, 1, 16)
        data = _encode(tmp_path, sig, 16, 1)
        d = np.frombuffer(data, np.uint8)
        blocks, off = parse_metadata(data)
        bs = blocks[0].min_blocksize
        offsets = index_frames(d, off, blocks[0])
        assert offsets is not None
        assert len(offsets) == len(sig) // bs  # partial tail excluded
        assert offsets[0] == off
