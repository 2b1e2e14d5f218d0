"""Real-chip acceptance sweep: encode on the TPU, verify with the oracle.

The test suite is CPU-only by design (conftest pins CPU; the TPU tunnel
is unreliable mid-suite), so chip-side correctness evidence otherwise
comes only from bench.py's two geometries. This sweep runs a matrix of
(level, channels, bps, rate) encodes ON THE CHIP, checks every stream
with the reference binary (`flac -t` + bit-exact decode compare) when it
is present, and round-trips two geometries through the BATCHED DEVICE
decoder on the chip as well.

Small blocksize (1024) keeps the per-geometry XLA compile short; the
persistent cache (flac_tpu.jaxcache) makes reruns cheap.

Usage: python tools/tpu_acceptance.py     (run under nohup; one TPU
client at a time — see docs/perf.md's tunnel notes)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1024
B = 16
ORACLE = "/tmp/flacoracle/flac"

# (level, channels, bps, rate, extra overrides)
CASES = [
    (2, 2, 16, 44100, {}),
    (5, 1, 16, 48000, {}),
    (5, 2, 8, 44100, {}),
    (8, 2, 16, 44100, {}),
    (8, 2, 24, 96000, {}),            # wide datapath (int32 two-limb)
    (5, 2, 16, 44100, {"do_escape_coding": True}),
]
DEVICE_DECODE = {(5, 1, 16, 48000), (8, 2, 24, 96000)}


def make_pcm(rng, n, ch, bps):
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n, dtype=np.float64)
    base = 0.6 * np.sin(2 * np.pi * 331.0 * t / 44100)
    cols = [np.clip(np.round(base * amp * (0.9 - 0.2 * c))
                    + rng.integers(-max(amp // 256, 2), max(amp // 256, 2), n),
                    -amp - 1, amp).astype(np.int32) for c in range(ch)]
    return np.stack(cols, axis=-1)


def main() -> int:
    import jax

    from flac_tpu.containers import AudioBuffer, read_wav, write_wav
    from flac_tpu.decode.host_decoder import decode_bytes
    from flac_tpu.decode.stream import decode_bytes_device
    from flac_tpu.encode.encoder import encode_file
    from flac_tpu.jaxcache import enable as enable_cache

    enable_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)
    if dev.platform != "tpu":
        print("WARNING: no TPU — sweep still runs but proves nothing new",
              flush=True)
    have_oracle = os.path.exists(ORACLE)
    rng = np.random.default_rng(31)
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        for level, ch, bps, rate, over in CASES:
            tag = f"-{level} {ch}ch {bps}bit/{rate}" + \
                (" " + ",".join(over) if over else "")
            sig = make_pcm(rng, B * T + 333, ch, bps)
            path = os.path.join(td, "a.flac")
            try:
                encode_file(sig, rate, bps, path, level=level, blocksize=T,
                            batch_frames=B, **over)
                data = open(path, "rb").read()
                pcm, _si, _frames = decode_bytes(data)  # host CRC+MD5 check
                assert np.array_equal(pcm, sig), "host decode mismatch"
                if (level, ch, bps, rate) in DEVICE_DECODE and not over:
                    dpcm, _si2, _info = decode_bytes_device(data)
                    assert np.array_equal(dpcm, sig), "device decode mismatch"
                if have_oracle:
                    r = subprocess.run([ORACLE, "-t", path],
                                       capture_output=True)
                    assert r.returncode == 0, f"oracle -t: {r.stderr[-200:]}"
                    wav = os.path.join(td, "a.wav")
                    r = subprocess.run([ORACLE, "-d", "-f", "-o", wav, path],
                                       capture_output=True)
                    assert r.returncode == 0, f"oracle -d: {r.stderr[-200:]}"
                    assert np.array_equal(read_wav(wav).samples, sig), \
                        "oracle decode mismatch"
                print(f"OK   {tag}: {len(data)} bytes"
                      + (" +device-decode" if (level, ch, bps, rate)
                         in DEVICE_DECODE and not over else "")
                      + (" +oracle" if have_oracle else ""), flush=True)
            except Exception as e:  # keep sweeping; report at the end
                failures += 1
                print(f"FAIL {tag}: {e}", flush=True)
    print(f"sweep done: {len(CASES)} cases, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
