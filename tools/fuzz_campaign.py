"""Randomized differential campaign against the reference binary.

The repeatable form of the ad-hoc campaigns logged in docs/perf.md (117
option/signal cases, then 200 device-path cases, 0 failures): every case
draws a random signal and a random encoder configuration, then checks

  encode:  our stream passes oracle `flac -t` (CRC + MD5) and oracle
           `flac -d` PCM is bit-exact vs the input;
  decode:  an oracle-encoded stream decodes bit-exactly through the
           batched device decoder (decode_bytes_device);
  seek:    random decode_range() reads on our stream PCM-match the input.

Usage:
  python tools/fuzz_campaign.py --cases 50 --seed 1 [--mode all]
  FLAC_TPU_SCAN=narrow python tools/fuzz_campaign.py ...   # pin a scan impl

Exit code 0 = all cases passed. Requires /tmp/flacoracle (built by
tools/build_reference_oracle.sh). Runs on CPU by default (pins the JAX
default device) so it can't hang on the TPU tunnel.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pin_cpu() -> None:
    try:
        from jax._src import xla_bridge as _xb

        if "axon" in getattr(_xb, "_backend_factories", {}) and not _xb._backends:
            _xb._backend_factories.pop("axon")
    except Exception:
        pass
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_signal(rng: np.random.Generator, n: int, ch: int, bps: int) -> np.ndarray:
    amp = (1 << (bps - 1)) - 1
    kind = rng.choice(["sine", "noise", "quiet", "constant", "wasted", "spikes"])
    t = np.arange(n, dtype=np.float64)
    out = np.zeros((n, ch), np.int32)
    for c in range(ch):
        if kind == "sine":
            f = float(rng.uniform(50, 8000))
            out[:, c] = np.round(0.7 * amp * np.sin(2 * np.pi * f * t / 44100 + c)).astype(np.int32)
        elif kind == "noise":
            out[:, c] = rng.integers(-amp - 1, amp + 1, n, dtype=np.int64).astype(np.int32)
        elif kind == "quiet":
            out[:, c] = np.clip(np.round(np.cumsum(rng.normal(0, 25, n))), -amp - 1, amp).astype(np.int32)
        elif kind == "constant":
            out[:, c] = int(rng.integers(-amp - 1, amp + 1))
        elif kind == "wasted":
            sh = int(rng.integers(1, min(bps - 1, 8)))
            out[:, c] = (rng.integers(-(amp >> sh) - 1, (amp >> sh) + 1, n,
                                      dtype=np.int64) << sh).astype(np.int32)
        else:  # spikes: near-silence with Rice outliers
            x = rng.integers(-3, 4, n, dtype=np.int64)
            idx = rng.integers(0, n, max(1, n // 500))
            x[idx] = rng.integers(-amp - 1, amp + 1, len(idx), dtype=np.int64)
            out[:, c] = x.astype(np.int32)
    return out


def draw_config(rng: np.random.Generator) -> dict:
    cfg = dict(
        level=int(rng.integers(0, 9)),
        ch=int(rng.choice([1, 2, 2])),
        bps=int(rng.choice([8, 16, 16, 24])),
        n=int(rng.integers(1000, 30000)),
        blocksize=int(rng.choice([0, 0, 576, 1024, 1152, 2048, 4096])) or None,
    )
    kw = {}
    if rng.random() < 0.2:
        kw["do_exhaustive_model_search"] = True
    if rng.random() < 0.2:
        kw["do_qlp_coeff_prec_search"] = True
    if rng.random() < 0.15:
        kw["do_escape_coding"] = True
    if rng.random() < 0.25:
        from flac_tpu.dsp.windows import parse_apodization_spec

        kw["apodizations"] = parse_apodization_spec(str(rng.choice(
            ["hann", "tukey(0.3)", "blackman;hann", "gauss(0.2)", "flattop"])))
    cfg["overrides"] = kw
    return cfg


def run_case(i: int, rng: np.random.Generator, oracle: Path, mode: str,
             tmp: Path) -> str | None:
    """Returns None on success, else a failure description."""
    from flac_tpu.decode.seek import SeekableDecoder
    from flac_tpu.decode.stream import decode_bytes_device
    from flac_tpu.encode.encoder import encode_file

    c = draw_config(rng)
    sig = make_signal(rng, c["n"], c["ch"], c["bps"])
    ours = tmp / f"c{i}.flac"
    desc = f"case {i}: {c}"
    try:
        encode_file(sig, 44100, c["bps"], str(ours), level=c["level"],
                    blocksize=c["blocksize"], batch_frames=8, **c["overrides"])
    except Exception as e:
        return f"{desc}: encode raised {e!r}"

    if mode in ("encode", "all"):
        r = subprocess.run([str(oracle), "-t", "-s", str(ours)], capture_output=True)
        if r.returncode != 0:
            return f"{desc}: oracle -t rc={r.returncode}: {r.stderr.decode()[:200]}"
        wav = tmp / f"c{i}.wav"
        subprocess.run([str(oracle), "-d", "-f", "-s", "-o", str(wav), str(ours)],
                       capture_output=True, check=True)
        from flac_tpu.containers.wav import read_wav
        got = read_wav(str(wav))
        if not np.array_equal(np.asarray(got.samples), sig):
            return f"{desc}: oracle -d PCM mismatch"

    if mode in ("decode", "all"):
        # oracle-encoded stream through our batched device decoder
        wav_in = tmp / f"c{i}_in.wav"
        from flac_tpu.containers.wav import AudioBuffer, write_wav
        write_wav(str(wav_in), AudioBuffer(samples=sig, sample_rate=44100,
                                           bits_per_sample=c["bps"]))
        oflac = tmp / f"c{i}_oracle.flac"
        r = subprocess.run([str(oracle), f"-{c['level']}", "-f", "-s",
                            "-o", str(oflac), str(wav_in)], capture_output=True)
        if r.returncode != 0:
            return f"{desc}: oracle encode rc={r.returncode}"
        try:
            pcm, si, info = decode_bytes_device(oflac.read_bytes(), batch_frames=8,
                                                max_lpc_order=32)
        except Exception as e:
            return f"{desc}: device decode raised {e!r}"
        if not np.array_equal(pcm, sig):
            return f"{desc}: device decode PCM mismatch (path={info.get('path')})"

    if mode in ("seek", "all") and len(sig) > 2000:
        dec = SeekableDecoder(ours.read_bytes())
        for _ in range(4):
            start = int(rng.integers(0, len(sig) - 1000))
            ln = int(rng.integers(1, 1000))
            got = dec.decode_range(start, ln)
            if not np.array_equal(np.asarray(got, np.int32), sig[start:start + ln]):
                return f"{desc}: decode_range({start},{ln}) mismatch"
    return None


def run_cli_case(i: int, rng: np.random.Generator, oracle: Path,
                 tmp: Path) -> str | None:
    """File-level differential through the flac CLI: random container in
    (lazy/memmap encode input path), oracle -t on our stream, then both
    binaries decode our stream to a random output container (streaming
    decode path) — output files must be byte-identical."""
    from flac_tpu.cli import flac as flac_cli
    from flac_tpu.containers import AudioBuffer, write_aiff, write_w64, write_wav

    c = draw_config(rng)
    if rng.random() < 0.3:
        c["bps"] = int(rng.choice([12, 20]))  # odd widths: left-justify layout
    sig = make_signal(rng, c["n"], c["ch"], c["bps"])
    in_kind = str(rng.choice(["wav", "aiff", "w64"]))
    desc = f"cli case {i}: {c} in={in_kind}"
    src = tmp / f"cli{i}.{in_kind}"
    writer = {"wav": write_wav, "aiff": write_aiff, "w64": write_w64}[in_kind]
    writer(str(src), AudioBuffer(samples=sig, sample_rate=44100,
                                 bits_per_sample=c["bps"]))
    ours = tmp / f"cli{i}.flac"
    rc = flac_cli.main(["--totally-silent", f"-{c['level']}", "-f",
                        "-o", str(ours), str(src)])
    if rc != 0:
        return f"{desc}: CLI encode rc={rc}"
    r = subprocess.run([str(oracle), "-t", "-s", str(ours)], capture_output=True)
    if r.returncode != 0:
        return f"{desc}: oracle -t rc={r.returncode}: {r.stderr.decode()[:200]}"
    flag, ext = [([], "wav"), (["--force-aiff-format"], "aiff"),
                 (["--force-rf64-format"], "rf64"),
                 (["--force-wave64-format"], "w64")][int(rng.integers(0, 4))]
    ref = tmp / f"cli{i}_ref.{ext}"
    r = subprocess.run([str(oracle), "-d", "-f", "-s", *flag, "-o", str(ref),
                        str(ours)], capture_output=True)
    if r.returncode != 0:
        return f"{desc}: oracle -d rc={r.returncode}: {r.stderr.decode()[:200]}"
    mine = tmp / f"cli{i}_mine.{ext}"
    rc = flac_cli.main(["--totally-silent", "-d", "-f", *flag,
                        "-o", str(mine), str(ours)])
    if rc != 0:
        return f"{desc}: CLI decode rc={rc}"
    if mine.read_bytes() != ref.read_bytes():
        return f"{desc}: decoded .{ext} differs from the oracle's"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=50)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--mode", choices=["encode", "decode", "seek", "all", "cli"],
                    default="all")
    ap.add_argument("--per-proc", type=int, default=15,
                    help="cases per worker process: every random config "
                         "compiles fresh XLA:CPU executables, and a "
                         "long-lived process eventually exhausts memory "
                         "(docs/flaky.md) — chunking sidesteps that")
    args = ap.parse_args()

    if args.cases > args.per_proc:
        # parent: run chunks in fresh subprocesses, distinct seeds
        total_fail = 0
        done = 0
        while done < args.cases:
            n = min(args.per_proc, args.cases - done)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--cases", str(n), "--seed", str(args.seed + done),
                 "--mode", args.mode, "--per-proc", str(args.per_proc)])
            if r.returncode == 1:
                total_fail += 1
            elif r.returncode not in (0, 1):
                print(f"worker crashed (rc={r.returncode}) after case "
                      f"{done}; continuing with a fresh process")
            done += n
            print(f"== {done}/{args.cases} dispatched ==", flush=True)
        print(f"campaign total: {args.cases} cases, "
              f"{total_fail} failing chunk(s)")
        return 1 if total_fail else 0

    _pin_cpu()
    oracle = Path(os.environ.get("ORACLE_DIR", "/tmp/flacoracle")) / "flac"
    if not oracle.exists():
        print("oracle binary missing; run tools/build_reference_oracle.sh", file=sys.stderr)
        return 2

    rng = np.random.default_rng(args.seed)
    fails = []
    with tempfile.TemporaryDirectory() as td:
        for i in range(args.cases):
            err = (run_cli_case(i, rng, oracle, Path(td))
                   if args.mode == "cli"
                   else run_case(i, rng, oracle, args.mode, Path(td)))
            if err:
                fails.append(err)
                print("FAIL", err, flush=True)
            elif (i + 1) % 10 == 0:
                print(f"{i + 1}/{args.cases} ok", flush=True)
    scan = os.environ.get("FLAC_TPU_SCAN", "auto")
    print(f"campaign: {args.cases} cases, mode={args.mode}, seed={args.seed}, "
          f"scan={scan}: {len(fails)} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
