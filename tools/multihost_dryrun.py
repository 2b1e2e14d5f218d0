"""Cross-PROCESS multi-host dryrun for the sharded codec paths.

The in-suite "multi-host" evidence (tests/test_parallel.py, __graft_entry__)
runs one process over 8 virtual CPU devices: that validates the collectives'
semantics but never crosses a real process boundary. This launcher drives the
SAME sharded encode/decode steps from N jax.distributed-initialized processes
(the strongest multi-host evidence obtainable without multi-host hardware):

  coordinator (this script, no args):
    1. golden run — ONE process, H*C virtual devices, ('host','chip') mesh
    2. N worker processes — each owns C virtual devices, Gloo collectives
       across the process boundary, mesh 'host' axis == process boundary
    3. byte-compare the workers' assembled stream against the golden stream

Every cross-shard value the design claims is collective-computed — the
STREAMINFO pmin/pmax/psum statistics, the two-level prefix-sum frame
placement, and the sharded-decode round trip — is asserted inside the worker
world, where 'host'-axis collectives really ride the process boundary
(the reference has no analog: libFLAC is single-threaded per stream;
this validates SURVEY §5.8 / §2.3's distribution model).

Usage:
  python tools/multihost_dryrun.py                 # full coordinator run
  python tools/multihost_dryrun.py --nprocs 2 --devices-per-proc 4
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

T = 256
FRAMES_PER_DEVICE = 2


def _clean_env(devices: int) -> dict:
    """Subprocess env: CPU-only, no axon sitecustomize, N virtual devices."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p and ".axon_site" not in p])
    return env


def _drop_axon_plugin():
    try:  # pragma: no cover - only matters under the axon environment
        from jax._src import xla_bridge as _xb

        if "axon" in getattr(_xb, "_backend_factories", {}) and not _xb._backends:
            import jax

            _xb._backend_factories.pop("axon")
            jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def run_case(nprocs: int, outdir: Path, tag: str):
    """Encode+decode over the current process world; process 0 writes
    <tag>.bin (assembled stream) and <tag>.json (STREAMINFO stats)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_pcm
    from flac_tpu.decode.frame_decoder import DecoderGeometry, bytes_to_words
    from flac_tpu.encode.frame_encoder import EncoderConfig
    from flac_tpu.parallel.sharding import (build_sharded_decode_step,
                                            build_sharded_encode_step,
                                            make_mesh)

    pid = jax.process_index()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    # 'host' mesh axis == process boundary, so host-axis collectives cross it
    mesh = make_mesh(devs, n_hosts=nprocs if nprocs > 1 else None)
    B = FRAMES_PER_DEVICE * len(devs)
    cfg = EncoderConfig.from_level(5, channels=2, bits_per_sample=16,
                                   sample_rate=44100, blocksize=T)
    step = build_sharded_encode_step(cfg, mesh, FRAMES_PER_DEVICE)

    pcm = _tiny_pcm(B, T)
    fnos = np.arange(B, dtype=np.int64)
    sh_in = NamedSharding(mesh, P(("host", "chip"), None, None))
    sh_b = NamedSharding(mesh, P(("host", "chip")))

    def globalize(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: np.ascontiguousarray(arr[idx]))

    res = step(globalize(pcm, sh_in), globalize(fnos, sh_b))

    def fetch(garr):
        """Global sharded array -> full np array on every process."""
        shards = sorted(garr.addressable_shards, key=lambda s: s.index[0].start)
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        if jax.process_count() == 1:
            return local
        return multihost_utils.process_allgather(local, tiled=True)

    words = fetch(res.words).astype(">u4")
    nbytes = fetch(res.nbytes)
    offs = fetch(res.stream_offset)
    # replicated scalars are fully addressable everywhere
    total = int(np.asarray(res.total_bytes))
    min_fs = int(np.asarray(res.min_framesize))
    max_fs = int(np.asarray(res.max_framesize))
    assert total == int(nbytes.sum()), (total, int(nbytes.sum()))
    assert np.array_equal(offs, np.cumsum(nbytes) - nbytes), "prefix-sum placement wrong"
    assert min_fs == int(nbytes.min()) and max_fs == int(nbytes.max())

    stream = b"".join(words[i].tobytes()[: nbytes[i]] for i in range(B))

    # sharded decode round trip over the same world
    geom = DecoderGeometry(blocksize=T, channels=2, bits_per_sample=16,
                           sample_rate=44100, max_lpc_order=32)
    dstep = build_sharded_decode_step(geom, mesh, FRAMES_PER_DEVICE)
    stream_words = bytes_to_words(stream)
    dpcm, _ends, dovf = dstep(
        globalize(stream_words, NamedSharding(mesh, P(None))),
        globalize((offs * 8).astype(np.int64), sh_b))
    assert not fetch(dovf).any(), "sharded decode overflow"
    assert np.array_equal(fetch(dpcm), pcm), "sharded decode round-trip failed"

    if pid == 0:
        (outdir / f"{tag}.bin").write_bytes(stream)
        (outdir / f"{tag}.json").write_text(json.dumps(dict(
            nprocs=nprocs, n_devices=len(devs), B=B, T=T,
            total_bytes=total, min_framesize=min_fs, max_framesize=max_fs)))
    print(f"[{tag} p{pid}] OK: {len(devs)} devices, {B} frames, "
          f"{total} stream bytes", flush=True)


def main_golden(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _drop_axon_plugin()
    run_case(1, Path(args.outdir), "golden")


def main_worker(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _drop_axon_plugin()
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nprocs, process_id=args.pid)
    run_case(args.nprocs, Path(args.outdir), "multiproc")


def main_coordinator(args) -> int:
    import tempfile

    nprocs = args.nprocs
    dpp = args.devices_per_proc
    with tempfile.TemporaryDirectory() as td:
        me = str(Path(__file__).resolve())
        # 1. golden: one process, nprocs*dpp devices
        r = subprocess.run(
            [sys.executable, me, "--mode", "golden", "--outdir", td],
            env=_clean_env(nprocs * dpp), cwd=str(REPO), timeout=900)
        if r.returncode:
            print("FAIL: golden run", file=sys.stderr)
            return 1
        # 2. the worker world
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, me, "--mode", "worker", "--pid", str(i),
             "--nprocs", str(nprocs), "--port", str(port), "--outdir", td],
            env=_clean_env(dpp), cwd=str(REPO)) for i in range(nprocs)]
        codes = [p.wait(timeout=900) for p in procs]
        if any(codes):
            print(f"FAIL: worker exit codes {codes}", file=sys.stderr)
            return 1
        # 3. byte-compare
        golden = (Path(td) / "golden.bin").read_bytes()
        actual = (Path(td) / "multiproc.bin").read_bytes()
        gstats = json.loads((Path(td) / "golden.json").read_text())
        astats = json.loads((Path(td) / "multiproc.json").read_text())
        if golden != actual:
            print(f"FAIL: streams differ ({len(golden)} vs {len(actual)} bytes)",
                  file=sys.stderr)
            return 1
        for k in ("total_bytes", "min_framesize", "max_framesize", "B"):
            if gstats[k] != astats[k]:
                print(f"FAIL: {k}: {gstats[k]} != {astats[k]}", file=sys.stderr)
                return 1
    print(f"PASS: {nprocs}-process x {dpp}-device world byte-identical to the "
          f"single-process {nprocs * dpp}-device mesh "
          f"({gstats['total_bytes']} stream bytes, encode+decode round trip)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["coordinator", "golden", "worker"],
                    default="coordinator")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args()
    if args.mode == "golden":
        main_golden(args)
        return 0
    if args.mode == "worker":
        main_worker(args)
        return 0
    return main_coordinator(args)


if __name__ == "__main__":
    sys.exit(main())
