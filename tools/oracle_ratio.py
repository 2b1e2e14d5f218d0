"""Measure the reference flac binary's compression ratio on the exact bench
corpus, for the oracle_same_corpus rows in bench.py's output.

The bench corpus (bench.make_corpus) is synthetic CD-audio-like stereo; the
reference benchmark page's 0.5367 corpus-wide -5 ratio (BASELINE.md) is on
real music, so it is not comparable to bench.py's ratio rows. This tool
produces the apples-to-apples number: the reference binary (built by
tools/build_reference_oracle.sh) encoding the SAME samples at the SAME
level.

The measured ratios are RECORDED to tools/oracle_ratio.json together with
the corpus geometry (level, batch, nbatches, seed base, blocksize);
bench.py reads that artifact and emits the oracle_same_corpus row only
when its own run geometry matches — stale constants are never reported
silently.

Usage: python tools/oracle_ratio.py [oracle_flac_path]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "oracle_ratio.json")


def main() -> None:
    oracle = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flacoracle/flac"
    if not os.path.exists(oracle):
        sys.exit(f"oracle binary not found at {oracle}; "
                 "run tools/build_reference_oracle.sh first")
    from bench import T, make_corpus

    entries = []
    with tempfile.TemporaryDirectory() as td:
        # the -5 TPU bench corpus is 6 batches x 512 frames, -8 is 4 x 256,
        # seeds 7+i (bench.main)
        for name, batch, nb, lvl in [("-5 corpus", 512, 6, 5),
                                     ("-8 corpus", 256, 4, 8)]:
            pcm = np.concatenate([
                make_corpus(batch * T, seed=7 + i).reshape(-1, 2)
                for i in range(nb)])
            wav = os.path.join(td, "c.wav")
            with wave.open(wav, "wb") as w:
                w.setnchannels(2)
                w.setsampwidth(2)
                w.setframerate(44100)
                w.writeframes(pcm.astype("<i2").tobytes())
            raw = pcm.size * 2
            out = os.path.join(td, "c.flac")
            subprocess.run([oracle, f"-{lvl}", "-f", "-o", out, wav],
                           capture_output=True, check=True)
            sz = os.path.getsize(out)
            print(f"{name} at -{lvl}: oracle ratio {sz / raw:.4f} "
                  f"({sz} / {raw})")
            entries.append(dict(level=lvl, batch=batch, nbatches=nb,
                                seed_base=7, blocksize=T,
                                ratio=round(sz / raw, 4),
                                flac_bytes=sz, raw_bytes=raw))
    with open(ARTIFACT, "w") as f:
        json.dump(dict(corpus="bench.make_corpus", entries=entries), f,
                  indent=1)
    print(f"wrote {ARTIFACT}")


if __name__ == "__main__":
    main()
