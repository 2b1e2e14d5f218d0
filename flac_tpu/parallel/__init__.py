"""Multi-chip/multi-host scale-out for the TPU FLAC engine.

The reference is strictly single-core (SURVEY.md §2.3); everything here is new
TPU-native design: frames shard across a `jax.sharding.Mesh`, per-shard stream
statistics reduce via ICI collectives, and per-frame encoded byte lengths go
through an all-gather + prefix-sum so every shard knows its frames' final
stream offsets (the seekpoint/frame-placement design of SURVEY.md §5.8).
"""

from flac_tpu.parallel.sharding import (
    ShardedEncodeResult,
    build_sharded_encode_step,
    make_mesh,
)

__all__ = ["make_mesh", "build_sharded_encode_step", "ShardedEncodeResult"]
