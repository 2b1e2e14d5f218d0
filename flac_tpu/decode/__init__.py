"""FLAC decoders.

Two paths, mirroring the plan in SURVEY.md §7.3:

* `host_decoder` — a sequential, bit-serial decoder (the analog of
  src/libFLAC/stream_decoder.c's state machine). It is the robustness path:
  handles corrupt streams with frame-sync rescan, arbitrary blocksize
  changes, escape codes, and serves as the correctness oracle in tests.
* `frame_decoder` / `stream` — the TPU path: a vectorized sync scan indexes
  frame boundaries, then batches of frames decode in parallel on device.
"""
