"""Batched frame-level DSP for the TPU encoder/decoder.

These modules re-express the reference's per-frame scalar loops
(src/libFLAC/{lpc,fixed,window}.c and the NASM kernels in src/libFLAC/ia32/)
as batched XLA computations over a leading frame axis, per SURVEY.md §2.2's
TPU mapping note.
"""
