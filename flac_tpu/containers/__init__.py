"""Audio container readers/writers (WAV/RF64/Wave64/AIFF/raw).

The analog of the reference's src/flac/encode.c input readers
(get_sample_info_wave/aiff/raw, encode.c:181-902) and src/flac/decode.c
output writers.
"""
