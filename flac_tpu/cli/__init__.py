"""Command-line tools: the `flac` and `metaflac` equivalents
(src/flac/main.c, src/metaflac/). Run as `python -m flac_tpu.cli.flac` /
`python -m flac_tpu.cli.metaflac`."""
