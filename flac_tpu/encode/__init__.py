"""TPU-native FLAC encoder: batched frame pipeline, field packer, stream driver."""
