"""TPU-native SO-ARM100 environments."""
