"""dumphfdl-tpu: TPU-native multichannel HFDL decoder framework."""

__version__ = '0.1.0'
