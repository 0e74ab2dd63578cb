"""opus_codec_tpu — a TPU-native Opus codec framework.

Rebuilds the capability surface of the reference crate (Deniskore/opus-codec
= safe Rust bindings over vendored libopus v1.5.2) as a from-scratch
JAX/XLA-first framework: batched device DSP pipelines over stream batches,
with the serial range-coding symbol lanes on the host.

Public surface (mirrors src/lib.rs:16-45 re-exports):
  Encoder, Decoder, Repacketizer, packet utils, typed enums, errors.
"""

from .api import Decoder, Encoder, Repacketizer
from .bitstream import packet
from .errors import ErrorCode, OpusError
from .types import (Application, Bandwidth, Bitrate, Channels, CodecMode,
                    Complexity, ExpertFrameDuration, FrameSize, SampleRate,
                    Signal)

__all__ = [
    "Encoder", "Decoder", "Repacketizer", "packet", "OpusError",
    "ErrorCode", "Application", "Bandwidth", "Bitrate", "Channels",
    "CodecMode", "Complexity", "ExpertFrameDuration", "FrameSize",
    "SampleRate", "Signal", "version", "runtime_version",
]


def version() -> str:
    """Protocol-level parity target (lib.rs:52-54)."""
    return "1.5.2"


def runtime_version() -> str:
    return "opus_codec_tpu 0.1 (libopus 1.5.2 capability parity target)"
