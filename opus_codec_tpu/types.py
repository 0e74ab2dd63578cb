"""Typed enums mirroring the reference's public type surface.

Parity: /root/reference/src/types.rs (Rust enum layer) and
/root/reference/opus/include/opus_defines.h (numeric protocol constants).
"""

from __future__ import annotations

import enum

__all__ = [
    "Application", "Channels", "SampleRate", "Bandwidth", "FrameSize",
    "Signal", "ExpertFrameDuration", "Bitrate", "CodecMode", "Complexity",
]


class Application(enum.IntEnum):
    """Intended application (types.rs:14-22)."""
    VOIP = 2048
    AUDIO = 2049
    RESTRICTED_LOW_DELAY = 2051


class Channels(enum.IntEnum):
    """types.rs:25-31."""
    MONO = 1
    STEREO = 2


class SampleRate(enum.IntEnum):
    """Supported API sample rates (types.rs:49-61)."""
    HZ8000 = 8000
    HZ12000 = 12000
    HZ16000 = 16000
    HZ24000 = 24000
    HZ48000 = 48000


class Bandwidth(enum.IntEnum):
    """Audio bandpass (types.rs:82-93; opus_defines.h)."""
    AUTO = -1000
    NARROWBAND = 1101       # 4 kHz
    MEDIUMBAND = 1102       # 6 kHz
    WIDEBAND = 1103         # 8 kHz
    SUPERWIDEBAND = 1104    # 12 kHz
    FULLBAND = 1105         # 20 kHz


class CodecMode(enum.IntEnum):
    """Internal coding mode (opus_private.h MODE_*)."""
    SILK_ONLY = 1000
    HYBRID = 1001
    CELT_ONLY = 1002


class FrameSize(enum.IntEnum):
    """Frame duration; value is duration in microseconds (types.rs:97-119)."""
    MS2_5 = 2500
    MS5 = 5000
    MS10 = 10000
    MS20 = 20000
    MS40 = 40000
    MS60 = 60000

    def samples(self, sample_rate: int) -> int:
        return int(self.value) * int(sample_rate) // 1_000_000


class Signal(enum.IntEnum):
    """types.rs:123-128."""
    AUTO = -1000
    VOICE = 3001
    MUSIC = 3002


class ExpertFrameDuration(enum.IntEnum):
    """OPUS_FRAMESIZE_* (types.rs:132-151)."""
    ARG = 5000
    MS2_5 = 5001
    MS5 = 5002
    MS10 = 5003
    MS20 = 5004
    MS40 = 5005
    MS60 = 5006
    MS80 = 5007
    MS100 = 5008
    MS120 = 5009


class Bitrate:
    """Bitrate setting: AUTO, MAX, or bits/second (types.rs:183-202)."""
    AUTO = -1000
    MAX = -1

    def __init__(self, bps: int):
        self.bps = int(bps)


class Complexity(int):
    """Encoder complexity 0..=10 (types.rs:155-179)."""

    def __new__(cls, value: int):
        if not 0 <= value <= 10:
            raise ValueError(f"complexity must be 0..=10, got {value}")
        return super().__new__(cls, value)
