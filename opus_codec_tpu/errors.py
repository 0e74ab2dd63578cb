"""Error taxonomy mirroring the reference (src/error.rs:36-62, opus_defines.h)."""

from __future__ import annotations

__all__ = ["OpusError", "ErrorCode"]

import enum


class ErrorCode(enum.IntEnum):
    OK = 0
    BAD_ARG = -1
    BUFFER_TOO_SMALL = -2
    INTERNAL_ERROR = -3
    INVALID_PACKET = -4
    UNIMPLEMENTED = -5
    INVALID_STATE = -6
    ALLOC_FAIL = -7


class OpusError(Exception):
    """Raised for all codec-level failures; carries the numeric code."""

    def __init__(self, code: int, message: str = ""):
        self.code = ErrorCode(code) if code in ErrorCode._value2member_map_ \
            else int(code)
        super().__init__(message or f"opus error {self.code}")

    @classmethod
    def bad_arg(cls, msg: str = "bad argument") -> "OpusError":
        return cls(ErrorCode.BAD_ARG, msg)

    @classmethod
    def invalid_packet(cls, msg: str = "invalid packet") -> "OpusError":
        return cls(ErrorCode.INVALID_PACKET, msg)

    @classmethod
    def buffer_too_small(cls, msg: str = "buffer too small") -> "OpusError":
        return cls(ErrorCode.BUFFER_TOO_SMALL, msg)
