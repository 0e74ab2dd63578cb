"""Packet framing tests (mirrors tests/opus_tests.rs packet analysis and
opus/tests/test_opus_padding.c)."""
import random

import pytest

from opus_codec_tpu.bitstream import packet as pkt
from opus_codec_tpu.errors import OpusError
from opus_codec_tpu.types import Bandwidth, CodecMode


def test_toc_roundtrip_celt():
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 2)
    t = pkt.Toc.parse(toc0)
    assert t.mode == CodecMode.CELT_ONLY
    assert t.bandwidth == Bandwidth.FULLBAND
    assert t.channels == 2
    assert t.frame_samples_48k == 960


def test_toc_roundtrip_silk():
    toc0 = pkt.gen_toc(CodecMode.SILK_ONLY, 50, Bandwidth.WIDEBAND, 1)
    t = pkt.Toc.parse(toc0)
    assert t.mode == CodecMode.SILK_ONLY
    assert t.bandwidth == Bandwidth.WIDEBAND
    assert t.channels == 1
    assert t.frame_samples_48k == 960


def test_toc_roundtrip_hybrid():
    toc0 = pkt.gen_toc(CodecMode.HYBRID, 100, Bandwidth.SUPERWIDEBAND, 2)
    t = pkt.Toc.parse(toc0)
    assert t.mode == CodecMode.HYBRID
    assert t.bandwidth == Bandwidth.SUPERWIDEBAND
    assert t.frame_samples_48k == 480


def test_toc_all_configs():
    # every config decodes to a consistent (mode, bw, duration)
    for toc0 in range(256):
        t = pkt.Toc.parse(toc0)
        assert t.frame_samples_48k in (120, 240, 480, 960, 1920, 2880)
        if t.mode == CodecMode.CELT_ONLY:
            assert t.bandwidth in (Bandwidth.NARROWBAND, Bandwidth.WIDEBAND,
                                   Bandwidth.SUPERWIDEBAND, Bandwidth.FULLBAND)


def test_code0_roundtrip():
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 1)
    frame = bytes(range(40))
    p = pkt.build_packet(toc0, [frame])
    parsed = pkt.parse_packet(p)
    assert parsed.frames == [frame]
    assert pkt.packet_nb_frames(p) == 1
    assert pkt.packet_nb_samples(p, 48000) == 960


def test_code1_roundtrip():
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, 100, Bandwidth.WIDEBAND, 1)
    f = bytes([7] * 23)
    p = pkt.build_packet(toc0, [f, f])
    assert p[0] & 0x3 == 1
    parsed = pkt.parse_packet(p)
    assert parsed.frames == [f, f]


def test_code2_roundtrip():
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, 100, Bandwidth.WIDEBAND, 1)
    f1, f2 = bytes([1] * 10), bytes([2] * 300)
    p = pkt.build_packet(toc0, [f1, f2])
    assert p[0] & 0x3 == 2
    parsed = pkt.parse_packet(p)
    assert parsed.frames == [f1, f2]


def test_code3_vbr_roundtrip():
    toc0 = pkt.gen_toc(CodecMode.SILK_ONLY, 50, Bandwidth.WIDEBAND, 2)
    frames = [bytes([i] * (10 + 37 * i)) for i in range(3)]
    p = pkt.build_packet(toc0, frames)
    assert p[0] & 0x3 == 3
    parsed = pkt.parse_packet(p)
    assert parsed.frames == frames
    assert pkt.packet_nb_frames(p) == 3
    assert pkt.packet_nb_samples(p, 48000) == 3 * 960


def test_code3_cbr_roundtrip():
    toc0 = pkt.gen_toc(CodecMode.SILK_ONLY, 50, Bandwidth.NARROWBAND, 1)
    frames = [bytes([9] * 20)] * 3
    p = pkt.build_packet(toc0, frames, cbr=True)
    parsed = pkt.parse_packet(p)
    assert parsed.frames == frames


@pytest.mark.parametrize("target", [50, 255, 256, 300, 1000])
def test_pad_unpad(target):
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 1)
    frames = [bytes([3] * 11), bytes([4] * 17)]
    p = pkt.build_packet(toc0, frames)
    padded = pkt.packet_pad(p, target)
    assert len(padded) == target
    parsed = pkt.parse_packet(padded)
    assert parsed.frames == frames
    unpadded = pkt.packet_unpad(padded)
    assert pkt.parse_packet(unpadded).frames == frames
    assert len(unpadded) <= len(p)


def test_invalid_packets():
    with pytest.raises(OpusError):
        pkt.parse_packet(b"")
    # code-1 with odd payload
    toc0 = (pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 1)
            & 0xFC) | 1
    with pytest.raises(OpusError):
        pkt.parse_packet(bytes([toc0, 1, 2, 3]))
    # code-3 with zero frames
    toc3 = (toc0 & 0xFC) | 3
    with pytest.raises(OpusError):
        pkt.parse_packet(bytes([toc3, 0x00]))
    # code-3 exceeding 120 ms (20 ms frames, 7 frames > 5760 samples)
    with pytest.raises(OpusError):
        pkt.parse_packet(bytes([toc3, 7]) + bytes(7 * 3))


def test_parse_fuzz_no_crash():
    rng = random.Random(3)
    for _ in range(2000):
        n = rng.randint(1, 60)
        data = bytes(rng.randrange(256) for _ in range(n))
        try:
            parsed = pkt.parse_packet(data)
            assert sum(len(f) for f in parsed.frames) <= n
        except OpusError:
            pass


def test_size_field():
    for s in [0, 1, 251, 252, 253, 1000, 1275]:
        b = pkt.encode_size(s)
        got, consumed = pkt.parse_size(b + b"xx", 0, len(b) + 2)
        assert got == s and consumed == len(b)
