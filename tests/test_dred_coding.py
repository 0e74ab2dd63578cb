"""DRED entropy-coding tests: Laplace p0 oracle cross-check and full
payload roundtrip with the RDO-VAE (synthetic weights + stats)."""
import os
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.bitstream.range_coder import RangeDecoder, RangeEncoder
from opus_codec_tpu.dnn.dred_coding import (DredStats, compute_quantizer,
                                            dred_decode, dred_encode,
                                            ec_laplace_decode_p0,
                                            ec_laplace_encode_p0,
                                            quantize_latents)


def test_laplace_p0_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(-40, 40, 200)
    p0, decay = 100 << 7, 120 << 7
    enc = RangeEncoder(4096)
    for v in vals:
        ec_laplace_encode_p0(enc, int(v), p0, decay)
    enc.done()
    dec = RangeDecoder(enc.data())
    got = [ec_laplace_decode_p0(dec, p0, decay) for _ in vals]
    np.testing.assert_array_equal(got, vals)
    assert enc.rng == dec.rng      # final_range equivalence


def test_compute_quantizer_schedule():
    # dQ table entry 4 = 6: quant rises by 6/16 per chunk
    got = [compute_quantizer(2, 4, 9, i) for i in range(24)]
    assert got[0] == 2
    assert all(a <= b for a, b in zip(got, got[1:]))
    assert got[-1] == 9            # clamped at qmax


def test_deadzone_quantizer():
    scale = np.full(4, 128, np.uint8)     # 0.5
    dz = np.full(4, 128, np.uint8)        # delta 0.5
    x = np.array([0.0, 0.3, 4.0, -4.0], np.float32)
    q = quantize_latents(x, scale, dz)
    assert q[0] == 0
    assert q[1] == 0                       # dead zone swallows small vals
    assert q[2] == 2 and q[3] == -2        # symmetric, shrunk ~0.5 then
    # check the shrinkage: without dead zone the value would round the same
    # but a larger delta pulls it down a step
    q2 = quantize_latents(np.array([4.0], np.float32),
                          np.full(1, 128, np.uint8),
                          np.full(1, 255, np.uint8))
    assert q2[0] == 1


def test_dred_payload_roundtrip():
    rng = np.random.default_rng(1)
    latent_dim, state_dim = 20, 8
    stats = DredStats.default(latent_dim, state_dim)
    state = (2.0 * rng.standard_normal(state_dim)).astype(np.float32)
    lat = (2.0 * rng.standard_normal((9, latent_dim))).astype(np.float32)
    data = dred_encode(state, lat, stats, q0=6, dQ=3, qmax=15,
                       max_bytes=400, dred_offset=12)
    assert 0 < len(data) <= 400
    st2, lat2, off = dred_decode(data, stats, latent_dim, state_dim)
    assert off == 12
    assert lat2.shape[0] == 4              # latents 0,2,4,6 coded
    # dequantised values match the encoder's quantisation (scale 64/256)
    q_state = quantize_latents(state, stats.state_scale[6],
                               stats.state_dead_zone[6])
    np.testing.assert_allclose(st2, q_state * 4.0, atol=1e-5)
    for k in range(4):
        qv = quantize_latents(lat[2 * k], stats.latent_scale[
            compute_quantizer(6, 3, 15, k)], stats.latent_dead_zone[0])
        np.testing.assert_allclose(lat2[k], qv * 4.0, atol=1e-5)


def test_dred_payload_budget():
    """Encoder degrades gracefully: fewer chunks under a tight budget,
    empty payload when even the state does not fit."""
    rng = np.random.default_rng(2)
    stats = DredStats.default(20, 8)
    state = (3 * rng.standard_normal(8)).astype(np.float32)
    lat = (3 * rng.standard_normal((21, 20))).astype(np.float32)
    big = dred_encode(state, lat, stats, 6, 3, 15, 4000)
    small = dred_encode(state, lat, stats, 6, 3, 15, 25)
    assert len(big) > len(small) > 0
    _, lat_big, _ = dred_decode(big, stats, 20, 8)
    _, lat_small, _ = dred_decode(small, stats, 20, 8)
    assert lat_big.shape[0] > lat_small.shape[0] >= 1
    assert dred_encode(state, lat, stats, 6, 3, 15, 2) == b""


def test_dred_offset_escape():
    """total_offset > 31 uses the escape coding path."""
    stats = DredStats.default(4, 4)
    state = np.ones(4, np.float32)
    lat = np.ones((3, 4), np.float32)
    data = dred_encode(state, lat, stats, 6, 3, 15, 200, dred_offset=-30)
    _, _, off = dred_decode(data, stats, 4, 4)
    assert off == -30
    # and with a frame offset correction applied at parse time
    _, _, off2 = dred_decode(data, stats, 4, 4, dred_frame_offset=8)
    assert off2 == -22


def test_dred_in_packet_end_to_end():
    """Full DRED transport: RDO-VAE encode -> entropy code -> packet
    extension ID 126 -> find/parse/process -> features for the PLC."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_dnn import _dred_blob
    from opus_codec_tpu.bitstream import packet as pkt
    from opus_codec_tpu.dnn.dred import RDOVAEEncoder
    from opus_codec_tpu.opus.dred_api import DredDecoder, dred_find_payload
    from opus_codec_tpu.opus.extensions import (ExtensionData,
                                                extensions_generate)

    rng = np.random.default_rng(11)
    blob = _dred_blob(rng)
    enc = RDOVAEEncoder.from_blob(blob)
    stats = DredStats.default(enc.latent_dim, enc.state_dim)

    # run the encoder over 5 dframes, buffer newest-first like the C
    lat_buf, state = [], None
    for _ in range(5):
        l, state = enc.encode_dframe(0.3 * rng.standard_normal(40))
        lat_buf.insert(0, l)
    payload = dred_encode(np.asarray(state), np.stack(lat_buf), stats,
                          q0=6, dQ=3, qmax=15, max_bytes=300,
                          dred_offset=14)
    assert payload

    # wrap: experimental prefix + extension + packet padding
    ext_payload = bytes([ord("D"), 10]) + payload
    padding = extensions_generate(
        [ExtensionData(126, 0, ext_payload)], len(ext_payload) + 1,
        pad=False)
    from opus_codec_tpu.types import Bandwidth, CodecMode
    toc = pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 2)
    base = bytes([toc]) + b"\x42" * 50
    packet = pkt.packet_pad(base, len(base) + len(padding) + 2)
    # splice our extension bytes into the padding area
    parsed = pkt.parse_packet(packet)
    pad_area = bytearray(parsed.padding)
    pad_area[-len(padding):] = padding
    packet = packet[:len(packet) - len(parsed.padding)] + bytes(pad_area)

    found, frame_off = dred_find_payload(packet)
    assert found == payload and frame_off == 0

    dec = DredDecoder.from_blob(blob, stats)
    dred, nb, dred_end = dec.parse(packet, max_dred_samples=48000)
    assert dred.process_stage == 2
    assert dred.nb_latents == 2          # latents 0 and 2 of 5 coded
    assert dred.features.shape == (8, 20)
    assert np.all(np.isfinite(dred.features))
    assert dred.dred_offset == 14
    assert nb == 2 * 48000 // 25 - 14 * 48000 // 400


def test_decoder_deep_plc_and_dred_api():
    """Decoder-level glue: set_dnn_blob + complexity>=5 routes PLC
    through the neural path; dred_decode synthesises from redundancy
    (opus_decoder.c:417-427, 670-711, 1460-1507 analogues)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_dnn import _dred_blob, _fargan_blob
    from test_deep_plc import _plc_blob
    from opus_codec_tpu import Decoder, Encoder
    from opus_codec_tpu.types import Application, Bitrate
    from opus_codec_tpu.dnn import weights as wtm

    rng = np.random.default_rng(21)
    # combined blob: PLC + FARGAN + RDO-VAE
    combined = (_plc_blob(rng) + _fargan_blob(rng) + _dred_blob(rng))

    enc = Encoder(48000, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(32000))
    dec = Decoder(48000, 1)
    dec.set_dnn_blob(combined)
    dec.set_complexity(5)
    dec.set_dred_duration(1000)

    t = np.arange(960 * 8)
    sig = (0.3 * np.sin(2 * np.pi * 220 * t / 48000)).astype(np.float32)
    for i in range(6):
        p = enc.encode_float(sig[i * 960:(i + 1) * 960])
        out = dec.decode_float(p, 960)
        assert out.shape == (960, 1)
    # lost frame -> neural concealment path
    out = dec.decode_float(None, 960)
    assert out.shape == (960, 1)
    assert np.all(np.isfinite(out))
    out2 = dec.decode(None, 960)
    assert out2.dtype == np.int16

    # DRED synthesis path
    from opus_codec_tpu.opus.dred_api import Dred
    from opus_codec_tpu.dnn.dred_coding import DredStats
    lat = rng.standard_normal((3, 16)).astype(np.float32)
    st = rng.standard_normal(8).astype(np.float32)
    d = Dred(state=st, latents=lat, nb_latents=3, dred_offset=0,
             process_stage=1)
    pcm = dec.dred_decode_float(d, dred_offset=0, frame_size=1920)
    assert pcm.shape == (1920, 1)
    assert np.all(np.isfinite(pcm))
    assert d.process_stage == 2            # processed on demand

    # guards
    dec2 = Decoder(48000, 1)
    with pytest.raises(Exception):
        dec2.dred_decode_float(d, 0, 960)  # no blob loaded
    with pytest.raises(Exception):
        dec.dred_decode_float(d, 0, 7)     # not a 10 ms multiple
