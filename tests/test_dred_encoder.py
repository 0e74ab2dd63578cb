"""Opus-level DRED encoder driver (dnn/dred_encoder.c equivalent)."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_dnn import _dred_blob  # noqa: E402

from opus_codec_tpu import Decoder, Encoder  # noqa: E402
from opus_codec_tpu.dnn.dred import RDOVAEEncoder  # noqa: E402
from opus_codec_tpu.dnn.dred_coding import DredStats  # noqa: E402
from opus_codec_tpu.dnn.dred_encoder import (DredEncoder,  # noqa: E402
                                             compute_dred_bitrate)
from opus_codec_tpu.opus.dred_api import (DredDecoder,  # noqa: E402
                                          dred_find_payload)
from opus_codec_tpu.types import Application, Bitrate  # noqa: E402

DEMO = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                    "build", "opus_demo")


def _speech(fs, seconds=2.0, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    return env * 0.3 * np.sin(2 * np.pi * 220 * t) \
        + 0.04 * rng.standard_normal(len(t))


def test_compute_dred_bitrate_model():
    """q0/dQ selection + chunk targeting (opus_encoder.c:593-636)."""
    br, q0, dq, qmax, chunks = compute_dred_bitrate(
        24000, 320, 16000, 40, False, 20)
    assert br > 0 and 4 <= q0 <= 15 and dq in (3, 5) and qmax == 15
    assert chunks >= 2
    # no loss, no FEC -> tiny budget -> DRED off
    br0, *_ , c0 = compute_dred_bitrate(24000, 320, 16000, 40, False, 0)
    assert br0 == 0
    # duration 0 -> off
    brd, *_, cd = compute_dred_bitrate(24000, 320, 16000, 0, False, 20)
    assert brd == 0


def test_dred_driver_latents_and_payload():
    rng = np.random.default_rng(3)
    model = RDOVAEEncoder.from_blob(_dred_blob(rng))
    drv = DredEncoder(model, 16000, 1)
    x = _speech(16000, 1.0).astype(np.float32)
    for i in range(0, len(x), 320):
        drv.compute_latents(x[i:i + 320], 320, 0)
    assert drv.latents_buffer_fill >= 25
    act = np.ones(4 * 104, np.uint8)
    body = drv.encode_silk_frame(10, 300, 6, 3, 15, act)
    assert len(body) > 0
    # all-silence activity memory -> nothing worth sending
    drv2 = DredEncoder(model, 16000, 1)
    for i in range(0, len(x), 320):
        drv2.compute_latents(x[i:i + 320], 320, 0)
    body2 = drv2.encode_silk_frame(10, 300, 6, 3, 15,
                                   np.zeros(4 * 104, np.uint8))
    assert body2 == b""


@pytest.mark.parametrize("fs", [16000, 48000])
def test_encoder_emits_dred_extension(fs):
    rng = np.random.default_rng(11)
    blob = _dred_blob(rng)
    enc = Encoder(fs, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_packet_loss_perc(20)
    enc.set_dnn_blob(blob)
    enc.set_dred_duration(40)
    dec = Decoder(fs, 1)
    x = _speech(fs, 1.0)
    pcm = np.clip(x * 32768, -32768, 32767).astype(np.int16)
    fsz = fs // 50
    n_dred = 0
    for i in range(len(pcm) // fsz):
        p = enc.encode(pcm[i * fsz:(i + 1) * fsz])
        dec.decode(p, fsz)
        assert enc.get_final_range() == dec.get_final_range() \
            or enc.get_final_range() == 0
        if dred_find_payload(p)[0] is not None:
            n_dred += 1
    assert n_dred >= 40   # most frames carry redundancy


@pytest.mark.skipif(not os.path.exists(DEMO), reason="oracle missing")
def test_dred_roundtrip_and_oracle_decode(tmp_path):
    """Our DRED payloads parse+process in our DredDecoder, and libopus
    decodes the padded packets' audio untouched."""
    rng = np.random.default_rng(11)
    blob = _dred_blob(rng)
    fs = 16000
    enc = Encoder(fs, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_packet_loss_perc(20)
    enc.set_dnn_blob(blob)
    enc.set_dred_duration(40)
    dec = Decoder(fs, 1)
    m = RDOVAEEncoder.from_blob(blob)
    ddec = DredDecoder.from_blob(
        blob, DredStats.default(m.latent_dim, m.state_dim))
    pcm = np.clip(_speech(fs) * 32768, -32768, 32767).astype(np.int16)
    bit = bytearray()
    parsed = 0
    feats = None
    for i in range(len(pcm) // 320):
        p = enc.encode(pcm[i * 320:(i + 1) * 320])
        dec.decode(p, 320)
        dred, nb, dend = ddec.parse(p, max_dred_samples=fs)
        if dred.process_stage == 2:
            parsed += 1
            feats = dred.features
    assert parsed > 90
    assert feats is not None and np.all(np.isfinite(feats))
    assert feats.shape[1] == 20
    bitf = str(tmp_path / "d.bit")
    for i in range(len(pcm) // 320):
        pass
    # rebuild stream for the oracle decode
    enc2 = Encoder(fs, 1, Application.VOIP)
    enc2.set_bitrate(Bitrate(24000))
    enc2.set_packet_loss_perc(20)
    enc2.set_dnn_blob(blob)
    enc2.set_dred_duration(40)
    dec2 = Decoder(fs, 1)
    for i in range(len(pcm) // 320):
        p = enc2.encode(pcm[i * 320:(i + 1) * 320])
        dec2.decode(p, 320)
        bit += struct.pack(">II", len(p), dec2.get_final_range()) + p
    open(bitf, "wb").write(bytes(bit))
    r = subprocess.run([DEMO, "-d", str(fs), "1", bitf,
                        str(tmp_path / "d.sw")], capture_output=True)
    assert r.returncode == 0
