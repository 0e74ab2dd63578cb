"""SilkBatchEncoder vs per-stream scalar encoders — byte parity.

The batched lane routes every noise-shaping-quantizer call through the
device kernels (bit-exact vs the scalar quantizer), so whole packets
must come out byte-identical to the pure-scalar `api.Encoder` for the
same streams, at both the plain-NSQ (complexity 1) and the
delayed-decision (complexity 9, the default tier) settings."""
import numpy as np
import pytest

from opus_codec_tpu.silk.batch_encoder import SilkBatchEncoder


def _speech(n, seed=0, f0=140.0):
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n) / fs
    x = 0.45 * np.sin(2 * np.pi * f0 * t)
    x += 0.2 * np.sin(2 * np.pi * 2.1 * f0 * t + 0.4)
    x += 0.035 * rng.standard_normal(n)
    env = 0.35 + 0.65 * 0.5 * (1 + np.sin(2 * np.pi * 2.8 * t))
    return (x * env).astype(np.float32)


def _scalar_packets(pcm_rows, n_frames, N, complexity):
    from opus_codec_tpu.api import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    outs = []
    for row in pcm_rows:
        e = Encoder(48000, 1, Application.VOIP)
        e.set_bitrate(Bitrate(24000))
        e.set_signal(Signal.VOICE)
        e.set_max_bandwidth(Bandwidth.WIDEBAND)
        e.set_complexity(complexity)
        e.set_vbr(False)
        outs.append([e.encode_float(row[f * N:(f + 1) * N])
                     for f in range(n_frames)])
    return outs


@pytest.mark.parametrize("complexity", [1, 9])
def test_silk_batch_encoder_byte_parity(complexity):
    B, N, n_frames = 3, 960, 5
    pcm = np.stack([_speech(N * n_frames, seed=3 + b, f0=115 + 31 * b)
                    for b in range(B)])

    enc = SilkBatchEncoder(B, bitrate=24000, complexity=complexity)
    got = [[] for _ in range(B)]
    for f in range(n_frames):
        pkts = enc.encode(pcm[:, f * N:(f + 1) * N])
        for b in range(B):
            got[b].append(pkts[b])

    want = _scalar_packets(pcm, n_frames, N, complexity)
    for b in range(B):
        for f in range(n_frames):
            assert got[b][f] == want[b][f], (b, f)


def test_silk_batch_encoder_fec_vbr_parity():
    """LBRR (in-band FEC) adds a second NSQ call per frame and VBR
    drives the rate loop through repeated quantizer calls — all of it
    flows through the same barrier and must stay byte-identical."""
    from opus_codec_tpu.api import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    B, N, n_frames = 2, 960, 5
    pcm = np.stack([_speech(N * n_frames, seed=21 + b, f0=130 + 25 * b)
                    for b in range(B)])

    enc = SilkBatchEncoder(B, bitrate=24000, complexity=9, vbr=True,
                           fec=True, packet_loss=20)
    got = [[] for _ in range(B)]
    for f in range(n_frames):
        pkts = enc.encode(pcm[:, f * N:(f + 1) * N])
        for b in range(B):
            got[b].append(pkts[b])

    for b in range(B):
        e = Encoder(48000, 1, Application.VOIP)
        e.set_bitrate(Bitrate(24000))
        e.set_signal(Signal.VOICE)
        e.set_max_bandwidth(Bandwidth.WIDEBAND)
        e.set_complexity(9)
        e.set_vbr(True)
        e.set_inband_fec(True)
        e.set_packet_loss_perc(20)
        for f in range(n_frames):
            want = e.encode_float(pcm[b, f * N:(f + 1) * N])
            assert got[b][f] == want, (b, f)
