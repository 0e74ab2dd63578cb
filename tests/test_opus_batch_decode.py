"""Mixed-mode EP-bucketed batch decoder.

A batch mixing CELT music streams and SILK voice streams decodes
through per-bucket device lanes and scatters PCM back to stream
order; the SILK lane must stay bit-exact vs the scalar decoder and
the CELT lane final_range-consistent with close PCM."""
import numpy as np


def _speech(n, seed=0, f0=140.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    x = 0.45 * np.sin(2 * np.pi * f0 * t)
    x += 0.2 * np.sin(2 * np.pi * 2.1 * f0 * t + 0.4)
    x += 0.035 * rng.standard_normal(n)
    return (x * 0.6).astype(np.float32)


def test_mixed_mode_bucketed_decode():
    from opus_codec_tpu.api import Decoder, Encoder
    from opus_codec_tpu.batch_api import OpusBatchDecoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)

    N = 960
    n_frames = 3
    rng = np.random.default_rng(4)

    # two SILK voice streams + two CELT music streams, encoded scalar
    streams = []
    for b in range(2):
        e = Encoder(48000, 1, Application.VOIP)
        e.set_bitrate(Bitrate(20000))
        e.set_signal(Signal.VOICE)
        e.set_max_bandwidth(Bandwidth.WIDEBAND)
        e.set_complexity(2)
        e.set_vbr(False)
        sig = _speech(N * n_frames, seed=b, f0=120 + 40 * b)
        streams.append(("silk", [e.encode_float(
            sig[f * N:(f + 1) * N]) for f in range(n_frames)]))
    for b in range(2):
        from opus_codec_tpu.batch_api import CeltBatchEncoder
        enc = CeltBatchEncoder(1, bitrate=64000)
        t = np.arange(N * n_frames) / 48000.0
        sig = (0.4 * np.sin(2 * np.pi * (300 + 150 * b) * t)
               + 0.03 * rng.standard_normal(len(t))).astype(np.float32)
        pkts = []
        for f in range(n_frames):
            p, _ = enc.encode_packed(sig[None, f * N:(f + 1) * N])
            pkts.append(p[0])
        streams.append(("celt", pkts))

    configs = [{"mode": m, "fs_khz": 16, "payload_ms": 20,
                "frame_size": N} for m, _ in streams]
    dec = OpusBatchDecoder(configs, frame_size=N)
    refs = [Decoder(48000, 1) for _ in streams]

    for f in range(n_frames):
        pkts = [s[1][f] for s in streams]
        out = dec.decode(pkts)
        assert out.shape == (4, N)
        for b, (mode, _) in enumerate(streams):
            want = refs[b].decode_float(pkts[b], N)[:, 0]
            if mode == "silk":
                # bit-exact lane (int16 grid)
                np.testing.assert_allclose(
                    out[b], want.astype(np.float32), rtol=0,
                    atol=1.0 / 32768.0, err_msg=f"silk {b} f{f}")
            else:
                err = np.abs(out[b] - want)
                ref = np.sqrt(np.mean(want ** 2)) + 1e-9
                assert np.sqrt(np.mean(err ** 2)) < 0.02 * ref + 1e-4, \
                    (b, f)
