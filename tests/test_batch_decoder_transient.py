"""Batched CELT decode of transient / tf-coded streams vs the scalar
decoder.

Streams come from the scalar encoder at complexity 5 (transient
analysis + tf + dynalloc active, postfilter disabled), which the
batched decoder previously rejected.  The synthesis must track the
scalar decoder's PCM closely (same parse, same shapes, float order
differs) across the haar cascades, hadamard interleave, per-node block
rotations and anti-collapse."""
import numpy as np
import pytest

from opus_codec_tpu.celt.decoder import CeltDecoder
from opus_codec_tpu.celt.encoder import CeltEncoder
from opus_codec_tpu.celt.modes import standard_mode

M = standard_mode()


def _encode(lm, bitrate, seed, n_frames=6):
    n = M.short_mdct_size << lm
    nbytes = max(bitrate * n // (8 * 48000), 16)
    e = CeltEncoder(48000, 1)
    e.complexity = 5
    e.vbr = False
    e.bitrate = bitrate
    e.disable_pf = True
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    frames = []
    n_transient = 0
    for fi in range(n_frames):
        pcm = 0.35 * np.sin(2 * np.pi * (260 + 90 * fi) * t) \
            + 0.04 * rng.standard_normal(n)
        if fi % 2 == 1:
            # hard onset to force transient coding
            pcm[: n // 4] *= 0.02
            pcm[n // 2:] += 0.6 * rng.standard_normal(n - n // 2)
        frames.append(e.encode_with_ec(pcm[None, :], n, nbytes))
    return frames


@pytest.mark.parametrize("lm,bitrate", [(3, 96000), (2, 64000)])
def test_batched_decode_transient_streams(lm, bitrate):
    from opus_codec_tpu.batch_api import CeltBatchDecoder
    from opus_codec_tpu.celt.dec_parse import parse_frame

    n = M.short_mdct_size << lm
    streams = [_encode(lm, bitrate, seed=s) for s in (1, 2)]
    n_frames = len(streams[0])
    # confirm the fixture actually exercises transient frames
    any_tr = False
    seed = 0
    for f in streams[0]:
        s = parse_frame(f, lm, seed=seed)
        any_tr |= s.transient
        seed = s.final_range
    assert any_tr, "fixture produced no transient frames"

    Bn = len(streams)
    dec = CeltBatchDecoder(Bn, frame_size=n)
    refs = [CeltDecoder(48000, 1) for _ in range(Bn)]
    for fi in range(n_frames):
        pkts = [streams[b][fi] for b in range(Bn)]
        out = dec.decode(pkts)
        for b in range(Bn):
            want = np.asarray(
                refs[b].decode_with_ec(pkts[b], n)).reshape(-1)[:n]
            got = np.asarray(out[b]).reshape(-1)[:n]
            # final ranges must agree exactly (same parse)
            assert int(dec.final_ranges[b]) == refs[b].rng, (b, fi)
            ref_rms = np.sqrt(np.mean(want ** 2)) + 1e-9
            err = np.sqrt(np.mean((got - want) ** 2))
            assert err < 2e-3 * ref_rms + 1e-5, (b, fi, err, ref_rms)


def test_batched_decode_postfilter_streams():
    """Streams with the comb postfilter coded (pitchy signal, pf
    enabled): the batched decoder's blockwise comb filter must track
    the scalar decoder."""
    from opus_codec_tpu.batch_api import CeltBatchDecoder
    from opus_codec_tpu.celt.dec_parse import parse_frame

    lm, bitrate = 3, 64000
    n = M.short_mdct_size << lm
    nbytes = max(bitrate * n // (8 * 48000), 16)
    rng = np.random.default_rng(3)
    t = np.arange(n) / 48000.0
    streams = []
    for s in range(2):
        e = CeltEncoder(48000, 1)
        e.complexity = 8
        e.vbr = False
        e.bitrate = bitrate
        e.disable_pf = False
        frames = []
        for fi in range(6):
            f0 = 110 + 30 * s            # strongly periodic -> pf on
            pcm = (0.55 * np.sin(2 * np.pi * f0 * (t + fi * n / 48000.0))
                   + 0.2 * np.sin(2 * np.pi * 2 * f0
                                  * (t + fi * n / 48000.0))
                   + 0.01 * rng.standard_normal(n))
            frames.append(e.encode_with_ec(pcm[None, :], n, nbytes))
        streams.append(frames)

    # confirm the fixture codes the postfilter at least once
    seed = 0
    any_pf = False
    for f in streams[0]:
        sy = parse_frame(f, lm, seed=seed)
        any_pf |= sy.pf_qg >= 0
        seed = sy.final_range
    assert any_pf, "fixture coded no postfilter frames"

    Bn = len(streams)
    dec = CeltBatchDecoder(Bn, frame_size=n)
    refs = [CeltDecoder(48000, 1) for _ in range(Bn)]
    for fi in range(6):
        pkts = [streams[b][fi] for b in range(Bn)]
        out = dec.decode(pkts)
        for b in range(Bn):
            want = np.asarray(
                refs[b].decode_with_ec(pkts[b], n)).reshape(-1)[:n]
            got = np.asarray(out[b]).reshape(-1)[:n]
            assert int(dec.final_ranges[b]) == refs[b].rng, (b, fi)
            ref_rms = np.sqrt(np.mean(want ** 2)) + 1e-9
            err = np.sqrt(np.mean((got - want) ** 2))
            assert err < 2e-3 * ref_rms + 1e-5, (b, fi, err, ref_rms)
