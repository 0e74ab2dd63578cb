"""Native CELT dry parse (dec_lane.c) vs the Python parser.

Every output array of every frame must match celt.dec_parse exactly —
transient/short-block frames, multiple rates and frame sizes, and the
carried LCG seed chain included."""
import numpy as np
import pytest

from opus_codec_tpu.celt.dec_parse import parse_frame, stack_syms
from opus_codec_tpu.celt.encoder import CeltEncoder
from opus_codec_tpu.celt.modes import standard_mode
from opus_codec_tpu.runtime.parse import (dec_parse_batch,
                                          native_parse_available)

M = standard_mode()


def _frames(lm, bitrate, seed, transients, n_frames=4):
    n = M.short_mdct_size << lm
    nbytes = max(bitrate * n // (8 * 48000), 12)
    e = CeltEncoder(48000, 1)
    e.complexity = 5
    e.vbr = False
    e.bitrate = bitrate
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    out = []
    for fi in range(n_frames):
        pcm = 0.4 * np.sin(2 * np.pi * (220 + 130 * fi) * t) \
            + 0.05 * rng.standard_normal(n)
        if transients and fi % 2 == 1:
            pcm[n // 3:] += 0.5 * rng.standard_normal(n - n // 3)
        out.append(e.encode_with_ec(pcm[None, :], n, nbytes))
    return out


@pytest.mark.skipif(not native_parse_available(),
                    reason="no C toolchain")
@pytest.mark.parametrize("lm,bitrate,transients", [
    (0, 64000, False),
    (1, 48000, False),
    (3, 64000, True),
    (3, 96000, True),
    (2, 128000, False),
])
def test_native_parse_matches_python(lm, bitrate, transients):
    frames = _frames(lm, bitrate, seed=10 * lm + 1,
                     transients=transients)
    # independent streams with chained seeds, like the batched decoder
    seeds = [0] * len(frames)
    py_syms = []
    for i, f in enumerate(frames):
        s = parse_frame(f, lm, seed=seeds[i])
        py_syms.append(s)
    want = stack_syms(py_syms)
    got = dec_parse_batch(frames, lm, seeds)
    assert got is not None
    assert np.all(got["error"] == 0)
    for key, ref in want.items():
        g = got[key]
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.int64),
            np.asarray(ref).astype(np.int64), err_msg=key)


@pytest.mark.skipif(not native_parse_available(),
                    reason="no C toolchain")
def test_native_parse_seed_chain():
    """Carried seeds (prev final_range) change noise-leaf records and
    must flow through identically."""
    lm = 3
    frames = _frames(lm, 48000, seed=9, transients=False, n_frames=3)
    seed = 0
    for f in frames:
        s = parse_frame(f, lm, seed=seed)
        got = dec_parse_batch([f], lm, [seed])
        want = stack_syms([s])
        for key, ref in want.items():
            np.testing.assert_array_equal(
                np.asarray(got[key]).astype(np.int64),
                np.asarray(ref).astype(np.int64), err_msg=key)
        seed = s.final_range
