"""MDCT tests: golden vectors from the reference clt_mdct_forward/backward
(tools/oracle/mdct_dump.c), mirroring opus/celt/tests/test_unit_mdct.c."""
import os

import numpy as np
import pytest

from opus_codec_tpu.celt.mdct import imdct_frame, mdct_forward
from opus_codec_tpu.celt.modes import standard_mode

DUMP = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                    "mdct_dump.txt")


def _vec(line):
    return np.array([float(x) for x in line.split()[1:]])


@pytest.mark.skipif(not os.path.exists(DUMP), reason="mdct dump missing")
def test_mdct_against_reference():
    m = standard_mode()
    with open(DUMP) as f:
        lines = f.read().strip().split("\n")
    idx = 0
    ncases = 0
    while idx < len(lines):
        hdr = lines[idx].split()
        assert hdr[0] == "FWD"
        shift = int(hdr[2])
        n2 = int(hdr[4])
        B = 1 << shift
        x = _vec(lines[idx + 1])
        ref_fwd = _vec(lines[idx + 2])
        assert lines[idx + 3].split()[0] == "BWD"
        hist = _vec(lines[idx + 4])
        spec = _vec(lines[idx + 5])
        ref_syn = _vec(lines[idx + 6])
        idx += 7
        ncases += 1

        # ---- forward: B interleaved blocks over the lapped input ----
        blocks = np.stack([x[b * n2: b * n2 + n2 + m.overlap]
                           for b in range(B)])
        got = mdct_forward(blocks, m.window)          # [B, n2]
        fwd = np.empty(B * n2)
        for b in range(B):
            fwd[b::B] = got[b]
        np.testing.assert_allclose(fwd, ref_fwd, rtol=2e-4, atol=2e-6)

        # ---- backward: full frame synthesis with TDAC ----
        frame, tail = imdct_frame(spec, m.window, B, hist)
        np.testing.assert_allclose(frame, ref_syn[:B * n2],
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(tail, ref_syn[B * n2:],
                                   rtol=2e-4, atol=2e-6)
    assert ncases == 4


def test_mdct_tdac_reconstruction():
    """Forward->backward across consecutive frames reconstructs the input
    (perfect reconstruction in the fully-overlapped region)."""
    m = standard_mode()
    n2 = 960
    rng = np.random.default_rng(11)
    sig = rng.standard_normal(n2 * 4)
    # encoder-style framing: frame f covers sig[f*n2 : f*n2+n2+overlap]
    tail = np.zeros(m.overlap // 2)
    out = []
    for f in range(3):
        block = sig[f * n2: f * n2 + n2 + m.overlap]
        spec = mdct_forward(block[None], m.window)[0]
        frame, tail = imdct_frame(spec, m.window, 1, tail)
        out.append(frame)
    out = np.concatenate(out)
    # after the first frame's leading overlap region, reconstruction is exact
    # up to the MDCT scaling convention: reference forward has 1/N4 * 0.5
    # factor pair such that fwd+bwd gives identity.
    lead = m.overlap
    a = sig[lead: 2 * n2]
    b = out[lead + n2 - n2: 2 * n2]  # aligned: out[k] reconstructs sig[k]
    ratio = np.dot(b[:1000], a[:1000]) / np.dot(a[:1000], a[:1000])
    np.testing.assert_allclose(b, ratio * a, atol=5e-12 * np.abs(a).max()
                               + 1e-9)
    # reference forward+backward pair is unity gain overall
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-9)
