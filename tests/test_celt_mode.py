"""Validate computed CELT mode tables against the reference static mode dump
(tools/oracle/mode_dump.c) and spot-check CWRS enumeration
(mirrors opus/celt/tests/test_unit_cwrs32.c)."""
import os
import random

import numpy as np
import pytest

from opus_codec_tpu.celt import cwrs
from opus_codec_tpu.celt.modes import standard_mode

DUMP = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                    "mode_dump.txt")


def _parse_dump():
    d = {}
    with open(DUMP) as f:
        lines = f.read().strip().split("\n")
    hdr = lines[0].split()
    d["Fs"], d["shortMdctSize"], d["maxLM"] = int(hdr[1]), int(hdr[3]), int(hdr[5])
    d["nbEBands"], d["effEBands"], d["overlap"] = int(hdr[7]), int(hdr[9]), int(hdr[11])
    for line in lines[1:]:
        parts = line.split()
        if parts[0] == "cache_size":
            d["cache_size"] = int(parts[1])
        elif parts[0] == "window":
            d["window"] = np.array([float(x) for x in parts[1:]])
        else:
            d[parts[0]] = np.array([int(x) for x in parts[1:]])
    return d


@pytest.mark.skipif(not os.path.exists(DUMP), reason="mode dump missing")
def test_mode_matches_reference():
    ref = _parse_dump()
    m = standard_mode(48000, 960)
    assert m.fs == ref["Fs"]
    assert m.short_mdct_size == ref["shortMdctSize"]
    assert m.max_lm == ref["maxLM"]
    assert m.nb_ebands == ref["nbEBands"]
    assert m.eff_ebands == ref["effEBands"]
    assert m.overlap == ref["overlap"]
    np.testing.assert_array_equal(m.e_bands, ref["eBands"])
    np.testing.assert_array_equal(m.log_n, ref["logN"])
    np.testing.assert_array_equal(m.cache_index, ref["cache_index"])
    assert len(m.cache_bits) == ref["cache_size"]
    np.testing.assert_array_equal(m.cache_bits, ref["cache_bits"])
    np.testing.assert_array_equal(m.cache_caps, ref["cache_caps"])
    np.testing.assert_array_equal(m.alloc_vectors.ravel(), ref["allocVectors"])
    # float32 static table vs our float64 computation
    np.testing.assert_allclose(m.window, ref["window"], atol=1e-6)


def test_cwrs_v_table():
    # V(N,K) values from the cwrs.c reference comment table
    V_ref = [
        [1, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [1, 2, 2, 2, 2, 2, 2, 2, 2, 2],
        [1, 4, 8, 12, 16, 20, 24, 28, 32, 36],
        [1, 6, 18, 38, 66, 102, 146, 198, 258, 326],
        [1, 8, 32, 88, 192, 360, 608, 952, 1408, 1992],
        [1, 10, 50, 170, 450, 1002, 1970, 3530, 5890, 9290],
        [1, 12, 72, 292, 912, 2364, 5336, 10836, 20256, 35436],
        [1, 14, 98, 462, 1666, 4942, 12642, 28814, 59906, 115598],
        [1, 16, 128, 688, 2816, 9424, 27008, 68464, 157184, 332688],
        [1, 18, 162, 978, 4482, 16722, 53154, 148626, 374274, 864146],
    ]
    for n in range(10):
        for k in range(10):
            if n == 0 and k > 0:
                continue
            assert cwrs.V(n, k) == V_ref[n][k], (n, k)


def test_cwrs_index_roundtrip():
    rng = random.Random(5)
    for _ in range(300):
        n = rng.randint(2, 40)
        k = rng.randint(1, 16)
        # random pulse vector with L1 norm k
        y = [0] * n
        for _ in range(k):
            y[rng.randrange(n)] += 1
        y = [v if rng.random() < 0.5 else -v for v in y]
        i = cwrs.icwrs(y)
        assert 0 <= i < cwrs.V(n, k)
        assert cwrs.cwrsi(n, k, i) == y


def test_cwrs_exhaustive_small():
    # every index decodes to a distinct vector that re-encodes to itself
    for n, k in [(2, 3), (3, 2), (4, 4), (5, 1), (2, 1)]:
        seen = set()
        for i in range(cwrs.V(n, k)):
            y = cwrs.cwrsi(n, k, i)
            assert sum(abs(v) for v in y) == k
            assert cwrs.icwrs(y) == i
            seen.add(tuple(y))
        assert len(seen) == cwrs.V(n, k)
