"""Weight-blob container format vs the reference parser.

The reference fetches its pretrained model blob at build time
(build.rs:156-184 — no network in this environment), so the blobs the
neural stack loads here are locally generated.  What this test pins
down is that the CONTAINER is byte-compatible: a blob produced by
``dnn.weights.write_weights`` must parse identically through the
reference's parse_lpcnet_weights.c:55 (name/type/size/payload), and a
blob with every array type must roundtrip through our own parser.
"""
import os
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.dnn import weights as W

_ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "oracle", "weights_check")


def _fnv1a(b: bytes) -> int:
    h = 2166136261
    for x in b:
        h = ((h ^ x) * 16777619) & 0xFFFFFFFF
    return h


def _sample_arrays():
    rng = np.random.default_rng(11)
    return [
        W.WeightArray("lay1_bias", W.WEIGHT_TYPE_float,
                      rng.standard_normal(96).astype("<f4")),
        W.WeightArray("lay1_weights_int8", W.WEIGHT_TYPE_int8,
                      rng.integers(-127, 127, 96 * 64).astype("<i1")),
        W.WeightArray("lay1_weights_idx", W.WEIGHT_TYPE_int,
                      rng.integers(0, 64, 200).astype("<i4")),
        W.WeightArray("lay1_scale", W.WEIGHT_TYPE_float,
                      rng.uniform(0.01, 0.1, 96).astype("<f4")),
        W.WeightArray("gru_recurrent_weights_float",
                      W.WEIGHT_TYPE_qweight,
                      rng.integers(-127, 127, 33).astype("<i1")),
    ]


def test_roundtrip_own_parser():
    arrays = _sample_arrays()
    blob = W.write_weights(arrays)
    back = W.parse_weights(blob)
    assert list(back) == [a.name for a in arrays]
    for a in arrays:
        got = back[a.name]
        assert got.type == a.type
        np.testing.assert_array_equal(got.data, a.data)


@pytest.mark.skipif(not os.path.exists(_ORACLE),
                    reason="weights_check oracle not built")
def test_blob_parses_with_reference_parser():
    arrays = _sample_arrays()
    blob = W.write_weights(arrays)
    r = subprocess.run([_ORACLE], input=blob, capture_output=True)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.decode().strip().splitlines()
    assert len(lines) == len(arrays)
    for line, a in zip(lines, arrays):
        name, typ, size, chk = line.split()
        assert name == a.name
        assert int(typ) == a.type
        assert int(size) == a.data.nbytes
        assert int(chk, 16) == _fnv1a(a.data.tobytes())
