"""Parity: encoder-side band shape transforms + spreading rotation.

The batched helpers must reproduce the scalar bands.py ops exactly in
float64: haar cascades / hadamard deinterleave (bands.c:746-785) and
the forward exp_rotation (vq.c:74-117, direction > 0)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


from opus_codec_tpu.celt import bands as B_
from opus_codec_tpu.celt import batch_analysis as ba
from opus_codec_tpu.celt.batch_decoder import _apply_ops


@pytest.mark.parametrize("N,blocks", [(44, 1), (44, 2), (44, 4),
                                      (176, 8), (22, 1), (8, 1),
                                      (96, 16)])
@pytest.mark.parametrize("exact", [True, False])
def test_exp_rotation_enc_parity(N, blocks, exact):
    rng = np.random.default_rng(0)
    B = 5
    X = rng.standard_normal((B, N))
    K = np.full(B, 5, np.int32)
    sp = np.full(B, 2, np.int32)
    got = np.asarray(ba.exp_rotation_enc(
        jnp.asarray(X), jnp.asarray(K), jnp.asarray(sp), N, blocks,
        exact=exact))
    for b in range(B):
        ref = list(X[b])
        B_.exp_rotation(ref, 0, N, 1, blocks, 5, 2)
        if exact:
            assert np.array_equal(np.asarray(ref), got[b]), \
                f"N={N} blocks={blocks} b={b}"
        else:
            np.testing.assert_allclose(got[b], np.asarray(ref),
                                       rtol=0, atol=1e-12)


@pytest.mark.parametrize("N", [96, 176, 16, 8])
def test_band_combo_parity(N):
    lm = 3
    specs = ba.band_combo_specs(N, lm)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((len(specs), N))
    tr = np.asarray([k[0] for k, _, _ in specs])
    r = np.asarray([k[1] for k, _, _ in specs], np.int32)
    td = np.asarray([k[2] for k, _, _ in specs], np.int32)
    got = np.asarray(ba.apply_band_combo(
        jnp.asarray(X), jnp.asarray(tr), jnp.asarray(r),
        jnp.asarray(td), N, lm, exact=True))
    gotf = np.asarray(ba.apply_band_combo(
        jnp.asarray(X, np.float32), jnp.asarray(tr), jnp.asarray(r),
        jnp.asarray(td), N, lm, exact=False))
    for ci, (key, B2, ops) in enumerate(specs):
        ref = np.asarray(_apply_ops(list(X[ci]), list(ops)))
        assert np.array_equal(ref, got[ci]), f"N={N} key={key}"
        np.testing.assert_allclose(gotf[ci], ref, rtol=0, atol=1e-4)


def test_band_blocks_params():
    """(r, td, B2) against _combo_ops for every feasible tf value."""
    from opus_codec_tpu.celt.batch_decoder import _combo_ops
    from opus_codec_tpu.celt.modes import TF_SELECT_TABLE, standard_mode
    m = standard_mode()
    lm = 3
    tf_vals = sorted(set(TF_SELECT_TABLE[lm]))
    cases = []          # (band, transient, tf)
    for i in (0, 10, 17, 20):
        for transient in (False, True):
            for tf in tf_vals:
                if transient or tf <= 0:
                    cases.append((i, transient, tf))
    B = len(cases)
    tr = np.asarray([c[1] for c in cases])
    tfc = np.zeros((B, 21), np.int32)
    for b, (i, _t, tf) in enumerate(cases):
        tfc[b, i] = tf
    r, td, b2 = ba.band_blocks_params(
        jnp.asarray(tr), jnp.asarray(tfc), lm, 0, 21)
    r, td, b2 = np.asarray(r), np.asarray(td), np.asarray(b2)
    for b, (i, transient, tf) in enumerate(cases):
        N = (int(m.e_bands[i + 1]) - int(m.e_bands[i])) << lm
        B0f = (1 << lm) if transient else 1
        if B0f > N:
            continue
        _f, _i, B2, rr, tdd = _combo_ops(N, B0f, tf)
        assert (r[b, i], td[b, i], b2[b, i]) == (rr, tdd, B2), \
            f"band={i} t={transient} tf={tf}: " \
            f"{(r[b, i], td[b, i], b2[b, i])} != {(rr, tdd, B2)}"
