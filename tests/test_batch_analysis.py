"""Parity: batched encoder analysis passes vs the scalar ground truth.

Each batched function must reproduce the scalar decision values exactly
on a float64 backend (the scalar functions are themselves oracle-checked
against celt_encoder.c / bands.c)."""
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


from opus_codec_tpu.celt import batch_analysis as ba
from opus_codec_tpu.celt import encoder as enc_mod
from opus_codec_tpu.celt.modes import standard_mode


def _signals(B, C, L, seed=0):
    """Mix of tonal, noisy and transient-rich (click) signals."""
    rng = np.random.default_rng(seed)
    x = np.zeros((B, C, L))
    t = np.arange(L)
    for b in range(B):
        kind = b % 4
        f = 0.01 + 0.02 * rng.random()
        base = 8000 * np.sin(2 * np.pi * f * t)
        if kind == 0:
            sig = base + 100 * rng.standard_normal(L)
        elif kind == 1:
            sig = 300 * rng.standard_normal(L)
        elif kind == 2:                    # hard onset mid-frame
            sig = 50 * rng.standard_normal(L)
            sig[L // 2:] += 6 * base[L // 2:]
        else:                              # click train
            sig = 100 * rng.standard_normal(L)
            for p in range(L // 4, L, 149):
                sig[p] += 25000 * rng.random()
        for c in range(C):
            x[b, c] = sig * (1.0 + 0.1 * c) + 10 * rng.standard_normal(L)
    return x


@pytest.mark.parametrize("C", [1, 2])
def test_transient_analysis_parity(C):
    B, L = 8, 1080
    x = _signals(B, C, L)
    ist, tfe, tfc, mm = ba.transient_analysis_batch(
        jnp.asarray(x, jnp.float64), exact=True)
    got_t = np.asarray(ist)
    got_e = np.asarray(tfe)
    got_c = np.asarray(tfc)
    n_trans = 0
    for b in range(B):
        w_t, w_e, w_c, _weak = enc_mod.transient_analysis(
            x[b], L, C, False)
        assert bool(got_t[b]) == bool(w_t), f"transient b={b}"
        assert got_e[b] == pytest.approx(w_e, abs=0, rel=0), f"tfe b={b}"
        assert int(got_c[b]) == int(w_c), f"tf_chan b={b}"
        n_trans += int(w_t)
    assert 0 < n_trans < B, "fixture should mix transient/steady"


@pytest.mark.parametrize("C", [1, 2])
def test_patch_transient_parity(C):
    B, nb = 8, 21
    rng = np.random.default_rng(1)
    newE = rng.uniform(-10, 10, (B, C, nb))
    oldE = newE - rng.uniform(-1, 4, (B, C, nb))
    got = np.asarray(ba.patch_transient_batch(
        jnp.asarray(newE, jnp.float64), jnp.asarray(oldE, jnp.float64),
        0, nb))
    for b in range(B):
        want = enc_mod.patch_transient_decision(newE[b], oldE[b], nb,
                                                0, nb, C)
        assert bool(got[b]) == bool(want), f"b={b}"


@pytest.mark.parametrize("C,lm", [(1, 3), (2, 3), (1, 2)])
def test_tf_analysis_parity(C, lm):
    m = standard_mode()
    B = 6
    N0 = m.short_mdct_size << lm
    eff_end = end = 21
    rng = np.random.default_rng(2)
    X = rng.standard_normal((B, C, N0))
    # normalise per band so magnitudes look like unit-band spectra
    for i in range(21):
        lo, hi = int(m.e_bands[i]) << lm, int(m.e_bands[i + 1]) << lm
        X[:, :, lo:hi] /= np.linalg.norm(X[:, :, lo:hi], axis=2,
                                         keepdims=True)
    is_t = np.asarray([b % 2 == 0 for b in range(B)])
    tfe = rng.uniform(0, 0.6, B)
    lam = rng.integers(80, 300, B)
    importance = rng.integers(1, 200, (B, 21)).astype(np.int32)
    tf_chan = rng.integers(0, C, B).astype(np.int32)

    res, sel = ba.tf_analysis_batch(
        jnp.asarray(X, jnp.float64), jnp.asarray(tf_chan),
        jnp.asarray(is_t), jnp.asarray(tfe, jnp.float64),
        jnp.asarray(lam, np.int32), jnp.asarray(importance),
        lm, eff_end, end, exact=True)
    res = np.asarray(res)
    sel = np.asarray(sel)
    for b in range(B):
        Xflat = list(X[b, 0]) + (list(X[b, 1]) if C == 2 else [])
        tf_res = [0] * 21
        want_sel = enc_mod.tf_analysis(
            m, eff_end, bool(is_t[b]), tf_res, int(lam[b]), Xflat, N0,
            lm, float(tfe[b]), int(tf_chan[b]), list(importance[b]))
        assert int(sel[b]) == int(want_sel), f"tf_select b={b}"
        assert list(res[b, :eff_end]) == tf_res[:eff_end], f"tf_res b={b}"


@pytest.mark.parametrize("C", [1, 2])
def test_spreading_decision_parity(C):
    from opus_codec_tpu.celt import bands as B_
    m = standard_mode()
    lm = 3
    B = 6
    N0 = m.short_mdct_size << lm
    rng = np.random.default_rng(3)
    X = rng.standard_normal((B, C, N0))
    for i in range(21):
        lo, hi = int(m.e_bands[i]) << lm, int(m.e_bands[i + 1]) << lm
        X[:, :, lo:hi] /= np.linalg.norm(X[:, :, lo:hi], axis=2,
                                         keepdims=True)
        # make some bands tonal (energy on one bin)
        if i % 3 == 0:
            X[:, :, lo:hi] *= 0.01
            X[:, :, lo] = 1.0
    sw = rng.integers(1, 33, (B, 21)).astype(np.int32)
    upd = np.asarray([b % 2 == 0 for b in range(B)])
    tav = rng.integers(0, 400, B).astype(np.int32)
    last = rng.integers(0, 4, B).astype(np.int32)
    hfav = rng.integers(0, 30, B).astype(np.int32)
    tap = rng.integers(0, 3, B).astype(np.int32)

    dec, tav2, hf2, tap2 = ba.spreading_decision_batch(
        jnp.asarray(X, jnp.float64), jnp.asarray(sw),
        jnp.asarray(upd), jnp.asarray(tav), jnp.asarray(last),
        jnp.asarray(hfav), jnp.asarray(tap), 21, lm, exact=True)
    for b in range(B):
        want = B_.spreading_decision(
            m, [list(X[b, c]) for c in range(C)], int(tav[b]),
            int(last[b]), int(hfav[b]), int(tap[b]), bool(upd[b]), 21,
            C, 1 << lm, list(sw[b]))
        w_dec, w_tav, w_hf, w_tap = want
        assert int(np.asarray(dec)[b]) == int(w_dec), f"decision b={b}"
        assert int(np.asarray(tav2)[b]) == int(w_tav), f"tonal b={b}"
        assert int(np.asarray(hf2)[b]) == int(w_hf), f"hf b={b}"
        assert int(np.asarray(tap2)[b]) == int(w_tap), f"tapset b={b}"
