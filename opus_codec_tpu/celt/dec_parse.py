"""CELT decode — the dry symbol parse (host lane).

The batched TPU decoder splits `celt_decode_with_ec` the same way the
batched encoder splits the encode path (SURVEY §7): the inherently
serial range-coder parse runs on the host, extracting every coded
symbol into fixed-shape per-stream record arrays, and the batched
device pipeline (``celt.batch_decoder``) replays the *placement-static*
band tree to synthesize PCM for the whole stream batch at once.

The parse is "dry": it never touches float spectral data.  Every
decode-side control decision in the reference depends only on integer
budget arithmetic (tell/tell_frac), decoded symbols, and static mode
tables — never on resynthesized values — which is what makes this
split possible.

Behavioural parity: /root/reference/opus/celt/celt_decoder.c:970-1365
(frame parse), bands.c:943-1231 (partition traversal, decode direction),
rate.c:534-645 (allocation), quant_bands.c:428-542 (energy symbols).
The scalar ``celt.decoder.CeltDecoder`` is the tested ground truth this
parse + the device synthesis are validated against.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from ..errors import OpusError
from .bands import BIT_INTERLEAVE_TABLE, _compute_qn
from .modes import (BITRES, CeltMode, SPREAD_NORMAL, SPREAD_ICDF,
                    TAPSET_ICDF, TF_SELECT_TABLE, TRIM_ICDF, get_pulses,
                    standard_mode)
from .cwrs import V
from .decoder import tf_decode
from .rate import compute_allocation

__all__ = ["NodeTable", "node_table", "FrameSyms", "parse_frame",
           "stack_syms"]


# ---------------------------------------------------------------------------
# Static tree layout: placement-ordered nodes per band.

@dataclass(frozen=True)
class NodeTable:
    """Per-(mode, lm) static band-tree layout.

    Nodes are indexed in *placement preorder* per band: node, then the
    mid (first-half) subtree, then the side subtree.  A node exists
    wherever the reference's `_quant_partition` recursion *could* visit
    (split allowed while LM != -1 and N > 2); per-stream data decides
    leaf/split at run time."""
    lm: int
    n_nodes: int
    band_first: np.ndarray   # [nb] first node id of band i
    band_count: np.ndarray   # [nb] node count of band i
    node_band: np.ndarray    # [n] band
    node_depth: np.ndarray   # [n]
    node_n: np.ndarray       # [n] coefficient count
    node_off: np.ndarray     # [n] offset within the band
    node_child: np.ndarray   # [n, 2] child ids (-1 = cannot split)


@lru_cache(maxsize=None)
def node_table(lm: int, mode_key: Optional[int] = None) -> NodeTable:
    m = standard_mode()
    nb = m.nb_ebands
    band_first = np.zeros(nb, np.int32)
    band_count = np.zeros(nb, np.int32)
    band, depth, nn, off, child = [], [], [], [], []

    def rec(i: int, N: int, lm_k: int, o: int) -> int:
        idx = len(band)
        band.append(i)
        depth.append(lm - lm_k)
        nn.append(N)
        off.append(o)
        child.append([-1, -1])
        if lm_k != -1 and N > 2:
            half = N >> 1
            child[idx][0] = rec(i, half, lm_k - 1, o)
            child[idx][1] = rec(i, half, lm_k - 1, o + half)
        return idx

    for i in range(nb):
        band_first[i] = len(band)
        N = int(m.e_bands[i + 1] - m.e_bands[i]) << lm
        rec(i, N, lm, 0)
        band_count[i] = len(band) - band_first[i]
    return NodeTable(
        lm=lm, n_nodes=len(band),
        band_first=band_first, band_count=band_count,
        node_band=np.asarray(band, np.int32),
        node_depth=np.asarray(depth, np.int32),
        node_n=np.asarray(nn, np.int32),
        node_off=np.asarray(off, np.int32),
        node_child=np.asarray(child, np.int32))


# node kinds
NODE_NONE = -1      # not visited (an ancestor was a leaf)
NODE_ZERO = 0       # leaf, no pulses (zeros / fold / noise by fill)
NODE_PVQ = 1        # leaf with K pulses, CWRS index recorded
NODE_SPLIT = 2      # theta split; children visited


@dataclass
class FrameSyms:
    """Every symbol of one CELT frame, parse output (ints only)."""
    lm: int
    silence: bool = False
    pf_pitch: int = 0           # postfilter period (0 = none coded)
    pf_qg: int = -1             # gain index, -1 = postfilter off
    pf_tapset: int = 0
    transient: bool = False
    intra: bool = False
    spread: int = SPREAD_NORMAL
    qi: Optional[np.ndarray] = None          # [nb] coarse residuals
    tf_res: Optional[np.ndarray] = None      # [nb] final tf per band
    fine_q: Optional[np.ndarray] = None      # [nb] decoded fine values (-1)
    fine_bits: Optional[np.ndarray] = None   # [nb] ebits (for offsets)
    finalise: Optional[np.ndarray] = None    # [2, nb] (-1 = not read)
    pulses: Optional[np.ndarray] = None      # [nb] allocation (q3 bits)
    sign_n1: Optional[np.ndarray] = None     # [nb] N==1 band sign (-1)
    # per static node:
    node_kind: Optional[np.ndarray] = None   # [n_nodes]
    node_k: Optional[np.ndarray] = None      # [n_nodes]
    node_index: Optional[np.ndarray] = None  # [n_nodes] uint32
    node_itheta: Optional[np.ndarray] = None  # [n_nodes] q14
    node_fill: Optional[np.ndarray] = None   # [n_nodes] leaf fill bits
    node_seed: Optional[np.ndarray] = None   # [n_nodes] LCG state at leaf
    # per band shape-transform params (entering the partition)
    band_B: Optional[np.ndarray] = None        # [nb] blocks after tf
    band_recombine: Optional[np.ndarray] = None
    band_time_divide: Optional[np.ndarray] = None
    band_eff_lowband: Optional[np.ndarray] = None  # [nb] (-1 = none)
    collapse_masks: Optional[np.ndarray] = None    # [nb] final cm per band
    anti_collapse_on: bool = False
    seed_after_bands: int = 0   # LCG state entering anti_collapse
    final_range: int = 0
    dual_stereo: int = 0
    intensity: int = 0


class _DryBand:
    """Decode-direction `_quant_band`/`_quant_partition` with the float
    work stripped out; records node symbols in placement order."""

    def __init__(self, m: CeltMode, dec: RangeDecoder, syms: FrameSyms,
                 tab: NodeTable, spread: int, lm: int, seed: int):
        self.m = m
        self.dec = dec
        self.s = syms
        self.tab = tab
        self.spread = spread
        self.lm = lm
        self.remaining_bits = 0
        self.i = 0
        self.seed = seed & 0xFFFFFFFF

    # bands.c:943-1105, decode, mono.  B0 is this invocation's entry B.
    def partition(self, node: int, N: int, b: int, B: int,
                  LM: int, fill: int) -> int:
        m = self.m
        i = self.i
        dec = self.dec
        s = self.s
        B0 = B
        cache_off = m.cache_index[(LM + 1) * m.nb_ebands + i]
        cache = m.cache_bits
        if LM != -1 and \
                b > int(cache[cache_off + int(cache[cache_off])]) + 12 \
                and N > 2:
            N >>= 1
            LM -= 1
            if B == 1:
                fill = (fill & 1) | (fill << 1)
            B = (B + 1) >> 1
            itheta, qalloc, delta = self._theta_mono(N, b, B, B0, LM, i)
            s.node_kind[node] = NODE_SPLIT
            s.node_itheta[node] = itheta
            b -= qalloc
            self.remaining_bits -= qalloc

            if itheta == 0:
                fill &= (1 << B) - 1
                delta = -16384
            elif itheta == 16384:
                fill &= ((1 << B) - 1) << B
                delta = 16384
            if B0 > 1 and (itheta & 0x3fff):
                if itheta > 8192:
                    delta -= delta >> (4 - LM)
                else:
                    delta = min(0, delta + (N << BITRES >> (5 - LM)))
            mbits = max(0, min(b, (b - delta) // 2))
            sbits = b - mbits
            c0, c1 = self.tab.node_child[node]
            cm = 0
            rebalance = self.remaining_bits
            if mbits >= sbits:
                cm = self.partition(c0, N, mbits, B, LM, fill)
                rebalance = mbits - (rebalance - self.remaining_bits)
                if rebalance > 3 << BITRES and itheta != 0:
                    sbits += rebalance - (3 << BITRES)
                cm |= self.partition(c1, N, sbits, B, LM,
                                     fill >> B) << (B0 >> 1)
            else:
                cm = self.partition(c1, N, sbits, B, LM,
                                    fill >> B) << (B0 >> 1)
                rebalance = sbits - (rebalance - self.remaining_bits)
                if rebalance > 3 << BITRES and itheta != 16384:
                    mbits += rebalance - (3 << BITRES)
                cm |= self.partition(c0, N, mbits, B, LM, fill)
            return cm

        # leaf (bands.c:1036-1102)
        q = m.bits2pulses(i, LM, b)
        curr_bits = m.pulses2bits(i, LM, q)
        self.remaining_bits -= curr_bits
        while self.remaining_bits < 0 and q > 0:
            self.remaining_bits += curr_bits
            q -= 1
            curr_bits = m.pulses2bits(i, LM, q)
            self.remaining_bits -= curr_bits
        if q != 0:
            K = get_pulses(q)
            total = V(N, K)
            assert total <= 1 << 32
            idx = dec.dec_uint(total)
            s.node_kind[node] = NODE_PVQ
            s.node_k[node] = K
            s.node_index[node] = idx
            # collapse mask of a PVQ leaf depends on the pulse vector;
            # the device computes it — but the parse needs it for the
            # fold masks of LATER bands, so compute it here too (cheap
            # integer CWRS inversion).
            from .cwrs import cwrsi
            if B > 1:                     # _extract_collapse_mask (vq.c:143)
                y = cwrsi(N, K, idx)
                N0 = N // B
                cm = 0
                for blk in range(B):
                    if any(y[blk * N0 + j] != 0 for j in range(N0)):
                        cm |= 1 << blk
                return cm
            return 1
        s.node_kind[node] = NODE_ZERO
        s.node_fill[node] = fill & ((1 << B) - 1)
        s.node_seed[node] = self.seed
        fill &= (1 << B) - 1
        if not fill:
            return 0
        # noise/fold both consume N LCG draws (bands.c:1076-1095); track
        # the seed here so the device leaves are order-independent
        from .bands import celt_lcg_rand
        sd = self.seed
        for _ in range(N):
            sd = celt_lcg_rand(sd)
        self.seed = sd & 0xFFFFFFFF
        if s.band_eff_lowband[i] < 0:
            return (1 << B) - 1
        return fill

    # _compute_theta, mono decode (bands.c:700-903)
    def _theta_mono(self, N: int, b: int, B: int, B0: int, LM: int,
                    i: int) -> Tuple[int, int, int]:
        import math
        m = self.m
        dec = self.dec
        pulse_cap = int(m.log_n[i]) + LM * (1 << BITRES)
        offset = (pulse_cap >> 1) - 4  # QTHETA_OFFSET == 4
        qn = _compute_qn(N, b, offset, pulse_cap, 0)
        tell = dec.tell_frac()
        itheta = 0
        if qn != 1:
            if B0 > 1:
                itheta = dec.dec_uint(qn + 1)
            else:
                ft = ((qn >> 1) + 1) * ((qn >> 1) + 1)
                fm = dec.decode(ft)
                if fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1):
                    itheta = (math.isqrt(8 * fm + 1) - 1) >> 1
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    itheta = (2 * (qn + 1)
                              - math.isqrt(8 * (ft - fm - 1) + 1)) >> 1
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                dec.update(fl, fl + fs, ft)
            itheta = (itheta * 16384) // qn
        qalloc = dec.tell_frac() - tell

        if itheta == 0:
            delta = -16384
        elif itheta == 16384:
            delta = 16384
        else:
            from .bands import bitexact_cos, bitexact_log2tan, _frac_mul16
            imid = bitexact_cos(itheta)
            iside = bitexact_cos(16384 - itheta)
            delta = _frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid))
        return itheta, qalloc, delta


def parse_frame(data: bytes, lm: int,
                dec: Optional[RangeDecoder] = None,
                start: int = 0, end: int = 21,
                seed: int = 0) -> FrameSyms:
    """Parse one mono CELT frame's symbols (no float work).

    ``seed`` is the decoder's carried LCG state (the previous frame's
    final_range); the parse tracks its consumption so each noise/fold
    leaf records its own entry state.

    Mirrors celt_decode_with_ec (celt_decoder.c:970-1365) for
    C == CC == 1, downsample == 1, start == 0."""
    m = standard_mode()
    nb = m.nb_ebands
    tab = node_table(lm)
    M = 1 << lm
    N = M * m.short_mdct_size
    length = len(data)
    if length > 1275:
        raise OpusError.bad_arg("frame too large")
    if dec is None:
        dec = RangeDecoder(data)
    total_bits = length * 8

    s = FrameSyms(lm=lm)
    s.qi = np.zeros(nb, np.int32)
    s.tf_res = np.zeros(nb, np.int32)
    s.fine_q = np.full(nb, -1, np.int32)
    s.fine_bits = np.zeros(nb, np.int32)
    s.finalise = np.full((2, nb), -1, np.int32)
    s.pulses = np.zeros(nb, np.int32)
    s.sign_n1 = np.full(nb, -1, np.int32)
    s.node_kind = np.full(tab.n_nodes, NODE_NONE, np.int32)
    s.node_k = np.zeros(tab.n_nodes, np.int32)
    s.node_index = np.zeros(tab.n_nodes, np.uint32)
    s.node_itheta = np.zeros(tab.n_nodes, np.int32)
    s.node_fill = np.zeros(tab.n_nodes, np.int32)
    s.node_seed = np.zeros(tab.n_nodes, np.uint32)
    s.collapse_masks = np.zeros(nb, np.int32)
    s.band_B = np.ones(nb, np.int32)
    s.band_recombine = np.zeros(nb, np.int32)
    s.band_time_divide = np.zeros(nb, np.int32)
    s.band_eff_lowband = np.full(nb, -1, np.int32)

    tell = dec.tell()
    if tell >= total_bits:
        silence = True
    elif tell == 1:
        silence = bool(dec.dec_bit_logp(15))
    else:
        silence = False
    s.silence = silence
    if silence:
        tell = length * 8
        dec.nbits_total += tell - dec.tell()

    if start == 0 and tell + 16 <= total_bits:
        if dec.dec_bit_logp(1):
            octave = dec.dec_uint(6)
            s.pf_pitch = (16 << octave) + dec.dec_bits(4 + octave) - 1
            s.pf_qg = dec.dec_bits(3)
            if dec.tell() + 2 <= total_bits:
                s.pf_tapset = dec.dec_icdf(TAPSET_ICDF, 2)
        tell = dec.tell()

    if lm > 0 and tell + 3 <= total_bits:
        s.transient = bool(dec.dec_bit_logp(3))
        tell = dec.tell()
    shortBlocks = M if s.transient else 0

    intra = bool(dec.dec_bit_logp(3)) if tell + 3 <= total_bits else False
    s.intra = intra

    # coarse energy symbols (unquant_coarse_energy, qi only)
    _parse_coarse(dec, s, lm, total_bits, start, end)

    tf = [0] * nb
    tf_decode(start, end, s.transient, tf, lm, dec)
    s.tf_res = np.asarray(tf, np.int32)

    tell = dec.tell()
    spread = SPREAD_NORMAL
    if tell + 4 <= total_bits:
        spread = dec.dec_icdf(SPREAD_ICDF, 5)
    s.spread = spread

    cap = m.init_caps(lm, 1)
    offsets = [0] * nb
    dynalloc_logp = 6
    total_bits_frac = total_bits << BITRES
    tell_frac = dec.tell_frac()
    for i in range(start, end):
        width = int(m.e_bands[i + 1] - m.e_bands[i]) << lm
        quanta = min(width << BITRES, max(6 << BITRES, width))
        loop_logp = dynalloc_logp
        boost = 0
        while tell_frac + (loop_logp << BITRES) < total_bits_frac \
                and boost < cap[i]:
            flag = dec.dec_bit_logp(loop_logp)
            tell_frac = dec.tell_frac()
            if not flag:
                break
            boost += quanta
            total_bits_frac -= quanta
            loop_logp = 1
        offsets[i] = boost
        if boost > 0:
            dynalloc_logp = max(2, dynalloc_logp - 1)

    alloc_trim = 5
    if tell_frac + (6 << BITRES) <= total_bits_frac:
        alloc_trim = dec.dec_icdf(TRIM_ICDF, 7)

    bits = ((length * 8) << BITRES) - dec.tell_frac() - 1
    anti_collapse_rsv = (1 << BITRES) if (s.transient and lm >= 2 and
                                          bits >= ((lm + 2) << BITRES)) \
        else 0
    bits -= anti_collapse_rsv

    alloc = compute_allocation(m, start, end, offsets, cap, alloc_trim,
                               0, 0, bits, 1, lm, dec, False)
    s.pulses = np.asarray(alloc.pulses, np.int32)
    s.fine_bits = np.asarray(alloc.ebits, np.int32)
    s.dual_stereo = alloc.dual_stereo
    s.intensity = alloc.intensity

    # fine energy values
    for i in range(start, end):
        if alloc.ebits[i] > 0:
            s.fine_q[i] = dec.dec_bits(alloc.ebits[i])

    # the band tree (quant_all_bands, decode, mono)
    _parse_bands(dec, s, m, tab, lm, start, end, shortBlocks, spread,
                 alloc, length, anti_collapse_rsv, seed)

    if anti_collapse_rsv > 0:
        s.anti_collapse_on = bool(dec.dec_bits(1))

    # energy finalise values
    bits_left = length * 8 - dec.tell()
    for prio in range(2):
        for i in range(start, end):
            if bits_left < 1:
                break
            if alloc.ebits[i] >= 8 or alloc.fine_priority[i] != prio:
                continue
            s.finalise[prio, i] = dec.dec_bits(1)
            bits_left -= 1

    s.final_range = dec.rng
    if dec.tell() > 8 * length:
        raise OpusError(-3, "decoder overran the frame")
    return s


def _parse_coarse(dec: RangeDecoder, s: FrameSyms, lm: int,
                  total_bits: int, start: int, end: int) -> None:
    """qi symbols of unquant_coarse_energy (quant_bands.c:428-491)."""
    from ..bitstream.laplace import laplace_decode
    from .modes import E_PROB_MODEL, SMALL_ENERGY_ICDF
    prob_model = E_PROB_MODEL[lm][1 if s.intra else 0]
    budget = total_bits
    for i in range(start, end):
        tell = dec.tell()
        if budget - tell >= 15:
            pi = 2 * min(i, 20)
            qi = laplace_decode(dec, prob_model[pi] << 7,
                                prob_model[pi + 1] << 6)
        elif budget - tell >= 2:
            qi = dec.dec_icdf(SMALL_ENERGY_ICDF, 2)
            qi = (qi >> 1) ^ -(qi & 1)
        elif budget - tell >= 1:
            qi = -dec.dec_bit_logp(1)
        else:
            qi = -1
        s.qi[i] = qi


def _parse_bands(dec: RangeDecoder, s: FrameSyms, m: CeltMode,
                 tab: NodeTable, lm: int, start: int, end: int,
                 shortBlocks: int, spread: int, alloc, length: int,
                 anti_collapse_rsv: int, seed: int) -> None:
    """quant_all_bands (bands.c:1398-1672), decode direction, mono."""
    from .modes import SPREAD_AGGRESSIVE
    e_bands = m.e_bands
    M = 1 << lm
    B = M if shortBlocks else 1
    norm_offset = M * int(e_bands[start])
    total_bits = length * (8 << BITRES) - anti_collapse_rsv
    balance = alloc.balance
    codedBands = alloc.coded_bands
    pulses = alloc.pulses

    dry = _DryBand(m, dec, s, tab, spread, lm, seed)

    lowband_offset = 0
    update_lowband = True
    collapse_masks = [0] * m.nb_ebands
    for i in range(start, end):
        dry.i = i
        last = (i == end - 1)
        N = M * int(e_bands[i + 1] - e_bands[i])
        tell = dec.tell_frac()
        if i != start:
            balance -= tell
        remaining_bits = total_bits - tell - 1
        dry.remaining_bits = remaining_bits
        if i <= codedBands - 1:
            curr_balance = balance // min(3, codedBands - i) \
                if balance >= 0 else -((-balance) // min(3, codedBands - i))
            b = max(0, min(16383, min(remaining_bits + 1,
                                      pulses[i] + curr_balance)))
        else:
            b = 0

        if (M * int(e_bands[i]) - N >= M * int(e_bands[start])
                or i == start + 1) and (update_lowband
                                        or lowband_offset == 0):
            lowband_offset = i
        # note: _special_hybrid_folding only matters for start > 0

        tf_change = int(s.tf_res[i])

        effective_lowband = -1
        if lowband_offset != 0 and (spread != SPREAD_AGGRESSIVE or B > 1
                                    or tf_change < 0):
            effective_lowband = max(0, M * int(e_bands[lowband_offset])
                                    - norm_offset - N)
            fold_start = lowband_offset
            while M * int(e_bands[fold_start - 1]) > \
                    effective_lowband + norm_offset:
                fold_start -= 1
            fold_end = lowband_offset - 1
            while True:
                fold_end += 1
                if not (fold_end < i and M * int(e_bands[fold_end]) <
                        effective_lowband + norm_offset + N):
                    break
            x_cm = 0
            fold_i = fold_start
            while True:
                x_cm |= collapse_masks[fold_i]
                fold_i += 1
                if fold_i >= fold_end:
                    break
        else:
            x_cm = (1 << B) - 1
        s.band_eff_lowband[i] = effective_lowband

        node0 = int(tab.band_first[i])
        if N == 1:
            # quant_band_n1 (bands.c:904-937)
            sign = 0
            if dry.remaining_bits >= 1 << BITRES:
                sign = dec.dec_bits(1)
                dry.remaining_bits -= 1 << BITRES
            s.sign_n1[i] = sign
            s.node_kind[node0] = NODE_PVQ   # marker; device special-cases
            x_cm = 1
        else:
            # shape-transform parameters (quant_band preamble,
            # bands.c:1109-1180, decode: only lowband is transformed)
            N_B = N // B
            B_band = B
            recombine = tf_change if tf_change > 0 else 0
            B2 = B_band >> recombine
            N_B2 = N_B << recombine
            time_divide = 0
            tfc = tf_change
            while (N_B2 & 1) == 0 and tfc < 0:
                B2 <<= 1
                N_B2 >>= 1
                time_divide += 1
                tfc += 1
            s.band_B[i] = B2
            s.band_recombine[i] = recombine
            s.band_time_divide[i] = time_divide
            # fill through the forward transforms (bands.c:754-771)
            fill = x_cm
            for _ in range(recombine):
                fill = BIT_INTERLEAVE_TABLE[fill & 0xF] | \
                    (BIT_INTERLEAVE_TABLE[fill >> 4] << 2)
            Bf = B_band >> recombine
            N_Bf = N_B << recombine
            tfc = tf_change
            while (N_Bf & 1) == 0 and tfc < 0:
                fill |= fill << Bf
                Bf <<= 1
                N_Bf >>= 1
                tfc += 1

            x_cm = dry.partition(node0, N, b, B2, lm, fill)

            # resynth-side cm propagation (bands.c:788-808)
            cm = x_cm
            Bq = B2
            N_Bq = N_B2
            for _ in range(time_divide):
                Bq >>= 1
                N_Bq <<= 1
                cm |= cm >> Bq
            from .bands import BIT_DEINTERLEAVE_TABLE
            for _ in range(recombine):
                cm = BIT_DEINTERLEAVE_TABLE[cm]
            Bq <<= recombine
            cm &= (1 << Bq) - 1
            x_cm = cm

        collapse_masks[i] = x_cm & 0xFF
        balance += pulses[i] + tell
        update_lowband = b > (N << BITRES)
    s.collapse_masks = np.asarray(collapse_masks, np.int32)
    s.seed_after_bands = dry.seed


def stack_syms(frames: List[FrameSyms]) -> dict:
    """Stack per-stream FrameSyms into batched numpy arrays."""
    def arr(name):
        return np.stack([getattr(f, name) for f in frames])

    return dict(
        silence=np.asarray([f.silence for f in frames]),
        transient=np.asarray([f.transient for f in frames]),
        intra=np.asarray([f.intra for f in frames]),
        spread=np.asarray([f.spread for f in frames], np.int32),
        pf_pitch=np.asarray([f.pf_pitch for f in frames], np.int32),
        pf_qg=np.asarray([f.pf_qg for f in frames], np.int32),
        pf_tapset=np.asarray([f.pf_tapset for f in frames], np.int32),
        qi=arr("qi"), tf_res=arr("tf_res"), fine_q=arr("fine_q"),
        fine_bits=arr("fine_bits"), finalise=arr("finalise"),
        pulses=arr("pulses"), sign_n1=arr("sign_n1"),
        node_kind=arr("node_kind"), node_k=arr("node_k"),
        node_index=arr("node_index"), node_itheta=arr("node_itheta"),
        node_fill=arr("node_fill"), node_seed=arr("node_seed"),
        band_B=arr("band_B"),
        band_recombine=arr("band_recombine"),
        band_time_divide=arr("band_time_divide"),
        band_eff_lowband=arr("band_eff_lowband"),
        collapse_masks=arr("collapse_masks"),
        anti_collapse_on=np.asarray([f.anti_collapse_on for f in frames]),
        seed_after_bands=np.asarray([f.seed_after_bands for f in frames],
                                    np.uint32),
        final_range=np.asarray([f.final_range for f in frames], np.uint32),
    )
