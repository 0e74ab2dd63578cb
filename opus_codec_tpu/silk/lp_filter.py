"""Variable-cutoff low-pass for bandwidth transitions (encoder side).

Reference: silk/LP_variable_cutoff.c (piece-wise interpolated elliptic
biquads ramped over 256 frames), silk/biquad_alt.c:47-80
(silk_biquad_alt_stride1), silk/control_audio_bandwidth.c:36-131 (the
internal-rate switching state machine).  All fixed-point exact.
"""

from __future__ import annotations

import numpy as np

from . import tables as T
from .sigproc import RSHIFT_ROUND, SMLAWB, SMULWB, i32, sat16

TRANSITION_NB = 3
TRANSITION_NA = 2
TRANSITION_INT_NUM = 5
TRANSITION_FRAMES = 5120 // 20        # 256
TRANSITION_INT_STEPS = TRANSITION_FRAMES // (TRANSITION_INT_NUM - 1)

_B = T.Transition_LP_B_Q28.reshape(TRANSITION_INT_NUM, TRANSITION_NB)
_A = T.Transition_LP_A_Q28.reshape(TRANSITION_INT_NUM, TRANSITION_NA)


class SilkLPState:
    """silk_LP_state (structs.h): transition filter + direction."""

    def __init__(self):
        self.In_LP_State = [0, 0]
        self.transition_frame_no = 0
        self.mode = 0
        self.saved_fs_kHz = 0


def biquad_alt_stride1(frame: np.ndarray, B_Q28, A_Q28, S) -> None:
    """silk_biquad_alt_stride1 (biquad_alt.c:47-80), in place on an
    int16-valued array; S is the 2-element state list."""
    A0_L = (-i32(A_Q28[0])) & 0x3FFF
    A0_U = (-i32(A_Q28[0])) >> 14
    A1_L = (-i32(A_Q28[1])) & 0x3FFF
    A1_U = (-i32(A_Q28[1])) >> 14
    b0, b1, b2 = int(B_Q28[0]), int(B_Q28[1]), int(B_Q28[2])
    s0, s1 = int(S[0]), int(S[1])
    for k in range(len(frame)):
        inval = int(frame[k])
        out32_q14 = i32(SMLAWB(s0, b0, inval) << 2)
        s0 = SMLAWB(SMLAWB(
            i32(s1 + RSHIFT_ROUND(SMULWB(out32_q14, A0_L), 14)),
            out32_q14, A0_U), b1, inval)
        s1 = SMLAWB(SMLAWB(
            RSHIFT_ROUND(SMULWB(out32_q14, A1_L), 14),
            out32_q14, A1_U), b2, inval)
        frame[k] = sat16((out32_q14 + (1 << 14) - 1) >> 14)
    S[0], S[1] = s0, s1


def _interpolate_taps(ind: int, fac_q16: int):
    """silk_LP_interpolate_filter_taps (LP_variable_cutoff.c:39-93)."""
    if ind < TRANSITION_INT_NUM - 1 and fac_q16 > 0:
        if fac_q16 < 32768:
            B = [SMLAWB(int(_B[ind][i]),
                        int(_B[ind + 1][i]) - int(_B[ind][i]), fac_q16)
                 for i in range(TRANSITION_NB)]
            A = [SMLAWB(int(_A[ind][i]),
                        int(_A[ind + 1][i]) - int(_A[ind][i]), fac_q16)
                 for i in range(TRANSITION_NA)]
        else:
            B = [SMLAWB(int(_B[ind + 1][i]),
                        int(_B[ind + 1][i]) - int(_B[ind][i]),
                        fac_q16 - (1 << 16))
                 for i in range(TRANSITION_NB)]
            A = [SMLAWB(int(_A[ind + 1][i]),
                        int(_A[ind + 1][i]) - int(_A[ind][i]),
                        fac_q16 - (1 << 16))
                 for i in range(TRANSITION_NA)]
        return B, A
    ind = min(ind, TRANSITION_INT_NUM - 1)
    return list(map(int, _B[ind])), list(map(int, _A[ind]))


def lp_variable_cutoff(psLP: SilkLPState, frame: np.ndarray) -> None:
    """silk_LP_variable_cutoff (LP_variable_cutoff.c:100-134); filters
    ``frame`` in place when a transition is active."""
    if psLP.mode == 0:
        return
    fac_q16 = (TRANSITION_FRAMES - psLP.transition_frame_no) << (16 - 6)
    ind = fac_q16 >> 16
    fac_q16 -= ind << 16
    assert 0 <= ind < TRANSITION_INT_NUM
    B, A = _interpolate_taps(ind, fac_q16)
    psLP.transition_frame_no = min(
        max(psLP.transition_frame_no + psLP.mode, 0), TRANSITION_FRAMES)
    biquad_alt_stride1(frame, B, A, psLP.In_LP_State)


def control_audio_bandwidth(ch, desired_hz: int, api_hz: int,
                            min_hz: int, max_hz: int,
                            opus_can_switch: bool,
                            allow_switch: bool = True):
    """silk_control_audio_bandwidth (control_audio_bandwidth.c:36-131).

    ``allow_switch`` mirrors psEncC->allow_bandwidth_switch
    (control_audio_bandwidth.c:68): internal-rate transitions and the LP
    cutoff ramp may only start during speech inactivity.

    Returns (fs_kHz, switch_ready)."""
    orig_khz = ch.fs_kHz if ch.fs_kHz else ch.sLP.saved_fs_kHz
    fs_khz = orig_khz
    switch_ready = False
    fs_hz = fs_khz * 1000
    if fs_hz == 0:
        fs_hz = min(desired_hz, api_hz)
        fs_khz = fs_hz // 1000
    elif fs_hz > api_hz or fs_hz > max_hz or fs_hz < min_hz:
        fs_hz = min(max(api_hz, min_hz), max_hz)
        fs_khz = fs_hz // 1000
    else:
        if ch.sLP.transition_frame_no >= TRANSITION_FRAMES:
            ch.sLP.mode = 0
        if not (allow_switch or opus_can_switch):
            pass     # switching gated on speech inactivity
        elif orig_khz * 1000 > desired_hz:
            # switch down
            if ch.sLP.mode == 0:
                ch.sLP.transition_frame_no = TRANSITION_FRAMES
                ch.sLP.In_LP_State = [0, 0]
            if opus_can_switch:
                ch.sLP.mode = 0
                fs_khz = 12 if orig_khz == 16 else 8
            elif ch.sLP.transition_frame_no <= 0:
                switch_ready = True
            else:
                ch.sLP.mode = -2     # down at double speed
        elif orig_khz * 1000 < desired_hz:
            # switch up
            if opus_can_switch:
                fs_khz = 12 if orig_khz == 8 else 16
                ch.sLP.transition_frame_no = 0
                ch.sLP.In_LP_State = [0, 0]
                ch.sLP.mode = 1
            elif ch.sLP.mode == 0:
                switch_ready = True
            else:
                ch.sLP.mode = 1
        elif ch.sLP.mode < 0:
            ch.sLP.mode = 1
    return fs_khz, switch_ready
