"""SILK encoder top level: state, control, per-frame driver and the
silk_Encode packet loop.

Follows silk/enc_API.c (silk_Encode), control_codec.c
(silk_control_encoder / setup_fs / setup_complexity / setup_LBRR),
control_SNR.c, float/encode_frame_FLP.c (silk_encode_frame_FLP with the
gain-scaling bitrate loop and LBRR), and float/find_pitch_lags_FLP.c.

Mono and stereo (LR->MS with predictor coding, encoder_stereo.py) are
both supported, as are 10-120 ms packets, LBRR, DTX and in-band FEC.
The batched device twins live in silk/batch_*.py (decoder, NSQ,
resampler); this scalar driver is their oracle-validated ground truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.range_coder import RangeEncoder
from . import encode_entropy as ee
from . import tables as T
from .encoder_analysis import (FIX_CONST, ltp_analysis_filter,
                               ltp_scale_ctrl, find_ltp, interpolate_nlsf,
                               a2nlsf, noise_shape_analysis, process_nlsfs,
                               quant_ltp_gains, residual_energy, sigmoid,
                               LAMBDA_OFFSET, LAMBDA_SPEECH_ACT,
                               LAMBDA_DELAYED_DECISIONS,
                               LAMBDA_INPUT_QUALITY, LAMBDA_CODING_QUALITY,
                               LAMBDA_QUANT_OFFSET,
                               MAX_PREDICTION_POWER_GAIN,
                               MAX_PREDICTION_POWER_GAIN_AFTER_RESET,
                               LTP_SCALES_TABLE_Q14, _f2i)
from .encoder_pitch import (FIND_PITCH_BANDWIDTH_EXPANSION,
                            FIND_PITCH_WHITE_NOISE_FRACTION,
                            apply_sine_window, autocorrelation, bwexpander,
                            k2a, lpc_analysis_filter, pitch_analysis_core,
                            schur)
from .nlsf import CB_NB_MB, CB_WB
from .nsq import NsqState, nsq as run_nsq, nsq_del_dec
from .resampler import Resampler
from .sigproc import (LSHIFT_SAT32, SMLAWB, SMULBB, SMULWB, lin2log,
                      log2lin)
from .vad import VadState
from .decoder import (MAX_DELTA_GAIN_QUANT, MIN_DELTA_GAIN_QUANT,
                      gains_dequant)

TYPE_NO_VOICE_ACTIVITY = 0
TYPE_UNVOICED = 1
TYPE_VOICED = 2
CODE_INDEPENDENTLY = 0
CODE_INDEPENDENTLY_NO_LTP_SCALING = 1
CODE_CONDITIONALLY = 2
MAX_NB_SUBFR = 4
MAX_LPC_ORDER = 16
MIN_LPC_ORDER = 10
LTP_ORDER = 5
LA_SHAPE_MS = 5
LA_PITCH_MS = 2
LTP_MEM_LENGTH_MS = 20
SUB_FRAME_LENGTH_MS = 5
N_LEVELS_QGAIN = 64
LBRR_SPEECH_ACTIVITY_THRES_Q8 = FIX_CONST(0.3, 8)
SPEECH_ACTIVITY_DTX_THRES_Q8 = FIX_CONST(0.05, 8)
NB_SPEECH_FRAMES_BEFORE_DTX = 10
MAX_CONSECUTIVE_DTX = 20
WARPING_MULTIPLIER_Q16 = FIX_CONST(0.015, 16)
VAD_NO_ACTIVITY = 0
VAD_NO_DECISION = -1

# control_SNR.c:41-81 (values / 21)
TARGET_RATE_NB_21 = (
    0, 15, 39, 52, 61, 68, 74, 79, 84, 88, 92, 95, 99, 102, 105, 108,
    111, 114, 117, 119, 122, 124, 126, 129, 131, 133, 135, 137, 139,
    142, 143, 145, 147, 149, 151, 153, 155, 157, 158, 160, 162, 163,
    165, 167, 168, 170, 171, 173, 174, 176, 177, 179, 180, 182, 183,
    185, 186, 187, 189, 190, 192, 193, 194, 196, 197, 199, 200, 201,
    203, 204, 205, 207, 208, 209, 211, 212, 213, 215, 216, 217, 219,
    220, 221, 223, 224, 225, 227, 228, 230, 231, 232, 234, 235, 236,
    238, 239, 241, 242, 243, 245, 246, 248, 249, 250, 252, 253, 255)
TARGET_RATE_MB_21 = (
    0, 0, 28, 43, 52, 59, 65, 70, 74, 78, 81, 85, 87, 90, 93, 95, 98,
    100, 102, 105, 107, 109, 111, 113, 115, 116, 118, 120, 122, 123,
    125, 127, 128, 130, 131, 133, 134, 136, 137, 138, 140, 141, 143,
    144, 145, 147, 148, 149, 151, 152, 153, 154, 156, 157, 158, 159,
    160, 162, 163, 164, 165, 166, 167, 168, 169, 171, 172, 173, 174,
    175, 176, 177, 178, 179, 180, 181, 182, 183, 184, 185, 186, 187,
    188, 188, 189, 190, 191, 192, 193, 194, 195, 196, 197, 198, 199,
    200, 201, 202, 203, 203, 204, 205, 206, 207, 208, 209, 210, 211,
    212, 213, 214, 214, 215, 216, 217, 218, 219, 220, 221, 222, 223,
    224, 224, 225, 226, 227, 228, 229, 230, 231, 232, 233, 234, 235,
    236, 236, 237, 238, 239, 240, 241, 242, 243, 244, 245, 246, 247,
    248, 249, 250, 251, 252, 253, 254, 255)
TARGET_RATE_WB_21 = (
    0, 0, 0, 8, 29, 41, 49, 56, 62, 66, 70, 74, 77, 80, 83, 86, 88,
    91, 93, 95, 97, 99, 101, 103, 105, 107, 108, 110, 112, 113, 115,
    116, 118, 119, 121, 122, 123, 125, 126, 127, 129, 130, 131, 132,
    134, 135, 136, 137, 138, 140, 141, 142, 143, 144, 145, 146, 147,
    148, 149, 150, 151, 152, 153, 154, 156, 157, 158, 159, 159, 160,
    161, 162, 163, 164, 165, 166, 167, 168, 169, 170, 171, 171, 172,
    173, 174, 175, 176, 177, 177, 178, 179, 180, 181, 181, 182, 183,
    184, 185, 185, 186, 187, 188, 189, 189, 190, 191, 192, 192, 193,
    194, 195, 195, 196, 197, 198, 198, 199, 200, 200, 201, 202, 203,
    203, 204, 205, 206, 206, 207, 208, 209, 209, 210, 211, 211, 212,
    213, 214, 214, 215, 216, 216, 217, 218, 219, 219, 220, 221, 221,
    222, 223, 224, 224, 225, 226, 226, 227, 228, 229, 229, 230, 231,
    232, 232, 233, 234, 234, 235, 236, 237, 237, 238, 239, 240, 240,
    241, 242, 243, 243, 244, 245, 246, 246, 247, 248, 249, 249, 250,
    251, 252, 253, 255)


@dataclass
class EncControl:
    """silk_EncControlStruct (the fields the encoder reads)."""
    API_sampleRate: int = 48000
    payloadSize_ms: int = 20
    bitRate: int = 24000
    packetLossPercentage: int = 0
    complexity: int = 9
    useInBandFEC: bool = False
    LBRR_coded: bool = False
    useDTX: bool = False
    useCBR: bool = False
    maxInternalSampleRate: int = 16000
    minInternalSampleRate: int = 8000
    desiredInternalSampleRate: int = 16000
    maxBits: int = 1275 * 8


@dataclass
class EncoderControlFLP:
    """silk_encoder_control_FLP scratch (structs_FLP.h)."""
    pitchL: List[int] = field(default_factory=lambda: [0] * 4)
    Gains: np.ndarray = None
    PredCoef_Q12: List[List[int]] = None
    LTPCoef: np.ndarray = None
    LTP_scale: float = 0.0
    AR: np.ndarray = None
    LF_MA_shp: np.ndarray = None
    LF_AR_shp: np.ndarray = None
    Tilt: np.ndarray = None
    HarmShapeGain: np.ndarray = None
    Lambda: float = 0.0
    input_quality: float = 0.0
    coding_quality: float = 0.0
    predGain: float = 0.0
    LTPredCodGain: float = 0.0
    ResNrg: np.ndarray = None
    GainsUnq_Q16: List[int] = None
    lastGainIndexPrev: int = 0


class SilkEncoderChannel:
    """silk_encoder_state(+FLP) for one channel."""

    def __init__(self):
        from .lp_filter import SilkLPState
        self.sLP = SilkLPState()
        self.fs_kHz = 0
        self.API_fs_Hz = 0
        self.prev_API_fs_Hz = 0
        self.PacketSize_ms = 0
        self.nFramesPerPacket = 1
        self.nb_subfr = 4
        self.frame_length = 0
        self.subfr_length = 0
        self.ltp_mem_length = 0
        self.la_pitch = 0
        self.la_shape = 0
        self.shapeWinLength = 0
        self.pitch_LPC_win_length = 0
        self.max_pitch_lag = 0
        self.predictLPCOrder = MAX_LPC_ORDER
        self.psNLSF_CB = CB_WB
        self.indices = ee.SideInfoIndices()
        self.prev_NLSFq_Q15 = [0] * MAX_LPC_ORDER
        self.speech_activity_Q8 = 0
        self.input_tilt_Q15 = 0
        self.input_quality_bands_Q15 = [0] * 4
        self.SNR_dB_Q7 = 0
        self.TargetRate_bps = 0
        self.PacketLoss_perc = 0
        self.Complexity = 9
        self.nStatesDelayedDecision = 1
        self.useInterpolatedNLSFs = 0
        self.NLSF_MSVQ_Survivors = 16
        self.warping_Q16 = 0
        self.shapingLPCOrder = 24
        self.pitchEstimationComplexity = 2
        self.pitchEstimationThreshold_Q16 = FIX_CONST(0.7, 16)
        self.pitchEstimationLPCOrder = 16
        self.first_frame_after_reset = 1
        self.controlled_since_last_payload = 0
        self.prefillFlag = 0
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.prevLag = 100
        self.ec_prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.ec_prevLagIndex = 0
        self.LTPCorr = 0.0
        self.sum_log_gain_Q7 = 0
        self.frameCounter = 0
        self.nFramesEncoded = 0
        self.noSpeechCounter = 0
        self.inDTX = 0
        self.useDTX = 0
        self.useCBR = 0
        self.useInBandFEC = 0
        self.LBRR_enabled = 0
        self.LBRR_flag = 0
        self.LBRR_flags = [0] * 3
        self.LBRR_GainIncreases = 0
        self.LBRRprevLastGainIndex = 0
        self.indices_LBRR = [ee.SideInfoIndices() for _ in range(3)]
        self.pulses_LBRR = [[0] * 320 for _ in range(3)]
        self.sVAD = VadState()
        self.sNSQ = NsqState()
        self.sShape_LastGainIndex = 10
        self.sShape_HarmShapeGain_smth = 0.0
        self.sShape_Tilt_smth = 0.0
        self.variable_HP_smth1_Q15 = 0
        self.x_buf = np.zeros(0)
        self.inputBuf = np.zeros(322, np.int64)
        self.inputBufIx = 0
        self.resampler: Optional[Resampler] = None
        self.pulses = [0] * 320

    # -- control (control_codec.c) --------------------------------------
    def setup_fs(self, fs_khz: int, packet_size_ms: int):
        """silk_setup_fs (control_codec.c:212-311)."""
        if packet_size_ms != self.PacketSize_ms:
            assert packet_size_ms in (10, 20, 40, 60)
            if packet_size_ms <= 10:
                self.nFramesPerPacket = 1
                self.nb_subfr = 2 if packet_size_ms == 10 else 1
                self.frame_length = packet_size_ms * fs_khz
                self.pitch_LPC_win_length = (10 + (LA_PITCH_MS << 1)) \
                    * fs_khz
            else:
                self.nFramesPerPacket = packet_size_ms // 20
                self.nb_subfr = MAX_NB_SUBFR
                self.frame_length = 20 * fs_khz
                self.pitch_LPC_win_length = (20 + (LA_PITCH_MS << 1)) \
                    * fs_khz
            self.PacketSize_ms = packet_size_ms
            self.TargetRate_bps = 0
        if self.fs_kHz != fs_khz:
            # reset states
            self.sNSQ = NsqState()
            self.prev_NLSFq_Q15 = [0] * MAX_LPC_ORDER
            self.inputBufIx = 0
            self.nFramesEncoded = 0
            self.TargetRate_bps = 0
            self.prevLag = 100
            self.first_frame_after_reset = 1
            self.sShape_LastGainIndex = 10
            self.sShape_HarmShapeGain_smth = 0.0
            self.sShape_Tilt_smth = 0.0
            self.sNSQ.lagPrev = 100
            self.sNSQ.prev_gain_Q16 = 65536
            self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
            self.fs_kHz = fs_khz
            if fs_khz in (8, 12):
                self.predictLPCOrder = MIN_LPC_ORDER
                self.psNLSF_CB = CB_NB_MB
            else:
                self.predictLPCOrder = MAX_LPC_ORDER
                self.psNLSF_CB = CB_WB
            self.subfr_length = SUB_FRAME_LENGTH_MS * fs_khz
            self.frame_length = self.subfr_length * self.nb_subfr
            self.ltp_mem_length = LTP_MEM_LENGTH_MS * fs_khz
            self.la_pitch = LA_PITCH_MS * fs_khz
            self.max_pitch_lag = 18 * fs_khz
            if self.nb_subfr == MAX_NB_SUBFR:
                self.pitch_LPC_win_length = (20 + (LA_PITCH_MS << 1)) \
                    * fs_khz
            else:
                self.pitch_LPC_win_length = (10 + (LA_PITCH_MS << 1)) \
                    * fs_khz
            self.variable_HP_smth1_Q15 = lin2log(60) << 8
            buf_len = self.ltp_mem_length + self.frame_length \
                + LA_SHAPE_MS * fs_khz
            self.x_buf = np.zeros(buf_len)
            self.inputBuf = np.zeros(self.frame_length + 2, np.int64)
        # frame_length can also change via packet-size alone (10<->20ms
        # at the same fs): keep the buffers sized to the new frame
        if self.fs_kHz and len(self.inputBuf) != self.frame_length + 2:
            buf_len = self.ltp_mem_length + self.frame_length \
                + LA_SHAPE_MS * self.fs_kHz
            old = self.x_buf
            self.x_buf = np.zeros(buf_len)
            keep = min(len(old), buf_len)
            self.x_buf[-keep:] = old[-keep:]
            self.inputBuf = np.zeros(self.frame_length + 2, np.int64)

    def setup_complexity(self, complexity: int):
        """silk_setup_complexity (control_codec.c:314-395)."""
        tiers = [
            (0, FIX_CONST(0.8, 16), 6, 12, 3, 1, 0, 2, False),
            (1, FIX_CONST(0.76, 16), 8, 14, 5, 1, 0, 3, False),
            (0, FIX_CONST(0.8, 16), 6, 12, 3, 2, 0, 2, False),
            (1, FIX_CONST(0.76, 16), 8, 14, 5, 2, 0, 4, False),
            (1, FIX_CONST(0.74, 16), 10, 16, 5, 2, 1, 6, True),
            (1, FIX_CONST(0.72, 16), 12, 20, 5, 3, 1, 8, True),
            (2, FIX_CONST(0.7, 16), 16, 24, 5, 4, 1, 16, True),
        ]
        if complexity < 1:
            t = tiers[0]
        elif complexity < 2:
            t = tiers[1]
        elif complexity < 3:
            t = tiers[2]
        elif complexity < 4:
            t = tiers[3]
        elif complexity < 6:
            t = tiers[4]
        elif complexity < 8:
            t = tiers[5]
        else:
            t = tiers[6]
        (self.pitchEstimationComplexity,
         self.pitchEstimationThreshold_Q16,
         self.pitchEstimationLPCOrder, self.shapingLPCOrder,
         la_shape_ms, self.nStatesDelayedDecision,
         self.useInterpolatedNLSFs, self.NLSF_MSVQ_Survivors,
         warp) = t
        self.la_shape = la_shape_ms * self.fs_kHz
        self.warping_Q16 = (self.fs_kHz * WARPING_MULTIPLIER_Q16
                            if warp else 0)
        self.pitchEstimationLPCOrder = min(self.pitchEstimationLPCOrder,
                                           self.predictLPCOrder)
        self.shapeWinLength = SUB_FRAME_LENGTH_MS * self.fs_kHz \
            + 2 * self.la_shape
        self.Complexity = complexity

    def control_SNR(self, target_rate_bps: int):
        """silk_control_SNR (control_SNR.c:84-113)."""
        self.TargetRate_bps = target_rate_bps
        if self.nb_subfr == 2:
            target_rate_bps -= 2000 + self.fs_kHz // 16
        if self.fs_kHz == 8:
            table = TARGET_RATE_NB_21
        elif self.fs_kHz == 12:
            table = TARGET_RATE_MB_21
        else:
            table = TARGET_RATE_WB_21
        idx = (target_rate_bps + 200) // 400
        idx = min(idx - 10, len(table) - 1)
        self.SNR_dB_Q7 = 0 if idx <= 0 else table[idx] * 21

    def setup_LBRR(self, lbrr_coded: bool):
        prev = self.LBRR_enabled
        self.LBRR_enabled = int(lbrr_coded)
        if self.LBRR_enabled:
            if prev == 0:
                self.LBRR_GainIncreases = 7
            else:
                self.LBRR_GainIncreases = max(
                    7 - SMULWB(self.PacketLoss_perc, FIX_CONST(0.2, 16)),
                    3)

    # -- VAD (encode_frame_FLP.c:40-73) ---------------------------------
    def do_vad(self, activity: int = VAD_NO_DECISION):
        sa, tilt, quality, snr = self.sVAD.get_sa_q8(
            self.inputBuf[1:1 + self.frame_length], self.frame_length,
            self.fs_kHz)
        self.speech_activity_Q8 = sa
        self.input_tilt_Q15 = tilt
        self.input_quality_bands_Q15 = quality
        if activity == VAD_NO_ACTIVITY and \
                self.speech_activity_Q8 >= SPEECH_ACTIVITY_DTX_THRES_Q8:
            self.speech_activity_Q8 = SPEECH_ACTIVITY_DTX_THRES_Q8 - 1
        if self.speech_activity_Q8 < SPEECH_ACTIVITY_DTX_THRES_Q8:
            self.indices.signalType = TYPE_NO_VOICE_ACTIVITY
            self.noSpeechCounter += 1
            if self.noSpeechCounter <= NB_SPEECH_FRAMES_BEFORE_DTX:
                self.inDTX = 0
            elif self.noSpeechCounter > (MAX_CONSECUTIVE_DTX
                                         + NB_SPEECH_FRAMES_BEFORE_DTX):
                self.noSpeechCounter = NB_SPEECH_FRAMES_BEFORE_DTX
                self.inDTX = 0
            self.VAD_flags[self.nFramesEncoded] = 0
        else:
            self.noSpeechCounter = 0
            self.inDTX = 0
            self.indices.signalType = TYPE_UNVOICED
            self.VAD_flags[self.nFramesEncoded] = 1

    # -- pitch (find_pitch_lags_FLP.c) ----------------------------------
    def find_pitch_lags(self, ctrl: EncoderControlFLP,
                        x_frame_start: int) -> np.ndarray:
        buf_len = self.la_pitch + self.frame_length + self.ltp_mem_length
        x_buf = self.x_buf
        # windowed signal for LPC
        start = buf_len - self.pitch_LPC_win_length
        seg = x_buf[start:start + self.pitch_LPC_win_length]
        la = self.la_pitch
        Wsig = np.concatenate([
            apply_sine_window(seg[:la], 1),
            seg[la:self.pitch_LPC_win_length - la],
            apply_sine_window(seg[self.pitch_LPC_win_length - la:], 2)])
        ac = autocorrelation(Wsig, self.pitchEstimationLPCOrder + 1)
        ac[0] += ac[0] * FIND_PITCH_WHITE_NOISE_FRACTION + 1
        rc, res_nrg = schur(ac, self.pitchEstimationLPCOrder)
        ctrl.predGain = ac[0] / max(res_nrg, 1.0)
        A = k2a(rc)
        A = bwexpander(A, FIND_PITCH_BANDWIDTH_EXPANSION)
        res = lpc_analysis_filter(x_buf[:buf_len], A)
        if self.indices.signalType != TYPE_NO_VOICE_ACTIVITY \
                and not self.first_frame_after_reset:
            thrhld = 0.6
            thrhld -= 0.004 * self.pitchEstimationLPCOrder
            thrhld -= 0.1 * self.speech_activity_Q8 / 256.0
            thrhld -= 0.15 * (self.prevSignalType >> 1)
            thrhld -= 0.1 * self.input_tilt_Q15 / 32768.0
            voiced, pitch, lag_idx, contour, corr = pitch_analysis_core(
                res, self.prevLag,
                self.LTPCorr,
                self.pitchEstimationThreshold_Q16 / 65536.0,
                thrhld, self.fs_kHz, self.pitchEstimationComplexity,
                self.nb_subfr)
            if voiced:
                self.indices.signalType = TYPE_VOICED
            else:
                self.indices.signalType = TYPE_UNVOICED
            ctrl.pitchL = list(pitch)
            self.indices.lagIndex = lag_idx
            self.indices.contourIndex = contour
            self.LTPCorr = corr
        else:
            ctrl.pitchL = [0] * MAX_NB_SUBFR
            self.indices.lagIndex = 0
            self.indices.contourIndex = 0
            self.LTPCorr = 0.0
        return res

    # -- pred coefs (find_pred_coefs_FLP.c) -----------------------------
    def find_pred_coefs(self, ctrl: EncoderControlFLP,
                        res_pitch: np.ndarray, x_start: int,
                        cond_coding: int):
        inv_gains = 1.0 / np.asarray(ctrl.Gains)
        if self.indices.signalType == TYPE_VOICED:
            XX, xX = find_ltp(res_pitch, x_start, ctrl.pitchL,
                              self.subfr_length, self.nb_subfr)
            # Injectable LTP-VQ backend (batched device lane seam)
            ltp_hook = getattr(self, "ltp_hook", None)
            if ltp_hook is not None:
                (B_q14, ltp_idx, per_idx, self.sum_log_gain_Q7,
                 pred_gain_db_q7) = ltp_hook(self, XX, xX)
            else:
                (B_q14, ltp_idx, per_idx, self.sum_log_gain_Q7,
                 pred_gain_db_q7) = quant_ltp_gains(
                    XX, xX, self.subfr_length, self.nb_subfr,
                    self.sum_log_gain_Q7)
            ctrl.LTPredCodGain = pred_gain_db_q7 / 128.0
            ctrl.LTPCoef = np.array(B_q14) / 16384.0
            self.indices.LTPIndex = ltp_idx
            self.indices.PERIndex = per_idx
            ltp_scale_ctrl(self, ctrl, cond_coding)
            lpc_in_pre = ltp_analysis_filter(
                self.x_buf, x_start - self.predictLPCOrder,
                ctrl.LTPCoef, ctrl.pitchL, inv_gains,
                self.subfr_length, self.nb_subfr, self.predictLPCOrder)
        else:
            # scaled, prepended subframes
            segs = []
            pos = x_start - self.predictLPCOrder
            for i in range(self.nb_subfr):
                segs.append(self.x_buf[pos:pos + self.subfr_length
                                       + self.predictLPCOrder]
                            * inv_gains[i])
                pos += self.subfr_length
            lpc_in_pre = np.concatenate(segs)
            ctrl.LTPCoef = np.zeros(self.nb_subfr * LTP_ORDER)
            ctrl.LTPredCodGain = 0.0
            self.sum_log_gain_Q7 = 0
            ctrl.LTP_scale = 0.0
            self.indices.LTP_scaleIndex = 0

        if self.first_frame_after_reset:
            min_inv_gain = 1.0 / MAX_PREDICTION_POWER_GAIN_AFTER_RESET
        else:
            min_inv_gain = 2.0 ** (ctrl.LTPredCodGain / 3) \
                / MAX_PREDICTION_POWER_GAIN
            min_inv_gain /= 0.25 + 0.75 * ctrl.coding_quality

        nlsf_q15 = self._find_lpc(lpc_in_pre, min_inv_gain)
        ctrl.PredCoef_Q12, q_nlsf = process_nlsfs(self, nlsf_q15,
                                                  self.prev_NLSFq_Q15)
        ctrl.ResNrg = residual_energy(lpc_in_pre, ctrl.PredCoef_Q12,
                                      ctrl.Gains, self.subfr_length,
                                      self.nb_subfr, self.predictLPCOrder)
        self.prev_NLSFq_Q15 = list(q_nlsf)

    def _find_lpc(self, x: np.ndarray, min_inv_gain: float) -> List[int]:
        """silk_find_LPC_FLP (find_LPC_FLP.c:36-103)."""
        from ..dnn.features import silk_burg_analysis
        subfr_length = self.subfr_length + self.predictLPCOrder
        self.indices.NLSFInterpCoef_Q2 = 4
        a, res_nrg = silk_burg_analysis(
            x[:self.nb_subfr * subfr_length], min_inv_gain, subfr_length,
            self.nb_subfr, self.predictLPCOrder)
        if self.useInterpolatedNLSFs and not self.first_frame_after_reset \
                and self.nb_subfr == MAX_NB_SUBFR:
            a_tmp, rn2 = silk_burg_analysis(
                x[2 * subfr_length:4 * subfr_length], min_inv_gain,
                subfr_length, 2, self.predictLPCOrder)
            res_nrg -= rn2
            nlsf_q15 = a2nlsf([_f2i(v * 65536.0) for v in a_tmp],
                              self.predictLPCOrder)
            res_nrg_2nd = np.inf
            from .nlsf import nlsf2a
            for k in range(3, -1, -1):
                nlsf0 = interpolate_nlsf(self.prev_NLSFq_Q15, nlsf_q15,
                                         k, self.predictLPCOrder)
                a0_q12 = nlsf2a(nlsf0, self.predictLPCOrder)
                a0 = np.array(a0_q12[:self.predictLPCOrder]) / 4096.0
                lpc_res = lpc_analysis_filter(x[:2 * subfr_length], a0)
                p = self.predictLPCOrder
                r1 = lpc_res[p:subfr_length]
                r2 = lpc_res[p + subfr_length:2 * subfr_length]
                res_nrg_interp = float(np.dot(r1, r1) + np.dot(r2, r2))
                if res_nrg_interp < res_nrg:
                    res_nrg = res_nrg_interp
                    self.indices.NLSFInterpCoef_Q2 = k
                elif res_nrg_interp > res_nrg_2nd:
                    break
                res_nrg_2nd = res_nrg_interp
            if self.indices.NLSFInterpCoef_Q2 == 4:
                return a2nlsf([_f2i(v * 65536.0) for v in a],
                              self.predictLPCOrder)
            return nlsf_q15
        return a2nlsf([_f2i(v * 65536.0) for v in a],
                      self.predictLPCOrder)

    # -- gains (process_gains_FLP.c) ------------------------------------
    def process_gains(self, ctrl: EncoderControlFLP, cond_coding: int):
        if self.indices.signalType == TYPE_VOICED:
            s = 1.0 - 0.5 * sigmoid(0.25 * (ctrl.LTPredCodGain - 12.0))
            ctrl.Gains = ctrl.Gains * s
        inv_max_sqr = (2.0 ** (0.33 * (21.0 - self.SNR_dB_Q7 / 128.0))) \
            / self.subfr_length
        ctrl.Gains = np.minimum(
            np.sqrt(ctrl.Gains ** 2 + ctrl.ResNrg * inv_max_sqr), 32767.0)
        p_gains_q16 = [_f2i(g * 65536.0) for g in ctrl.Gains]
        ctrl.GainsUnq_Q16 = list(p_gains_q16)
        ctrl.lastGainIndexPrev = self.sShape_LastGainIndex
        ind, qgains, self.sShape_LastGainIndex = ee.gains_quant(
            p_gains_q16, self.sShape_LastGainIndex,
            cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
        self.indices.GainsIndices = ind
        ctrl.Gains = np.array(qgains) / 65536.0
        if self.indices.signalType == TYPE_VOICED:
            if ctrl.LTPredCodGain + self.input_tilt_Q15 / 32768.0 > 1.0:
                self.indices.quantOffsetType = 0
            else:
                self.indices.quantOffsetType = 1
        quant_offset = int(T.Quantization_Offsets_Q10[
            self.indices.signalType >> 1][
            self.indices.quantOffsetType]) / 1024.0
        ctrl.Lambda = (LAMBDA_OFFSET
                       + LAMBDA_DELAYED_DECISIONS
                       * self.nStatesDelayedDecision
                       + LAMBDA_SPEECH_ACT * self.speech_activity_Q8 / 256.0
                       + LAMBDA_INPUT_QUALITY * ctrl.input_quality
                       + LAMBDA_CODING_QUALITY * ctrl.coding_quality
                       + LAMBDA_QUANT_OFFSET * quant_offset)

    # -- NSQ wrapper (wrappers_FLP.c:81-143) ----------------------------
    def run_nsq(self, ctrl: EncoderControlFLP, indices, nsq_state,
                x_start: int) -> List[int]:
        AR_Q13 = [[_f2i(ctrl.AR[i][j] * 8192.0)
                   for j in range(24)]
                  for i in range(self.nb_subfr)]
        LF_shp_Q14 = []
        for i in range(self.nb_subfr):
            hi = _f2i(ctrl.LF_AR_shp[i] * 16384.0)
            lo = _f2i(ctrl.LF_MA_shp[i] * 16384.0) & 0xFFFF
            v = (hi << 16) | lo
            if v & 0x80000000:
                v -= 1 << 32
            LF_shp_Q14.append(v)
        Tilt_Q14 = [_f2i(t * 16384.0) for t in ctrl.Tilt]
        Harm_Q14 = [_f2i(h * 16384.0) for h in ctrl.HarmShapeGain]
        Lambda_Q10 = _f2i(ctrl.Lambda * 1024.0)
        LTP_Q14 = [_f2i(b * 16384.0) for b in ctrl.LTPCoef]
        Pred_Q12 = ctrl.PredCoef_Q12
        Gains_Q16 = [_f2i(g * 65536.0) for g in ctrl.Gains]
        if indices.signalType == TYPE_VOICED:
            LTP_scale_Q14 = LTP_SCALES_TABLE_Q14[indices.LTP_scaleIndex]
        else:
            LTP_scale_Q14 = 0
        x16 = np.array([_f2i(v) for v in
                        self.x_buf[x_start:x_start + self.frame_length]],
                       np.int64)
        # Injectable NSQ backend: the batched device lane
        # (silk.batch_encoder) intercepts every quantizer call here —
        # same seam, same Q-domain arguments — and replays it through
        # silk_nsq_batch / silk_nsq_del_dec_batch for a whole stream
        # batch at once.
        hook = getattr(self, "nsq_hook", None)
        if hook is not None:
            return hook(self, nsq_state, indices, x16, Pred_Q12,
                        LTP_Q14, AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14,
                        Gains_Q16, ctrl.pitchL, Lambda_Q10,
                        LTP_scale_Q14)
        # NSQ variant selection (wrappers_FLP.c:138-143)
        if self.nStatesDelayedDecision > 1 or self.warping_Q16 > 0:
            return nsq_del_dec(self, nsq_state, indices, x16, Pred_Q12,
                               LTP_Q14, AR_Q13, Harm_Q14, Tilt_Q14,
                               LF_shp_Q14, Gains_Q16, ctrl.pitchL,
                               Lambda_Q10, LTP_scale_Q14)
        return run_nsq(self, nsq_state, indices, x16, Pred_Q12, LTP_Q14,
                       AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14, Gains_Q16,
                       ctrl.pitchL, Lambda_Q10, LTP_scale_Q14)

    # -- LBRR (encode_frame_FLP.c:331-381) ------------------------------
    def lbrr_encode(self, ctrl: EncoderControlFLP, x_start: int,
                    cond_coding: int):
        if not (self.LBRR_enabled and self.speech_activity_Q8
                > LBRR_SPEECH_ACTIVITY_THRES_Q8):
            return
        self.LBRR_flags[self.nFramesEncoded] = 1
        import copy
        nsq_lbrr = self.sNSQ.copy()
        ind_lbrr = copy.deepcopy(self.indices)
        self.indices_LBRR[self.nFramesEncoded] = ind_lbrr
        temp_gains = ctrl.Gains.copy()
        # The bitstream codes LBRR GainsIndices[0] conditionally (delta,
        # 41 symbols) iff the previous frame in the packet was LBRR-coded
        # (enc_API.c:376-384; decoder mirror).  The reference passes the
        # *regular* frame's condCoding here instead, which can disagree
        # for the side channel's second frame and feed a full-range index
        # (up to 63) to the 41-entry delta table (a silent overread in C,
        # encode_indices.c:73 silk_assert).  We derive the conditional
        # from the header rule so the encoded index is always valid and
        # the encoder's LBRR gains stay in sync with every decoder.
        header_cond = self.nFramesEncoded > 0 \
            and self.LBRR_flags[self.nFramesEncoded - 1] == 1
        if not header_cond:
            self.LBRRprevLastGainIndex = self.sShape_LastGainIndex
            ind_lbrr.GainsIndices[0] = min(
                ind_lbrr.GainsIndices[0] + self.LBRR_GainIncreases,
                N_LEVELS_QGAIN - 1)
        else:
            ind_lbrr.GainsIndices[0] = min(
                ind_lbrr.GainsIndices[0],
                MAX_DELTA_GAIN_QUANT - MIN_DELTA_GAIN_QUANT)
        gains_q16, self.LBRRprevLastGainIndex = gains_dequant(
            ind_lbrr.GainsIndices, self.LBRRprevLastGainIndex,
            header_cond, self.nb_subfr)
        ctrl.Gains = np.array(gains_q16) / 65536.0
        self.pulses_LBRR[self.nFramesEncoded] = self.run_nsq(
            ctrl, ind_lbrr, nsq_lbrr, x_start)
        ctrl.Gains = temp_gains

    # -- frame driver (encode_frame_FLP.c:76-330) -----------------------
    def encode_frame(self, enc: RangeEncoder, cond_coding: int,
                     max_bits: int, use_cbr: bool) -> int:
        ctrl = EncoderControlFLP()
        self.indices.Seed = self.frameCounter & 3
        self.frameCounter += 1
        # bandwidth-transition low-pass (encode_frame_FLP.c:129)
        from .lp_filter import lp_variable_cutoff
        lp_variable_cutoff(self.sLP, self.inputBuf[1:1 + self.frame_length])
        x_start = self.ltp_mem_length
        frame = self.inputBuf[1:1 + self.frame_length]
        self.x_buf[x_start + LA_SHAPE_MS * self.fs_kHz:
                   x_start + LA_SHAPE_MS * self.fs_kHz
                   + self.frame_length] = frame
        # tiny anti-denormal signal (encode_frame_FLP.c:127-130)
        for i in range(8):
            self.x_buf[x_start + LA_SHAPE_MS * self.fs_kHz
                       + i * (self.frame_length >> 3)] += \
                (1 - (i & 2)) * 1e-6

        if self.prefillFlag:
            res_pitch = self.find_pitch_lags(ctrl, x_start)
            noise_shape_analysis(self, ctrl,
                                 res_pitch[x_start:], self.x_buf, x_start)
            self.find_pred_coefs(ctrl, res_pitch, x_start, cond_coding)
            self.process_gains(ctrl, cond_coding)
            self.run_nsq(ctrl, self.indices, self.sNSQ, x_start)
            self._shift_buffers()
            return 0

        res_pitch = self.find_pitch_lags(ctrl, x_start)
        noise_shape_analysis(self, ctrl, res_pitch[x_start:],
                             self.x_buf, x_start)
        self.find_pred_coefs(ctrl, res_pitch, x_start, cond_coding)
        self.process_gains(ctrl, cond_coding)
        self.lbrr_encode(ctrl, x_start, cond_coding)

        # bitrate control loop (encode_frame_FLP.c:148-312)
        bits_margin = 5 if use_cbr else max_bits // 4
        max_iter = 6
        gain_mult_q8 = FIX_CONST(1, 8)
        found_lower = found_upper = False
        gains_id = ee.gains_id(self.indices.GainsIndices, self.nb_subfr)
        gains_id_lower = gains_id_upper = -1
        nbits_lower = nbits_upper = 0
        gain_mult_lower = gain_mult_upper = 0
        gain_lock = [0] * self.nb_subfr
        best_sum = [0] * self.nb_subfr
        best_gain_mult = [0] * self.nb_subfr

        enc_copy = enc.save()
        nsq_copy = self.sNSQ.copy()
        seed_copy = self.indices.Seed
        prev_lag_copy = self.ec_prevLagIndex
        prev_sig_copy = self.ec_prevSignalType
        enc_copy2 = None
        nsq_copy2 = None
        last_gain_copy2 = 0
        it = 0
        while True:
            if gains_id == gains_id_lower:
                nbits = nbits_lower
            elif gains_id == gains_id_upper:
                nbits = nbits_upper
            else:
                if it > 0:
                    enc.restore(enc_copy)
                    self.sNSQ = nsq_copy.copy()
                    self.indices.Seed = seed_copy
                    self.ec_prevLagIndex = prev_lag_copy
                    self.ec_prevSignalType = prev_sig_copy
                self.pulses = self.run_nsq(ctrl, self.indices, self.sNSQ,
                                           x_start)
                if it == max_iter and not found_lower:
                    enc_copy2 = enc.save()
                self.ec_prevLagIndex = ee.encode_indices(
                    enc, self.indices, self.psNLSF_CB, self.nb_subfr,
                    self.fs_kHz, cond_coding, self.ec_prevSignalType,
                    self.ec_prevLagIndex)
                self.ec_prevSignalType = self.indices.signalType
                ee.encode_pulses(enc, self.indices.signalType,
                                 self.indices.quantOffsetType,
                                 self.pulses, self.frame_length)
                nbits = enc.tell()
                if it == max_iter and not found_lower \
                        and nbits > max_bits:
                    # damage control (encode_frame_FLP.c:217-243)
                    enc.restore(enc_copy2)
                    self.sShape_LastGainIndex = ctrl.lastGainIndexPrev
                    for i in range(self.nb_subfr):
                        self.indices.GainsIndices[i] = 4
                    if cond_coding != CODE_CONDITIONALLY:
                        self.indices.GainsIndices[0] = \
                            ctrl.lastGainIndexPrev
                    self.ec_prevLagIndex = prev_lag_copy
                    self.ec_prevSignalType = prev_sig_copy
                    self.pulses = [0] * self.frame_length
                    self.ec_prevLagIndex = ee.encode_indices(
                        enc, self.indices, self.psNLSF_CB, self.nb_subfr,
                        self.fs_kHz, cond_coding, self.ec_prevSignalType,
                        self.ec_prevLagIndex)
                    self.ec_prevSignalType = self.indices.signalType
                    ee.encode_pulses(enc, self.indices.signalType,
                                     self.indices.quantOffsetType,
                                     self.pulses, self.frame_length)
                    nbits = enc.tell()
                if not use_cbr and it == 0 and nbits <= max_bits:
                    break
            if it == max_iter:
                if found_lower and (gains_id == gains_id_lower
                                    or nbits > max_bits):
                    enc.restore(enc_copy2)
                    self.sNSQ = nsq_copy2.copy()
                    self.sShape_LastGainIndex = last_gain_copy2
                break
            if nbits > max_bits:
                if not found_lower and it >= 2:
                    ctrl.Lambda = max(ctrl.Lambda * 1.5, 1.5)
                    self.indices.quantOffsetType = 0
                    found_upper = False
                    gains_id_upper = -1
                else:
                    found_upper = True
                    nbits_upper = nbits
                    gain_mult_upper = gain_mult_q8
                    gains_id_upper = gains_id
            elif nbits < max_bits - bits_margin:
                found_lower = True
                nbits_lower = nbits
                gain_mult_lower = gain_mult_q8
                if gains_id != gains_id_lower:
                    gains_id_lower = gains_id
                    enc_copy2 = enc.save()
                    nsq_copy2 = self.sNSQ.copy()
                    last_gain_copy2 = self.sShape_LastGainIndex
            else:
                break
            if not found_lower and nbits > max_bits:
                for i in range(self.nb_subfr):
                    ssum = sum(abs(p) for p in
                               self.pulses[i * self.subfr_length:
                                           (i + 1) * self.subfr_length])
                    if it == 0 or (ssum < best_sum[i]
                                   and not gain_lock[i]):
                        best_sum[i] = ssum
                        best_gain_mult[i] = gain_mult_q8
                    else:
                        gain_lock[i] = 1
            if not (found_lower and found_upper):
                if nbits > max_bits:
                    gain_mult_q8 = min(1024, gain_mult_q8 * 3 // 2)
                else:
                    gain_mult_q8 = max(64, gain_mult_q8 * 4 // 5)
            else:
                gain_mult_q8 = gain_mult_lower + (
                    (gain_mult_upper - gain_mult_lower)
                    * (max_bits - nbits_lower)) \
                    // (nbits_upper - nbits_lower)
                hi_bound = gain_mult_lower + \
                    ((gain_mult_upper - gain_mult_lower) >> 2)
                lo_bound = gain_mult_upper - \
                    ((gain_mult_upper - gain_mult_lower) >> 2)
                if gain_mult_q8 > hi_bound:
                    gain_mult_q8 = hi_bound
                elif gain_mult_q8 < lo_bound:
                    gain_mult_q8 = lo_bound
            p_gains_q16 = [
                LSHIFT_SAT32(SMULWB(ctrl.GainsUnq_Q16[i],
                                    best_gain_mult[i] if gain_lock[i]
                                    else gain_mult_q8), 8)
                for i in range(self.nb_subfr)]
            self.sShape_LastGainIndex = ctrl.lastGainIndexPrev
            ind, qgains, self.sShape_LastGainIndex = ee.gains_quant(
                p_gains_q16, self.sShape_LastGainIndex,
                cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
            self.indices.GainsIndices = ind
            gains_id = ee.gains_id(ind, self.nb_subfr)
            ctrl.Gains = np.array(qgains) / 65536.0
            it += 1

        self._shift_buffers()
        self.prevLag = ctrl.pitchL[self.nb_subfr - 1]
        self.prevSignalType = self.indices.signalType
        self.first_frame_after_reset = 0
        return 0

    def _shift_buffers(self):
        n = self.ltp_mem_length + LA_SHAPE_MS * self.fs_kHz
        self.x_buf[:n] = self.x_buf[self.frame_length:
                                    self.frame_length + n]

    VAD_flags = None  # set per packet


VARIABLE_HP_MIN_CUTOFF_HZ = 60
VARIABLE_HP_MAX_CUTOFF_HZ = 100


def hp_variable_cutoff(ch: "SilkEncoderChannel") -> None:
    """Adapt the HP cutoff toward the low end of the pitch range
    (HP_variable_cutoff.c:39-78).  Updates ``ch.variable_HP_smth1_Q15``
    from the previous frame's pitch lag, quality and speech activity."""
    if ch.prevSignalType != TYPE_VOICED:
        return
    pitch_freq_hz_q16 = ((ch.fs_kHz * 1000) << 16) // ch.prevLag
    pitch_freq_log_q7 = lin2log(pitch_freq_hz_q16) - (16 << 7)
    quality_q15 = int(ch.input_quality_bands_Q15[0])
    min_log_q7 = lin2log(VARIABLE_HP_MIN_CUTOFF_HZ << 16) - (16 << 7)
    pitch_freq_log_q7 = SMLAWB(
        pitch_freq_log_q7, SMULWB((-quality_q15) << 2, quality_q15),
        pitch_freq_log_q7 - min_log_q7)
    delta_freq_q7 = pitch_freq_log_q7 - (ch.variable_HP_smth1_Q15 >> 8)
    if delta_freq_q7 < 0:
        # track close to the minimum when pitch frequency decreases
        delta_freq_q7 *= 3
    lim = FIX_CONST(0.4, 7)
    delta_freq_q7 = min(max(delta_freq_q7, -lim), lim)
    ch.variable_HP_smth1_Q15 = SMLAWB(
        ch.variable_HP_smth1_Q15,
        SMULBB(ch.speech_activity_Q8, delta_freq_q7),
        FIX_CONST(0.1, 16))
    ch.variable_HP_smth1_Q15 = min(
        max(ch.variable_HP_smth1_Q15,
            lin2log(VARIABLE_HP_MIN_CUTOFF_HZ) << 8),
        lin2log(VARIABLE_HP_MAX_CUTOFF_HZ) << 8)


class SilkEncoder:
    """silk_encoder + silk_Encode (enc_API.c:142-566), mono or stereo
    (adaptive mid/side with predictor coding)."""

    def __init__(self):
        self.ch = SilkEncoderChannel()          # mid / mono
        self.ch2 = SilkEncoderChannel()         # side
        for c in (self.ch, self.ch2):
            c.VAD_flags = [0] * 3
        self.sStereo = None
        self.nBitsUsedLBRR = 0
        self.nBitsExceeded = 0
        self.prev_decode_only_middle = 0
        self.allowBandwidthSwitch = 0
        self.timeSinceSwitchAllowed_ms = 0

    def _control(self, ch, ctl: EncControl, fs_khz: int):
        ch.useDTX = int(ctl.useDTX)
        ch.useCBR = int(ctl.useCBR)
        ch.useInBandFEC = int(ctl.useInBandFEC)
        ch.API_fs_Hz = ctl.API_sampleRate
        ch.PacketLoss_perc = ctl.packetLossPercentage
        if ch.fs_kHz != fs_khz or ch.PacketSize_ms != ctl.payloadSize_ms:
            ch.setup_fs(fs_khz, ctl.payloadSize_ms)
            ch.resampler = None
        ch.setup_complexity(ctl.complexity)
        ch.setup_LBRR(ctl.LBRR_coded)
        if ch.first_frame_after_reset:
            ch.LBRR_flags = [0] * 3
        ch.inDTX = ch.useDTX
        if ch.resampler is None and ch.API_fs_Hz != ch.fs_kHz * 1000:
            ch.resampler = Resampler(ch.API_fs_Hz, ch.fs_kHz * 1000,
                                     for_enc=True)

    def _encode_header_and_lbrr(self, enc: RangeEncoder, n_channels: int):
        """enc_API.c:306-360: header space + LBRR flags/data."""
        chans = [self.ch, self.ch2][:n_channels]
        nfp = self.ch.nFramesPerPacket
        icdf0 = 256 - (256 >> ((nfp + 1) * n_channels))
        enc.enc_icdf(0, (icdf0, 0), 8)
        bits0 = enc.tell()
        for ch in chans:
            lbrr_symbol = 0
            for i in range(nfp):
                lbrr_symbol |= ch.LBRR_flags[i] << i
            ch.LBRR_flag = 1 if lbrr_symbol > 0 else 0
            if lbrr_symbol and nfp > 1:
                tab = (T.LBRR_flags_2_iCDF if nfp == 2
                       else T.LBRR_flags_3_iCDF)
                enc.enc_icdf(lbrr_symbol - 1, tab, 8)
        for i in range(nfp):
            for n, ch in enumerate(chans):
                if ch.LBRR_flags[i]:
                    if n_channels == 2 and n == 0:
                        from .encoder_stereo import StereoEncState
                        ee.stereo_encode_pred(enc, self.sStereo.predIx[i])
                        if self.ch2.LBRR_flags[i] == 0:
                            ee.stereo_encode_mid_only(
                                enc, self.sStereo.mid_only_flags[i])
                    cond = (CODE_CONDITIONALLY
                            if i > 0 and ch.LBRR_flags[i - 1]
                            else CODE_INDEPENDENTLY)
                    ch.ec_prevLagIndex = ee.encode_indices(
                        enc, ch.indices_LBRR[i], ch.psNLSF_CB,
                        ch.nb_subfr, ch.fs_kHz, cond,
                        ch.ec_prevSignalType, ch.ec_prevLagIndex)
                    ch.ec_prevSignalType = ch.indices_LBRR[i].signalType
                    ee.encode_pulses(enc, ch.indices_LBRR[i].signalType,
                                     ch.indices_LBRR[i].quantOffsetType,
                                     ch.pulses_LBRR[i], ch.frame_length)
        for ch in chans:
            ch.LBRR_flags = [0] * 3
        self.nBitsUsedLBRR = enc.tell() - bits0

    def encode(self, ctl: EncControl, samples_in: np.ndarray,
               enc: RangeEncoder, max_bytes: int,
               activity: int = VAD_NO_DECISION,
               n_channels: int = 1, to_mono: bool = False) -> int:
        """Encode one packet worth of input into ``enc``.

        ``samples_in``: [N] mono or interleaved [2*N] / [N,2] stereo at
        the API rate.  Returns bits used (0 => DTX)."""
        from .encoder_stereo import StereoEncState, stereo_lr_to_ms
        chans = [self.ch, self.ch2][:n_channels]
        if n_channels == 2 and self.sStereo is None:
            self.sStereo = StereoEncState()
        for ch in chans:
            ch.nFramesEncoded = 0
        # internal-rate switching state machine
        # (control_audio_bandwidth.c:36-131); a completed LP transition
        # arms the switch for the next packet
        from .lp_filter import control_audio_bandwidth
        fs_khz, switch_ready = control_audio_bandwidth(
            self.ch, ctl.desiredInternalSampleRate, ctl.API_sampleRate,
            ctl.minInternalSampleRate, ctl.maxInternalSampleRate,
            getattr(self, "_pending_switch", False),
            allow_switch=bool(getattr(self, "allowBandwidthSwitch", 0)))
        self._pending_switch = switch_ready
        if fs_khz != self.ch.fs_kHz and self.ch.fs_kHz:
            self.ch.sLP.saved_fs_kHz = self.ch.fs_kHz
        self._control(self.ch, ctl, fs_khz)
        if n_channels == 2:
            self._control(self.ch2, ctl, self.ch.fs_kHz)

        samples_in = np.asarray(samples_in)
        if n_channels == 2:
            if samples_in.ndim == 1:
                samples_in = samples_in.reshape(-1, 2)
        ch0 = self.ch
        n_frames = ch0.nFramesPerPacket
        spf_api = ch0.frame_length * ch0.API_fs_Hz // (ch0.fs_kHz * 1000)
        nbits_total_start = enc.tell()

        for fi in range(n_frames):
            hp_variable_cutoff(ch0)    # enc_API.c:398
            if n_channels == 2:
                segL = samples_in[fi * spf_api:(fi + 1) * spf_api, 0]
                segR = samples_in[fi * spf_api:(fi + 1) * spf_api, 1]
                fL = self._resample(self.ch, segL)
                fR = self._resample(self.ch2, segR, which=2)
            else:
                seg = samples_in[fi * spf_api:(fi + 1) * spf_api]
                frame = self._resample(ch0, seg)
                ch0.inputBuf[1:1 + ch0.frame_length] =                     frame[:ch0.frame_length]

            if fi == 0:
                self._encode_header_and_lbrr(enc, n_channels)

            # target rate (enc_API.c:365-392)
            nbits = ctl.bitRate * ctl.payloadSize_ms // 1000
            nbits -= self.nBitsUsedLBRR
            nbits //= n_frames
            target_rate = nbits * (100 if ctl.payloadSize_ms == 10
                                   else 50)
            target_rate -= (self.nBitsExceeded * 1000) // 500
            if fi > 0:
                bits_balance = enc.tell() - self.nBitsUsedLBRR \
                    - nbits * fi
                target_rate -= (bits_balance * 1000) // 500
            target_rate = min(max(target_rate, 5000), ctl.bitRate)

            if n_channels == 2:
                mid, side, ix, mid_only, ms_rates = stereo_lr_to_ms(
                    self.sStereo, fL[:ch0.frame_length],
                    fR[:ch0.frame_length], target_rate,
                    ch0.speech_activity_Q8, to_mono, ch0.fs_kHz,
                    ch0.frame_length)
                self.sStereo.predIx[fi] = ix
                self.sStereo.mid_only_flags[fi] = mid_only
                # mid channel input: 1-sample-delayed mid incl. history
                ch0.inputBuf[0:ch0.frame_length + 2] = \
                    mid[:ch0.frame_length + 2]
                self.ch2.inputBuf[1:1 + ch0.frame_length] = \
                    side[:ch0.frame_length]
                if mid_only == 0:
                    if self.prev_decode_only_middle == 1:
                        # reset side state (enc_API.c:399-412)
                        c2 = self.ch2
                        c2.sNSQ = NsqState()
                        c2.prev_NLSFq_Q15 = [0] * MAX_LPC_ORDER
                        c2.prevLag = 100
                        c2.sNSQ.lagPrev = 100
                        c2.sShape_LastGainIndex = 10
                        c2.prevSignalType = TYPE_NO_VOICE_ACTIVITY
                        c2.sNSQ.prev_gain_Q16 = 65536
                        c2.first_frame_after_reset = 1
                        c2.sShape_HarmShapeGain_smth = 0.0
                        c2.sShape_Tilt_smth = 0.0
                    self.ch2.do_vad(activity)
                else:
                    self.ch2.VAD_flags[fi] = 0
                ee.stereo_encode_pred(enc, ix)
                if self.ch2.VAD_flags[fi] == 0:
                    ee.stereo_encode_mid_only(enc, mid_only)

            ch0.control_SNR(target_rate if n_channels == 1
                            else max(ms_rates[0], 1))
            ch0.do_vad(activity)
            if n_channels == 2:
                self.ch2.control_SNR(max(ms_rates[1], 1))

            for n, ch in enumerate(chans):
                rate = target_rate if n_channels == 1 else ms_rates[n]
                if rate <= 0:
                    continue
                max_bits = ctl.maxBits
                if n_frames == 3:
                    if fi == 0:
                        max_bits = max_bits * 2 // 5
                    elif fi == 1:
                        max_bits = max_bits * 3 // 4
                use_cbr = ctl.useCBR and fi == n_frames - 1
                if n_channels == 2 and n == 0 and ms_rates[1] > 0:
                    use_cbr = False
                    max_bits -= ctl.maxBits // (n_frames * 2)
                if ch.nFramesEncoded - n <= 0:
                    cond = CODE_INDEPENDENTLY
                elif n > 0 and self.prev_decode_only_middle:
                    cond = CODE_INDEPENDENTLY_NO_LTP_SCALING
                else:
                    cond = CODE_CONDITIONALLY
                ch.encode_frame(enc, cond, max_bits, use_cbr)
                ch.nFramesEncoded += 1
            if n_channels == 2:
                self.prev_decode_only_middle = \
                    self.sStereo.mid_only_flags[fi]

        # patch VAD/LBRR header flags (enc_API.c:487-500)
        flags = 0
        for ch in chans:
            for i in range(n_frames):
                flags = (flags << 1) | int(ch.VAD_flags[i])
            flags = (flags << 1) | int(ch.LBRR_flag)
        enc.patch_initial_bits(flags, (n_frames + 1) * n_channels)

        dtx = all(c.inDTX for c in chans)
        nbytes = 0 if dtx else (enc.tell() + 7) // 8
        self.nBitsExceeded += nbytes * 8
        self.nBitsExceeded -= ctl.bitRate * ctl.payloadSize_ms // 1000
        self.nBitsExceeded = min(max(self.nBitsExceeded, 0), 10000)
        # allow bandwidth switching only during speech inactivity, with a
        # threshold that relaxes over time (enc_API.c:548-557)
        thr_q8 = SMLAWB(SPEECH_ACTIVITY_DTX_THRES_Q8,
                        FIX_CONST((1 - 0.05) / 5000, 16 + 8),
                        self.timeSinceSwitchAllowed_ms)
        if self.ch.speech_activity_Q8 < thr_q8:
            self.allowBandwidthSwitch = 1
            self.timeSinceSwitchAllowed_ms = 0
        else:
            self.allowBandwidthSwitch = 0
            self.timeSinceSwitchAllowed_ms += ctl.payloadSize_ms
        if dtx:
            return 0
        return enc.tell() - nbits_total_start

    def _resample(self, ch, seg, which=1):
        if ch.resampler is not None:
            return ch.resampler.process(
                np.clip(np.round(seg), -32768, 32767).astype(np.int64))
        return np.round(np.asarray(seg)).astype(np.int64)
