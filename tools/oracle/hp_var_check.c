/* Drive the smth1 update recurrence of silk_HP_variable_cutoff with
   synthetic (lag, quality, activity) sequences and print smth1. */
#include <stdio.h>
#include "SigProc_FIX.h"
#define VARIABLE_HP_SMTH_COEF1 0.1f
#define VARIABLE_HP_MAX_DELTA_FREQ 0.4f
#define VARIABLE_HP_MIN_CUTOFF_HZ 60
#define VARIABLE_HP_MAX_CUTOFF_HZ 100
int main(void) {
  opus_int32 smth1 = silk_LSHIFT(silk_lin2log(SILK_FIX_CONST(VARIABLE_HP_MIN_CUTOFF_HZ,16)) - (16<<7), 8);
  int fs_kHz = 16;
  unsigned s = 12345;
  for (int i = 0; i < 50; i++) {
    s = s*1664525u + 1013904223u;
    int lag = 40 + (s>>20)%200;
    s = s*1664525u + 1013904223u;
    int quality = (s>>16)%32768;
    s = s*1664525u + 1013904223u;
    int act = (s>>24)%256;
    opus_int32 pitch_freq_Hz_Q16 = silk_DIV32_16(silk_LSHIFT(silk_MUL(fs_kHz,1000),16), lag);
    opus_int32 pitch_freq_log_Q7 = silk_lin2log(pitch_freq_Hz_Q16) - (16<<7);
    pitch_freq_log_Q7 = silk_SMLAWB(pitch_freq_log_Q7, silk_SMULWB(silk_LSHIFT(-quality,2), quality),
        pitch_freq_log_Q7 - (silk_lin2log(SILK_FIX_CONST(VARIABLE_HP_MIN_CUTOFF_HZ,16)) - (16<<7)));
    opus_int32 delta_freq_Q7 = pitch_freq_log_Q7 - silk_RSHIFT(smth1, 8);
    if (delta_freq_Q7 < 0) delta_freq_Q7 = silk_MUL(delta_freq_Q7, 3);
    delta_freq_Q7 = silk_LIMIT_32(delta_freq_Q7, -SILK_FIX_CONST(VARIABLE_HP_MAX_DELTA_FREQ,7), SILK_FIX_CONST(VARIABLE_HP_MAX_DELTA_FREQ,7));
    smth1 = silk_SMLAWB(smth1, silk_SMULBB(act, delta_freq_Q7), SILK_FIX_CONST(VARIABLE_HP_SMTH_COEF1,16));
    smth1 = silk_LIMIT_32(smth1, silk_LSHIFT(silk_lin2log(VARIABLE_HP_MIN_CUTOFF_HZ),8),
                                 silk_LSHIFT(silk_lin2log(VARIABLE_HP_MAX_CUTOFF_HZ),8));
    printf("%d %d %d %d\n", lag, quality, act, (int)smth1);
  }
  return 0;
}
