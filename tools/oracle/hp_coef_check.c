/* Print B_Q28/A_Q28 of hp_cutoff for a sweep of cutoffs/Fs. */
#include <stdio.h>
#include "SigProc_FIX.h"
int main(void) {
  int fs_list[3] = {48000, 24000, 16000};
  for (int f = 0; f < 3; f++) {
    opus_int32 Fs = fs_list[f];
    for (opus_int32 cutoff_Hz = 3; cutoff_Hz <= 100; cutoff_Hz += 7) {
      opus_int32 B_Q28[3], A_Q28[2], Fc_Q19, r_Q28, r_Q22;
      Fc_Q19 = silk_DIV32_16(silk_SMULBB(SILK_FIX_CONST(1.5*3.14159/1000,19), cutoff_Hz), Fs/1000);
      r_Q28 = SILK_FIX_CONST(1.0,28) - silk_MUL(SILK_FIX_CONST(0.92,9), Fc_Q19);
      B_Q28[0] = r_Q28; B_Q28[1] = silk_LSHIFT(-r_Q28,1); B_Q28[2] = r_Q28;
      r_Q22 = silk_RSHIFT(r_Q28,6);
      A_Q28[0] = silk_SMULWW(r_Q22, silk_SMULWW(Fc_Q19,Fc_Q19) - SILK_FIX_CONST(2.0,22));
      A_Q28[1] = silk_SMULWW(r_Q22, r_Q22);
      printf("%d %d %d %d %d %d %d\n", (int)Fs, (int)cutoff_Hz,
             (int)B_Q28[0], (int)B_Q28[1], (int)B_Q28[2], (int)A_Q28[0], (int)A_Q28[1]);
    }
  }
  return 0;
}
