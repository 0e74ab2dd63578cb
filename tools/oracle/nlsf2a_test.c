#include <stdio.h>
#include "main.h"
int main(void) {
  opus_int16 nlsf[16] = {714, 1386, 3168, 5848, 7776, 10624, 12672, 14720,
                         16768, 18688, 20736, 22784, 24704, 26752, 28672, 30592};
  opus_int16 a[16]; int i;
  silk_NLSF2A(a, nlsf, 16, 0);
  printf("A_Q12:"); for (i=0;i<16;i++) printf(" %d", a[i]); printf("\n");
  /* second vector */
  opus_int16 nlsf2[16] = {574, 1141, 2615, 6400, 8576, 10624, 12672, 14720,
                          16768, 18688, 20736, 22784, 24704, 26752, 28672, 30592};
  silk_NLSF2A(a, nlsf2, 16, 0);
  printf("A_Q12b:"); for (i=0;i<16;i++) printf(" %d", a[i]); printf("\n");
  /* gains_dequant check */
  { opus_int32 g[4]; opus_int8 ind[4]={36,4,3,4}; opus_int8 prev=36;
    /* independent coding on first */
    silk_gains_dequant(g, ind, &prev, 0, 4);
    printf("GAINS: %d %d %d %d prev %d\n", g[0],g[1],g[2],g[3], prev); }
  return 0;
}
