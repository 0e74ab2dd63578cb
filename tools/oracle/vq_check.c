#include <stdio.h>
#include <string.h>
#define HAVE_CONFIG_H
#include "config.h"
#include "main.h"
int main(void) {
    opus_int32 XX_Q17[25], xX_Q17[5];
    opus_int8 ind;
    opus_int32 res, rd;
    opus_int gain;
    unsigned int seed = 7;
    int k;
    for (k = 0; k < 25; k++) XX_Q17[k] = 0;
    for (k = 0; k < 5; k++) {
        XX_Q17[6*k] = 131072 + (opus_int32)(seed % 20000);
        seed = seed * 1664525u + 1013904223u;
    }
    for (k = 0; k < 25; k++) {
        int r = k / 5, c = k % 5;
        if (r != c) {
            opus_int32 v = (opus_int32)((seed >> 10) % 30000) - 15000;
            seed = seed * 1664525u + 1013904223u;
            XX_Q17[5*r + c] = XX_Q17[5*c + r] = v;
        }
    }
    for (k = 0; k < 5; k++) {
        xX_Q17[k] = (opus_int32)((seed >> 10) % 80000) - 40000;
        seed = seed * 1664525u + 1013904223u;
    }
    printf("XX");
    for (k = 0; k < 25; k++) printf(" %d", XX_Q17[k]);
    printf("\nxX");
    for (k = 0; k < 5; k++) printf(" %d", xX_Q17[k]);
    printf("\n");
    for (k = 0; k < 3; k++) {
        silk_VQ_WMat_EC_c(&ind, &res, &rd, &gain, XX_Q17, xX_Q17,
            silk_LTP_vq_ptrs_Q7[k], silk_LTP_vq_gain_ptrs_Q7[k],
            silk_LTP_gain_BITS_Q5_ptrs[k], 80, 5000, silk_LTP_vq_sizes[k]);
        printf("VQ %d: ind %d res %d rd %d gain %d\n", k, ind, res, rd, gain);
    }
    return 0;
}
