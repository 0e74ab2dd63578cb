/* Oracle: A2NLSF + NLSF_encode + quant_LTP_gains on deterministic data. */
#include <stdio.h>
#include <string.h>
#include <math.h>
#define HAVE_CONFIG_H
#include "config.h"
#include "main.h"

extern const silk_NLSF_CB_struct silk_NLSF_CB_WB;
extern const silk_NLSF_CB_struct silk_NLSF_CB_NB_MB;

int main(void) {
    int trial, i;
    /* --- A2NLSF --- */
    for (trial = 0; trial < 8; trial++) {
        opus_int32 a_Q16[16];
        opus_int16 NLSF[16];
        unsigned int seed = 7 + trial;
        for (i = 0; i < 16; i++) {
            seed = seed * 1664525u + 1013904223u;
            a_Q16[i] = (opus_int32)((seed >> 8) % 30000) - 15000;
        }
        /* tame the filter a bit */
        for (i = 0; i < 16; i++) a_Q16[i] = a_Q16[i] / (2 + i);
        silk_A2NLSF(NLSF, a_Q16, 16);
        printf("A2NLSF");
        for (i = 0; i < 16; i++) printf(" %d", NLSF[i]);
        printf("\n");
    }
    /* --- NLSF_encode (WB) --- */
    for (trial = 0; trial < 8; trial++) {
        opus_int16 nlsf[16], w[16];
        opus_int8 ind[17];
        unsigned int seed = 77 + trial;
        opus_int16 base = 600;
        for (i = 0; i < 16; i++) {
            seed = seed * 1664525u + 1013904223u;
            base += 400 + (opus_int16)((seed >> 9) % 1600);
            nlsf[i] = base;
        }
        silk_NLSF_VQ_weights_laroia(w, nlsf, 16);
        silk_NLSF_encode(ind, nlsf, &silk_NLSF_CB_WB, w,
                         3000 + 100 * trial, 4, trial % 3);
        printf("NLSFENC");
        for (i = 0; i < 17; i++) printf(" %d", ind[i]);
        printf(" |");
        for (i = 0; i < 16; i++) printf(" %d", nlsf[i]);
        printf("\n");
    }
    /* --- quant_LTP_gains --- */
    for (trial = 0; trial < 6; trial++) {
        opus_int32 XX_Q17[4 * 25], xX_Q17[4 * 5];
        opus_int16 B_Q14[20];
        opus_int8 cbk_index[4], per = 0;
        opus_int32 slg = 30 * (1 << 7);
        opus_int pg;
        unsigned int seed = 7 + trial;
        int j, k;
        for (j = 0; j < 4; j++) {
            /* build a plausible symmetric XX and xX */
            for (k = 0; k < 25; k++) XX_Q17[j*25+k] = 0;
            for (k = 0; k < 5; k++) {
                XX_Q17[j*25 + 6*k] = 131072 + (opus_int32)(seed % 20000);
                seed = seed * 1664525u + 1013904223u;
            }
            for (k = 0; k < 25; k++) {
                int r = k / 5, c = k % 5;
                if (r != c) {
                    opus_int32 v = (opus_int32)((seed >> 10) % 30000) - 15000;
                    seed = seed * 1664525u + 1013904223u;
                    XX_Q17[j*25 + 5*r + c] = XX_Q17[j*25 + 5*c + r] = v;
                }
            }
            for (k = 0; k < 5; k++) {
                xX_Q17[j*5+k] = (opus_int32)((seed >> 10) % 80000) - 40000;
                seed = seed * 1664525u + 1013904223u;
            }
        }
        silk_quant_LTP_gains(B_Q14, cbk_index, &per, &slg, &pg,
                             XX_Q17, xX_Q17, 80, 4, 0);
        printf("LTPQ %d %d %d %d %d %d %d %d\n", (int)per,
               cbk_index[0], cbk_index[1], cbk_index[2], cbk_index[3],
               (int)slg, pg, B_Q14[7]);
    }
    return 0;
}
