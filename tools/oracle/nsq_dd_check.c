/* Oracle: silk_NSQ_del_dec_c, voiced, with warping, 3 frames. */
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <math.h>
#define HAVE_CONFIG_H
#include "config.h"
#include "main.h"

int main(void) {
    silk_encoder_state enc;
    silk_nsq_state nsq;
    SideInfoIndices ind;
    opus_int16 x16[320];
    opus_int8 pulses[320];
    opus_int16 PredCoef_Q12[2*16];
    opus_int16 LTPCoef_Q14[20];
    opus_int16 AR_Q13[4*24];
    opus_int HarmShapeGain_Q14[4] = {6000, 6000, 5000, 5000};
    opus_int Tilt_Q14[4] = {-5000, -5000, -5500, -5200};
    opus_int32 LF_shp_Q14[4];
    opus_int32 Gains_Q16[4] = {3<<16, 3<<16, 4<<16, 4<<16};
    opus_int pitchL[4] = {100, 100, 102, 102};
    int i, k, frame;
    unsigned int seed = 5;
    memset(&enc, 0, sizeof(enc));
    memset(&nsq, 0, sizeof(nsq));
    memset(&ind, 0, sizeof(ind));
    enc.nb_subfr = 4; enc.frame_length = 320; enc.subfr_length = 80;
    enc.ltp_mem_length = 320; enc.predictLPCOrder = 16;
    enc.shapingLPCOrder = 16; enc.arch = 0;
    enc.nStatesDelayedDecision = 4;
    enc.warping_Q16 = 16 * 983;   /* fs 16 * FIX(0.015,16) */
    nsq.prev_gain_Q16 = 65536; nsq.lagPrev = 100;
    ind.signalType = TYPE_VOICED; ind.quantOffsetType = 0;
    ind.NLSFInterpCoef_Q2 = 4;
    for (i = 0; i < 16; i++)
        PredCoef_Q12[i] = PredCoef_Q12[16+i] =
            (opus_int16)((i==0)?6000:((i==1)?-2000:(100-13*i)));
    for (i = 0; i < 20; i++) LTPCoef_Q14[i] = (opus_int16)((i%5==2)?9000:500);
    for (k = 0; k < 4; k++)
        for (i = 0; i < 16; i++)
            AR_Q13[k*24+i] = (opus_int16)(((i==0)?5000:-3000/(i+1)));
    for (k = 0; k < 4; k++)
        LF_shp_Q14[k] = ((opus_int32)(opus_int16)15000 << 16)
                        | (opus_uint16)(opus_int16)(-14000);
    for (frame = 0; frame < 3; frame++) {
        for (i = 0; i < 320; i++) {
            double t = (frame*320+i);
            double v = 5000.0*sin(2*M_PI*t/100.0) + 1000.0*sin(2*M_PI*t/25.0);
            seed = seed * 1664525u + 1013904223u;
            v += 200.0*((double)(seed>>8)/8388608.0 - 1.0);
            x16[i] = (opus_int16)floor(v + 0.5);
        }
        ind.Seed = (frame + 1) & 3;
        silk_NSQ_del_dec_c(&enc, &nsq, &ind, x16, pulses, PredCoef_Q12,
            LTPCoef_Q14, AR_Q13, HarmShapeGain_Q14, Tilt_Q14, LF_shp_Q14,
            Gains_Q16, pitchL, 1300, 15565);
        long sum = 0, asum = 0;
        for (i = 0; i < 320; i++) { sum += pulses[i]; asum += abs(pulses[i]); }
        printf("frame %d: seedout %d sum %ld abs %ld p[0..9]", frame,
               ind.Seed, sum, asum);
        for (i = 0; i < 10; i++) printf(" %d", pulses[i]);
        printf(" xq[325..329]");
        for (i = 325; i < 330; i++) printf(" %d", nsq.xq[i]);
        printf("\n");
    }
    return 0;
}
