/* Oracle: silk_pitch_analysis_core_FLP on synthetic voiced frames. */
#include <stdio.h>
#include <string.h>
#include <math.h>
#define HAVE_CONFIG_H
#include "config.h"
#include "main_FLP.h"

int main(void) {
    int trial;
    for (trial = 0; trial < 12; trial++) {
        silk_float frame[40 * 16];
        opus_int pitch[4];
        opus_int16 lagIndex = 0;
        opus_int8 contourIndex = 0;
        silk_float LTPCorr = 0.0f;
        int i, fs = 16, n = 40 * fs;
        double period = 50.0 + 13.0 * trial;   /* 50..193 samples @16k */
        unsigned int seed = 123 + trial;
        for (i = 0; i < n; i++) {
            double t = i;
            double v = 6000.0 * sin(2 * M_PI * t / period)
                     + 2500.0 * sin(4 * M_PI * t / period + 0.7)
                     + 900.0 * sin(6 * M_PI * t / period + 1.9);
            seed = seed * 1664525u + 1013904223u;
            v += 300.0 * ((double)(seed >> 8) / 8388608.0 - 1.0);
            frame[i] = (silk_float)v;
        }
        int ret = silk_pitch_analysis_core_FLP(frame, pitch, &lagIndex,
            &contourIndex, &LTPCorr, 0, 0.6f, 0.4f, fs, 2, 4, 0);
        printf("%d %d %d %d %d %d %d %d %.4f\n", ret, pitch[0], pitch[1],
               pitch[2], pitch[3], (int)lagIndex, (int)contourIndex,
               (int)(period + 0.5), LTPCorr);
    }
    return 0;
}
