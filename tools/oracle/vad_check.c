/* Oracle: drive silk_VAD_GetSA_Q8_c on a deterministic 16 kHz stream,
   print per-frame outputs for cross-check with silk/vad.py. */
#include <stdio.h>
#include <string.h>
#include <math.h>
#define HAVE_CONFIG_H
#include "config.h"
#include "main.h"

int main(void) {
    silk_encoder_state enc;
    opus_int16 frame[320];
    int f, i;
    memset(&enc, 0, sizeof(enc));
    enc.frame_length = 320;
    enc.fs_kHz = 16;
    enc.arch = 0;
    silk_VAD_Init(&enc.sVAD);
    for (f = 0; f < 30; f++) {
        double amp = (f > 6 && f < 20) ? 8000.0 : 60.0;
        for (i = 0; i < 320; i++) {
            double t = (f * 320 + i) / 16000.0;
            double v = amp * sin(2 * M_PI * 155 * t)
                     + 0.4 * amp * sin(2 * M_PI * 310 * t)
                     + 30.0 * sin(2 * M_PI * 3777 * t + f);
            frame[i] = (opus_int16)floor(v + 0.5);
        }
        silk_VAD_GetSA_Q8_c(&enc, frame);
        printf("%d %d %d %d %d %d\n", enc.speech_activity_Q8,
               enc.input_tilt_Q15, enc.input_quality_bands_Q15[0],
               enc.input_quality_bands_Q15[1],
               enc.input_quality_bands_Q15[2],
               enc.input_quality_bands_Q15[3]);
    }
    return 0;
}
