/* Feed float PCM (f32le mono file) through run_analysis in 20 ms frames
   and print per-frame AnalysisInfo fields.
   Usage: analysis_check <Fs> <pcm.f32> */
#include <stdio.h>
#include <stdlib.h>
#include "analysis.h"
#include "modes.h"
#include "celt.h"

/* downmix_float is not exported; reimplement the c1=0,c2=-2 mono case */
static void dmix(const void *_x, opus_val32 *y, int subframe, int offset, int c1, int c2, int C)
{
   const float *x = (const float *)_x;
   int j;
   (void)c2; (void)C; (void)c1;
   for (j=0;j<subframe;j++) y[j] = 32768.f*x[(j+offset)];
}

int main(int argc, char **argv)
{
   int Fs = atoi(argv[1]);
   FILE *f = fopen(argv[2], "rb");
   fseek(f, 0, SEEK_END); long nb = ftell(f)/4; fseek(f, 0, SEEK_SET);
   float *pcm = malloc(nb*4);
   if (fread(pcm, 4, nb, f) != (size_t)nb) return 1;
   fclose(f);
   int frame = Fs/50;
   TonalityAnalysisState *st = calloc(1, sizeof(*st));
   tonality_analysis_init(st, Fs);
   int err = 0;
   const CELTMode *mode = opus_custom_mode_create(48000, 960, &err);
   AnalysisInfo info;
   long pos = 0;
   while (pos + frame <= nb) {
      run_analysis(st, mode, pcm+pos, frame, frame, 0, -2, 1, Fs, 24, dmix, &info);
      printf("%d %.6f %.6f %.6f %.6f %.6f %.6f %d %.6f %.6f\n",
             info.valid, info.tonality, info.tonality_slope, info.noisiness,
             info.activity, info.music_prob, info.activity_probability,
             info.bandwidth, info.music_prob_min, info.music_prob_max);
      pos += frame;
   }
   return 0;
}
