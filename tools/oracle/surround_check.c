/* Run reference surround_analysis on f32 interleaved PCM.
   Usage: surround_check <channels> <pcm.f32>  (48 kHz, 20ms frames) */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "opus.h"
#include "opus_custom.h"
#include "celt.h"
#include "opus_private.h"


static void copy_in(opus_val16 *dst, int dst_stride, const void *src_, int src_stride, int src_channel, int frame_size, void *user_data)
{
   const float *src = (const float*)src_;
   int i;
   (void)user_data;
   for (i=0;i<frame_size;i++)
      dst[i*dst_stride] = src[i*src_stride+src_channel];
}

int main(int argc, char **argv)
{
   int channels = atoi(argv[1]);
   FILE *f = fopen(argv[2], "rb");
   fseek(f, 0, SEEK_END); long nb = ftell(f)/4/channels; fseek(f, 0, SEEK_SET);
   float *pcm = malloc(nb*channels*4);
   if (fread(pcm, 4, nb*channels, f) != (size_t)(nb*channels)) return 1;
   fclose(f);
   int err=0;
   const CELTMode *mode = opus_custom_mode_create(48000, 960, &err);
   opus_val32 *mem = calloc(channels*120, 4);
   opus_val32 *preemph = calloc(channels, 4);
   opus_val16 *bandLogE = malloc(channels*21*4);
   long pos = 0;
   while (pos + 960 <= nb) {
      surround_analysis(mode, pcm+pos*channels, bandLogE, mem, preemph,
                        960, 120, channels, 48000, copy_in, 0);
      for (int c=0;c<channels;c++) {
         for (int i=0;i<21;i++) printf("%.5f ", bandLogE[21*c+i]);
         printf("\n");
      }
      pos += 960;
   }
   return 0;
}
