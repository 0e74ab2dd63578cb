/* Custom codec cross-harness.
   enc: custom_cross enc <Fs> <ch> <frame> <bytes> <in.s16> <out.bits>
   dec: custom_cross dec <Fs> <ch> <frame> <bytes> <in.bits> <out.s16>
   bits file: fixed <bytes> per frame, concatenated. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "opus_custom.h"
int main(int argc, char **argv)
{
   int enc_mode = strcmp(argv[1], "enc") == 0;
   int Fs = atoi(argv[2]), ch = atoi(argv[3]), frame = atoi(argv[4]), nbytes = atoi(argv[5]);
   int err = 0;
   OpusCustomMode *mode = opus_custom_mode_create(Fs, frame, &err);
   if (!mode) return 10;
   FILE *fi = fopen(argv[6], "rb"), *fo = fopen(argv[7], "wb");
   short *pcm = malloc(frame*ch*2);
   unsigned char *buf = malloc(nbytes);
   if (enc_mode) {
      OpusCustomEncoder *e = opus_custom_encoder_create(mode, ch, &err);
      if (!e) return 11;
      while (fread(pcm, 2, frame*ch, fi) == (size_t)(frame*ch)) {
         int r = opus_custom_encode(e, pcm, frame, buf, nbytes);
         if (r != nbytes) { fprintf(stderr, "enc r=%d\n", r); return 12; }
         fwrite(buf, 1, nbytes, fo);
      }
   } else {
      OpusCustomDecoder *d = opus_custom_decoder_create(mode, ch, &err);
      if (!d) return 13;
      while (fread(buf, 1, nbytes, fi) == (size_t)nbytes) {
         int r = opus_custom_decode(d, buf, nbytes, pcm, frame);
         if (r != frame) { fprintf(stderr, "dec r=%d\n", r); return 14; }
         fwrite(pcm, 2, frame*ch, fo);
      }
   }
   return 0;
}
