/* Decode a stream of length-prefixed multistream packets with libopus.
   Usage: ms_decode_check <channels> <streams> <coupled> <mapping csv> <in.bit> <out.f32> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "opus_multistream.h"

int main(int argc, char **argv)
{
   int channels = atoi(argv[1]);
   int streams = atoi(argv[2]);
   int coupled = atoi(argv[3]);
   unsigned char mapping[255];
   char *tok = strtok(argv[4], ",");
   int i = 0;
   while (tok) { mapping[i++] = atoi(tok); tok = strtok(NULL, ","); }
   FILE *f = fopen(argv[5], "rb");
   FILE *g = fopen(argv[6], "wb");
   int err = 0;
   OpusMSDecoder *dec = opus_multistream_decoder_create(48000, channels,
       streams, coupled, mapping, &err);
   if (err) { fprintf(stderr, "create err %d\n", err); return 1; }
   unsigned char buf[60000];
   float pcm[5760*8];
   unsigned char hdr[4];
   while (fread(hdr, 1, 4, f) == 4) {
      unsigned len = (hdr[0]<<24)|(hdr[1]<<16)|(hdr[2]<<8)|hdr[3];
      if (len > sizeof(buf) || fread(buf, 1, len, f) != len) return 2;
      int n = opus_multistream_decode_float(dec, buf, len, pcm, 5760, 0);
      if (n < 0) { fprintf(stderr, "decode err %d\n", n); return 3; }
      fwrite(pcm, 4, n*channels, g);
   }
   fclose(g);
   return 0;
}
