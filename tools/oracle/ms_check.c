/* Decode a multistream packet produced by our MSEncoder with the reference
 * opus_multistream_decoder. Test tooling only. */
#include <stdio.h>
#include <stdlib.h>
#include "opus_multistream.h"
int main(int argc, char **argv) {
  FILE *f = fopen(argv[1], "rb");
  unsigned char buf[60000];
  int len = fread(buf, 1, sizeof(buf), f);
  int err;
  unsigned char mapping[6] = {0, 4, 1, 2, 3, 5};
  OpusMSDecoder *d = opus_multistream_decoder_create(48000, 6, 4, 2,
                                                     mapping, &err);
  opus_int16 pcm[960 * 6];
  int ret = opus_multistream_decode(d, buf, len, pcm, 960, 0);
  printf("ret %d err %d first samples %d %d %d %d %d %d\n", ret, err,
         pcm[0], pcm[1], pcm[2], pcm[3], pcm[4], pcm[5]);
  { opus_uint32 rng; opus_multistream_decoder_ctl(d, OPUS_GET_FINAL_RANGE(&rng));
    printf("final_range %u\n", rng); }
  return ret == 960 ? 0 : 1;
}
