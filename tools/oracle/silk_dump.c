/* Decode SILK-only Opus packets calling silk_Decode directly, dumping
 * ec_tell checkpoints + side-info indices so the Python port can be
 * compared step by step. Test tooling only. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "main.h"
#include "API.h"
#include "entdec.h"

int main(int argc, char **argv) {
  FILE *f = fopen(argv[1], "rb");
  unsigned char hdr[8], payload[2000];
  opus_int32 decSize;
  void *dec;
  silk_DecControlStruct ctl;
  int pkt = 0;
  silk_Get_Decoder_Size(&decSize);
  dec = malloc(decSize);
  silk_InitDecoder(dec);
  memset(&ctl, 0, sizeof(ctl));
  ctl.nChannelsAPI = 1;
  ctl.nChannelsInternal = 1;
  ctl.API_sampleRate = 16000;
  ctl.internalSampleRate = 16000;
  ctl.payloadSize_ms = 20;
  while (fread(hdr, 1, 8, f) == 8 && pkt < 4) {
    int len = (hdr[0] << 24) | (hdr[1] << 16) | (hdr[2] << 8) | hdr[3];
    ec_dec rd;
    opus_int16 out[960 * 3];
    opus_int32 nOut = 0;
    int i;
    fread(payload, 1, len, f);
    /* strip 1-byte TOC (code 0) */
    ec_dec_init(&rd, payload + 1, len - 1);
    silk_Decode(dec, &ctl, 0, 1, &rd, out, &nOut, 0);
    printf("PKT %d len %d tell %d rng %u nOut %d\n", pkt, len - 1,
           ec_tell(&rd), rd.rng, (int)nOut);
    printf("SAMP");
    for (i = 0; i < 16; i++) printf(" %d", out[i]);
    printf("\nMID");
    for (i = 400; i < 416; i++) printf(" %d", out[i]);
    { int ma=0; for (i=0;i<nOut;i++) if (abs(out[i])>ma) ma=abs(out[i]);
      printf("\nMAXABS %d\n", ma); }
    {
      /* peek at decoder state: indices of channel 0 */
      silk_decoder_state *ch = (silk_decoder_state *)dec; /* channel_state[0] is first member */
      printf("IDX sig %d qoff %d gains %d %d %d %d seed %d interp %d\n",
             ch->indices.signalType, ch->indices.quantOffsetType,
             ch->indices.GainsIndices[0], ch->indices.GainsIndices[1],
             ch->indices.GainsIndices[2], ch->indices.GainsIndices[3],
             ch->indices.Seed, ch->indices.NLSFInterpCoef_Q2);
      printf("NLSF");
      for (i = 0; i < 17; i++) printf(" %d", ch->indices.NLSFIndices[i]);
      printf("\nPREVNLSF");
      for (i = 0; i < 16; i++) printf(" %d", ch->prevNLSF_Q15[i]);
      printf("\nGAINIDX %d lagPrev %d\n", ch->LastGainIndex, ch->lagPrev);
      { int mv = ch->ltp_mem_length - ch->frame_length; int ma=0, j;
        printf("RAWXQ");
        for (j=0;j<16;j++) printf(" %d", ch->outBuf[mv+j]);
        printf(" |");
        for (j=100;j<116;j++) printf(" %d", ch->outBuf[mv+j]);
        for (j=0;j<ch->frame_length;j++) if (abs(ch->outBuf[mv+j])>ma) ma=abs(ch->outBuf[mv+j]);
        printf(" MAX %d\n", ma); }
    }
    pkt++;
  }
  return 0;
}
