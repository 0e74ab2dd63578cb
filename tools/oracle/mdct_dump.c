/* Golden vectors for the CELT MDCT: run the reference clt_mdct_forward /
 * clt_mdct_backward on LCG-generated input for every shift/stride combo and
 * print inputs+outputs. tests/test_mdct.py replays them. Test tooling only. */
#include <stdio.h>
#include <string.h>
#include "modes.h"
#include "mdct.h"

static unsigned int lcg = 123u;
static float frand(void) {
  lcg = lcg * 1664525u + 1013904223u;
  return ((int)(lcg >> 8) - (1 << 23)) / (float)(1 << 23);
}

int main(void) {
  const CELTMode *m = opus_custom_mode_create(48000, 960, NULL);
  int shift, i, b;
  int overlap = m->overlap;
  for (shift = 0; shift <= m->maxLM; shift++) {
    int B = 1 << shift;          /* stride = number of short blocks */
    int N = m->mdct.n >> shift;  /* MDCT size */
    int N2 = N >> 1;
    float in[2048 + 200], fwd_in[2048 + 200], out[2048], syn[4096];
    int total_in = B * N2 + overlap;
    for (i = 0; i < total_in; i++) in[i] = frand();
    memcpy(fwd_in, in, sizeof(in));
    /* forward: B interleaved blocks, as compute_mdcts does */
    for (b = 0; b < B; b++)
      clt_mdct_forward(&m->mdct, fwd_in + b * N2, out + b, m->window,
                       overlap, shift, B, 0);
    printf("FWD shift %d N2 %d\nIN", shift, N2);
    for (i = 0; i < total_in; i++) printf(" %.9g", in[i]);
    printf("\nOUT");
    for (i = 0; i < B * N2; i++) printf(" %.9g", out[i]);
    printf("\n");
    /* backward: fill output region with history to exercise TDAC mirror */
    for (i = 0; i < B * N2 + overlap; i++) syn[i] = frand();
    printf("BWD shift %d\nHIST", shift);
    for (i = 0; i < overlap / 2; i++) printf(" %.9g", syn[i]);
    printf("\nSPEC");
    for (i = 0; i < B * N2; i++) printf(" %.9g", out[i]);
    printf("\n");
    for (b = 0; b < B; b++)
      clt_mdct_backward(&m->mdct, out + b, syn + N2 * b, m->window, overlap,
                        shift, B, 0);
    printf("SYN");
    for (i = 0; i < B * N2 + overlap / 2; i++) printf(" %.9g", syn[i]);
    printf("\n");
  }
  return 0;
}
