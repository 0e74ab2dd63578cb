/* Golden-vector generator for the range coder.
 *
 * Links against the reference libopus.a and drives its ec_enc_*/ /* ec_dec_*
 * entry points with a deterministic LCG-driven op sequence, emitting the
 * resulting packet bytes and tell() values as text. tests/test_range_coder.py
 * replays the identical sequence through the Python implementation and
 * compares byte-for-byte. This file is test tooling only; it is not part of
 * the framework.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "entenc.h"
#include "entdec.h"

#define BUF_SZ 512
#define NOPS 200

static unsigned int lcg_state = 42u;
static unsigned int lcg(void) {
  lcg_state = lcg_state * 1664525u + 1013904223u;
  return lcg_state >> 8;
}

int main(void) {
  unsigned char buf[BUF_SZ];
  int trial;
  for (trial = 0; trial < 50; trial++) {
    ec_enc enc;
    ec_dec dec;
    int ops[NOPS][3];
    int vals[NOPS];
    int n, i;
    lcg_state = 1000u + (unsigned)trial;
    memset(buf, 0, sizeof(buf));
    ec_enc_init(&enc, buf, BUF_SZ);
    n = 0;
    for (i = 0; i < NOPS; i++) {
      int kind = (int)(lcg() % 5u);
      int a = 0, b = 0, v = 0;
      switch (kind) {
        case 0: { /* encode(fl, fh, ft) from a random symbol in [0, ft) */
          int ft = 2 + (int)(lcg() % 200u);
          int s = (int)(lcg() % (unsigned)ft);
          ec_encode(&enc, (unsigned)s, (unsigned)(s + 1), (unsigned)ft);
          a = ft; v = s;
        } break;
        case 1: { /* bit_logp */
          int logp = 1 + (int)(lcg() % 14u);
          int bit = (int)(lcg() & 1u);
          ec_enc_bit_logp(&enc, bit, (unsigned)logp);
          a = logp; v = bit;
        } break;
        case 2: { /* uint */
          unsigned ft = 2u + lcg() % 100000u;
          unsigned s = lcg() % ft;
          ec_enc_uint(&enc, s, ft);
          a = (int)ft; v = (int)s;
        } break;
        case 3: { /* raw bits */
          int nb = 1 + (int)(lcg() % 16u);
          int s = (int)(lcg() & ((1u << nb) - 1u));
          ec_enc_bits(&enc, (opus_uint32)s, (unsigned)nb);
          a = nb; v = s;
        } break;
        case 4: { /* icdf on a fixed 4-symbol table, ftb=7 */
          static const unsigned char icdf[4] = {120, 80, 30, 0};
          int s = (int)(lcg() % 4u);
          ec_enc_icdf(&enc, s, icdf, 7);
          a = 4; v = s;
        } break;
      }
      ops[n][0] = kind; ops[n][1] = a; ops[n][2] = b;
      vals[n] = v;
      n++;
      if (ec_tell(&enc) > (BUF_SZ - 16) * 8) break;
    }
    ec_enc_done(&enc);
    if (enc.error) { printf("TRIAL %d ERROR\n", trial); continue; }
    printf("TRIAL %d N %d RB %u TELL %d\n", trial, n,
           ec_range_bytes(&enc), ec_tell(&enc));
    printf("OPS");
    for (i = 0; i < n; i++)
      printf(" %d,%d,%d", ops[i][0], ops[i][1], vals[i]);
    printf("\n");
    printf("BYTES ");
    for (i = 0; i < BUF_SZ; i++) printf("%02x", buf[i]);
    printf("\n");
    /* decode side: verify and emit tell_frac trace */
    ec_dec_init(&dec, buf, BUF_SZ);
    printf("TRACE");
    for (i = 0; i < n; i++) {
      int kind = ops[i][0], a = ops[i][1], got = -1;
      switch (kind) {
        case 0: {
          int s = (int)ec_decode(&dec, (unsigned)a);
          ec_dec_update(&dec, (unsigned)s, (unsigned)(s + 1), (unsigned)a);
          got = s;
        } break;
        case 1: got = ec_dec_bit_logp(&dec, (unsigned)a); break;
        case 2: got = (int)ec_dec_uint(&dec, (opus_uint32)a); break;
        case 3: got = (int)ec_dec_bits(&dec, (unsigned)a); break;
        case 4: {
          static const unsigned char icdf[4] = {120, 80, 30, 0};
          got = ec_dec_icdf(&dec, icdf, 7);
        } break;
      }
      if (got != vals[i]) { printf(" MISMATCH@%d", i); break; }
      printf(" %u", (unsigned)ec_tell_frac(&dec));
    }
    printf("\n");
  }
  return 0;
}
