/* Dump the reference static CELT mode (48 kHz / 960) tables as text so
 * tests/test_celt_mode.py can compare our computed mode against them.
 * Test tooling only. */
#include <stdio.h>
#include "modes.h"
#include "celt.h"

int main(void) {
  int i;
  const CELTMode *m = opus_custom_mode_create(48000, 960, NULL);
  if (!m) { printf("ERROR\n"); return 1; }
  printf("Fs %d shortMdctSize %d maxLM %d nbEBands %d effEBands %d overlap %d\n",
         m->Fs, m->shortMdctSize, m->maxLM, m->nbEBands, m->effEBands,
         m->overlap);
  printf("eBands");
  for (i = 0; i <= m->nbEBands; i++) printf(" %d", m->eBands[i]);
  printf("\nlogN");
  for (i = 0; i < m->nbEBands; i++) printf(" %d", m->logN[i]);
  printf("\nwindow");
  for (i = 0; i < m->overlap; i++) printf(" %.9g", (double)m->window[i]);
  printf("\ncache_index");
  for (i = 0; i < m->nbEBands * (m->maxLM + 2); i++)
    printf(" %d", m->cache.index[i]);
  printf("\ncache_size %d\ncache_bits", m->cache.size);
  for (i = 0; i < m->cache.size; i++) printf(" %d", m->cache.bits[i]);
  printf("\ncache_caps");
  for (i = 0; i < (m->maxLM + 1) * 2 * m->nbEBands; i++)
    printf(" %d", m->cache.caps[i]);
  printf("\nallocVectors");
  for (i = 0; i < m->nbAllocVectors * m->nbEBands; i++)
    printf(" %d", m->allocVectors[i]);
  printf("\n");
  return 0;
}
