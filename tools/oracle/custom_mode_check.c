/* Dump CELTMode internals for custom rates. Usage: custom_mode_check <Fs> <frame> */
#include <stdio.h>
#include <stdlib.h>
#include "opus_custom.h"
#include "modes.h"
int main(int argc, char **argv)
{
   int err = 0;
   CELTMode *m = opus_custom_mode_create(atoi(argv[1]), atoi(argv[2]), &err);
   if (!m) { printf("ERR %d\n", err); return 1; }
   printf("nbEBands %d shortMdct %d maxLM %d overlap %d effEBands %d\n",
          m->nbEBands, m->shortMdctSize, m->maxLM, m->overlap, m->effEBands);
   printf("eBands:");
   for (int i = 0; i <= m->nbEBands; i++) printf(" %d", m->eBands[i]);
   printf("\npreemph: %f %f\n", m->preemph[0], m->preemph[1]);
   printf("alloc0:");
   for (int i = 0; i < m->nbEBands; i++) printf(" %d", m->allocVectors[5*m->nbEBands+i]);
   printf("\nlogN:");
   for (int i = 0; i < m->nbEBands; i++) printf(" %d", m->logN[i]);
   printf("\n");
   printf("cacheidx:");
   for (int i = 0; i < (m->maxLM+2)*m->nbEBands; i++) printf(" %d", m->cache.index[i]);
   printf("\ncachesize %d\ncaps:", m->cache.size);
   for (int i = 0; i < (m->maxLM+1)*2*m->nbEBands; i++) printf(" %d", m->cache.caps[i]);
   printf("\nbits0:");
   for (int i = 0; i < 40 && i < m->cache.size; i++) printf(" %d", m->cache.bits[i]);
   printf("\n");
   return 0;
}
