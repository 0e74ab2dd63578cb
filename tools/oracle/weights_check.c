/* Oracle: parse a weight blob with the REFERENCE parser
 * (dnn/parse_lpcnet_weights.c:55 parse_weights) and dump each array's
 * name, type, byte size and a FNV-1a checksum of its payload.
 *
 * Usage: weights_check < blob.bin
 * Output lines: "<name> <type> <size> <fnv1a_hex>"
 *
 * Cross-checks opus_codec_tpu/dnn/weights.py's writer/parser against
 * the reference container format (nnet.h WeightHead).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "nnet.h"

static unsigned fnv1a(const unsigned char *p, int n)
{
    unsigned h = 2166136261u;
    int i;
    for (i = 0; i < n; i++) {
        h ^= p[i];
        h *= 16777619u;
    }
    return h;
}

int main(void)
{
    unsigned char *buf = NULL;
    size_t cap = 0, len = 0;
    WeightArray *list = NULL;
    int n, i;
    for (;;) {
        if (len == cap) {
            cap = cap ? 2 * cap : 1 << 16;
            buf = realloc(buf, cap);
            if (!buf) return 2;
        }
        size_t r = fread(buf + len, 1, cap - len, stdin);
        if (r == 0) break;
        len += r;
    }
    n = parse_weights(&list, buf, (int)len);
    if (n < 0) {
        fprintf(stderr, "parse_weights failed: %d\n", n);
        return 1;
    }
    for (i = 0; i < n; i++) {
        printf("%s %d %d %08x\n", list[i].name, list[i].type,
               list[i].size,
               fnv1a((const unsigned char *)list[i].data,
                     list[i].size));
    }
    free(list);
    free(buf);
    return 0;
}
