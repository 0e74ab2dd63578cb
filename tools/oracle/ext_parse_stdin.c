/* Parse extension bytes (hex on stdin) with libopus and print results —
   interop check: our generator's output through the reference parser. */
#include <stdio.h>
#include <string.h>
#include "opus_types.h"
typedef struct { int id; int frame; const unsigned char *data; opus_int32 len; } opus_extension_data;
extern opus_int32 opus_packet_extensions_parse(const unsigned char *data,
    opus_int32 len, opus_extension_data *extensions, opus_int32 *nb);
int main(void) {
    char hex[20000];
    unsigned char buf[10000];
    opus_extension_data out[32];
    opus_int32 nb = 32, i, n = 0, ret;
    if (!fgets(hex, sizeof(hex), stdin)) return 1;
    for (i = 0; hex[i] && hex[i] != '\n'; i += 2)
        sscanf(&hex[i], "%2hhx", &buf[n++]);
    ret = opus_packet_extensions_parse(buf, n, out, &nb);
    printf("RET %d NB %d\n", (int)ret, (int)nb);
    for (i = 0; i < nb; i++) {
        int j;
        printf("%d %d ", out[i].id, out[i].frame);
        for (j = 0; j < out[i].len; j++) printf("%02x", out[i].data[j]);
        printf("\n");
    }
    return 0;
}
